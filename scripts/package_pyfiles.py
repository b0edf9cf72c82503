"""Build the --py-files zip for cluster submission (north_rule: "run via
spark-submit --py-files on multi-executor clusters").

    python scripts/package_pyfiles.py [out.zip]
    spark-submit --py-files mr_crawly_spark.zip main.py --warehouse ...

Zips the `mr_crawly_spark` package and the `oracle` package (the golden
tests import it; harmless on executors) from the repo root, source only.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> list[str]:
    names: list[str] = []
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for pkg in ("mr_crawly_spark", "oracle"):
            root = os.path.join(REPO, pkg)
            for dirpath, dirnames, filenames in os.walk(root):
                dirnames[:] = [d for d in dirnames if d != "__pycache__"]
                for fn in sorted(filenames):
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(dirpath, fn)
                    arc = os.path.relpath(full, REPO)
                    zf.write(full, arc)
                    names.append(arc)
    return names


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "mr_crawly_spark.zip"
    )
    names = build(out)
    print(f"{out}: {len(names)} files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
