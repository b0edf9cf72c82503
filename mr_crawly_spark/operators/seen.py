"""URL-seen set: exact anti-join + partitioned Bloom prefilter (D2/D3/J3).

The reference's seen-set is a driver-local Python set (manager.py:61,248-249)
plus Redis SADD sets (cache.py:165-175). Distributed equivalent:

- membership   = LEFT ANTI join of candidates against the ``seen`` table,
  keyed on (url_hash, url) — xxhash64 keeps the shuffle key narrow while the
  url equality guards against 64-bit collisions (at 10^10 keys the birthday
  bound makes a few collisions likely, and seen-set *equality* is a
  correctness gate, so hash-only membership would be wrong);
- prefilter    = per-bucket Bloom filters over ``pmod(url_hash, n_buckets)``.
  Bloom is strictly a PREFILTER (SURVEY.md §7.4): candidates the Bloom rules
  out skip the shuffle entirely (no false negatives by construction);
  candidates it flags still anti-join exactly, so false positives only cost
  work, never correctness.

Scale path: at 10^10 seen URLs a 10-bits/key Bloom is ~12 GB — too big for
one broadcast. The sidecar layout (one row per bucket, written next to the
snapshot by ``write_bloom_sidecar``) shards it so a bucket-partitioned probe
loads only the ranges it needs; in-sandbox we broadcast the dict (the corpus
fits), and the bucket math is identical either way.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for a target false-positive rate."""
    n = max(n_items, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8  # byte-align
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _probe_positions(hashes_u64: np.ndarray, m: int, k: int) -> Iterator[np.ndarray]:
    """Double-hashing probe sequence from the 64-bit xxhash value."""
    h1 = hashes_u64 % np.uint64(m)
    h2 = ((hashes_u64 >> np.uint64(33)) | np.uint64(1)) % np.uint64(m)
    for i in range(k):
        yield (h1 + np.uint64(i) * h2) % np.uint64(m)


# refuse driver-side collects of Bloom bitmaps beyond this (the 10^10-key
# target is ~12 GB of Bloom — it must stay distributed; round-1 verdict #4)
MAX_DRIVER_BLOOM_BYTES = 256 * 1024 * 1024


def _bloom_df(seen: DataFrame, n_buckets: int, m_bits: int, k: int) -> DataFrame:
    """(bucket, bits) rows built DISTRIBUTED via applyInPandas — the full
    Bloom never exists in one place; each task builds its bucket's bitmap."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        bits = np.zeros(m_bits, dtype=bool)
        for pos in _probe_positions(h, m_bits, k):
            bits[pos] = True
        return pd.DataFrame(
            {"bucket": [int(pdf["_bucket"].iloc[0])],
             "bits": [np.packbits(bits).tobytes()]}
        )

    return (
        seen.select("url_hash")
        .withColumn("_bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)))
        .groupBy("_bucket")
        .applyInPandas(build, "bucket int, bits binary")
    )


def build_bucket_blooms(
    seen: DataFrame, n_buckets: int, m_bits: int, k: int
) -> dict[int, bytes]:
    """Driver-resident {bucket: packed bytes} for the broadcast probe path.
    Size-gated: beyond MAX_DRIVER_BLOOM_BYTES use the sidecar path
    (build_bloom_sidecar + bloom_prefilter_sidecar) — never collect."""
    total = n_buckets * (m_bits // 8)
    if total > MAX_DRIVER_BLOOM_BYTES:
        raise ValueError(
            f"bloom of {total} bytes exceeds the driver gate "
            f"({MAX_DRIVER_BLOOM_BYTES}); use build_bloom_sidecar + "
            "bloom_prefilter_sidecar (bucket-partitioned, no driver collect)"
        )
    rows = _bloom_df(seen, n_buckets, m_bits, k).collect()
    return {r["bucket"]: bytes(r["bits"]) for r in rows}


def _geometry_path(path: str) -> str:
    import os

    return os.path.join(path, "_bloom_geometry.json")


def _write_geometry(path: str, m_bits: int, k: int, n_buckets: int) -> None:
    import json
    import os

    os.makedirs(path, exist_ok=True)
    tmp = _geometry_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"m_bits": m_bits, "k": k, "n_buckets": n_buckets}, f)
    os.replace(tmp, _geometry_path(path))


def _remove_geometry(path: str) -> None:
    import contextlib
    import os

    with contextlib.suppress(FileNotFoundError):
        os.remove(_geometry_path(path))


def read_bloom_geometry(path: str) -> tuple[int, int, int] | None:
    """(m_bits, k, n_buckets) persisted with the sidecar, or None. Loaders
    MUST validate this against their config before probing: reloaded bitmaps
    probed with a different geometry give silent false negatives."""
    import json
    import os

    p = _geometry_path(path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        g = json.load(f)
    return (g["m_bits"], g["k"], g["n_buckets"])


def build_bloom_sidecar(
    seen: DataFrame, path: str, n_buckets: int, m_bits: int, k: int
) -> None:
    """Scale path: build the bucketed Bloom distributed and write it straight
    to the sidecar parquet — no driver collect at any size.

    Crash-safe ordering: the geometry file is removed FIRST and rewritten
    LAST, so any partial state in between has no geometry and loaders
    rebuild instead of probing a half-written filter (a valid geometry over
    missing bitmaps would silently answer definitely-unseen for every key —
    false negatives across the whole seen set)."""
    _remove_geometry(path)
    _bloom_df(seen, n_buckets, m_bits, k).write.mode("overwrite").parquet(path)
    _write_geometry(path, m_bits, k, n_buckets)


def _swap_sidecar_parquet(path, tmp_dir, remove_geom, write_geom) -> None:
    """Replace ``path``'s parquet files with a freshly-written tmp dir's,
    geometry-last: the geometry is removed before the first destructive
    step and rewritten only after the new files are all in place, so a
    crash at ANY point leaves a geometry-less dir that loaders treat as
    absent (rebuild) — never a valid geometry over partial bitmaps."""
    import glob as _glob
    import os
    import shutil

    remove_geom()  # invalidate: any crash below -> rebuild on resume
    for old in _glob.glob(os.path.join(path, "*.parquet")):
        os.remove(old)
    os.makedirs(path, exist_ok=True)
    parts = sorted(_glob.glob(os.path.join(tmp_dir, "*.parquet")))
    for i, fn in enumerate(parts):
        os.replace(fn, os.path.join(path, f"part-{i:05d}.parquet"))
    shutil.rmtree(tmp_dir, ignore_errors=True)
    write_geom()  # valid again


def merge_bloom_sidecar(
    spark: SparkSession,
    seen_delta: DataFrame,
    path: str,
    n_buckets: int,
    m_bits: int,
    k: int,
) -> None:
    """Fold a seen DELTA into the sidecar Bloom fully distributed — the
    sidecar-mode twin of engine._bloom_add_delta: executors build the
    delta's per-bucket bitmaps, union them with the existing sidecar rows,
    and OR-merge per bucket (one applyInPandas task per touched bucket).
    No bitmap ever reaches the driver; per-flush cost is one scan of the
    (filter-sized, n_buckets-row) sidecar plus the delta — independent of
    the seen table's size."""
    geom = read_bloom_geometry(path)
    if geom is not None and geom != (m_bits, k, n_buckets):
        raise ValueError(f"sidecar geometry {geom} != {(m_bits, k, n_buckets)}")
    existing = spark.read.parquet(path).select("bucket", "bits")
    delta = _bloom_df(seen_delta, n_buckets, m_bits, k)

    def or_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: np.ndarray | None = None
        for raw in pdf["bits"]:
            arr = np.frombuffer(bytes(raw), dtype=np.uint8)
            if acc is not None and len(arr) != len(acc):
                raise ValueError("bloom bitmap length mismatch — geometry drift")
            acc = arr.copy() if acc is None else (acc | arr)
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "bits": [acc.tobytes()]}
        )

    merged = (
        existing.unionByName(delta)
        .groupBy("bucket")
        .applyInPandas(or_merge, "bucket int, bits binary")
    )
    tmp = path.rstrip("/") + "._merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    _swap_sidecar_parquet(
        path,
        tmp,
        lambda: _remove_geometry(path),
        lambda: _write_geometry(path, m_bits, k, n_buckets),
    )


def write_bloom_sidecar(
    spark: SparkSession,
    blooms: dict[int, bytes],
    path: str,
    m_bits: int | None = None,
    k: int | None = None,
    n_buckets: int | None = None,
) -> None:
    """Persist a driver-resident bucketed Bloom next to the seen snapshot,
    including its geometry (resume validates it before probing). The dict
    already lives on the driver (size-gated), so the parquet is written
    pyarrow-direct — a createDataFrame + write job cost ~0.5 s of pure
    scheduling on every flush. Spark reads it back like any parquet dir.

    Crash-safe ordering (ADVICE r4): geometry removed FIRST, parquet
    written to a temp name and os.replace()d, geometry written LAST — a
    crash at any point leaves either the old complete sidecar or a
    geometry-less dir that loaders treat as absent and rebuild. The old
    remove-then-write order could leave a valid geometry over zero
    parquet files, which probes as all-unseen (silent false negatives)."""
    import glob as _glob
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    _os.makedirs(path, exist_ok=True)
    _remove_geometry(path)
    target = _os.path.join(path, "part-00000.parquet")
    for old in _glob.glob(_os.path.join(path, "*.parquet")):
        if old != target:
            _os.remove(old)  # stale parts from a previous distributed write
    pq.write_table(
        pa.table(
            {
                "bucket": pa.array(list(blooms.keys()), pa.int32()),
                "bits": pa.array(list(blooms.values()), pa.binary()),
            }
        ),
        target + ".tmp",
    )
    _os.replace(target + ".tmp", target)
    if m_bits is not None and k is not None and n_buckets is not None:
        _write_geometry(path, m_bits, k, n_buckets)


def read_bloom_sidecar(spark: SparkSession, path: str) -> dict[int, bytes]:
    return {
        r["bucket"]: bytes(r["bits"])
        for r in spark.read.parquet(path).collect()
    }


def bloom_prefilter(
    candidates: DataFrame,
    blooms: dict[int, bytes],
    n_buckets: int,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Append ``maybe_seen`` via an Arrow-batched membership probe.

    Candidates must carry ``url_hash``. Buckets missing from the dict are
    empty -> definitely unseen.
    """
    from pyspark.sql.types import BooleanType, StructField, StructType

    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(blooms)
    # fresh StructType — StructType.add would mutate the df's cached schema
    schema = StructType(
        list(candidates.schema.fields) + [StructField("maybe_seen", BooleanType())]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bl = bc.value
        unpacked: dict[int, np.ndarray] = {}
        for pdf in batches:
            signed = pdf["url_hash"].to_numpy(dtype=np.int64)
            h = signed.view(np.uint64)
            bkt = signed % n_buckets  # numpy % positive -> non-negative == pmod
            out = np.zeros(len(pdf), dtype=bool)
            for b in np.unique(bkt):
                bits_bytes = bl.get(int(b))
                if bits_bytes is None:
                    continue
                if int(b) not in unpacked:
                    unpacked[int(b)] = np.unpackbits(
                        np.frombuffer(bits_bytes, dtype=np.uint8)
                    ).astype(bool)
                bits = unpacked[int(b)]
                mask = bkt == b
                ok = np.ones(int(mask.sum()), dtype=bool)
                for pos in _probe_positions(h[mask], m_bits, k):
                    ok &= bits[pos]
                out[mask] = ok
            pdf = pdf.copy()
            pdf["maybe_seen"] = out
            yield pdf

    return candidates.mapInPandas(probe, schema)


def bloom_prefilter_sidecar(
    candidates: DataFrame,
    sidecar_path: str,
    n_buckets: int,
    m_bits: int,
    k: int,
    debug_loaded_col: bool = False,
) -> DataFrame:
    """Append ``maybe_seen`` via a BUCKET-PARTITIONED probe: candidates are
    range-partitioned by ``pmod(url_hash, n_buckets)`` and each task loads
    ONLY the bucket bitmaps present in its partition, straight from the
    sidecar parquet with a pyarrow bucket-predicate read — the full Bloom is
    never broadcast or driver-resident (the 10^10-key / ~12 GB case that
    kills the dict path, round-1 verdict #4).

    ``debug_loaded_col`` adds ``_buckets_loaded`` = how many distinct bucket
    bitmaps this task has read so far (tests assert locality with it).
    """
    import glob as _glob

    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        StructField,
        StructType,
    )

    geom = read_bloom_geometry(sidecar_path)
    if geom is not None and geom != (m_bits, k, n_buckets):
        raise ValueError(
            f"sidecar geometry {geom} != requested {(m_bits, k, n_buckets)}"
        )
    files = sorted(_glob.glob(f"{sidecar_path}/*.parquet"))
    if not files:
        # a parquet-less sidecar would probe every key as definitely-unseen
        # (silent false negatives) — refuse; callers rebuild instead
        raise FileNotFoundError(
            f"bloom sidecar {sidecar_path} has no parquet files — rebuild it"
        )

    bucketed = candidates.withColumn(
        "_bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets))
    ).repartitionByRange(n_buckets, "_bucket")
    fields = list(bucketed.schema.fields) + [StructField("maybe_seen", BooleanType())]
    if debug_loaded_col:
        fields.append(StructField("_buckets_loaded", IntegerType()))
    schema = StructType(fields)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq  # executor-side import

        loaded: dict[int, np.ndarray | None] = {}

        def load_bucket(b: int) -> np.ndarray | None:
            for fn in files:
                tbl = pq.read_table(fn, filters=[("bucket", "=", b)])
                if tbl.num_rows:
                    raw = tbl.column("bits")[0].as_py()
                    return np.unpackbits(
                        np.frombuffer(raw, dtype=np.uint8)
                    ).astype(bool)
            return None  # empty bucket -> definitely unseen

        for pdf in batches:
            signed = pdf["url_hash"].to_numpy(dtype=np.int64)
            h = signed.view(np.uint64)
            bkt = pdf["_bucket"].to_numpy(dtype=np.int64)
            out = np.zeros(len(pdf), dtype=bool)
            for b in np.unique(bkt):
                if int(b) not in loaded:
                    loaded[int(b)] = load_bucket(int(b))
                bits = loaded[int(b)]
                if bits is None:
                    continue
                mask = bkt == b
                ok = np.ones(int(mask.sum()), dtype=bool)
                for pos in _probe_positions(h[mask], m_bits, k):
                    ok &= bits[pos]
                out[mask] = ok
            pdf = pdf.copy()
            pdf["maybe_seen"] = out
            if debug_loaded_col:
                pdf["_buckets_loaded"] = len(loaded)
            yield pdf

    return bucketed.mapInPandas(probe, schema).drop("_bucket")


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    blooms: dict[int, bytes] | None = None,
    n_buckets: int = 0,
    m_bits: int = 0,
    k: int = 0,
    sidecar_path: str | None = None,
) -> DataFrame:
    """Rows of ``candidates`` (url, url_hash, ...) not present in ``seen``.

    Exact semantics always; the Bloom path only short-circuits the shuffle
    for definitely-new rows. Pass ``blooms`` (small, broadcast dict) OR
    ``sidecar_path`` (bucket-partitioned executor-side loads — the scale
    path; the full Bloom never leaves the cluster).
    """
    seen_keys = seen.select("url_hash", "url")
    if blooms is None and sidecar_path is None:
        return candidates.join(seen_keys, ["url_hash", "url"], "left_anti")
    if sidecar_path is not None:
        probed = bloom_prefilter_sidecar(
            candidates, sidecar_path, n_buckets, m_bits, k
        )
    else:
        probed = bloom_prefilter(candidates, blooms, n_buckets, m_bits, k)
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = (
        probed.filter(F.col("maybe_seen"))
        .drop("maybe_seen")
        .join(seen_keys, ["url_hash", "url"], "left_anti")
    )
    return fresh.unionByName(maybe)


# --------------------------------------------------------------------------- #
# Cuckoo-filter prefilter (north_star: "partitioned Bloom/cuckoo URL-seen").
#
# Same contract as the Bloom path — a PREFILTER with no false negatives, so
# it can only skip work, never change the seen-set — with the cuckoo
# filter's two extra properties (Fan et al., "Cuckoo Filter: Practically
# Better Than Bloom", CoNEXT 2014):
#   - O(1) DELETION: a recrawl can evict a URL to force a refetch without
#     rebuilding the filter (a Bloom cannot delete);
#   - bounded occupancy: a bucket that cannot absorb its keys is marked
#     SATURATED (empty sentinel) and degrades to "everything maybe-seen" —
#     exact anti-join still decides, so saturation costs work, not answers.
#
# Layout mirrors the Bloom sidecar: the 64-bit url_hash shards into engine
# buckets via pmod(url_hash, n_buckets); each engine bucket holds one
# partial-key cuckoo table (uint16 fingerprints, SLOTS_PER_BUCKET-way),
# built distributed per bucket via applyInPandas.

SLOTS_PER_BUCKET = 4
MAX_KICKS = 500
_FP_MASK = np.uint64(0xFFFF)
# involutive alternate-index mix (partial-key cuckoo hashing needs
# i2 = i1 ^ mix(fp) with a power-of-two table so the xor round-trips)
_FP_MIX = np.uint64(0x5BD1E995)


def cuckoo_params(n_items: int, load_factor: float = 0.84) -> int:
    """Table size (rows of SLOTS_PER_BUCKET slots) per engine bucket for the
    expected per-bucket key count: next power of two above
    n / (slots * load). Power-of-two is REQUIRED for the xor alternate
    index to be involutive."""
    n = max(n_items, 1)
    rows = max(8, int(n / (SLOTS_PER_BUCKET * load_factor)) + 1)
    return 1 << (rows - 1).bit_length()


def _cuckoo_fp_i1_i2(
    h: np.ndarray, n_rows: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fingerprint, primary row, alternate row) per 64-bit hash. fp==0 is
    reserved for empty slots, so fingerprints are remapped to 1. The hash is
    avalanche-mixed first (odd-constant multiply is a bijection mod 2^64);
    BOTH the fingerprint and the primary row come from the MIXED hash:

    - fp from raw high bits would collapse low-entropy inputs (small ints)
      to one fingerprint;
    - i1 from LOW bits (raw OR mixed) would collapse under the engine's
      bucket shard — keys reach a bucket via pmod(url_hash, n_buckets) with
      power-of-two n_buckets, so within a bucket the low log2(n_buckets)
      bits are CONSTANT, and an odd-constant multiply PRESERVES that (a
      multiple of 2^b times odd stays a multiple of 2^b): only
      n_rows/n_buckets primary rows would ever be used (measured: 6170 keys
      in a 2048-row table hit 64 rows and saturated at 0.75 load). So i1
      takes bits 16+ of hm — a product's high-side bits depend on every
      input bit; fp uses bits 48+, disjoint for any practical n_rows."""
    mask = np.uint64(n_rows - 1)
    hm = h * np.uint64(0x9E3779B97F4A7C15)  # wraps mod 2^64
    fp = ((hm >> np.uint64(48)) & _FP_MASK).astype(np.uint64)
    fp[fp == 0] = 1
    i1 = (hm >> np.uint64(16)) & mask
    i2 = (i1 ^ (fp * _FP_MIX)) & mask
    return fp.astype(np.uint16), i1.astype(np.int64), i2.astype(np.int64)


def _place_fp(tbl: np.ndarray, fp: int, i1: int, i2: int, mask: np.uint64) -> bool:
    """Place one fingerprint into (i1 | i2), evicting up to MAX_KICKS.
    Duplicate fingerprints are STORED, not skipped (Fan et al. §3): two
    distinct keys colliding on (fp, row-class) occupy two slots, so
    cuckoo_delete removes ONE copy and the other key keeps probing positive
    — the no-false-negative contract survives deletion. Each inserted key
    adds exactly one copy, so duplicates are naturally bounded by the
    caller's insert-once discipline (the engine only ever inserts a URL the
    round it first becomes seen)."""
    for row in (i1, i2):
        free = np.flatnonzero(tbl[row] == 0)
        if free.size:
            tbl[row, free[0]] = fp
            return True
    # eviction chain: deterministic victim slot (kick counter mod ways)
    row, cur = i1, fp
    for kick in range(MAX_KICKS):
        slot = kick % SLOTS_PER_BUCKET
        cur, tbl[row, slot] = int(tbl[row, slot]), cur
        row = int((np.uint64(row) ^ (np.uint64(cur) * _FP_MIX)) & mask)
        free = np.flatnonzero(tbl[row] == 0)
        if free.size:
            tbl[row, free[0]] = cur
            return True
    return False


def _cuckoo_insert_all(h: np.ndarray, n_rows: int) -> bytes:
    """Build one bucket's table; b'' (saturated sentinel) if any key cannot
    be placed within MAX_KICKS evictions."""
    return _cuckoo_insert_into(
        np.zeros((n_rows, SLOTS_PER_BUCKET), dtype=np.uint16), h, n_rows
    )


def _cuckoo_df(seen: DataFrame, n_buckets: int, n_rows: int) -> DataFrame:
    """(bucket, bits) cuckoo tables built DISTRIBUTED via applyInPandas —
    one task per engine bucket; the full filter never exists in one task."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        return pd.DataFrame(
            {"bucket": [int(pdf["_bucket"].iloc[0])],
             "bits": [_cuckoo_insert_all(h, n_rows)]}
        )

    return (
        seen.select("url_hash")
        .withColumn("_bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)))
        .groupBy("_bucket")
        .applyInPandas(build, "bucket int, bits binary")
    )


def build_bucket_cuckoos(
    seen: DataFrame, n_buckets: int, n_rows: int
) -> dict[int, bytes]:
    """Driver-resident {engine bucket: cuckoo table bytes} — the twin of
    build_bucket_blooms; built distributed, one task per engine bucket."""
    total = n_buckets * n_rows * SLOTS_PER_BUCKET * 2
    if total > MAX_DRIVER_BLOOM_BYTES:
        raise ValueError(
            f"cuckoo of {total} bytes exceeds the driver gate "
            f"({MAX_DRIVER_BLOOM_BYTES}); use build_cuckoo_sidecar + "
            "cuckoo_prefilter_sidecar (bucket-partitioned, no driver collect)"
        )
    rows = _cuckoo_df(seen, n_buckets, n_rows).collect()
    return {r["bucket"]: bytes(r["bits"]) for r in rows}


def cuckoo_add_delta(
    tables: dict[int, bytes],
    seen_delta: DataFrame,
    n_buckets: int,
    n_rows: int,
) -> None:
    """Fold a round's seen delta into the driver-resident filter — the
    cuckoo twin of engine._bloom_add_delta, fully distributed (r3 verdict
    #1): executors build per-bucket delta tables from the delta's url_hash
    column (applyInPandas, one task per touched bucket); the driver then
    merges TABLE BYTES per bucket (KBs) instead of collecting raw url-hash
    lists through the driver. A bucket whose merge overflows flips to the
    saturated sentinel — degrades to maybe-seen, never a false negative."""
    delta = {
        r["bucket"]: bytes(r["bits"])
        for r in _cuckoo_df(seen_delta, n_buckets, n_rows).collect()
    }
    for b, bits in delta.items():
        existing = tables.get(b)
        if existing == b"":
            continue  # already saturated
        if bits == b"":
            tables[b] = b""  # delta alone overflowed -> merged surely would
            continue
        if existing is None:
            tables[b] = bits
            continue
        tbl = np.frombuffer(existing, dtype=np.uint16).reshape(
            n_rows, SLOTS_PER_BUCKET
        ).copy()
        d = np.frombuffer(bits, dtype=np.uint16).reshape(
            n_rows, SLOTS_PER_BUCKET
        )
        tables[b] = _cuckoo_merge_tables(tbl, d, n_rows)


def cuckoo_add(
    tables: dict[int, bytes], url_hashes: list[int], n_buckets: int, n_rows: int
) -> None:
    """Driver-side insert of a small url-hash list (tests / tooling; the
    engine round loop uses cuckoo_add_delta, which never moves hashes
    through the driver). A bucket that overflows flips to the saturated
    sentinel."""
    by_bucket: dict[int, list[int]] = {}
    for signed in url_hashes:
        by_bucket.setdefault(signed % n_buckets, []).append(signed)
    for b, hs in by_bucket.items():
        existing = tables.get(b)
        if existing == b"":
            continue  # already saturated
        h_new = np.array(hs, dtype=np.int64).view(np.uint64)
        if existing is None:
            tables[b] = _cuckoo_insert_all(h_new, n_rows)
            continue
        tbl = np.frombuffer(existing, dtype=np.uint16).reshape(
            n_rows, SLOTS_PER_BUCKET
        ).copy()
        # fps are one-way (cannot rebuild from keys), so insert the new
        # keys into the existing table directly
        tables[b] = _cuckoo_insert_into(tbl, h_new, n_rows)


def _cuckoo_insert_into(tbl: np.ndarray, h: np.ndarray, n_rows: int) -> bytes:
    """Insert the keys of ``h`` into an existing table (in place); b'' when
    any key cannot be placed."""
    fps, i1s, i2s = _cuckoo_fp_i1_i2(h, n_rows)
    mask = np.uint64(n_rows - 1)
    for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
        if not _place_fp(tbl, fp, i1, i2, mask):
            return b""  # saturated: prefilter degrades, never lies
    return tbl.tobytes()


def _cuckoo_merge_tables(
    tbl: np.ndarray, delta: np.ndarray, n_rows: int
) -> bytes:
    """Fold a DELTA cuckoo table (same geometry) into ``tbl`` in place.

    Fingerprints are one-way, but a stored fp at row r fully determines its
    key class {r, r ^ mix(fp)} (the xor is involutive on a power-of-two
    table), so re-placing each delta (row, fp) at exactly those two rows
    preserves probe correctness — this is what makes the DISTRIBUTED
    incremental add possible: executors build per-bucket tables of just the
    round's new keys, and the driver merges table bytes instead of
    receiving raw url hashes (r3 verdict #1)."""
    mask = np.uint64(n_rows - 1)
    rows, slots = np.nonzero(delta)
    for r, s in zip(rows.tolist(), slots.tolist()):
        fp = int(delta[r, s])
        alt = int((np.uint64(r) ^ (np.uint64(fp) * _FP_MIX)) & mask)
        if not _place_fp(tbl, fp, r, alt, mask):
            return b""
    return tbl.tobytes()


def _cuckoo_geometry_path(path: str) -> str:
    import os

    return os.path.join(path, "_cuckoo_geometry.json")


def _remove_cuckoo_geometry(path: str) -> None:
    import contextlib
    import os

    with contextlib.suppress(FileNotFoundError):
        os.remove(_cuckoo_geometry_path(path))


def _write_cuckoo_geometry(path: str, n_rows: int, n_buckets: int) -> None:
    import json
    import os

    os.makedirs(path, exist_ok=True)
    tmp = _cuckoo_geometry_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n_rows": n_rows, "n_buckets": n_buckets}, f)
    os.replace(tmp, _cuckoo_geometry_path(path))


def build_cuckoo_sidecar(
    seen: DataFrame, path: str, n_buckets: int, n_rows: int
) -> None:
    """Scale path: build the bucketed cuckoo filter distributed (one task
    per engine bucket) and write it straight to the sidecar parquet — no
    driver collect at any size. The twin of build_bloom_sidecar, with the
    same crash-safe geometry-removed-first / geometry-written-last order."""
    _remove_cuckoo_geometry(path)
    _cuckoo_df(seen, n_buckets, n_rows).write.mode("overwrite").parquet(path)
    _write_cuckoo_geometry(path, n_rows, n_buckets)


def _cuckoo_fold_tables(raws: list[bytes], n_rows: int) -> bytes:
    """Fold same-geometry cuckoo tables into one: the first is the base,
    every later table's stored (row, fp) pairs re-place into it via the
    involutive key class {r, r ^ mix(fp)}. Any saturated input (or a merge
    overflow) saturates the result — degrades to maybe-seen, never lies."""
    if any(t == b"" for t in raws):
        return b""
    base = np.frombuffer(raws[0], dtype=np.uint16).reshape(
        n_rows, SLOTS_PER_BUCKET
    ).copy()
    for t in raws[1:]:
        d = np.frombuffer(t, dtype=np.uint16).reshape(n_rows, SLOTS_PER_BUCKET)
        merged = _cuckoo_merge_tables(base, d, n_rows)
        if merged == b"":
            return b""
        base = np.frombuffer(merged, dtype=np.uint16).reshape(
            n_rows, SLOTS_PER_BUCKET
        ).copy()
    return base.tobytes()


def merge_cuckoo_sidecar(
    spark: SparkSession,
    seen_delta: DataFrame,
    path: str,
    n_buckets: int,
    n_rows: int,
) -> None:
    """Fold a seen DELTA into the sidecar cuckoo filter fully distributed —
    the sidecar-mode twin of cuckoo_add_delta: executors build the delta's
    per-bucket tables, union them with the existing sidecar rows, and fold
    per bucket (one applyInPandas task per touched bucket). No table bytes
    reach the driver; a bucket whose fold overflows flips to the saturated
    sentinel (costs work, never correctness)."""
    geom = read_cuckoo_geometry(path)
    if geom is not None and geom != (n_rows, n_buckets):
        raise ValueError(f"sidecar geometry {geom} != {(n_rows, n_buckets)}")
    existing = spark.read.parquet(path).select("bucket", "bits")
    delta = _cuckoo_df(seen_delta, n_buckets, n_rows)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        raws = [bytes(r) for r in pdf["bits"]]
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])],
             "bits": [_cuckoo_fold_tables(raws, n_rows)]}
        )

    merged = (
        existing.unionByName(delta)
        .groupBy("bucket")
        .applyInPandas(fold, "bucket int, bits binary")
    )
    tmp = path.rstrip("/") + "._merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    _swap_sidecar_parquet(
        path,
        tmp,
        lambda: _remove_cuckoo_geometry(path),
        lambda: _write_cuckoo_geometry(path, n_rows, n_buckets),
    )


def write_cuckoo_sidecar(
    tables: dict[int, bytes], path: str, n_rows: int, n_buckets: int
) -> None:
    """Persist the driver-resident cuckoo filter next to the seen snapshot
    (the Bloom-sidecar twin): pyarrow-direct parquet (the dict is
    size-gated driver data — no Spark job) plus a geometry file. Resume
    MUST validate the geometry before probing: tables probed with a
    different n_rows give silent false negatives.

    Crash-safe ordering (ADVICE r4): geometry removed FIRST, parquet
    written to a temp name and os.replace()d, geometry written LAST — a
    crash mid-write leaves a geometry-less dir that resume treats as
    absent (rebuild from the seen table), never a valid geometry over
    zero parquet files (which read_cuckoo_sidecar would return as {} and
    cuckoo_prefilter would probe as definitely-unseen for every key)."""
    import contextlib
    import glob as _glob
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    with contextlib.suppress(FileNotFoundError):
        os.remove(_cuckoo_geometry_path(path))
    target = os.path.join(path, "part-00000.parquet")
    for old in _glob.glob(os.path.join(path, "*.parquet")):
        if old != target:
            os.remove(old)
    pq.write_table(
        pa.table(
            {
                "bucket": pa.array(list(tables.keys()), pa.int32()),
                "bits": pa.array(list(tables.values()), pa.binary()),
            }
        ),
        target + ".tmp",
    )
    os.replace(target + ".tmp", target)
    tmp = _cuckoo_geometry_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n_rows": n_rows, "n_buckets": n_buckets}, f)
    os.replace(tmp, _cuckoo_geometry_path(path))


def read_cuckoo_geometry(path: str) -> tuple[int, int] | None:
    """(n_rows, n_buckets) persisted with the sidecar, or None."""
    import json
    import os

    p = _cuckoo_geometry_path(path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        g = json.load(f)
    return (g["n_rows"], g["n_buckets"])


def read_cuckoo_sidecar(path: str) -> dict[int, bytes]:
    """Load the persisted filter. Raises FileNotFoundError when the dir has
    NO parquet files at all: an empty dict probes as definitely-unseen for
    every key, so treating a gutted sidecar as 'empty filter' would turn
    filesystem damage into silent false negatives — callers must rebuild
    instead. (A legitimately empty filter is one parquet file, zero rows.)"""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise FileNotFoundError(
            f"cuckoo sidecar {path} has a geometry but no parquet files — "
            "invalid state; rebuild from the seen table"
        )
    out: dict[int, bytes] = {}
    for fn in files:
        tbl = pq.read_table(fn)
        for b, bits in zip(
            tbl.column("bucket").to_pylist(), tbl.column("bits").to_pylist()
        ):
            out[int(b)] = bytes(bits)
    return out


def cuckoo_delete(
    tables: dict[int, bytes], url_hash: int, n_buckets: int, n_rows: int
) -> bool:
    """Remove one key's fingerprint (the cuckoo capability a Bloom lacks —
    e.g. force-refetch a URL without rebuilding the whole prefilter).
    Returns True if a fingerprint was cleared. Deleting from a saturated
    bucket is a no-op (it already answers maybe for everything).

    Safe for inserted keys: inserts STORE duplicate fingerprints (see
    _place_fp), so when two live keys collide on (fp, row-class) each owns
    a slot — deleting one clears one copy and the other still probes
    positive. Delete exactly as many times as you inserted."""
    b = url_hash % n_buckets
    existing = tables.get(b)
    if not existing:  # absent or saturated sentinel
        return False
    tbl = np.frombuffer(existing, dtype=np.uint16).reshape(
        n_rows, SLOTS_PER_BUCKET
    ).copy()
    h = np.array([url_hash], dtype=np.int64).view(np.uint64)
    fps, i1s, i2s = _cuckoo_fp_i1_i2(h, n_rows)
    fp, i1, i2 = int(fps[0]), int(i1s[0]), int(i2s[0])
    for row in (i1, i2):
        hit = np.flatnonzero(tbl[row] == fp)
        if hit.size:
            tbl[row, hit[0]] = 0
            tables[b] = tbl.tobytes()
            return True
    return False


def cuckoo_prefilter(
    candidates: DataFrame,
    tables: dict[int, bytes],
    n_buckets: int,
    n_rows: int,
) -> DataFrame:
    """Append ``maybe_seen`` via an Arrow-batched cuckoo probe — the twin of
    bloom_prefilter. Missing buckets are empty (definitely unseen);
    saturated buckets (b'') answer maybe for every key."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(tables)
    schema = StructType(
        list(candidates.schema.fields) + [StructField("maybe_seen", BooleanType())]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tb = bc.value
        unpacked: dict[int, np.ndarray | None] = {}
        for pdf in batches:
            signed = pdf["url_hash"].to_numpy(dtype=np.int64)
            h = signed.view(np.uint64)
            bkt = signed % n_buckets
            out = np.zeros(len(pdf), dtype=bool)
            for b in np.unique(bkt):
                raw = tb.get(int(b))
                if raw is None:
                    continue
                if raw == b"":
                    out[bkt == b] = True  # saturated -> exact join decides
                    continue
                if int(b) not in unpacked:
                    unpacked[int(b)] = np.frombuffer(raw, dtype=np.uint16).reshape(
                        n_rows, SLOTS_PER_BUCKET
                    )
                tbl = unpacked[int(b)]
                mask = bkt == b
                fps, i1s, i2s = _cuckoo_fp_i1_i2(h[mask], n_rows)
                hit = (tbl[i1s] == fps[:, None]).any(axis=1) | (
                    tbl[i2s] == fps[:, None]
                ).any(axis=1)
                out[mask] = hit
            pdf = pdf.copy()
            pdf["maybe_seen"] = out
            yield pdf

    return candidates.mapInPandas(probe, schema)


def cuckoo_prefilter_sidecar(
    candidates: DataFrame,
    sidecar_path: str,
    n_buckets: int,
    n_rows: int,
    debug_loaded_col: bool = False,
) -> DataFrame:
    """Append ``maybe_seen`` via a BUCKET-PARTITIONED cuckoo probe — the
    twin of bloom_prefilter_sidecar: candidates are range-partitioned by
    ``pmod(url_hash, n_buckets)`` and each task loads ONLY the bucket
    tables in its partition, straight from the sidecar parquet with a
    pyarrow bucket-predicate read. The full filter is never broadcast or
    driver-resident — the path build_bucket_cuckoos' 256 MB driver gate
    points at (a 10^9-key cuckoo at 2 B/fp·1.19 slots is ~2.4 GB; at
    10^10 it is ~24 GB and MUST stay distributed).

    Saturated buckets (b'' sentinel) answer maybe for every key; missing
    buckets are empty (definitely unseen). ``debug_loaded_col`` adds
    ``_buckets_loaded`` for the locality tests."""
    import glob as _glob

    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        StructField,
        StructType,
    )

    geom = read_cuckoo_geometry(sidecar_path)
    if geom is not None and geom != (n_rows, n_buckets):
        raise ValueError(
            f"sidecar geometry {geom} != requested {(n_rows, n_buckets)}"
        )
    files = sorted(_glob.glob(f"{sidecar_path}/*.parquet"))
    if not files:
        raise FileNotFoundError(
            f"cuckoo sidecar {sidecar_path} has no parquet files — rebuild it"
        )

    bucketed = candidates.withColumn(
        "_bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets))
    ).repartitionByRange(n_buckets, "_bucket")
    fields = list(bucketed.schema.fields) + [StructField("maybe_seen", BooleanType())]
    if debug_loaded_col:
        fields.append(StructField("_buckets_loaded", IntegerType()))
    schema = StructType(fields)

    _SATURATED = "saturated"

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq  # executor-side import

        loaded: dict[int, np.ndarray | str | None] = {}

        def load_bucket(b: int) -> np.ndarray | str | None:
            for fn in files:
                tbl = pq.read_table(fn, filters=[("bucket", "=", b)])
                if tbl.num_rows:
                    raw = tbl.column("bits")[0].as_py()
                    if raw == b"":
                        return _SATURATED
                    return np.frombuffer(raw, dtype=np.uint16).reshape(
                        n_rows, SLOTS_PER_BUCKET
                    )
            return None  # empty bucket -> definitely unseen

        for pdf in batches:
            signed = pdf["url_hash"].to_numpy(dtype=np.int64)
            h = signed.view(np.uint64)
            bkt = pdf["_bucket"].to_numpy(dtype=np.int64)
            out = np.zeros(len(pdf), dtype=bool)
            for b in np.unique(bkt):
                if int(b) not in loaded:
                    loaded[int(b)] = load_bucket(int(b))
                tbl = loaded[int(b)]
                if tbl is None:
                    continue
                mask = bkt == b
                if isinstance(tbl, str):  # saturated -> exact join decides
                    out[mask] = True
                    continue
                fps, i1s, i2s = _cuckoo_fp_i1_i2(h[mask], n_rows)
                hit = (tbl[i1s] == fps[:, None]).any(axis=1) | (
                    tbl[i2s] == fps[:, None]
                ).any(axis=1)
                out[mask] = hit
            pdf = pdf.copy()
            pdf["maybe_seen"] = out
            if debug_loaded_col:
                pdf["_buckets_loaded"] = len(loaded)
            yield pdf

    return bucketed.mapInPandas(probe, schema).drop("_bucket")


def filter_unseen_cuckoo(
    candidates: DataFrame,
    seen: DataFrame,
    tables: dict[int, bytes] | None,
    n_buckets: int,
    n_rows: int,
    sidecar_path: str | None = None,
) -> DataFrame:
    """filter_unseen with the cuckoo prefilter: exact semantics always —
    definitely-new rows skip the anti-join shuffle, flagged rows still join
    exactly (false positives cost work, never correctness). Pass ``tables``
    (small, broadcast dict) OR ``sidecar_path`` (bucket-partitioned
    executor-side loads — the scale path)."""
    seen_keys = seen.select("url_hash", "url")
    if sidecar_path is not None:
        probed = cuckoo_prefilter_sidecar(
            candidates, sidecar_path, n_buckets, n_rows
        )
    else:
        probed = cuckoo_prefilter(candidates, tables, n_buckets, n_rows)
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = (
        probed.filter(F.col("maybe_seen"))
        .drop("maybe_seen")
        .join(seen_keys, ["url_hash", "url"], "left_anti")
    )
    return fresh.unionByName(maybe)
