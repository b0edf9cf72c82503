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


def build_bucket_blooms(
    seen: DataFrame, n_buckets: int, m_bits: int, k: int
) -> dict[int, bytes]:
    """Per-bucket Bloom bitsets built distributed (applyInPandas), collected
    as {bucket: packed bytes}. Each bucket holds seen-urls with
    pmod(url_hash, n_buckets) == bucket."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        bits = np.zeros(m_bits, dtype=bool)
        for pos in _probe_positions(h, m_bits, k):
            bits[pos] = True
        return pd.DataFrame(
            {"bucket": [int(pdf["_bucket"].iloc[0])],
             "bits": [np.packbits(bits).tobytes()]}
        )

    rows = (
        seen.select("url_hash")
        .withColumn("_bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)))
        .groupBy("_bucket")
        .applyInPandas(build, "bucket int, bits binary")
        .collect()
    )
    return {r["bucket"]: bytes(r["bits"]) for r in rows}


def write_bloom_sidecar(
    spark: SparkSession, blooms: dict[int, bytes], path: str
) -> None:
    """Persist the bucketed Bloom next to the seen snapshot (scale path:
    probes load only the buckets they touch)."""
    pdf = pd.DataFrame(
        {"bucket": list(blooms.keys()), "bits": list(blooms.values())}
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(path)


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


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    blooms: dict[int, bytes] | None = None,
    n_buckets: int = 0,
    m_bits: int = 0,
    k: int = 0,
) -> DataFrame:
    """Rows of ``candidates`` (url, url_hash, ...) not present in ``seen``.

    Exact semantics always; the Bloom path only short-circuits the shuffle
    for definitely-new rows.
    """
    seen_keys = seen.select("url_hash", "url")
    if blooms is None:
        return candidates.join(seen_keys, ["url_hash", "url"], "left_anti")
    probed = bloom_prefilter(candidates, blooms, n_buckets, m_bits, k)
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = (
        probed.filter(F.col("maybe_seen"))
        .drop("maybe_seen")
        .join(seen_keys, ["url_hash", "url"], "left_anti")
    )
    return fresh.unionByName(maybe)
