"""applyInPandasWithState: per-host state must accumulate ACROSS
micro-batches (one file per trigger) and match the batch ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_crawly_spark.streaming.stateful import host_crawl_state

SCHEMA = "host string, fetched_at double, fetch_status int"


def test_host_state_accumulates_across_batches(spark, tmp_path):
    pdir = str(tmp_path / "fetch_stream")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    batch1 = [("a.test", 0.0, 200), ("a.test", 0.4, 200), ("b.test", 1.0, 404)]
    batch2 = [("a.test", 5.0, 200), ("b.test", 1.2, 200), ("b.test", 9.0, 200)]
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(pdir + "/f1")
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(pdir + "/f2")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(pdir + "/f*")
    )
    out = host_crawl_state(stream, min_gap=1.0)
    q = (
        out.writeStream.format("memory")
        .queryName("host_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    # update mode emits one row per host per batch; the LAST row per host is
    # the accumulated state
    rows = spark.sql(
        "SELECT * FROM host_state"
    ).orderBy("host", "n_fetches").collect()
    final = {}
    for r in rows:
        final[r["host"]] = (
            r["n_fetches"], r["n_ok"], r["last_fetch_at"],
            r["politeness_violations"],
        )
    # a.test: fetches at 0.0, 0.4 (gap 0.4 -> violation), 5.0 -> 3 fetches all ok
    assert final["a.test"] == (3, 3, 5.0, 1)
    # b.test: 1.0 (404), 1.2 (gap .2 -> violation), 9.0 -> 3 fetches, 2 ok
    assert final["b.test"] == (3, 2, 9.0, 1)
    # state crossed batch boundaries: intermediate emission for a.test had 2
    a_rows = [r for r in rows if r["host"] == "a.test"]
    assert len(a_rows) >= 2 and a_rows[0]["n_fetches"] == 2
