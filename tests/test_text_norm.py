"""CCNet-style normalization (functions/text.py normalized_text):
case/accent/punctuation/whitespace canonicalization, idempotence, and
the dedup use — reformatted variants collide after normalizing."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_crawly_spark.functions.text import fingerprint, normalized_text


def _norm_one(spark, s):
    return (
        spark.createDataFrame([(s,)], "t string")
        .select(normalized_text(F.col("t")).alias("n"))
        .collect()[0]["n"]
    )


def test_normalized_text_hand_cases(spark):
    assert _norm_one(spark, "Café  Über—naïve!") == "cafe uber naive"
    assert _norm_one(spark, "  Hello,\tWORLD!!  ") == "hello world"
    assert _norm_one(spark, "règle št ø đ ı") == "regle st o d i"
    assert _norm_one(spark, "keep 123 digits") == "keep 123 digits"
    assert _norm_one(spark, "") == ""
    assert _norm_one(spark, "!!!") == ""


def test_normalized_text_idempotent(spark):
    df = spark.createDataFrame(
        [("Mixed—CASE, with Açcents!",), ("plain text",)], "t string"
    )
    once = df.select(normalized_text(F.col("t")).alias("n"))
    twice = once.select(normalized_text(F.col("n")).alias("n"))
    assert [r["n"] for r in once.collect()] == [r["n"] for r in twice.collect()]


def test_normalized_variants_collide_for_dedup(spark):
    """The point of the canonicalizer: trivially-reformatted copies get
    the SAME fingerprint after normalization, different before."""
    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog."),
            (2, "the QUICK  brown fox — jumps over the lazy dog!!"),
            (3, "thé quick brown fox jumps over the lazy dôg"),
            (4, "an entirely different document"),
        ],
        "id int, t string",
    )
    fps = (
        df.select(
            "id", fingerprint(normalized_text(F.col("t"))).alias("fp")
        )
        .collect()
    )
    by_id = {r["id"]: r["fp"] for r in fps}
    assert by_id[1] == by_id[2] == by_id[3] != by_id[4]
    raw = {
        r["id"]: r["fp"]
        for r in df.select("id", fingerprint(F.col("t")).alias("fp")).collect()
    }
    assert len({raw[1], raw[2], raw[3]}) == 3
