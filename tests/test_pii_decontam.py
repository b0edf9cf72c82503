"""PII redaction, benchmark decontamination, exact-substring duplication,
and URL quality gates (round 5 training-data-pipeline additions).

The oracle equivalence runs in test_entry.py like every other entry; these
tests pin the CONTRACTS the hash check alone can't see: planted positives
are actually detected (non-vacuity), redaction removes every match
(idempotence + completeness), and the URL features produce the hand-derived
values on known URLs.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from mr_crawly_spark.functions import pii as PII
from mr_crawly_spark.functions import urls as U
from mr_crawly_spark.operators.decontam import (
    duplicated_ngram_fraction,
    ngram_contamination,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_small(spark):
    from mr_crawly_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") < 100
    )


# --------------------------------------------------------------------- PII
def test_pii_planted_rows_detected(spark):
    df = entry_mod.queries()["pii_redact"](spark, SF_DIR)
    planted = df.filter(F.col("doc_id") % 7 == 0)
    n_planted = planted.count()
    assert n_planted > 0
    # every planted row detects at least one of each PII class
    weak = planted.filter(
        (F.col("n_emails") < 1) | (F.col("n_phones") < 1) | (F.col("n_ips") < 1)
    ).count()
    assert weak == 0


def test_pii_redaction_complete_and_idempotent(spark):
    df = entry_mod.queries()["pii_redact"](spark, SF_DIR)
    rows = df.select("redacted").collect()
    pats = [re.compile(p) for p in (PII.EMAIL_RE, PII.PHONE_RE, PII.IPV4_RE)]
    for r in rows:
        for p in pats:
            assert not p.search(r.redacted), (p.pattern, r.redacted[:120])
    # placeholders survive a second redaction pass untouched
    once = df.select(F.col("redacted").alias("text"))
    twice = once.select(PII.redact_pii(F.col("text")).alias("r2"), "text")
    assert twice.filter(F.col("r2") != F.col("text")).count() == 0


def test_pii_counts_on_known_text(spark):
    df = spark.createDataFrame(
        [
            Row(t="mail a@b.com and c.d+x@e.org, call 555-123-4567"),
            Row(t="server at 10.1.2.3 and 192.168.0.255 ok"),
            Row(t="clean text with no identifiers at all"),
        ]
    )
    got = df.select(
        PII.email_count(F.col("t")).alias("e"),
        PII.phone_count(F.col("t")).alias("p"),
        PII.ipv4_count(F.col("t")).alias("i"),
    ).collect()
    assert [(r.e, r.p, r.i) for r in got] == [(2, 1, 0), (0, 0, 2), (0, 0, 0)]


# ----------------------------------------------------------- decontamination
def test_decontaminate_planted_leaks_are_full_overlap(spark):
    df = entry_mod.queries()["decontaminate"](spark, SF_DIR)
    leaked = df.filter(F.col("doc_id") >= 10**9)
    assert leaked.count() > 0
    assert leaked.filter(F.col("contam_frac") < 1.0).count() == 0
    # fractions are well-formed everywhere
    assert df.filter(
        (F.col("contam_frac") < 0) | (F.col("contam_frac") > 1)
    ).count() == 0
    assert df.filter(F.col("n_contaminated") > F.col("n_ngrams")).count() == 0


def test_decontaminate_benchmark_docs_excluded_from_output(spark, docs_small):
    bench = docs_small.filter(F.col("doc_id") % 5 == 0)
    corpus = docs_small.filter(F.col("doc_id") % 5 != 0)
    out = ngram_contamination(corpus, bench, n=3)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert all(i % 5 != 0 for i in ids)


def test_decontaminate_broadcast_off_matches_on(spark, docs_small):
    bench = docs_small.filter(F.col("doc_id") % 5 == 0)
    corpus = docs_small.filter(F.col("doc_id") % 5 != 0)
    on = ngram_contamination(corpus, bench, n=3, broadcast_bench=True)
    off = ngram_contamination(corpus, bench, n=3, broadcast_bench=False)
    assert sorted(map(tuple, on.collect())) == sorted(map(tuple, off.collect()))


# ------------------------------------------------------ duplicated n-grams
def test_dup_ngrams_planted_copies_fully_duplicated(spark):
    df = entry_mod.queries()["dup_ngrams"](spark, SF_DIR)
    planted = df.filter(F.col("doc_id") >= 10**9)
    assert planted.count() > 0
    assert planted.filter(F.col("dup_frac") < 1.0).count() == 0
    # the originals of the planted copies are fully duplicated too
    orig = df.filter((F.col("doc_id") < 10**9) & (F.col("doc_id") % 10 == 0))
    assert orig.filter(F.col("dup_frac") < 1.0).count() == 0


def test_dup_ngrams_unique_corpus_is_all_zero(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon"),
            Row(doc_id=2, text="one two three four five six"),
        ]
    )
    out = duplicated_ngram_fraction(docs, n=3).collect()
    assert {r.doc_id: (r.n_dup, r.dup_frac) for r in out} == {
        1: (0, 0.0),
        2: (0, 0.0),
    }


# ---------------------------------------------------------------- URL gate
def test_url_features_on_known_urls(spark):
    df = spark.createDataFrame(
        [
            Row(u="https://a.test/p1"),
            Row(u="https://a.test/d/d/d/d/d/d/d/x?a=1&b=2&c=3&d=4"),
            Row(u="https://spam.test/win-casino-now"),
        ]
    )
    got = df.select(
        U.url_depth_col(F.col("u")).alias("depth"),
        U.url_param_count_col(F.col("u")).alias("np"),
        U.url_spam_flag_col(F.col("u")).alias("spam"),
        U.url_quality_col(F.col("u")).alias("q"),
    ).collect()
    assert (got[0].depth, got[0].np, got[0].spam) == (1, 0, False)
    assert (got[1].depth, got[1].np) == (8, 4)
    assert got[1].q == pytest.approx(0.7 * 0.7, abs=1e-4)  # deep + many params
    assert got[2].spam is True and got[2].q == pytest.approx(0.1, abs=1e-4)


def test_url_quality_entry_blocklist_join(spark):
    df = entry_mod.queries()["url_quality"](spark, SF_DIR)
    bad = df.filter(
        F.col("blocked") != ((F.col("doc_id") % 50) % 11 == 0)
    ).count()
    assert bad == 0
    spam = df.filter(F.col("doc_id") % 13 == 0)
    assert spam.count() > 0
    assert spam.filter(~F.col("spam")).count() == 0
