from __future__ import annotations

import pytest

from mr_crawly_spark.datagen import generate_corpus
from mr_crawly_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="mr-crawly-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    """The sf-test corpus: ~8 hosts, one hot host, deterministic (seed 42)."""
    return generate_corpus(n_hosts=8, base_pages=40, hot_factor=6)


@pytest.fixture(scope="session")
def small_corpus():
    return generate_corpus(n_hosts=4, base_pages=10, hot_factor=3, n_seeds=3)


@pytest.fixture(scope="session")
def tiny_corpus():
    """Smallest corpus that still exercises every path — for the expensive
    multi-run tests (resume, rollback, partition invariance)."""
    return generate_corpus(n_hosts=3, base_pages=5, hot_factor=2, n_seeds=3)
