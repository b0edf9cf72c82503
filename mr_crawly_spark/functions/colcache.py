"""Session-scoped cache of static Column expression trees.

Every pyspark Column operation is a py4j round-trip (~0.5 ms measured in
this sandbox). The crawl round loop used to rebuild the SAME unresolved
expression trees every round — ~3.7k round-trips, ~1 s of pure driver
latency per round, which dominates the per-round floor at sandbox scale
(and is pure serial driver time at ANY scale, so it caps round cadence on
a cluster too).

Column objects are immutable, unresolved expression trees bound only to
the JVM gateway — safely reusable across queries and actions within one
SparkSession. This cache builds each static tree once per session. Entries
are keyed by the live SparkSession OBJECT in a WeakKeyDictionary: when a
session is stopped and garbage-collected its entries die with it, so a
restarted JVM can never be served stale gateway handles.
"""

from __future__ import annotations

from typing import Any, Callable
from weakref import WeakKeyDictionary

_BY_SESSION: WeakKeyDictionary = WeakKeyDictionary()


def session_cached(session, key: str, build: Callable[[], Any]) -> Any:
    """Return the cached value for ``key`` under this SparkSession, building
    it with ``build()`` on first use. ``build`` must return only immutable
    plan fragments (Column / list of Column / WindowSpec) — never a
    DataFrame (DataFrames capture a specific source plan)."""
    d = _BY_SESSION.get(session)
    if d is None:
        d = {}
        _BY_SESSION[session] = d
    if key not in d:
        d[key] = build()
    return d[key]
