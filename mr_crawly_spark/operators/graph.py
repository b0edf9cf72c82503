"""Link-graph triangle counting + local clustering coefficient.

Crawl-quality signal: link farms and mutual-admiration spam rings are
triangle-dense, organic link graphs are locally sparse — the clustering
coefficient is a standard per-host spam feature (beyond-ref surface; the
reference stores links, `mr_crawly/cache.py` links table, but computes no
graph statistics).

Scale notes (100 TB / 10^10-edge graphs):
- The naive wedge join explodes on hubs: a degree-d node contributes
  O(d^2) wedges, and web graphs have d ~ 10^7 hubs. The fix is the
  standard DEGREE ORDERING (Chiba-Nishizeki / Schank-Wagner, also the
  MapReduce formulation in Suri-Vassilvitskii WWW'11): orient every
  undirected edge from its (degree, id)-smaller endpoint to the larger;
  out-degree in the oriented graph is O(sqrt(E)) for every node, so
  per-node wedge fan-out is bounded by E, not d_max^2, and each triangle
  is generated exactly once (from its order-minimal vertex).
- Three shuffles total: degree agg, wedge self-join on the pivot node,
  triangle-closing equi-join on the wedge's far pair. All equi-joins —
  no cross/theta join anywhere.
- Counts are exact longs (no doubles in the aggregation); the clustering
  coefficient is derived per row at the end (4dp round, the repo's
  cross-engine double convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected simple graph: drop self-loops, canonicalize each edge to
    (u, v) = (least, greatest), dedup (parallel edges and both directions
    collapse to one row)."""
    return (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .distinct()
    )


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node exact triangle counts + local clustering coefficient over
    the undirected simple graph induced by ``edges``.

    Returns (node, degree, n_tri, clustering) for EVERY node with at
    least one edge: ``n_tri`` = number of triangles containing the node,
    ``clustering`` = 2*n_tri / (degree*(degree-1)) (0.0 when degree < 2),
    rounded to 4dp.

    Each triangle is found exactly once, from its (degree, id)-minimal
    vertex; the per-node attribution then explodes the three corners.
    """
    # consumed by three branches each (degree union + orientation join;
    # du/dv/final attribution join; a/b/closing) — without the lazy
    # checkpoints Catalyst re-executes the whole upstream subtree once per
    # branch (the measured plan carried the canonicalize-distinct and the
    # degree agg three times each: 271 operators, 6 parquet scans)
    e0 = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .localCheckpoint(eager=False)
    )
    # orient u->v by the (degree, id) total order: out-degree is O(sqrt(E))
    # for every node (a hub only keeps edges to higher-degree nodes)
    du = deg.select(
        F.col("node").alias("u"), F.col("degree").alias("_du")
    )
    dv = deg.select(
        F.col("node").alias("v"), F.col("degree").alias("_dv")
    )
    keyed = (
        e0.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.struct(F.col("_du").alias("d"), F.col("u").alias("n")).alias(
                "_ku"
            ),
            F.struct(F.col("_dv").alias("d"), F.col("v").alias("n")).alias(
                "_kv"
            ),
        )
    )
    oriented = keyed.select(
        F.when(F.col("_ku") < F.col("_kv"), F.col("u"))
        .otherwise(F.col("v"))
        .alias("lo"),
        F.when(F.col("_ku") < F.col("_kv"), F.col("v"))
        .otherwise(F.col("u"))
        .alias("hi"),
        F.when(F.col("_ku") < F.col("_kv"), F.col("_kv"))
        .otherwise(F.col("_ku"))
        .alias("_khi"),
    ).localCheckpoint(eager=False)
    # wedges from the pivot (order-minimal) vertex: two out-edges, far
    # endpoints ordered by the same total order so (y, z) is generated once
    a = oriented.select(
        F.col("lo").alias("x"), F.col("hi").alias("y"), F.col("_khi").alias("_ky")
    )
    b = oriented.select(
        F.col("lo").alias("x"), F.col("hi").alias("z"), F.col("_khi").alias("_kz")
    )
    wedges = a.join(b, "x").filter(F.col("_ky") < F.col("_kz")).select(
        "x", "y", "z"
    )
    closing = oriented.select(
        F.col("lo").alias("y"), F.col("hi").alias("z")
    )
    tris = wedges.join(closing, ["y", "z"]).select("x", "y", "z")
    per_node = (
        tris.select(
            F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )
    out = deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("n_tri"),
    )
    clustering = F.when(
        F.col("degree") < 2, F.lit(0.0)
    ).otherwise(
        F.round(
            2.0 * F.col("n_tri") / (F.col("degree") * (F.col("degree") - 1)),
            4,
        )
    )
    return out.withColumn("clustering", clustering)


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> int:
    """Total number of distinct triangles in the graph (each counted
    once). Driver-side int — the per-node frame is triangle_stats."""
    row = (
        triangle_stats(edges, src, dst)
        .agg((F.sum("n_tri") / 3).cast("bigint").alias("t"))
        .first()
    )
    return int(row["t"] or 0)
