"""Connected components via alternating large-star / small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
— the O(log n)-round, shuffle-bounded algorithm (SURVEY.md §2.11
"Canonicalization").

Node ids are strings; the total order is lexicographic ``min`` — any
deterministic total order yields canonical component representatives.
Each iteration is two hash-shuffles (groupBy node); ``localCheckpoint``
truncates lineage so plans don't grow with iterations; AQE handles
post-shuffle coalescing and skew splitting. Convergence = edge multiset
stable (count + order-insensitive checksum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: m = min(N(u) ∪ {u}); connect every strictly larger
    neighbor to m."""
    # both orientations via one in-row explode, not a union of two
    # selects — one pass over the (checkpointed) edge set per round
    # (round-6, the triangle_counts lesson)
    sym = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .distinct()
    )
    m = sym.groupBy("src").agg(F.min("dst").alias("minn"))
    m = m.select("src", F.least("minn", F.col("src")).alias("m"))
    return (
        sym.where(F.col("dst") > F.col("src"))
        .join(m, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges large→small; for each node u: m = min of its smaller
    neighborhood ∪ {u}; connect those neighbors and u itself to m."""
    oriented = (
        e.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    m = oriented.groupBy("src").agg(F.min("dst").alias("minn"))
    m = m.select("src", F.least("minn", F.col("src")).alias("m"))
    joined = oriented.join(m, "src")
    out = joined.select(F.col("dst").alias("src"), F.col("m").alias("dst")).union(
        m.select(F.col("src"), F.col("m").alias("dst"))
    )
    return out.where(F.col("src") != F.col("dst")).distinct()


def _signature(
    e: DataFrame, col_a: str = "src", col_b: str = "dst"
) -> tuple[int, int]:
    """Order-insensitive hashed checksum of a two-column DataFrame (count +
    sum of xxhash64 over both columns). Shared by the cc fixpoint and the
    LPA convergence exit (graph.analytics). PROBABILISTIC: distinct states
    can collide (order-insensitive sums admit swap collisions), the same
    accepted risk as any checksum-based fixpoint detection.

    decimal(38,0) sum: overflow-proof under ANSI mode (Spark 4 default)."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(F.col(col_a), F.col(col_b)).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _driver_union_find(e: DataFrame) -> DataFrame:
    """Small-graph fast path: collect the edge list and run union-find on
    the driver. Entity-dedup sameAs graphs are bounded by the alias
    dictionary — orders of magnitude smaller than the document stream — so
    below the threshold this replaces ~2·log(n) serial Spark jobs with one
    collect, removing constant latency that would otherwise cap scaling
    efficiency. The distributed star algorithm remains the path for graphs
    that don't fit on the driver."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for row in e.collect():
        ra, rb = find(row["src"]), find(row["dst"])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = [(n, find(n)) for n in list(parent)]
    return e.sparkSession.createDataFrame(rows, "node string, component string")


def connected_components(
    edges: DataFrame, max_iter: int = 25, driver_threshold: int = 200_000
) -> DataFrame:
    """edges(src, dst) → labels(node, component) where component is the
    lexicographic min node id of each connected component. Isolated nodes
    (absent from edges) are the caller's concern — a node not returned maps
    to itself. Graphs with ≤ ``driver_threshold`` edges use the driver
    union-find fast path; larger graphs run alternating star rounds."""
    e = (
        edges.select("src", "dst")
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = e.count()
    if n_edges == 0:
        spark = edges.sparkSession
        return spark.createDataFrame([], "node string, component string")
    if n_edges <= driver_threshold:
        return _driver_union_find(e)
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        sig = _signature(e)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # labels from a non-converged star graph can split components with
        # no error signal — fail loudly instead (round-1 advisor finding)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "alternating star rounds; raise max_iter (expected O(log n))"
        )
    # converged star graph: every edge points node → component root
    members = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
    return members.union(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )
