"""SPARQL property paths: bounded transitive reachability (``pred+``).

``match_bgp`` (graph/bgp.py) covers sequence paths (``p1/p2`` is a
2-pattern chain) and a predicate alternation is just an IN-filter, but
the recursive forms ``pred+`` / ``pred{1,k}`` need iteration, and the
two existing recursive operators cover the wrong ends of the spectrum:
``graph.cc`` computes the UNLABELED unbounded closure (components), and
``analytics.two_hop_reach`` is pinned at exactly two hops. This module
adds the serving-side middle: shortest-distance reachability from an
anchor entity along one predicate (or an alternation set), bounded by
``max_hops``.

Spark-first shape — a driver-controlled BFS (the pagerank/kcore loop
pattern, one distributed join per hop, never a collect of node data):

* the edge relation is filtered to the predicate set ONCE, projected to
  distinct (src, dst) pairs, repartitioned on the join key, and
  localCheckpointed — every hop joins against this one cached table, so
  the per-round shuffle moves only the (small) frontier;
* per hop: ``frontier ⋈ edges`` advances, an anti-join against the seen
  set keeps the first (= shortest) distance and guarantees termination
  on cycles; the frontier is localCheckpointed each round to truncate
  the growing lineage (same discipline as analytics.label_propagation);
* the loop stops early when the frontier empties (``isEmpty`` on the
  new frontier — a driver-side boolean per hop, not data).

Scale notes (100 TB): an ANCHORED ``pred+`` explores one entity's
forward cone — frontier size is bounded by the cone, not the graph, and
each hop is one keyed equi-join Spark executes as a shuffle join (or
broadcast once the frontier is small). The UNANCHORED pairwise closure
``?x pred+ ?y`` is Θ(n²) output in the worst case and is deliberately
NOT offered here; components (graph.cc) or a bounded wedge/BGP query
are the right tools, mirroring match_bgp's unanchored-scan refusal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reachable_from(
    edges: DataFrame,
    source: str,
    preds: str | list[str] | None = None,
    *,
    max_hops: int = 8,
    min_hops: int = 1,
) -> DataFrame:
    """Entities reachable from ``source`` along directed edges whose
    predicate is in ``preds`` (a single predicate, a list = SPARQL
    alternation ``(p1|p2)+``, or None = any predicate), within
    ``min_hops..max_hops`` hops. A ``^`` prefix inverts a predicate
    (SPARQL inverse path): ``"^acquired"`` follows acquired edges
    BACKWARD, and mixing ``["owns", "^owns"]`` walks the undirected
    closure of owns. Returns (node, hops) where ``hops`` is the
    SHORTEST distance — each node appears exactly once, the source
    itself only if a cycle returns to it (SPARQL ``pred+`` semantics;
    use ``min_hops=0`` for ``pred*``, which adds the source at hop 0).
    NOTE: ``min_hops > 1`` filters on the SHORTEST distance — a node
    first reached at hop 1 is excluded even if a separate longer path of
    in-window length also reaches it (i.e. this is "shortest distance in
    [min_hops, max_hops]", not conventional ``pred{m,k}`` path-existence
    semantics; round-5 ADVICE, documented deliberately).

    >>> reachable_from(edges, "E000001", "acquired", max_hops=3)
    DataFrame[node: string, hops: int]
    >>> reachable_from(edges, "E000001", "^acquired", max_hops=3)
    DataFrame[node: string, hops: int]   # who transitively acquired it
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    if not 0 <= min_hops <= max_hops:
        raise ValueError(
            f"min_hops must be in [0, max_hops], got {min_hops}"
        )
    if preds is not None:
        plist = [preds] if isinstance(preds, str) else list(preds)
        if not plist:
            raise ValueError(
                "empty preds list — pass None for any-predicate"
            )
        # "^" is the inverse operator (SPARQL syntax); a predicate whose
        # NAME literally starts with "^" (predicates are free text from
        # the extractor) is queryable forward via a single leading
        # backslash escape: "\\^follows" matches the literal "^follows".
        forward = [
            p[1:] if p.startswith("\\") else p
            for p in plist
            if not p.startswith("^")
        ]
        inverse = [p[1:] for p in plist if p.startswith("^")]
        parts = []
        if forward:
            parts.append(
                edges.where(F.col("pred").isin(forward)).select(
                    "subj_id", "obj_id"
                )
            )
        if inverse:
            parts.append(
                edges.where(F.col("pred").isin(inverse)).select(
                    F.col("obj_id").alias("subj_id"),
                    F.col("subj_id").alias("obj_id"),
                )
            )
        rel = parts[0]
        for p in parts[1:]:
            rel = rel.unionByName(p)
    else:
        rel = edges.select("subj_id", "obj_id")
    # one distinct pair table for every hop: filtered once, keyed on the
    # join column, lineage cut so hop N's plan does not replay the scan.
    # Self-loops stay — SPARQL pred+ reaches a self-looping node from
    # itself in one hop; the seen-set anti-join keeps them terminating.
    # repartition-then-dropDuplicates builds it in ONE exchange: hash
    # partitioning on subj_id already clusters every (subj_id, obj_id)
    # duplicate, so the dedup aggregate runs in place (round-6; the
    # distinct-then-repartition order paid a second full shuffle).
    rel = rel.repartition("subj_id").dropDuplicates().localCheckpoint()
    frontier = (
        rel.where(F.col("subj_id") == F.lit(source))
        .select(F.col("obj_id").alias("node"), F.lit(1).alias("hops"))
        .localCheckpoint()
    )
    seen = frontier
    for hop in range(2, max_hops + 1):
        if frontier.isEmpty():
            break
        # dropDuplicates(["node"]) instead of distinct(): hops is constant
        # within a round, so per-node dedup is equivalent — but it dedups
        # map-side BEFORE the exchange (partial agg over the hub fan-out)
        # and its (node)-hash output partitioning is exactly what the
        # seen-set anti-join needs, so the round runs ONE exchange of hop
        # output instead of two (round-6; distinct() keyed (node, hops)
        # and forced the anti-join to re-shuffle).
        frontier = (
            frontier.join(rel, frontier["node"] == rel["subj_id"])
            .select(F.col("obj_id").alias("node"), F.lit(hop).alias("hops"))
            .dropDuplicates(["node"])
            .join(seen.select("node"), "node", "left_anti")
            .localCheckpoint()
        )
        seen = seen.unionByName(frontier)
    if min_hops == 0:
        zero = seen.sparkSession.createDataFrame(
            [(source, 0)], "node string, hops int"
        )
        # pred* : the source at distance 0 wins over any cycle distance
        seen = zero.unionByName(seen.where(F.col("node") != F.lit(source)))
    elif min_hops > 1:
        seen = seen.where(F.col("hops") >= F.lit(min_hops))
    return seen
