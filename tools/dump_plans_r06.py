#!/usr/bin/env python
"""Round-6 plan capture: write `.explain("formatted")` output for each
optimized query to plans/r06/<name>_<suffix>.txt (suffix = before/after).

Uses a small fixture (sf0.001 tables + a 2,000-doc KG edge table) so the
capture runs in seconds; plan SHAPE (exchanges, join strategies, pushed
filters, Python eval nodes) is what the files witness, not timings.

    python tools/dump_plans_r06.py before [name ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    from pyspark.sql import functions as F

    from kgforge.fixtures.gen import write_fixture_tables
    from kgforge.session import get_spark
    from kgforge.stages.canonicalize import edges_with_day, rewrite_triples
    from kgforge.stages.docstream import extract_docstream
    from kgforge.stages.link import alias_resolution

    spark = get_spark("plans-r06", master="local[8]", shuffle_partitions=16)
    sf = "/root/testdata/sf0.001"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
    )
    os.makedirs(out_dir, exist_ok=True)

    fx = tempfile.mkdtemp(prefix="kgforge_plans_r06_")
    webdocs_path, alias_path = write_fixture_tables(spark, fx, 2000, partitions=16)
    webdocs = spark.read.parquet(webdocs_path)
    alias_df = spark.read.parquet(alias_path)
    mention_map = alias_resolution(alias_df).select(
        F.col("alias").alias("mention"), "canon_id"
    )
    edges_path = os.path.join(fx, "edges_by_day")
    from kgforge.graph.temporal import materialize_edges_by_day

    materialize_edges_by_day(
        edges_with_day(rewrite_triples(extract_docstream(webdocs), mention_map)),
        edges_path,
    )
    edges_tbl = spark.read.parquet(edges_path)

    builders = {}

    def b(name):
        def deco(fn):
            builders[name] = fn
            return fn

        return deco

    @b("kg_two_hop_sketch")
    def _two_hop():
        from kgforge.graph.analytics import two_hop_reach_approx

        return two_hop_reach_approx(edges_tbl)

    @b("kg_triangles")
    def _triangles():
        from kgforge.graph.analytics import triangle_counts

        return triangle_counts(edges_tbl)

    @b("kg_communities")
    def _lpa():
        from kgforge.graph.analytics import label_propagation

        return label_propagation(edges_tbl)

    @b("kg_entity_profile")
    def _profile():
        from kgforge.graph.analytics import entity_profile

        return entity_profile(edges_tbl)

    @b("kg_path_reach")
    def _reach():
        from kgforge.graph.paths import reachable_from

        return reachable_from(edges_tbl, "E000001", None, max_hops=4)

    @b("kg_bgp_chain")
    def _chain():
        from kgforge.graph.bgp import match_bgp

        return match_bgp(
            edges_tbl, [("?x", "acquired", "?y"), ("?y", "works at", "?z")]
        )

    @b("kg_bgp_cycle_wcoj")
    def _wcoj():
        from kgforge.graph.wcoj import match_bgp_cycle

        return match_bgp_cycle(
            edges_tbl,
            [
                ("?a", "works at", "?b"),
                ("?b", "acquired", "?c"),
                ("?c", "works at", "?a"),
            ],
        )

    @b("ngram_jaccard_pairs")
    def _ngram():
        from kgforge.queries import ngram_jaccard_verified_pairs

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        return ngram_jaccard_verified_pairs(docs)

    @b("minhash_lsh_candidates")
    def _minhash():
        from kgforge.queries import minhash_lsh_candidates_agg

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        return minhash_lsh_candidates_agg(docs)

    @b("embedding_near_dup")
    def _near_dup():
        from kgforge.queries import q_embedding_near_dup

        return q_embedding_near_dup(spark, sf)

    @b("lsh_bucketed_ann")
    def _lsh_ann():
        from kgforge.queries import q_lsh_bucketed_ann

        return q_lsh_bucketed_ann(spark, sf)

    @b("ann_cosine_topk")
    def _ann_cos():
        from kgforge.queries import q_ann_cosine_topk

        return q_ann_cosine_topk(spark, sf)

    @b("revenue_topk")
    def _rev():
        from kgforge.queries import q_revenue_topk

        return q_revenue_topk(spark, sf)

    @b("kg_refdata")
    def _refdata():
        return alias_resolution(alias_df)

    @b("simhash_buckets")
    def _simhash():
        from kgforge.queries import q_simhash_buckets

        return q_simhash_buckets(spark, sf)

    @b("kg_window_subgraph")
    def _window():
        from kgforge.graph.temporal import window_subgraph_topk

        return window_subgraph_topk(spark, edges_path, k=1000)

    @b("kg_pred_canon")
    def _pred_canon():
        from kgforge.extract.predicates import canonicalize_predicates

        return canonicalize_predicates(edges_tbl)

    @b("kg_profile_sketch")
    def _profile_sketch():
        from kgforge.graph.analytics import entity_profile_table_approx

        return entity_profile_table_approx(edges_tbl)

    @b("kg_daily_nodes_sketch")
    def _daily_sketch():
        from kgforge.graph.analytics import daily_active_nodes_approx

        return daily_active_nodes_approx(edges_tbl)

    for name, fn in builders.items():
        if only and name not in only:
            continue
        df = fn()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
