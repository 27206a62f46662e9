#!/usr/bin/env python
"""Round-6 optimization harness: per-phase isolation of bench.py.

bench.py is FROZEN for driver measurement; this file reproduces its
phases one by one (same session config, same fixture, same actions) so a
single phase can be timed in isolation (guide §1.4) and repeated without
paying the whole bench. Usage:

    python bench_extra.py [phase ...] [--repeat N] [--docs N]

With no phase arguments, every phase runs once in bench.py order and the
output matches bench.py's per-query timing keys.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "revenue_topk",
    "word_frequency",
    "dedup_exact",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_buckets",
    "ann_cosine_topk",
    "embedding_near_dup",
    "sessionize",
    "tumbling_window_counts",
    "text_quality",
    "repetition_bigrams",
    "multimodal_meta",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("phases", nargs="*", help="phase names (default: all)")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument(
        "--docs", type=int, default=int(os.environ.get("KGFORGE_BENCH_DOCS", "30000"))
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from __spark_entry__ import queries
    from kgforge.fixtures.gen import write_fixture_tables
    from kgforge.queries import BENCH_QUERIES
    from kgforge.session import get_spark, warm_python_workers
    from kgforge.stages.canonicalize import edges_with_day, rewrite_triples
    from kgforge.stages.docstream import extract_docstream, scan_mentions_docstream
    from kgforge.stages.link import alias_resolution
    from kgforge.stages.normalize import normalize

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_cores = int(cpus) if cpus.isdigit() else 32
    spark = get_spark(
        "kgforge-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(16, n_cores * 2),
        arrow_batch=2048,
    )
    sc = spark.sparkContext
    qs = {**BENCH_QUERIES, **queries()}
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).groupBy(
        "l_returnflag"
    ).count().collect()

    # ---- lazily-built shared state (mirrors bench.py) ------------------
    state: dict[str, object] = {}

    def kg_setup():
        if "edges_tbl" in state:
            return
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))
        fx = tempfile.mkdtemp(prefix="kgforge_benchx_")
        webdocs_path, alias_path = write_fixture_tables(
            spark, fx, args.docs, partitions=max(64, n_cores * 4)
        )
        state["webdocs"] = spark.read.parquet(webdocs_path)
        state["alias_df"] = spark.read.parquet(alias_path)
        warm_python_workers(spark, n_cores)
        state["fx"] = fx

    def mention_map():
        if "mention_map" not in state:
            kg_setup()
            amap = alias_resolution(state["alias_df"]).localCheckpoint()
            state["alias_map"] = amap
            state["mention_map"] = amap.select(
                F.col("alias").alias("mention"), "canon_id"
            )
        return state["mention_map"]

    def edges_tbl():
        if "edges_read" not in state:
            kg_setup()
            path = os.path.join(state["fx"], "edges_by_day")
            from kgforge.graph.temporal import materialize_edges_by_day

            materialize_edges_by_day(
                edges_with_day(
                    rewrite_triples(extract_docstream(state["webdocs"]), mention_map())
                ),
                path,
            )
            state["edges_path"] = path
            state["edges_read"] = spark.read.parquet(path)
        return state["edges_read"]

    # ---- phase registry ------------------------------------------------
    phases: dict[str, object] = {}
    for name in HEADLINE:
        phases[name] = (lambda n=name: qs[n](spark, sf_dir).count())

    def ph(name):
        def deco(fn):
            phases[name] = fn
            return fn

        return deco

    @ph("ngram_jaccard_unbounded")
    def _ngram_unbounded():
        from kgforge.queries import ngram_jaccard_verified_pairs

        docs_full = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = ngram_jaccard_verified_pairs(docs_full).localCheckpoint()
        state["pairs"] = pairs
        return pairs.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.coalesce(F.avg("jaccard"), F.lit(0.0)), 6).alias("avg_jaccard"),
        ).collect()[0]

    @ph("minhash_lsh_unbounded")
    def _minhash_unbounded():
        from kgforge.queries import minhash_lsh_candidates_agg

        docs_full = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_lsh_candidates_agg(docs_full).collect()[0]

    @ph("near_dup_clusters_unbounded")
    def _clusters_unbounded():
        from kgforge.queries import (
            near_dup_clusters_from_pairs,
            ngram_jaccard_verified_pairs,
        )

        if "pairs" not in state:
            docs_full = spark.read.parquet(f"{sf_dir}/documents.parquet")
            state["pairs"] = ngram_jaccard_verified_pairs(docs_full).localCheckpoint()
        return (
            near_dup_clusters_from_pairs(state["pairs"])
            .agg(
                F.count(F.lit(1)).alias("n_clusters"),
                F.coalesce(F.sum("n_removed"), F.lit(0)).alias("n_removed"),
            )
            .collect()[0]
        )

    @ph("kg_refdata")
    def _kg_refdata():
        kg_setup()
        amap = alias_resolution(state["alias_df"]).localCheckpoint()
        state["alias_map"] = amap
        state["mention_map"] = amap.select(F.col("alias").alias("mention"), "canon_id")
        return amap.count()

    @ph("kg_normalize")
    def _kg_normalize():
        kg_setup()
        normalize(state["webdocs"]).write.format("noop").mode("overwrite").save()

    @ph("kg_docstream")
    def _kg_docstream():
        kg_setup()
        return rewrite_triples(
            extract_docstream(state["webdocs"]), mention_map()
        ).count()

    @ph("kg_mention_scan")
    def _kg_mention_scan():
        kg_setup()
        from kgforge.linking.guard import collect_bounded

        aliases = collect_bounded(
            state["alias_df"], "alias", what="gazetteer alias dictionary"
        )
        return scan_mentions_docstream(state["webdocs"], aliases).count()

    @ph("kg_edges_materialize")
    def _kg_edges_materialize():
        kg_setup()
        import shutil

        from kgforge.graph.temporal import materialize_edges_by_day

        path = os.path.join(state["fx"], "edges_by_day")
        if "edges_read" in state:
            # re-materialize fresh on repeat runs
            shutil.rmtree(path, ignore_errors=True)
            del state["edges_read"]
        materialize_edges_by_day(
            edges_with_day(
                rewrite_triples(extract_docstream(state["webdocs"]), mention_map())
            ),
            path,
        )
        state["edges_path"] = path
        state["edges_read"] = spark.read.parquet(path)

    @ph("kg_window_subgraph")
    def _kg_window_subgraph():
        from kgforge.graph.temporal import window_subgraph_topk

        edges_tbl()
        return window_subgraph_topk(spark, state["edges_path"], k=1000).count()

    @ph("kg_entity_profile")
    def _kg_entity_profile():
        from kgforge.graph.analytics import entity_profile

        return entity_profile(edges_tbl()).count()

    @ph("kg_triangles")
    def _kg_triangles():
        from kgforge.graph.analytics import triangle_counts

        return triangle_counts(edges_tbl()).count()

    @ph("kg_two_hop_sketch")
    def _kg_two_hop_sketch():
        from kgforge.graph.analytics import two_hop_reach_approx

        return two_hop_reach_approx(edges_tbl()).count()

    @ph("kg_profile_sketch")
    def _kg_profile_sketch():
        from kgforge.graph.analytics import (
            daily_active_nodes_approx,
            entity_profile_table_approx,
        )

        entity_profile_table_approx(edges_tbl()).count()
        daily_active_nodes_approx(edges_tbl()).count()

    @ph("kg_communities")
    def _kg_communities():
        from kgforge.graph.analytics import label_propagation

        return label_propagation(edges_tbl()).count()

    @ph("kg_pred_canon")
    def _kg_pred_canon():
        from kgforge.extract.predicates import canonicalize_predicates

        return (
            canonicalize_predicates(edges_tbl()).select("canon_pred").distinct().count()
        )

    @ph("kg_bgp_chain")
    def _kg_bgp_chain():
        from kgforge.graph.bgp import match_bgp

        return match_bgp(
            edges_tbl(), [("?x", "acquired", "?y"), ("?y", "works at", "?z")]
        ).count()

    @ph("kg_bgp_anchored")
    def _kg_bgp_anchored():
        from kgforge.graph.bgp import match_bgp

        return match_bgp(
            edges_tbl(), [("?x", "acquired", "?y"), ("?y", "located in", "E000001")]
        ).count()

    CYCLE = [
        ("?a", "works at", "?b"),
        ("?b", "acquired", "?c"),
        ("?c", "works at", "?a"),
    ]

    @ph("kg_bgp_cycle_binary")
    def _kg_bgp_cycle_binary():
        from kgforge.graph.bgp import match_bgp

        return match_bgp(edges_tbl(), CYCLE).count()

    @ph("kg_bgp_cycle_wcoj")
    def _kg_bgp_cycle_wcoj():
        from kgforge.graph.wcoj import match_bgp_cycle

        return match_bgp_cycle(edges_tbl(), CYCLE).count()

    @ph("kg_path_reach")
    def _kg_path_reach():
        from kgforge.graph.paths import reachable_from

        return reachable_from(edges_tbl(), "E000001", None, max_hops=4).count()

    # ---- run -----------------------------------------------------------
    names = args.phases or list(phases)
    bad = [n for n in names if n not in phases]
    if bad:
        print(f"unknown phases: {bad}", file=sys.stderr)
        return 2
    timings: dict[str, list[float]] = {}
    for rep in range(args.repeat):
        for name in names:
            sc.setJobDescription(f"{name} (rep {rep})")
            t0 = time.perf_counter()
            phases[name]()
            dt = round(time.perf_counter() - t0, 3)
            timings.setdefault(name, []).append(dt)
            sc.setJobDescription(None)
            print(f"[rep {rep}] {name}: {dt}", file=sys.stderr)
    print(
        json.dumps(
            {
                "sf": sf_dir,
                "cpus": cpus,
                "docs": args.docs,
                "timings": timings,
                "min": {k: min(v) for k, v in timings.items()},
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
