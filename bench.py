#!/usr/bin/env python
"""Benchmark harness — one JSON line on stdout.

Two parts:
1. Representative operator queries from the driver contract at
   ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1).
2. The KG document stream (fused normalize → sentences → triples →
   canonical rewrite) over a parquet webdocs fixture generated once into a
   temp dir (generation timed separately so kg numbers measure Spark work,
   not driver-side fixture hashing) — reports docs/sec.

Runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32). Scaling-efficiency
evidence (local[4] vs local[16], north rule N vs 4N) lives in
tools/run_scaling.py → BENCH.md.
"""

from __future__ import annotations

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

KG_BENCH_DOCS = int(os.environ.get("KGFORGE_BENCH_DOCS", "30000"))


def run_bench(sf_dir: str, cpus: str) -> dict:
    from pyspark.sql import functions as F

    from __spark_entry__ import queries
    from kgforge.fixtures.gen import write_fixture_tables
    from kgforge.session import get_spark
    from kgforge.stages.canonicalize import rewrite_triples
    from kgforge.stages.docstream import extract_docstream
    from kgforge.stages.link import alias_resolution
    from kgforge.stages.normalize import normalize

    n_cores = int(cpus) if cpus.isdigit() else 32
    spark = get_spark(
        "kgforge-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(16, n_cores * 2),
        arrow_batch=2048,
    )
    # NOTE: spark.sql.files.maxPartitionBytes stays at the 128MB default
    # here — the round-2 bench set 2MB globally to give the small KG
    # fixture enough input splits, which silently fragmented the TPC-H
    # scans into hundreds of micro-tasks (pricing_summary 8.1s → 0.7s at
    # the default). The small-split config is applied at runtime to the
    # KG phases only, below.
    # contract registry + the per-operator members of the round-5
    # consolidated families (bench times operators individually even
    # though the driver contract records them through family queries)
    from kgforge.queries import BENCH_QUERIES

    qs = {**BENCH_QUERIES, **queries()}
    # JVM/session warmup OUTSIDE the timed loop: the first action pays
    # session init + whole-stage-codegen compilation (~5 s) which the
    # FIRST headline query (pricing_summary) was silently absorbing —
    # measured 6.5 s recorded vs ~0.7 s steady-state. Same discipline as
    # warm_python_workers for the KG phases: steady-state cost is the
    # quantity that scales, startup amortizes to zero on a real cluster.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).groupBy(
        "l_returnflag"
    ).count().collect()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt

    # UNBOUNDED near-dup variants (scale evidence): the contract queries
    # bound doc_id < 500 for oracle cost; these run the same plans over the
    # FULL documents table and report candidate counts, demonstrating the
    # hot-shingle DF cap keeps candidates ~linear in corpus size.
    from kgforge.queries import (
        minhash_lsh_candidates_agg,
        near_dup_clusters_from_pairs,
        ngram_jaccard_verified_pairs,
    )

    docs_full = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs_tbl = docs_full.count()
    # materialize the verified pairs ONCE (localCheckpoint) — the agg view
    # and the cluster stage both read them, exactly as a production dedup
    # would (you don't re-shingle the corpus to cluster its pairs)
    t0 = time.perf_counter()
    pairs = ngram_jaccard_verified_pairs(docs_full).localCheckpoint()
    jac_row = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.coalesce(F.avg("jaccard"), F.lit(0.0)), 6).alias("avg_jaccard"),
    ).collect()[0]
    timings["ngram_jaccard_unbounded"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    mh_row = minhash_lsh_candidates_agg(docs_full).collect()[0]
    timings["minhash_lsh_unbounded"] = round(time.perf_counter() - t0, 3)
    # cluster formation + survivor selection over the verified pairs —
    # the full dedup operation (pairs → CC → survivors) at corpus scale
    t0 = time.perf_counter()
    cl_row = (
        near_dup_clusters_from_pairs(pairs)
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.coalesce(F.sum("n_removed"), F.lit(0)).alias("n_removed"),
        )
        .collect()[0]
    )
    timings["near_dup_clusters_unbounded"] = round(time.perf_counter() - t0, 3)
    total += (
        timings["ngram_jaccard_unbounded"]
        + timings["minhash_lsh_unbounded"]
        + timings["near_dup_clusters_unbounded"]
    )
    unbounded = {
        "documents_rows": n_docs_tbl,
        "jaccard_pairs": jac_row["n_pairs"],
        "minhash_candidate_pairs": mh_row["n_candidate_pairs"],
        "near_dup_clusters": cl_row["n_clusters"],
        "near_dup_removed": int(cl_row["n_removed"]),
    }

    # KG document stream over parquet input. The 30k-doc fixture is only
    # ~15MB of parquet: at the default 128MB split size the whole stream
    # would land in one task, so the Python-bound phases below get 2MB
    # splits (runtime-mutable SQL conf; scoped to these phases).
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))
    fx = tempfile.mkdtemp(prefix="kgforge_bench_")
    t0 = time.perf_counter()
    webdocs_path, alias_path = write_fixture_tables(
        spark, fx, KG_BENCH_DOCS, partitions=max(64, n_cores * 4)
    )
    fixture_gen_sec = round(time.perf_counter() - t0, 3)
    webdocs = spark.read.parquet(webdocs_path)
    alias_df = spark.read.parquet(alias_path)

    # warm every python-worker slot (imports + module init) before timing
    # the Python-bound KG phases — same steady-state methodology as
    # tools/_scaling_worker.py (BENCH.md): at 10^12-doc scale, worker
    # spin-up amortizes to zero, and on a cold page cache the first
    # pandas-UDF phase otherwise pays 32× (numpy+pandas+kgforge imports)
    # of random IO inside its timed window (observed: 2.9 s → 22 s drift
    # on kg_refdata as the shared host's page cache was evicted).
    from kgforge.session import warm_python_workers

    warm_python_workers(spark, n_cores)

    t0 = time.perf_counter()
    alias_map = alias_resolution(alias_df).localCheckpoint()
    timings["kg_refdata"] = round(time.perf_counter() - t0, 3)
    mention_map = alias_map.select(F.col("alias").alias("mention"), "canon_id")

    t0 = time.perf_counter()
    normalize(webdocs).write.format("noop").mode("overwrite").save()
    timings["kg_normalize"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n_edges = rewrite_triples(extract_docstream(webdocs), mention_map).count()
    timings["kg_docstream"] = round(time.perf_counter() - t0, 3)

    # gazetteer mention scan over the same corpus (kg_mentions core path,
    # fused: one python stage like the docstream)
    from kgforge.linking.guard import collect_bounded
    from kgforge.stages.docstream import scan_mentions_docstream

    aliases = collect_bounded(alias_df, "alias", what="gazetteer alias dictionary")
    t0 = time.perf_counter()
    n_mentions = scan_mentions_docstream(webdocs, aliases).count()
    timings["kg_mention_scan"] = round(time.perf_counter() - t0, 3)

    # temporal graph phases: materialize the edge table PARTITIONED BY day
    # (Iceberg days(warc_ts) emulation), then a time-window subgraph query
    # that reads it back with the day predicate as a partition filter —
    # the scan touches ~1/6 of the day directories, not the table
    from kgforge.graph.temporal import (
        WINDOW_HI,
        WINDOW_LO,
        materialize_edges_by_day,
        window_subgraph_topk,
    )
    from kgforge.stages.canonicalize import edges_with_day

    edges_path = os.path.join(fx, "edges_by_day")
    t0 = time.perf_counter()
    materialize_edges_by_day(
        edges_with_day(rewrite_triples(extract_docstream(webdocs), mention_map)),
        edges_path,
    )
    timings["kg_edges_materialize"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    n_window_edges = window_subgraph_topk(spark, edges_path, k=1000).count()
    timings["kg_window_subgraph"] = round(time.perf_counter() - t0, 3)
    n_day_dirs = len([d for d in os.listdir(edges_path) if d.startswith("day=")])
    n_window_dirs = len(
        [
            d
            for d in os.listdir(edges_path)
            if d.startswith("day=") and WINDOW_LO <= d[4:] <= WINDOW_HI
        ]
    )

    # graph-analytics phases over the materialized edge table (round 4):
    # read the day-partitioned parquet back — the serving-side pattern; the
    # graph store is queried, the doc pipeline is not re-run. Degree-ordered
    # triangle counting and the 2-hop wedge join are the skew stress tests
    # (the fixture's hot entity touches ~30% of docs).
    from kgforge.extract.predicates import canonicalize_predicates
    from kgforge.graph.analytics import (
        entity_profile,
        label_propagation,
        triangle_counts,
        two_hop_reach_approx,
    )

    edges_tbl = spark.read.parquet(edges_path)
    t0 = time.perf_counter()
    entity_profile(edges_tbl).count()
    timings["kg_entity_profile"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    triangle_counts(edges_tbl).count()
    timings["kg_triangles"] = round(time.perf_counter() - t0, 3)
    # the SKETCH variant: the exact wedge join is quadratic in hub degree
    # (measured 22.9 s at just 5k docs on this fixture's 30%-hot entity);
    # HLL sketches bound the join to one sketch row per edge
    t0 = time.perf_counter()
    two_hop_reach_approx(edges_tbl).count()
    timings["kg_two_hop_sketch"] = round(time.perf_counter() - t0, 3)
    # HLL rollup twins (round-5, BACKLOG #12): profile distinct-pred
    # estimates + per-day distinct-node estimates — the constant-bytes-
    # per-group serving path beside the exact aggregates
    from kgforge.graph.analytics import (
        daily_active_nodes_approx,
        entity_profile_table_approx,
    )

    t0 = time.perf_counter()
    entity_profile_table_approx(edges_tbl).count()
    daily_active_nodes_approx(edges_tbl).count()
    timings["kg_profile_sketch"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    label_propagation(edges_tbl).count()
    timings["kg_communities"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    n_canon_preds = (
        canonicalize_predicates(edges_tbl)
        .select("canon_pred")
        .distinct()
        .count()
    )
    timings["kg_pred_canon"] = round(time.perf_counter() - t0, 3)

    # BGP serving queries (round-5 second continuation). Two shapes:
    # the UNANCHORED 2-pattern chain is the hub stress test — on this
    # fixture's 30%-hot entity it fans to ~5M bindings, so the phase
    # measures join fan-out + distinct at adversarial selectivity (the
    # BGP sibling of the triangles/2-hop skew phases); the ANCHORED
    # chain is the serving-latency path — the constant reaches the
    # parquet scan as a pushed filter and bounds the output.
    from kgforge.graph.bgp import match_bgp

    t0 = time.perf_counter()
    n_bgp = match_bgp(
        edges_tbl,
        [("?x", "acquired", "?y"), ("?y", "works at", "?z")],
    ).count()
    timings["kg_bgp_chain"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    n_bgp_anchored = match_bgp(
        edges_tbl,
        [("?x", "acquired", "?y"), ("?y", "located in", "E000001")],
    ).count()
    timings["kg_bgp_anchored"] = round(time.perf_counter() - t0, 3)

    # CYCLIC BGP (round-5 WCOJ, BACKLOG #15): the works-at/acquired/
    # works-at triangle routes both legs of the hub wedge through the
    # 30%-hot entity. The binary plan must materialize every open wedge
    # before the closing join can discard non-triangles; the HyperCube +
    # cell-local generic-join path (graph/wcoj.py) bounds communication
    # to O(shares x input) regardless of hub degree. Both are timed on
    # the same pattern so the record carries the comparison.
    from kgforge.graph.wcoj import match_bgp_cycle

    cycle = [
        ("?a", "works at", "?b"),
        ("?b", "acquired", "?c"),
        ("?c", "works at", "?a"),
    ]
    t0 = time.perf_counter()
    n_cycle_binary = match_bgp(edges_tbl, cycle).count()
    timings["kg_bgp_cycle_binary"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    n_cycle_wcoj = match_bgp_cycle(edges_tbl, cycle).count()
    timings["kg_bgp_cycle_wcoj"] = round(time.perf_counter() - t0, 3)

    # property path (SPARQL pred+): 4-hop any-predicate forward cone from
    # the hot entity — driver-paced BFS, one keyed join per hop, seen-set
    # anti-join bounds the frontier by unique nodes even through the hub
    from kgforge.graph.paths import reachable_from

    t0 = time.perf_counter()
    n_reach = reachable_from(edges_tbl, "E000001", None, max_hops=4).count()
    timings["kg_path_reach"] = round(time.perf_counter() - t0, 3)

    total += (
        timings["kg_refdata"]
        + timings["kg_normalize"]
        + timings["kg_docstream"]
        + timings["kg_mention_scan"]
        + timings["kg_edges_materialize"]
        + timings["kg_window_subgraph"]
        + timings["kg_entity_profile"]
        + timings["kg_triangles"]
        + timings["kg_two_hop_sketch"]
        + timings["kg_profile_sketch"]
        + timings["kg_communities"]
        + timings["kg_pred_canon"]
        + timings["kg_bgp_chain"]
        + timings["kg_bgp_anchored"]
        + timings["kg_bgp_cycle_binary"]
        + timings["kg_bgp_cycle_wcoj"]
        + timings["kg_path_reach"]
    )

    result = {
        "metric": "kgforge_headline_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "kg_docs": KG_BENCH_DOCS,
        "kg_edges": n_edges,
        "kg_fixture_gen_sec": fixture_gen_sec,
        "kg_docs_per_sec": round(KG_BENCH_DOCS / timings["kg_docstream"], 2),
        "kg_mentions_found": n_mentions,
        "kg_window_topk_groups": n_window_edges,
        "kg_day_partitions": n_day_dirs,
        "kg_window_partitions_scanned": n_window_dirs,
        "kg_canonical_predicates": n_canon_preds,
        "kg_bgp_matches": n_bgp,
        "kg_bgp_anchored_matches": n_bgp_anchored,
        "kg_bgp_cycle_matches": {"binary": n_cycle_binary, "wcoj": n_cycle_wcoj},
        "kg_path_reach_nodes": n_reach,
        "unbounded_near_dup": unbounded,
    }
    spark.stop()
    return result


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    print(json.dumps(run_bench(sf_dir, cpus)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
