#!/usr/bin/env python
"""Benchmark harness — one JSON line on stdout.

Runs the headline queries (KG pipeline end-to-end + representative
relational/dedup/ANN queries) at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32).

    {"metric": "kgforge_headline_sec", "value": <total>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": "...", "docs_per_sec": ...}

``--scaling`` additionally runs the KG pipeline at two parallelism levels
(local[8] vs local[32]) on identical input and reports throughput at both
plus scaling efficiency (sandbox stand-in for the north rule's N vs 4N
executor clusters) — results land in BENCH.md via tools/run_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "revenue_topk",
    "word_frequency",
    "dedup_exact",
    "minhash_lsh_candidates",
    "ann_cosine_topk",
    "sessionize",
    "text_quality",
]

KG_QUERIES = ["kg_normalize", "kg_triples", "kg_edges_topk"]


def run_bench(sf_dir: str, cpus: str) -> dict:
    from __spark_entry__ import queries
    from kgforge.session import get_spark

    spark = get_spark(
        "kgforge-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(16, int(cpus) * 2) if cpus.isdigit() else 32,
    )
    qs = queries()
    timings: dict[str, float] = {}
    total = 0.0
    n_docs_kg = 0
    for name in HEADLINE + KG_QUERIES:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
        if name == "kg_normalize":
            n_docs_kg = n
    kg_sec = sum(timings[q] for q in KG_QUERIES)
    result = {
        "metric": "kgforge_headline_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "kg_docs": n_docs_kg,
        "kg_docs_per_sec": round(n_docs_kg / kg_sec, 2) if kg_sec else None,
    }
    spark.stop()
    return result


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    result = run_bench(sf_dir, cpus)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
