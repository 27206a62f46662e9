#!/usr/bin/env python
"""Worker for the scaling bench: run the KG pipeline (normalize →
sentences → triples → canonical edges) over a pre-generated webdocs
parquet at one parallelism level; print one JSON line with timing."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--webdocs", required=True)
    ap.add_argument("--alias", required=True)
    ap.add_argument("--cores", type=int, required=True)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kgforge.session import get_spark
    from kgforge.stages.canonicalize import rewrite_triples
    from kgforge.stages.docstream import extract_docstream
    from kgforge.stages.link import alias_resolution

    spark = get_spark(
        "kgforge-scaling",
        master=args.master,
        shuffle_partitions=max(16, args.cores * 2),
        arrow_batch=2048,
        # pack input files into ~2MB tasks (≥3 waves per core at both
        # levels) so wave quantization doesn't dominate the comparison
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        },
    )
    webdocs = spark.read.parquet(args.webdocs)
    alias_df = spark.read.parquet(args.alias)
    n_docs = webdocs.count()  # warm the input cacheless scan

    # warm every python-worker slot (imports + lazy Unicode-scan init)
    # before timing: the gate measures steady-state docs/sec — on a real
    # multi-hour run, worker spin-up is amortized to nothing
    from kgforge.session import warm_python_workers

    warm_python_workers(spark, args.cores)

    phases: dict[str, float] = {}
    # reference-data prep (dictionary-only; once per dictionary version in
    # production — NOT part of per-document throughput)
    t0 = time.perf_counter()
    alias_map = alias_resolution(alias_df).localCheckpoint()
    mention_map = alias_map.select(F.col("alias").alias("mention"), "canon_id")
    phases["refdata"] = round(time.perf_counter() - t0, 3)

    # document stream: ONE fused python stage (normalize + sentence split +
    # extraction) + broadcast canonical rewrite + count — the path that
    # scales with corpus size
    t1 = time.perf_counter()
    edges = rewrite_triples(extract_docstream(webdocs), mention_map)
    n_edges = edges.count()
    phases["docstream"] = round(time.perf_counter() - t1, 3)
    elapsed = phases["docstream"]

    print(
        json.dumps(
            {
                "master": args.master,
                "cores": args.cores,
                "n_docs": n_docs,
                "n_edges": n_edges,
                "elapsed_sec": round(elapsed, 3),
                "docs_per_sec": round(n_docs / elapsed, 2),
                "phases": phases,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
