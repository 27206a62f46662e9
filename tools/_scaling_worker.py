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
    from kgforge.stages.canonicalize import canonical_map, rewrite_triples
    from kgforge.stages.extract import sentences, triples
    from kgforge.stages.link import link, mentions, same_as_edges
    from kgforge.stages.normalize import normalize

    spark = get_spark(
        "kgforge-scaling",
        master=args.master,
        shuffle_partitions=max(16, args.cores * 2),
    )
    webdocs = spark.read.parquet(args.webdocs).repartition(args.cores * 2)
    alias_df = spark.read.parquet(args.alias)
    n_docs = webdocs.count()  # warm the input cacheless scan

    t0 = time.perf_counter()
    trip = triples(sentences(normalize(webdocs)))
    ents = link(mentions(trip), alias_df)
    edges = rewrite_triples(trip, canonical_map(ents, same_as_edges(alias_df)))
    n_edges = edges.count()
    elapsed = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "master": args.master,
                "cores": args.cores,
                "n_docs": n_docs,
                "n_edges": n_edges,
                "elapsed_sec": round(elapsed, 3),
                "docs_per_sec": round(n_docs / elapsed, 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
