#!/usr/bin/env python
"""CLI for the incremental (streaming) ingest paths.

    # normalize newly arrived webdocs parquet files
    python jobs/run_stream.py normalize --in <webdocs_dir> --out <dir> --ckpt <dir>

    # full incremental KG: new docs → canonical day-partitioned edges
    python jobs/run_stream.py edges --in <webdocs_dir> --alias-map <dir> \
        --out <dir> --ckpt <dir>

    # stateful event sessionization
    python jobs/run_stream.py sessions --in <events_dir> --out <dir> --ckpt <dir>

Each run drains everything currently present (Trigger.AvailableNow) and
exits; re-runs pick up only new files (checkpointed, exactly-once).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["normalize", "edges", "sessions"])
    ap.add_argument("--in", dest="input_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--alias-map", help="alias_resolution output (edges mode)")
    ap.add_argument("--backend", default="mock", choices=["mock", "onnx"])
    ap.add_argument("--gap-sec", type=int, default=1800)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from kgforge.session import get_spark

    spark = get_spark("kgforge-stream", master=args.master)
    if args.mode == "normalize":
        from kgforge.streaming.ingest import stream_normalize_to_parquet

        q = stream_normalize_to_parquet(
            spark, args.input_dir, args.out, args.ckpt, backend=args.backend
        )
    elif args.mode == "edges":
        if not args.alias_map:
            ap.error("--alias-map required for edges mode")
        from kgforge.streaming.ingest import stream_extract_edges

        q = stream_extract_edges(
            spark, args.input_dir, args.alias_map, args.out, args.ckpt,
            backend=args.backend,
        )
    else:
        from kgforge.streaming.stateful import stream_sessionize

        q = stream_sessionize(
            spark, args.input_dir, args.out, args.ckpt, gap_sec=args.gap_sec
        )
    q.awaitTermination()
    n = spark.read.parquet(args.out).count()
    print(f"{args.mode}: output rows={n} at {args.out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
