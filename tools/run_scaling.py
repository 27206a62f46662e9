#!/usr/bin/env python
"""Scaling bench: identical input at local[8] vs local[32] (sandbox
stand-in for N vs 4N executor clusters per the north rule); reports
throughput at both levels + scaling efficiency and appends the table to
BENCH.md. Each level runs in its own subprocess (a JVM's master is fixed
at startup)."""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--out-md", default=os.path.join(REPO, "BENCH.md"))
    args = ap.parse_args()

    from kgforge.fixtures.gen import write_fixture_tables
    from kgforge.session import get_spark

    fx = tempfile.mkdtemp(prefix="kgforge_scaling_")
    spark = get_spark("kgforge-scaling-gen", master="local[32]")
    webdocs, alias = write_fixture_tables(spark, fx, args.docs, partitions=64)
    spark.stop()

    results = []
    for cores in [int(c) for c in args.levels.split(",")]:
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "_scaling_worker.py"),
                "--master",
                f"local[{cores}]",
                "--webdocs",
                webdocs,
                "--alias",
                alias,
                "--cores",
                str(cores),
            ],
            capture_output=True,
            text=True,
            check=True,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
        print(line)

    lo, hi = results[0], results[-1]
    speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
    core_ratio = hi["cores"] / lo["cores"]
    efficiency = round(speedup / core_ratio, 4)
    summary = {
        "n_docs": args.docs,
        "levels": results,
        "speedup": round(speedup, 4),
        "core_ratio": core_ratio,
        "scaling_efficiency": efficiency,
        "meets_north_rule": efficiency >= 0.8,
    }
    print(json.dumps(summary))

    lines = [
        "",
        f"## Scaling run ({args.docs} docs, full KG pipeline)",
        "",
        "| parallelism | elapsed (s) | docs/sec |",
        "|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| local[{r['cores']}] | {r['elapsed_sec']} | {r['docs_per_sec']} |"
        )
    lines += [
        "",
        f"speedup {lo['cores']}→{hi['cores']} cores: **{summary['speedup']}×** "
        f"(core ratio {core_ratio}×) → scaling efficiency "
        f"**{efficiency}** (north-rule gate ≥ 0.8: "
        f"{'PASS' if summary['meets_north_rule'] else 'FAIL'})",
        "",
    ]
    with open(args.out_md, "a") as fh:
        fh.write("\n".join(lines))
    return 0


if __name__ == "__main__":
    sys.exit(main())
