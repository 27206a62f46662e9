#!/usr/bin/env python
"""Local replica of the driver's correctness harness: run each contract
query (``__spark_entry__.queries()``) on Spark AND its ``oracle_sql()``
SQL on DuckDB over the same parquet tables, compare row count + schema +
name-sorted order-insensitive values.

TYPE-STRICT (round-1 lesson): the driver hashes typed values, so a DuckDB
HUGEINT/decimal128 never equals a Spark int64 even when numerically equal.
Every value is compared as a (type-class, value) pair — Decimal vs int vs
float are distinct — so this checker predicts the driver instead of
masking type drift. Usage:

    python tools/check_correctness.py [query ...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    """Typed canonical form: (type-class, value). int/float/Decimal are
    deliberately NOT collapsed (driver compare is typed)."""
    if v is None:
        return ("null", None)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        # representation-exact: same doubles on both sides must agree bitwise
        return ("float", v.hex())
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("array", tuple(_norm(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v))
    return ("str", str(v))


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    ), [cols[i] for i in order]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SF_DIR", "/root/testdata/sf0.01"))
    args = ap.parse_args()

    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from kgforge.session import get_spark

    spark = get_spark("kgforge-correctness", master="local[8]", shuffle_partitions=16)

    qs = queries()
    oracles = oracle_sql()
    # the driver contract pins kg_* oracles to sf0.01; when checking another
    # tier locally, rematerialize the expected tables for THAT tier
    tier = os.path.basename(args.sf.rstrip("/"))
    if tier != "sf0.01":
        from kgforge.fixtures.expected import TIER_DOCS, kg_oracle_sql

        if tier in TIER_DOCS:
            oracles.update(kg_oracle_sql(tier, args.sf))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    names = args.names or sorted(qs)
    failed = []
    for name in names:
        try:
            sdf = qs[name](spark, args.sf)
            srows = sdf.collect()
            scols = sdf.columns
            sset, sorted_cols = _rowset(scols, [tuple(r) for r in srows])
            if name not in oracles:
                print(f"{name:28s} SPARK-ONLY rows={len(srows)}")
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            dset, _ = _rowset(dcols, drows)
            ok_cols = sorted(scols) == sorted(dcols)
            ok_count = len(sset) == len(dset)
            ok_vals = sset == dset
            status = "OK" if (ok_cols and ok_count and ok_vals) else "MISMATCH"
            print(
                f"{name:28s} {status} rows={len(srows)}/{len(drows)} "
                f"cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'}"
            )
            if status != "OK":
                failed.append(name)
                if ok_cols and not ok_vals:
                    sonly = [r for r in sset if r not in set(dset)][:3]
                    donly = [r for r in dset if r not in set(sset)][:3]
                    print(f"    cols order: {sorted_cols}")
                    print(f"    spark-only: {sonly}")
                    print(f"    duck-only : {donly}")
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"{name:28s} ERROR {type(exc).__name__}: {str(exc)[:300]}")
    spark.stop()
    print(f"\n{len(names) - len(failed)}/{len(names)} ok; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
