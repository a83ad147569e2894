#!/usr/bin/env python
"""Driver simulation: runs the __spark_entry__ contract exactly as the
harness does — entry() smoke, then every queries() entry vs its
oracle_sql() twin on duckdb, sorted-column order-insensitive compare.

Usage:
    python scripts/driver_sim.py [--sf DIR] [--only NAME[,NAME...]]
Exit code 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return str(v)


def canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    names = [columns[i] for i in order]
    return names, sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as E
    from stream_processing_platform_spark.session import get_spark

    spark = get_spark(app_name="driver-sim")

    t0 = time.time()
    entry_rows = E.entry(spark).collect()
    print(f"entry(): {len(entry_rows)} rows in {time.time() - t0:.1f}s")
    assert len(entry_rows) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    failures = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = qs[name](spark, args.sf)
        srows = [tuple(r) for r in sdf.collect()]
        if name in oracles:
            rel = con.sql(oracles[name])
            drows, dcols = rel.fetchall(), list(rel.columns)
            s_names, s_set = canon_rows(sdf.columns, srows)
            d_names, d_set = canon_rows(dcols, drows)
            ok = s_names == d_names and s_set == d_set
            status = "MATCH" if ok else "MISMATCH"
            if not ok:
                failures.append(name)
                if s_names != d_names:
                    print(f"  cols: spark={s_names} duck={d_names}")
                else:
                    s_only = [r for r in s_set if r not in set(d_set)][:3]
                    d_only = [r for r in d_set if r not in set(s_set)][:3]
                    print(f"  spark-only: {s_only}\n  duck-only : {d_only}")
        else:
            status = "rows-only"
        print(f"{name}: {len(srows)} rows {status} ({time.time() - t0:.1f}s)", flush=True)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
