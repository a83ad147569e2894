#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into plans/<dir>/.

Usage:
    python scripts/capture_plan.py --out plans/r14 --suffix after NAME [NAME...]

Runs at $SPARK_GRAFT_SF_DIR (default sf0.1) — the same scale the bench
times — so the plan a file claims is the plan the bench ran.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="after")
    args = ap.parse_args()

    from stream_processing_platform_spark.registry import queries
    from stream_processing_platform_spark.session import get_spark

    spark = get_spark(app_name="spp-capture-plan")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
