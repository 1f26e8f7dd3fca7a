#!/usr/bin/env python
"""Capture .explain('formatted') for named declared queries into
plans/r14/<name>_<tag>.txt (tag = before/after). Batch queries only:
calling a streaming gate executes the stream and returns the sink
read, so its 'plan' would be a bare parquet scan — for gates the
meaningful before/after evidence is the gate body itself plus bench
io/fingerprints, captured separately.

Usage:
  python probes/capture_plans.py <tag> <query> [<query> ...]
  SPARK_GRAFT_SF_DIR overrides the data dir (default sf0.1).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    out_dir = os.path.join(here, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    from big_data_for_smart_houses_spark.queries import QUERIES
    from big_data_for_smart_houses_spark.session import get_spark

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
