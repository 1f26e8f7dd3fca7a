"""10x probe for the d>2 skyline scale path (round-11 verdict ask
#7): ``skyline3d_parts`` is hash-certified, but its local-skyline ->
small-union second pass (operators/scan.py:skyline_nd) had no sweep
row. This probe measures, at 1x (sf0.1 part) and 10x
(sources/synthetic.scale_up_tables, tables=["part"]):

* wall seconds + shuffle MB for the full operator (bench's poller),
* the PHASE-1 SURVIVOR UNION — the number of local-skyline points
  the single merge task receives. This is the operator's scale
  contract: the merge pass is safe at 100 TB only if local dominance
  keeps the union near the true frontier size, not near the input.
  The probe computes it with its own copy of the dominance kernel so
  the operator under test stays untouched.

Run:  python probes/skyline10x.py [factor]    (default 10)
Writes /tmp/skyline10x.json and prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _local_survivors(pts_df) -> int:
    """Phase-1 survivor-union size, measured independently of the
    operator: per-partition vectorized dominance over the distinct
    normalized points (same kernel shape as skyline_nd's _local)."""
    import pandas as pd

    def kernel(batches):
        import numpy as np

        chunk = list(batches)
        if not chunk:
            return
        data = pd.concat(chunk, ignore_index=True)
        a = data.to_numpy(dtype="float64")
        k = a.shape[0]
        keep = np.ones(k, dtype=bool)
        for i in range(k):
            if not keep[i]:
                continue
            le = (a <= a[i]).all(axis=1)
            lt = (a < a[i]).any(axis=1)
            if (le & lt).any():
                keep[i] = False
            else:
                ge = (a >= a[i]).all(axis=1)
                gt = (a > a[i]).any(axis=1)
                keep &= ~(ge & gt & (np.arange(k) != i))
        yield data[keep]

    return pts_df.mapInPandas(kernel, schema=pts_df.schema).count()


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import bench
    from pyspark.sql import functions as F

    from big_data_for_smart_houses_spark.operators.scan import skyline_nd
    from big_data_for_smart_houses_spark.session import get_spark
    from big_data_for_smart_houses_spark.sources.synthetic import (
        scale_up_tables,
    )

    spark = get_spark("probe_skyline10x")
    spark.sparkContext.setLogLevel("ERROR")
    poll = bench._stage_metrics_poller(spark)

    scaled_dir = f"/tmp/skyline{factor}x_part"
    if not os.path.exists(f"{scaled_dir}/part.parquet"):
        scale_up_tables(spark, SF_DIR, scaled_dir, factor,
                        tables=["part"])

    def gate_projection(sf_dir):
        # same projection as queries/stats_gate.q_skyline3d_parts
        return spark.read.parquet(f"{sf_dir}/part.parquet").select(
            "p_retailprice",
            "p_size",
            (F.col("p_partkey") % 10).alias("quality"),
        )

    def wide_projection(sf_dir):
        # The scale-up generator replicates the part VALUE SPACE, so
        # the gate projection's distinct-point count is constant
        # across scales (the dedup absorbs duplication — itself worth
        # measuring, but not a distinct-growth stress). This variant
        # derives the third dimension from the raw partkey modulo a
        # prime, so distinct points grow with the scaled key range
        # and phase 1 has genuinely more work and more survivors.
        return spark.read.parquet(f"{sf_dir}/part.parquet").select(
            "p_retailprice",
            "p_size",
            (F.col("p_partkey") % 10007).alias("quality"),
        )

    results = []
    for label, d in (("1x", SF_DIR), (f"{factor}x", scaled_dir)):
        p = gate_projection(d)
        n_rows = p.count()
        # normalized distinct points, as the operator sees them
        pts = p.select(
            F.col("p_retailprice").alias("_s0"),
            (-F.col("p_size")).alias("_s1"),
            (-F.col("quality")).alias("_s2"),
        ).distinct()
        n_distinct = pts.count()
        union = _local_survivors(pts)
        last_stage, _ = poll(-1)
        t0 = time.perf_counter()
        frontier = skyline_nd(
            p, minimize_cols=["p_retailprice"],
            maximize_cols=["p_size", "quality"],
        ).count()
        wall = round(time.perf_counter() - t0, 2)
        _, io = poll(last_stage)
        r = {
            "probe": f"skyline3d_{label}",
            "wall_s": wall,
            "rows": n_rows,
            "distinct_pts": n_distinct,
            "phase1_union": union,
            "frontier": frontier,
            **io,
        }
        print(json.dumps(r), flush=True)
        results.append(r)
    for label, d in (("1x", SF_DIR), (f"{factor}x", scaled_dir)):
        p = wide_projection(d)
        pts = p.select(
            F.col("p_retailprice").alias("_s0"),
            (-F.col("p_size")).alias("_s1"),
            (-F.col("quality")).alias("_s2"),
        ).distinct()
        n_distinct = pts.count()
        union = _local_survivors(pts)
        last_stage, _ = poll(-1)
        t0 = time.perf_counter()
        frontier = skyline_nd(
            p, minimize_cols=["p_retailprice"],
            maximize_cols=["p_size", "quality"],
        ).count()
        wall = round(time.perf_counter() - t0, 2)
        _, io = poll(last_stage)
        r = {
            "probe": f"skyline3d_wide_{label}",
            "wall_s": wall,
            "rows": p.count(),
            "distinct_pts": n_distinct,
            "phase1_union": union,
            "frontier": frontier,
            **io,
        }
        print(json.dumps(r), flush=True)
        results.append(r)
    with open("/tmp/skyline10x.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
