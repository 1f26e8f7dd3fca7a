"""LOCF per-key-parallelism probe (round-12, SCALE.md): the
vectorized streaming-LOCF fold's remaining cost is Arrow
serialization of the emitted rows out of the Python worker. This
probe demonstrates that the cost parallelizes across keys — the same
100x input (sources/synthetic.scale_up_tables output reused from
probes/stateful_100x.py) run at 8 vs 32 state partitions:

    8 partitions: 106.4 s   (the stateful_100x layout)
    32 partitions: 45.4 s   (15x decade ratio — alongside the
                             JVM-state session tracker's 13x)

identical 104,791,400 output rows both ways, so on a multi-executor
cluster the operator's wall curve is set by keys-per-executor, not
by the Python fold.

Run:  python probes/locf_parallelism.py [factor] [partitions ...]
Defaults: factor 100, partitions 8 32. Requires the scaled events
table (materialized on first run if absent, like stateful_100x).
Writes /tmp/locf_parallelism.json and prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AWAIT_S = 3000


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    parts_list = [int(p) for p in sys.argv[2:]] or [8, 32]

    from big_data_for_smart_houses_spark.session import get_spark
    from big_data_for_smart_houses_spark.sources.synthetic import (
        scale_up_tables,
    )
    from big_data_for_smart_houses_spark.streaming.stateful import (
        locf_stream,
    )

    spark = get_spark("probe_locf_parallelism")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = f"/tmp/scale{factor}x_events"
    if not os.path.exists(f"{scaled_dir}/events.parquet"):
        scale_up_tables(spark, SF_DIR, scaled_dir, factor,
                        tables=["events"])
    src = f"{scaled_dir}/events.parquet"
    schema = spark.read.parquet(src).schema

    results = []
    for parts in parts_list:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        tmp = tempfile.mkdtemp(prefix=f"locf_par{parts}_")
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .select("user_id", "ts", "value")
        )
        t0 = time.perf_counter()
        q = (
            locf_stream(stream, 3600)
            .writeStream.format("parquet")
            .option("path", f"{tmp}/out")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(AWAIT_S):
            q.stop()
            raise TimeoutError(f"partitions={parts}")
        wall = round(time.perf_counter() - t0, 1)
        n = spark.read.parquet(f"{tmp}/out").count()
        r = {"state_partitions": parts, "wall_s": wall, "rows": n}
        print(json.dumps(r), flush=True)
        results.append(r)
    with open("/tmp/locf_parallelism.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
