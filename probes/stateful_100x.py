"""100x stateful-streaming probe (round-10 verdict ask #4).

The r9 100x probe covered batch near-dup + q17; this one covers the
STATEFUL STREAMING family: the NoTimeout session tracker
(stream_device_sessions' operator) and streaming LOCF at 1x (sf0.1
events, ~100k rows) and 100x (sources/synthetic.scale_up_tables
factor 100 -> ~10M rows, key cardinality x100 with per-key densities
constant — production-shaped growth). For each probe it records:

* wall seconds for the availableNow run,
* shuffle write/read MB (JVM AppStatusStore, bench's poller),
* state rows + state memory from the final StreamingQueryProgress
  stateOperators block,
* for the session tracker: keys and PENDING-INTERVAL totals read
  back through the statestore source — the direct test that state is
  O(keys x pending-intervals), never O(events).

Run:  python probes/stateful_100x.py [factor]    (default 100)
Writes /tmp/stateful_100x.json and prints one JSON line per probe.
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


def _state_metrics(q):
    for p in reversed(q.recentProgress):
        ops = p.get("stateOperators") or []
        if ops:
            return {
                "state_rows": sum(o.get("numRowsTotal", 0) for o in ops),
                "state_bytes": sum(
                    o.get("memoryUsedBytes", 0) for o in ops
                ),
            }
    return {"state_rows": None, "state_bytes": None}


def _run(spark, name, events_dir, build, poll, read_state=None):
    from pyspark.sql import functions as F  # noqa: F401

    tmp = tempfile.mkdtemp(prefix=f"probe100x_{name}_")
    ck = f"{tmp}/ckpt"
    last_stage, _ = poll(-1)
    t0 = time.perf_counter()
    q = (
        build(events_dir)
        .writeStream.format("parquet")
        .option("path", f"{tmp}/out")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(AWAIT_S):
        q.stop()
        raise TimeoutError(name)
    wall = round(time.perf_counter() - t0, 1)
    _, io = poll(last_stage)
    out = {"probe": name, "wall_s": wall, **io, **_state_metrics(q)}
    out["emitted_rows"] = spark.read.parquet(f"{tmp}/out").count()
    if read_state is not None:
        out.update(read_state(ck))
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    import bench
    from pyspark.sql import functions as F

    from big_data_for_smart_houses_spark.session import get_spark
    from big_data_for_smart_houses_spark.sources.synthetic import (
        scale_up_tables,
    )
    from big_data_for_smart_houses_spark.streaming.stateful import (
        locf_stream,
        track_device_sessions,
    )

    spark = get_spark("probe_stateful_100x")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    poll = bench._stage_metrics_poller(spark)

    scaled_dir = f"/tmp/scale{factor}x_events"
    if not os.path.exists(f"{scaled_dir}/events.parquet"):
        t0 = time.perf_counter()
        scale_up_tables(spark, SF_DIR, scaled_dir, factor,
                        tables=["events"])
        print(f"scale-up materialized in "
              f"{time.perf_counter()-t0:.0f}s", file=sys.stderr)

    def sessions_build(events_dir):
        s = (
            spark.readStream.schema(
                spark.read.parquet(events_dir).schema
            )
            .parquet(events_dir)
            .select(
                F.col("user_id").cast("string").alias("device_id"),
                F.col("ts").alias("timestamp"),
            )
        )
        return track_device_sessions(s, 1800)

    def locf_build(events_dir):
        s = (
            spark.readStream.schema(
                spark.read.parquet(events_dir).schema
            )
            .parquet(events_dir)
            .select("user_id", "ts", "value")
        )
        return locf_stream(s, 3600)

    def sessions_state(ck):
        st = spark.read.format("statestore").option("path", ck).load()
        sizes = st.select(
            F.size("value.groupState.starts_us").alias("k")
        ).agg(
            F.count(F.lit(1)).alias("state_keys"),
            F.sum("k").alias("pending_intervals"),
            F.max("k").alias("max_intervals_per_key"),
        ).collect()[0]
        return {
            "state_keys": sizes["state_keys"],
            "pending_intervals": sizes["pending_intervals"],
            "max_intervals_per_key": sizes["max_intervals_per_key"],
        }

    # the sf0.1 events table is a single FILE; FileStreamSource needs
    # a directory — hardlink it into one
    one_x = f"{SF_DIR}/events.parquet"
    if os.path.isfile(one_x):
        d = tempfile.mkdtemp(prefix="probe100x_src_")
        os.link(one_x, f"{d}/part-0.parquet")
        one_x = d

    results = []
    for label, events_dir in (
        ("1x", one_x),
        (f"{factor}x", f"{scaled_dir}/events.parquet"),
    ):
        n = spark.read.parquet(events_dir).count()
        r = _run(spark, f"device_sessions_{label}", events_dir,
                 sessions_build, poll, read_state=sessions_state)
        r["n_events"] = n
        print(json.dumps(r), flush=True)
        results.append(r)
        r = _run(spark, f"locf_stream_{label}", events_dir,
                 locf_build, poll)
        r["n_events"] = n
        print(json.dumps(r), flush=True)
        results.append(r)
    with open("/tmp/stateful_100x.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
