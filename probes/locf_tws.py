"""LOCF transformWithStateInPandas probe (round-12 verdict ask #5).

The streaming-LOCF fold is emission-optimal on applyInPandasWithState
(round 12 vectorized the gap emission; probes/locf_parallelism.py
shows the residual Arrow cost parallelizes across keys), but its
8-partition 100x wall ratio (37.7x) still trails the JVM-state
session tracker's (13x). The suspected residual is the
applyInPandasWithState state channel: state tuples ride Arrow
batches alongside the data with per-batch (de)serialization. Spark
4.x's transformWithStateInPandas moves state to a dedicated
proto channel with ValueState get/update per key and mandatory
RocksDB provider — this probe measures whether that machinery is
faster for THIS operator before any adoption decision.

Method: the TWS variant wraps the EXACT production fold
(streaming/stateful._locf_fn) through a GroupState shim, so both
implementations execute byte-identical fold logic and the probe
isolates the state-transfer machinery:

1. correctness: both variants run availableNow over the sf0.01
   events table; outputs must match exactly (exceptAll both ways).
2. timing: both variants over the 100x scaled events table
   (sources/synthetic.scale_up_tables, reused from
   probes/stateful_100x.py) at 8 and 32 shuffle partitions, both
   under the RocksDB provider (TWS requires it; running the
   incumbent under the same provider keeps the comparison honest —
   the committed locf_parallelism numbers under the default HDFS
   provider are reprinted for context).

Run:  python probes/locf_tws.py [factor] [partitions ...]
Defaults: factor 100, partitions 8 32.
Writes /tmp/locf_tws.json and prints one JSON line per run.

MEASURED RESULT (round 13, this sandbox): transformWithStateInPandas
is ENVIRONMENT-BLOCKED here — its driver/worker state channel is a
protobuf protocol (pyspark.sql.streaming.proto) and the ``protobuf``
package is not installed (and installs are out of scope, like the
Kafka broker and ffmpeg). The TWS wrapper below CONSTRUCTS its plan
fine (TransformWithStateInPySpark node, verified); the stream then
dies in pre-init schema validation with ``ImportError: cannot import
name 'descriptor' from 'google.protobuf'``. The probe detects the
missing dependency up front, records the block in its JSON, and
still times the incumbent under the RocksDB provider so the
comparison completes unchanged the day the dependency exists.

Measured incumbent timings from this probe's runs (r13 HEAD, 100x =
10M input events -> 104,791,400 output rows, RocksDB provider):
113.2 s at 8 state partitions, 37.0 s at 32 — vs the committed
locf_parallelism numbers under the default HDFS-backed provider
(113.2 s / 45.4 s): bit-for-bit the same 8-partition wall and ~18%
FASTER at 32, so the state provider is not the residual; per-key
Arrow emission is, and it parallelizes. /tmp/locf_tws.json carries
the per-run JSON.

Why no JVM/SQL reformulation either (the ask's other branch): the
operator's finality contract is EVENT-driven — a bucket closes when
a LATER event for the same key arrives, regardless of watermark —
which is what makes append mode exact with zero retractions and the
state O(keys). Watermark-windowed streaming aggregation can produce
the per-bucket winners, but emitting the carried-forward GAP rows
between two observed buckets needs "previous observed bucket per
key" — lag() state, which streaming SQL does not expose; that is
custom per-key state by definition, i.e. exactly the Python-state
operator we already have. The remaining residual is bounded and
measured: probes/locf_parallelism.py shows it parallelizes across
keys (15x decade ratio at 32 state partitions), so staying on
applyInPandasWithState is the measured-correct choice in this
environment.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ORACLE_SF = "/root/testdata/sf0.01"
AWAIT_S = 3000
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


class _GroupStateShim:
    """Adapts applyInPandasWithState's GroupState surface (exists /
    get / update) onto a plain carried tuple, so the production
    _locf_fn runs unmodified inside a transformWithStateInPandas
    processor — the probe then measures ONLY the state-channel
    machinery, never a second fold implementation."""

    __slots__ = ("_t", "updated")

    def __init__(self, t):
        self._t = t
        self.updated = None

    @property
    def exists(self):
        return self._t is not None

    @property
    def get(self):
        return self._t

    def update(self, t):
        self.updated = t


def _make_processor(step_seconds: int):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
    )

    from big_data_for_smart_houses_spark.streaming.stateful import (
        _locf_fn,
    )

    class LocfTws(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState(
                "open",
                "bucket_s BIGINT, obs_ts_us BIGINT, value DOUBLE",
            )
            self._fn = _locf_fn(step_seconds)

        def handleInputRows(self, key, rows, timerValues):
            shim = _GroupStateShim(self._state.get())
            yield from self._fn(key, rows, shim)
            if shim.updated is not None:
                self._state.update(shim.updated)

        def close(self):
            pass

    return LocfTws()


def _locf_stream_tws(stream, step_seconds=3600):
    from big_data_for_smart_houses_spark.streaming.stateful import (
        LOCF_OUTPUT_SCHEMA,
    )

    return stream.groupBy("user_id").transformWithStateInPandas(
        _make_processor(step_seconds),
        outputStructType=LOCF_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def _run(spark, src, schema, builder, tag) -> tuple[float, str]:
    tmp = tempfile.mkdtemp(prefix=f"locf_tws_{tag}_")
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .select("user_id", "ts", "value")
    )
    t0 = time.perf_counter()
    q = (
        builder(stream)
        .writeStream.format("parquet")
        .option("path", f"{tmp}/out")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(AWAIT_S):
        q.stop()
        raise TimeoutError(tag)
    return round(time.perf_counter() - t0, 1), f"{tmp}/out"


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

    spark = get_spark("probe_locf_tws")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB
    )

    results: dict = {"provider": "rocksdb", "factor": factor}

    # transformWithStateInPandas's state channel is a protobuf
    # protocol; without the package the stream crashes in pre-init
    # schema validation. Detect up front so the block is recorded as
    # data, not as a stack trace.
    try:
        import google.protobuf  # noqa: F401

        tws_available = True
    except ImportError:
        tws_available = False
        results["tws_blocked"] = (
            "protobuf not installed: transformWithStateInPandas's "
            "driver/worker state channel "
            "(pyspark.sql.streaming.proto) cannot start — "
            "environment-blocked like the Kafka broker and ffmpeg; "
            "the wrapper's plan construction is still verified below"
        )
        print(json.dumps({"tws_blocked": results["tws_blocked"]}))

    # -- correctness gate (or plan-construction check when blocked) --
    # (staged into a DIRECTORY: FileStreamSource's basePath inference
    # rejects a single-file parquet path)
    small_dir = tempfile.mkdtemp(prefix="locf_tws_input_") + "/events"
    spark.read.parquet(f"{ORACLE_SF}/events.parquet").write.parquet(
        small_dir
    )
    schema_small = spark.read.parquet(small_dir).schema
    if tws_available:
        t_cur, out_cur = _run(
            spark, small_dir, schema_small,
            lambda s: locf_stream(s, 3600), "cur_small",
        )
        t_tws, out_tws = _run(
            spark, small_dir, schema_small,
            lambda s: _locf_stream_tws(s, 3600), "tws_small",
        )
        a = spark.read.parquet(out_cur)
        b = spark.read.parquet(out_tws)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        n = a.count()
        results["correctness"] = {
            "rows": n,
            "rows_tws": b.count(),
            "exceptall_diff": diff,
        }
        print(json.dumps({"correctness": results["correctness"]}))
        assert diff == 0 and n == b.count(), results["correctness"]
    else:
        stream = (
            spark.readStream.schema(schema_small)
            .parquet(small_dir)
            .select("user_id", "ts", "value")
        )
        plan = _locf_stream_tws(stream, 3600)._jdf.queryExecution(
        ).logical().toString()
        assert "transformWithStateUDF" in plan, plan
        results["tws_plan_constructs"] = True
        print(json.dumps({"tws_plan_constructs": True}))

    # -- 100x timing --------------------------------------------------
    scaled_dir = f"/tmp/scale{factor}x_events"
    if not os.path.exists(f"{scaled_dir}/events.parquet"):
        scale_up_tables(
            spark, SF_DIR, scaled_dir, factor, tables=["events"]
        )
    src = f"{scaled_dir}/events.parquet"
    schema = spark.read.parquet(src).schema

    variants = [("apply_in_pandas", lambda s: locf_stream(s, 3600))]
    if tws_available:
        variants.append(
            ("transform_with_state", lambda s: _locf_stream_tws(s, 3600))
        )
    for parts in parts_list:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        row: dict = {"partitions": parts}
        for tag, builder in variants:
            t, out = _run(spark, src, schema, builder, f"{tag}{parts}")
            n_out = spark.read.parquet(out).count()
            row[tag] = {"wall_s": t, "rows": n_out}
            shutil.rmtree(os.path.dirname(out), ignore_errors=True)
            print(json.dumps({"partitions": parts, tag: row[tag]}))
        results.setdefault("timings", []).append(row)

    with open("/tmp/locf_tws.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
