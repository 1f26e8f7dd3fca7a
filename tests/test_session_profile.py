"""The input-volume-aware shuffle-partition profile (round-10
verdict ask #4): gates keep the 32-partition parity layout at gate
SF; big inputs derive the knob the q17@1000x probe measured."""

from __future__ import annotations

import pytest

from big_data_for_smart_houses_spark.session import (
    DEFAULT_SHUFFLE_PARTITIONS,
    SCALE_PROFILE_CAP,
    _local_input_bytes,
    apply_scale_profile,
    scale_shuffle_partitions,
)


def test_gate_sf_stays_on_the_floor():
    # sf0.1's full table set is tens of MB — far below one target
    # partition, so every gate keeps the parity layout
    sf01_bytes = _local_input_bytes("/root/testdata/sf0.1")
    assert scale_shuffle_partitions(sf01_bytes) == (
        DEFAULT_SHUFFLE_PARTITIONS
    )
    assert scale_shuffle_partitions(0) == DEFAULT_SHUFFLE_PARTITIONS


def test_1000x_lineitem_derives_the_measured_knob():
    # the 1000x probe's lineitem is ~11 GB on disk; the formula must
    # land in the q17-measured effective band (~256), not at the
    # floor and not at the cap
    n = scale_shuffle_partitions(11 * 10**9)
    assert 128 <= n <= 512, n


def test_clamps_and_validation():
    assert scale_shuffle_partitions(10**15) == SCALE_PROFILE_CAP
    assert scale_shuffle_partitions(1, floor=7) == 7
    with pytest.raises(ValueError):
        scale_shuffle_partitions(-1)


def test_apply_scale_profile_sets_and_returns(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        n = apply_scale_profile(spark, "/root/testdata/sf0.001")
        assert n == DEFAULT_SHUFFLE_PARTITIONS
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(n)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
