"""Count-min sketch: mergeable frequency estimation for unbounded
vocabularies.

Complements the exact heavy-hitter path (extensions/text.py:
token_heavy_hitters) and the HLL count-distinct family
(business_summary_approx): when the token/URL/entity vocabulary of a
100 TB corpus is too large to materialize exact counts for, a CMS
holds frequency estimates in ``depth × width`` counters — kilobytes —
with the classic one-sided guarantee (estimate >= truth always;
overestimate bounded by ε·N with ε = e/width at the standard depth).

Engine-portable determinism: every row hash is derived from md5 of
``"<row>:<value>"`` — no multiplicative mixing that could overflow
int64 (Spark wraps, DuckDB promotes to HUGEINT: a silent parity
break), so the DuckDB oracle replays the sketch bit-for-bit.

Scale shape: build = row-local hash explode (depth rows per value) +
ONE map-side-combined aggregate to at most depth × width counter rows;
merge = counter-wise sum (the same monoid contract as
operators/merge.py); lookup = a broadcast join of the queried items
against the tiny counter table. Nothing is ever per-row state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 2048


def _bucket(col: Column, row: int, width: int) -> Column:
    """Row-``row``'s bucket for a value: md5 of "row:value", first 15
    hex digits as an int (fits int64 with headroom), mod width —
    replayable verbatim in SQL on any engine with md5."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{row}:"), col)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: one (row, bucket, counter) table with at most
    ``depth * width`` rows. The hash fan-out is a row-local inline
    array explode; the single aggregate map-side combines, so the
    exchange carries counters, not values."""
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("cms_row"),
                _bucket(F.col(value_col), i, width).alias("cms_bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("_rb"))
        .groupBy(
            F.col("_rb.cms_row").alias("cms_row"),
            F.col("_rb.cms_bucket").alias("cms_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter-wise sum — sketches built on disjoint shards merge into
    the sketch of the union (the CMS monoid). |counters|-row shuffle."""
    return (
        a.unionByName(b)
        .groupBy("cms_row", "cms_bucket")
        .agg(F.sum("counter").cast("long").alias("counter"))
    )


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for ``items``: min over rows of the counter at
    each row's bucket (missing bucket = 0). The sketch is tiny by
    construction, so Catalyst broadcasts it; the items side never
    shuffles."""
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("cms_row"),
                _bucket(F.col(value_col), i, width).alias("cms_bucket"),
            )
            for i in range(depth)
        ]
    )
    exploded = items.select(
        F.col(value_col), F.explode(rows).alias("_rb")
    ).select(
        value_col,
        F.col("_rb.cms_row").alias("cms_row"),
        F.col("_rb.cms_bucket").alias("cms_bucket"),
    )
    return (
        exploded.join(
            F.broadcast(sketch), ["cms_row", "cms_bucket"], "left"
        )
        .groupBy(value_col)
        .agg(
            F.min(F.coalesce(F.col("counter"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter: mergeable set membership with no false negatives
# ---------------------------------------------------------------------------

# 63 usable bits per 64-bit word keeps every shift strictly below the
# sign bit, so the word values stay non-negative and the bit arithmetic
# is identical in Spark and DuckDB (no two's-complement edge to argue
# about). 1024 words ≈ 64 K bits ≈ 8 KB per filter.
BLOOM_WORD_BITS = 63
BLOOM_WORDS = 1024
BLOOM_M_BITS = BLOOM_WORD_BITS * BLOOM_WORDS
BLOOM_K = 3


def _bloom_pos(col: Column, i: int, m_bits: int) -> Column:
    """Hash ``i``'s bit position for a value: the CMS md5 trick with a
    ``b<i>:`` domain prefix — overflow-free, replayable in SQL."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"b{i}:"), col)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(m_bits))


def bloom_build(
    df: DataFrame,
    value_col: str,
    k: int = BLOOM_K,
    m_bits: int = BLOOM_M_BITS,
) -> DataFrame:
    """Build a Bloom filter as a (word index, word bits) table of at
    most ``m_bits / 63`` rows — kilobytes, the broadcastable pre-join
    filter: probe a 100 TB fact stream for membership in a keyset
    without shuffling either side (the semi-join bypass Delta/Iceberg
    expose as dataSkippingStats / bloom indexes).

    Build shape: row-local k-way hash explode + ONE map-side-combined
    ``bit_or`` aggregate. Merging filters from disjoint shards is the
    same word-wise ``bit_or`` (the Bloom monoid)."""
    positions = F.array(
        *[_bloom_pos(F.col(value_col), i, m_bits) for i in range(k)]
    )
    p = F.col("_p")
    w = BLOOM_WORD_BITS
    return (
        df.select(F.explode(positions).alias("_p"))
        .select(
            F.floor(p / F.lit(w)).cast("long").alias("bloom_word"),
            # SQL expr: the Python shiftleft() binding only takes a
            # literal shift amount, the SQL function takes a column
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(_p, {w}) AS INT))"
            ).alias("_bit"),
        )
        .groupBy("bloom_word")
        .agg(F.bit_or("_bit").alias("bits"))
    )


def bloom_might_contain(
    bloom: DataFrame,
    items: DataFrame,
    value_col: str,
    k: int = BLOOM_K,
    m_bits: int = BLOOM_M_BITS,
) -> DataFrame:
    """Membership probe: ``might_contain`` is true iff ALL k bit
    positions are set. No false negatives ever (structural); false
    positives bounded by (k·n/m)^k. The filter table broadcasts; the
    items side never shuffles for the probe itself (one aggregate
    restores one row per item)."""
    positions = F.array(
        *[_bloom_pos(F.col(value_col), i, m_bits) for i in range(k)]
    )
    p = F.col("_p")
    w = BLOOM_WORD_BITS
    exploded = items.select(
        F.col(value_col), F.explode(positions).alias("_p")
    ).select(
        value_col,
        F.floor(p / F.lit(w)).cast("long").alias("bloom_word"),
        F.pmod(p, F.lit(w)).cast("int").alias("_bit"),
    )
    hit = (
        F.expr(
            "shiftright(CAST(coalesce(bits, 0) AS BIGINT), _bit) & CAST(1 AS BIGINT)"
        )
        == 1
    )
    return (
        exploded.join(F.broadcast(bloom), "bloom_word", "left")
        .groupBy(value_col)
        .agg(F.bool_and(hit).alias("might_contain"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Word-wise OR — filters built on disjoint shards merge into the
    filter of the union (the Bloom monoid; unit-asserted equal to a
    from-scratch build). |words|-row shuffle, same contract as
    cms_merge."""
    return (
        a.unionByName(b)
        .groupBy("bloom_word")
        .agg(F.bit_or("bits").alias("bits"))
    )


# ---------------------------------------------------------------------------
# HdrHistogram-style mergeable quantile sketch (round 10)
# ---------------------------------------------------------------------------
#
# The one standard 100 TB telemetry primitive the family above lacks:
# percentiles over re-aggregatable partitions (the reference's KPI
# queries — dashboard/app.py:300-351 — are exactly this shape at
# scale). Design choice: a LOG-LINEAR bucket histogram (HdrHistogram,
# Gil Tene, public) rather than KLL/t-digest, deliberately — KLL
# needs coin flips and t-digest's centroids depend on merge order, so
# neither can hash-gate bit-exactly across engines; the log-linear
# histogram has the SAME contract that matters at scale (true monoid
# state measured in KB per group, one-pass build, counter-sum merge,
# bounded relative error 2^-(sub_bits+1)) with ALL-INTEGER semantics:
# every bucket id, count, rank target, and estimate is replayable
# verbatim in ANSI SQL (bit shifts + binary-string length), the same
# portability property the CMS above gets from md5.
#
# Values are quantized to integers (``round(value * scale)``); bucket
# magnitude for |m| is: e = floor(log2|m|) via bit length (EXACT —
# no libm), shift = max(e - sub_bits, 0), base = |m| >> shift, id =
# shift * 2^(sub_bits+1) + base, signed by sign(m). id is monotone in
# m (negatives mirror below zero), so rank selection is a cumulative
# sum over id order. Values with |m| < 2^sub_bits get unit buckets
# (exact); larger buckets have width/|value| <= 2^-sub_bits, so the
# midpoint estimate is within 2^-(sub_bits+1) relative error.

HDR_SUB_BITS = 5
_HDR_K = 1 << (HDR_SUB_BITS + 1)  # ids per shift level


def hdr_bucket(m: Column, sub_bits: int = HDR_SUB_BITS) -> Column:
    """Signed log-linear bucket id of an integer-scaled value.

    floor(log2) is pure bit arithmetic (round-10 verdict ask #6):
    smear the top bit down (6 shift-ORs) then popcount — `e =
    bit_count(smear(a)) - 1` — all JVM integer ops inside codegen.
    The previous form round-tripped every row through TWO string
    allocations (`length(conv(cast-to-string, 10, 2))`); on a sketch
    whose point is 100 M-row builds that was measurable constant
    factor. Bit-identical on the full int64 domain: for a = 0 the
    smear gives e = -1 vs the old 0, but shift = max(e-sub_bits, 0)
    clamps both to 0 and sgn = 0 zeroes the bucket either way
    (unit-tested exhaustively around every power-of-two boundary)."""
    k = 1 << (sub_bits + 1)
    a = F.abs(m)
    sm = a
    for s in (1, 2, 4, 8, 16, 32):
        sm = sm.bitwiseOR(F.call_function("shiftright", sm, F.lit(s)))
    e = F.bit_count(sm) - 1
    shift = F.greatest(e - F.lit(sub_bits), F.lit(0)).cast("int")
    base = F.call_function("shiftright", a, shift)
    mag = shift.cast("bigint") * k + base
    sgn = (
        F.when(m > 0, 1).when(m < 0, -1).otherwise(0).cast("bigint")
    )
    return (sgn * mag).alias("bucket")


def hdr_estimate(bucket: Column, sub_bits: int = HDR_SUB_BITS) -> Column:
    """Integer midpoint of the bucket's value range (exact for unit
    buckets, within 2^-(sub_bits+1) relative error otherwise). ALL
    integer arithmetic — ``/`` on bigints would detour through
    double and lose ulps past 2^53 (|value| >= ~4.5e13 at
    scale=100), silently breaking the bit-exact SQL-replay contract;
    k is a power of two, so both divisions are shifts."""
    sgn = F.when(bucket < 0, -1).otherwise(1).cast("bigint")
    idx = F.abs(bucket)
    shift = F.call_function(
        "shiftright", idx, F.lit(sub_bits + 1)
    ).cast("int")
    base = F.pmod(idx, F.lit(1 << (sub_bits + 1))).cast("bigint")
    lo = F.call_function("shiftleft", base, shift)
    hi = F.call_function("shiftleft", base + 1, shift) - 1
    return (
        sgn * F.call_function("shiftright", lo + hi, F.lit(1))
    ).alias("est_scaled")


def hdr_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    scale: int = 100,
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """One-pass sketch build: quantize, bucket (row-local), ONE
    map-side-combined count aggregate down to at most a few hundred
    (group, bucket) rows per group — the only shuffle, and it moves
    counters, not values."""
    m = F.round(F.col(value_col) * scale, 0).cast("bigint")
    return (
        # NULL values are excluded, not absorbed: a NULL bucket row
        # would count into n but sort engine-dependently (Spark
        # windows order NULLS FIRST, DuckDB NULLS LAST), silently
        # shifting every rank target the moment a corpus gains one
        # NULL. Standard sketch semantics (CMS/KMV above): null is
        # no observation.
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, hdr_bucket(m, sub_bits))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Counter-wise sum — sketches built on disjoint shards merge
    into the sketch of the union (the monoid law the quantile gate
    proves on driver data and the unit test proves on arbitrary
    3-way splits). |buckets|-row shuffle, same contract as
    cms_merge/bloom_merge."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hdr_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    probes_pct: list[int],
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """Rank-select integer percentiles from a sketch: cumulative
    counts in bucket-id order (a window over the KB-scale per-group
    sketch — never over raw data), target rank ceil(p*n/100) in
    integer arithmetic, answer = first bucket whose cumulative count
    reaches the target, reported as its midpoint estimate."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*group_cols))
    )
    probes = F.explode(
        F.array(*[F.lit(p) for p in probes_pct])
    ).alias("probe_pct")
    hit = (
        cum.select(*group_cols, "bucket", "cum", "n", probes)
        .withColumn(
            # integer DIV, not '/': the double detour loses ulps for
            # n past 2^53 rows/group (same contract note as
            # hdr_estimate)
            "target",
            F.expr("(probe_pct * n + 99) DIV 100").cast("bigint"),
        )
        .filter(F.col("cum") >= F.col("target"))
        .groupBy(*group_cols, "probe_pct")
        .agg(
            F.min("bucket").alias("bucket"),
            F.max("n").alias("n_rows"),
        )
    )
    return hit.select(
        *group_cols,
        "probe_pct",
        "n_rows",
        "bucket",
        hdr_estimate(F.col("bucket"), sub_bits),
    )
