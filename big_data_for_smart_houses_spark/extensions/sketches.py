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
