"""Data-layout clustering: Z-order (Morton) keys for multi-dimensional
locality.

Beyond-reference extension (SURVEY.md §7.4): the reference stores its
silver layer ordered by ingestion only, so any two-dimensional
predicate (device AND time, user AND value band) scans everything.
Writing files clustered by a Z-order key over the filter columns gives
every dimension sub-linear file pruning from ONE sort order — the same
technique Delta/Iceberg expose as ``OPTIMIZE ZORDER BY`` — and parquet
min/max row-group stats pick the benefit up automatically, no engine
cooperation needed.

The key is a pure integer expression (quantize each dimension to
``bits`` levels, interleave the bits), so it runs inside whole-stage
codegen; the only wide stage in a re-layout job is the final
``repartitionByRange`` on the key, which is exactly the shuffle the
rewrite exists to pay. No UDFs, no driver work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16


def quantize_dim(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map ``col`` into an integer cell index in ``[0, 2**bits)`` given
    the dimension's min/max. Degenerate dimensions (lo == hi) map to
    cell 0, and so does a NULL dimension value — made EXPLICIT here
    because ``least(NULL, n)`` skips nulls and would otherwise send
    null rows to the far corner cell (2**bits - 1) of the curve; cell 0
    clusters them together at the origin instead, the conventional
    nulls-first layout. Pure arithmetic — codegen-friendly, no Python."""
    n_cells = F.lit((1 << bits) - 1)
    span = hi - lo
    scaled = F.when(col.isNull(), F.lit(0)).when(
        span > 0,
        F.floor(((col - lo) / span) * n_cells),
    ).otherwise(F.lit(0))
    return F.least(scaled.cast("long"), n_cells.cast("long"))


def interleave_bits(a: Column, b: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton-interleave two ``bits``-wide integers: bit i of ``a``
    lands at position 2i, bit i of ``b`` at 2i+1.

    Unrolled as a sum of masked shifts — ``2 * bits`` bitwise terms
    that constant-fold into one codegen expression. For bits=16 the
    result fits comfortably in a long (32 bits used).
    """
    expr = F.lit(0).cast("long")
    for i in range(bits):
        expr = expr + F.shiftleft(
            F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i
        ) + F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return expr


def zorder_key_2d(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Attach ``zorder_key``: the Morton interleave of the two columns
    quantized against their global min/max.

    The min/max discovery is a 5-value scalar aggregate broadcast back
    via a 1-row cross join (the same shape as ``revenue_vs_global``) —
    at 100 TB that is one cheap pre-pass, or the values come free from
    table-level statistics. The key itself is row-local.
    """
    bounds = df.agg(
        F.min(col_a).alias("_alo"),
        F.max(col_a).alias("_ahi"),
        F.min(col_b).alias("_blo"),
        F.max(col_b).alias("_bhi"),
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    qa = quantize_dim(
        F.col(col_a), F.col("_alo"), F.col("_ahi"), bits
    )
    qb = quantize_dim(
        F.col(col_b), F.col("_blo"), F.col("_bhi"), bits
    )
    return with_bounds.withColumn(
        "zorder_key", interleave_bits(qa, qb, bits)
    ).drop("_alo", "_ahi", "_blo", "_bhi")


def cluster_by_zorder(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_files: int = 32,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Re-layout: range-partition on the Z-order key into ``n_files``
    write tasks and sort within each, so every output file covers a
    tight hyper-rectangle of (col_a, col_b) and parquet row-group
    min/max stats prune on BOTH columns."""
    keyed = zorder_key_2d(df, col_a, col_b, bits)
    return keyed.repartitionByRange(n_files, "zorder_key").sortWithinPartitions(
        "zorder_key"
    )


def interleave_bits_nd(dims: list[Column], bits: int = ZORDER_BITS) -> Column:
    """N-dimensional Morton interleave: bit i of dimension d lands at
    position ``i * D + d`` — the 2-D form generalizes directly, and
    ``D * bits`` must stay <= 62 to fit a signed long (asserted).
    Still one constant-folded codegen expression of ``D * bits``
    masked shifts."""
    n = len(dims)
    assert n >= 2, "need at least two dimensions"
    assert n * bits <= 62, (
        f"{n} dims x {bits} bits = {n * bits} interleaved bits "
        "overflows a signed long; lower bits per dimension"
    )
    expr = F.lit(0).cast("long")
    for d, col in enumerate(dims):
        for i in range(bits):
            expr = expr + F.shiftleft(
                F.shiftright(col, i).bitwiseAND(F.lit(1)), i * n + d
            )
    return expr


def zorder_key_nd(
    df: DataFrame,
    cols: list[str],
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Attach ``zorder_key`` over any number of dimensions: one 5-ish
    value scalar aggregate discovers every dimension's bounds (single
    pass, broadcast back), then the pure-integer N-way interleave.
    3 dims x 16 bits is the practical sweet spot (48 bits used)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_{c}_lo"), F.max(c).alias(f"_{c}_hi")]
    bounds = df.agg(*aggs)
    with_bounds = df.crossJoin(F.broadcast(bounds))
    qs = [
        quantize_dim(
            F.col(c), F.col(f"_{c}_lo"), F.col(f"_{c}_hi"), bits
        )
        for c in cols
    ]
    drop = [f"_{c}_{s}" for c in cols for s in ("lo", "hi")]
    return with_bounds.withColumn(
        "zorder_key", interleave_bits_nd(qs, bits)
    ).drop(*drop)
