"""Numeric scalar helpers shared across silver/gold transforms.

All are thin compositions of built-in ``pyspark.sql.functions`` — they
stay inside whole-stage codegen (no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def guarded_div(num: Column, den: Column, default: float = 0.0) -> Column:
    """``num/den if den > 0 else default`` — the reference's guarded
    division idiom (consumer/bronze_to_silver.py:258-262,
    consumer/silver_to_gold.py:114-118, 261-265)."""
    return F.when(den > 0, num / den).otherwise(F.lit(default))


def clamp01(col: Column) -> Column:
    """Clamp into [0, 1] — ``np.minimum(x, 1)`` / ``max(0, min(1, x))``
    (reference consumer/silver_to_gold.py:158, 162-167)."""
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), col))


def bround3(col: Column) -> Column:
    """Half-even rounding to 3 decimals: pandas ``.round(3)`` is
    banker's rounding, so Spark ``bround`` (not ``round``) is the
    parity-correct choice (SURVEY.md §2.4 rounding note)."""
    return F.bround(col, 3)


def gate_quantize(col: Column) -> Column:
    """Gate-parity quantization: round-trip through float32
    (``CAST(CAST(x AS REAL) AS DOUBLE)`` on the oracle side).

    Cross-engine float aggregation differs by a few ulps (different
    reduction order: Spark partial-agg merge / DuckDB segment-tree
    windows), which a byte-exact hash gate flags even though the values
    are numerically identical — and the divergence is nondeterministic
    run to run (task scheduling changes merge order). Two candidate
    quantizers:

    * decimal ``round(x, 6)`` — FAILS: averages of 2-decimal inputs
      over power-of-two counts (e.g. a 32-row window) terminate exactly
      on a ``…5`` decimal boundary, where Spark's
      BigDecimal(shortest-repr, HALF_UP) and DuckDB's
      multiply-round-divide genuinely disagree (observed at sf0.01:
      54.915312 vs 54.915313).
    * float32 round-trip — IEEE round-to-nearest-even is fully
      specified (ties included) and both engines implement it
      bit-identically, so equal inputs ALWAYS quantize equally, and
      ulp-different inputs collapse unless they straddle a float32
      rounding boundary (p ≈ 1e-8 per value, vs ~1e-15 rel input
      jitter).

    Costs: output keeps ~7 significant digits — at the gate query
    boundary only; operators keep full doubles. Pair every use with
    ``CAST(CAST(x AS REAL) AS DOUBLE)`` in the oracle SQL."""
    return col.cast("float").cast("double")


def quantize_cols(df, *cols: str):
    """Apply :func:`gate_quantize` to the named columns of a DataFrame —
    the Spark half of the gate-parity contract."""
    for c in cols:
        df = df.withColumn(c, gate_quantize(F.col(c)))
    return df
