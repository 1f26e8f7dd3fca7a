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
