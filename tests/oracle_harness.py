"""Local replica of the driver's correctness gate: run a Spark query
and its DuckDB oracle SQL on the same parquet tables, compare row
count + schema-shape + order-insensitive values (floats with
tolerance), and report the worst float deviation so parity margins are
visible before the real gate runs."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame, exact: bool = False) -> pd.DataFrame:
    df = df.copy()
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]").astype("string")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            sample = next((x for x in s if x is not None and x == x), None)
            if isinstance(sample, (bytes, bytearray)):
                # binary columns: Spark yields bytearray, DuckDB bytes —
                # canonicalize to hex before the string compare
                df[c] = s.map(
                    lambda b: bytes(b).hex() if b is not None else None
                ).astype("string")
            elif isinstance(sample, bool):
                df[c] = s.astype("boolean")
            elif isinstance(sample, (dt.date, dt.datetime)):
                df[c] = pd.to_datetime(s).astype("datetime64[us]").astype("string")
            elif isinstance(sample, float):
                df[c] = s.astype("float64")
            elif isinstance(sample, int):
                df[c] = s.astype("int64")
            else:
                df[c] = s.astype("string")
    # order-insensitive: sort rows by every column. In tolerant mode,
    # floats are rounded for the sort so last-bit jitter cannot permute
    # rows; in exact mode we sort on full precision — any bit
    # difference then surfaces as a value mismatch, which is exactly
    # what the driver's byte hash would report.
    sort_df = df.copy()
    if not exact:
        for c in sort_df.columns:
            if pd.api.types.is_float_dtype(sort_df[c]):
                sort_df[c] = sort_df[c].round(6)
    order = sort_df.sort_values(by=list(df.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


# DuckDB types the driver's type-tagged hash will always reject, even
# when every value matches Spark bit-for-bit: DuckDB widens integer
# sums to HUGEINT (and DECIMAL for some aggregates) while Spark stays
# BIGINT/DOUBLE. _normalize below coerces both to int64, so without
# this guard the local mirror passes a query the driver fails (this
# exact blind spot shipped tpch_q12 red in round 7).
_WIDE_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def assert_oracle_types_narrow(rel) -> None:
    """Fail fast if any oracle result column has a DuckDB-only wide
    numeric type — the oracle SQL must CAST it (AS BIGINT / AS DOUBLE)
    so both engines hash the same physical type."""
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper().startswith(_WIDE_DUCK_TYPES)
    ]
    assert not bad, (
        f"oracle type-parity: DuckDB returns wide columns {bad}; "
        "CAST them in the oracle SQL (sum(int) -> CAST(... AS BIGINT)) "
        "or the driver's type-tagged hash will reject the row even "
        "when values are bit-identical"
    )


def compare(
    spark_df,
    oracle_sql: str,
    sf_dir: str,
    float_rtol: float = 1e-6,
    float_atol: float = 1e-9,
    exact: bool = False,
) -> dict:
    """Compare Spark result vs DuckDB oracle. With ``exact=True`` the
    comparison mirrors the driver's gate: order-insensitive but
    bit-exact on every value (no float tolerance) — a query must pass
    exact mode to be expected green in CORRECTNESS_r{N}.json."""
    if exact:
        float_rtol = 0.0
        float_atol = 0.0
    sp = _normalize(spark_df.toPandas(), exact=exact)
    con = duck_con(sf_dir)
    try:
        rel = con.sql(oracle_sql)
        assert_oracle_types_narrow(rel)
        du = _normalize(rel.df(), exact=exact)
    finally:
        con.close()

    result: dict = {"rows_spark": len(sp), "rows_duck": len(du), "max_rel_err": 0.0}
    assert list(sp.columns) == list(du.columns), (
        f"column mismatch: spark={list(sp.columns)} duck={list(du.columns)}"
    )
    assert len(sp) == len(du), f"row count: spark={len(sp)} duck={len(du)}"

    # Check EVERY column before raising: failing on the first
    # mismatch (alphabetically) hides later ones, so a "fixed" error
    # could just unmask the next — one run should show the full
    # damage report.
    failures: list[str] = []
    for c in sp.columns:
        a, b = sp[c], du[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            av = a.astype("float64").to_numpy()
            bv = b.astype("float64").to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            close = np.isclose(av, bv, rtol=float_rtol, atol=float_atol) | both_nan
            if not close.all():
                bad = np.where(~close)[0][:5]
                failures.append(
                    f"float mismatch in {c} at rows {bad}: "
                    f"spark={av[bad]} duck={bv[bad]}"
                )
                continue
            with np.errstate(divide="ignore", invalid="ignore"):
                rel = np.abs(av - bv) / np.maximum(np.abs(bv), 1e-300)
            rel = rel[~both_nan]
            if rel.size:
                result["max_rel_err"] = max(
                    result["max_rel_err"], float(np.nanmax(rel))
                )
        else:
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                bad = np.where(~eq.to_numpy())[0][:5]
                failures.append(
                    f"value mismatch in {c} at rows {bad}: "
                    f"spark={a.iloc[bad].tolist()} duck={b.iloc[bad].tolist()}"
                )
    if failures:
        raise AssertionError(
            f"{len(failures)} mismatching column(s):\n"
            + "\n".join(failures)
        )
    return result


def assert_match(name, query_fn, oracle_sql, spark, sf_dir, **kw):
    res = compare(query_fn(spark, sf_dir), oracle_sql, sf_dir, **kw)
    assert res["rows_spark"] > 0, f"{name}: empty result"
    return res
