"""Round-6 modern-surface gates: the Spark 4 API families a user
migrating from the reference (or any earlier JSON/string pipeline)
adopts at scale, each hash-gated against a DuckDB oracle.

- VARIANT (`parse_json`/`variant_get`): the binary semi-structured
  encoding that replaces string re-parsing of the reference's
  telemetry JSON payloads — shredded access without a schema pass.
- `try_`-family ANSI-safe arithmetic: the no-job-crash error contract
  (reference consumer code wraps every cast in try/except —
  consumer/ingest_bronze.py:86-95; here it's one declarative call).
- XML encode/decode/xpath: the other wire format, gated by exact
  roundtrip (to_xml's formatting is part of the contract).
- Correlated LATERAL subquery joins: per-row dependent subqueries,
  the SQL surface behind per-entity top-k without a window function.
- Sliding token-window chunking with overlap: the RAG/embedding prep
  shape (CDC chunking covers content-defined splits; this covers the
  fixed-window-with-stride variant every retrieval pipeline uses).

All row-local except the lateral join (one keyed exchange at scale,
broadcast-able dimension side) — zero Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure_for_oracle_parity
from ..sources.parquet import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_for_oracle_parity(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# VARIANT: parse_json / variant_get / schema_of_variant / try_parse_json
# ---------------------------------------------------------------------------

def q_variant_functions_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spark 4 VARIANT path over the events props JSON: parse once
    into the binary variant encoding, then typed path extraction
    (`variant_get` int and string casts of ``$.k``), the inferred
    variant schema string, and the `try_parse_json` null contract on
    a deliberately-corrupted copy (leading garbage — Spark's parser
    tolerates TRAILING garbage after a complete JSON value, so the
    corruption must precede it).
    At 100 TB this is THE json strategy: one parse, shredded columnar
    access, no per-query string re-scan."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    corrupt = F.try_parse_json(F.concat(F.lit("x"), F.col("props")))
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.missing", "string").isNull()
        .alias("missing_is_null"),
        F.schema_of_variant(v).alias("var_schema"),
        F.is_variant_null(v).alias("top_is_json_null"),
        corrupt.isNull().alias("corrupt_dropped"),
    )


ORACLE_VARIANT_FUNCTIONS_EVENTS = """
SELECT event_id,
       CAST(props::JSON->>'k' AS BIGINT) AS k_int,
       props::JSON->>'k' AS k_str,
       true AS missing_is_null,
       'OBJECT<k: BIGINT>' AS var_schema,
       false AS top_is_json_null,
       true AS corrupt_dropped
FROM events
"""

QUERIES["variant_functions_events"] = q_variant_functions_events
ORACLES["variant_functions_events"] = ORACLE_VARIANT_FUNCTIONS_EVENTS


# ---------------------------------------------------------------------------
# try_-family ANSI-safe arithmetic
# ---------------------------------------------------------------------------

_BIGINT_MAX = 9223372036854775807


def q_try_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe arithmetic: `try_divide` (null on zero),
    `try_add`/`try_multiply` (null on bigint overflow), `try_to_number`
    (null on format mismatch), `try_element_at` (null out of bounds),
    `try_to_timestamp` (null on garbage) — the declarative replacement
    for the reference's per-field try/except validator
    (consumer/ingest_bronze.py:86-95). Division results are
    order-insensitive scalars (single multiply/divide per row), so no
    quantization is needed."""
    ev = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    arr = F.array(F.lit(10), F.lit(20))
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), k.cast("double")).alias("div_by_k"),
        F.try_add(F.lit(_BIGINT_MAX).cast("long"), F.col("event_id"))
        .isNotNull()
        .alias("add_ok"),
        F.try_multiply(
            F.lit(_BIGINT_MAX).cast("long"),
            F.col("event_id") + F.lit(2),
        ).isNull()
        .alias("mul_overflowed"),
        F.try_to_number(
            F.format_string("%.2f", "value"), F.lit("999999.99")
        ).cast("double").alias("num_ok"),
        F.try_to_number(F.col("event_type"), F.lit("999")).isNull()
        .alias("num_bad_null"),
        F.try_element_at(arr, (F.col("event_id") % 4 + 1).cast("int"))
        .alias("elem_maybe"),
        F.try_to_timestamp(F.col("event_type")).isNull().alias("ts_bad_null"),
    )


ORACLE_TRY_FUNCTIONS_EVENTS = f"""
SELECT event_id,
       CASE WHEN CAST(props::JSON->>'k' AS BIGINT) = 0 THEN NULL
            ELSE value / CAST(props::JSON->>'k' AS DOUBLE) END
         AS div_by_k,
       event_id = 0 AS add_ok,
       true AS mul_overflowed,
       CAST(printf('%.2f', value) AS DOUBLE) AS num_ok,
       true AS num_bad_null,
       CASE WHEN event_id % 4 + 1 <= 2
            THEN (event_id % 4 + 1) * 10 END AS elem_maybe,
       true AS ts_bad_null
FROM events
"""

QUERIES["try_functions_events"] = q_try_functions_events
ORACLES["try_functions_events"] = ORACLE_TRY_FUNCTIONS_EVENTS


# ---------------------------------------------------------------------------
# XML: to_xml exact format + from_xml roundtrip + xpath extraction
# ---------------------------------------------------------------------------

def q_xml_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML wire format: `to_xml` of a (event_id, event_type) struct —
    the exact serialized string is hashed, so the formatting contract
    (ROW root, 4-space indent, newlines) is pinned — then `from_xml`
    parses it back (roundtrip fields must equal the originals) and
    `xpath_string`/`xpath_long` extract from the raw string. Only
    deterministic-format fields (long, string) ride in the payload;
    float formatting stays out by design."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ev = _t(spark, sf_dir, "events")
    xml = F.to_xml(
        F.struct(
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("etype"),
        )
    )
    back_schema = StructType(
        [
            StructField("eid", LongType()),
            StructField("etype", StringType()),
        ]
    )
    withx = ev.select("event_id", "event_type", xml.alias("xml"))
    return withx.select(
        "event_id",
        "xml",
        F.from_xml("xml", back_schema).alias("m"),
        F.expr("xpath_string(xml, '/ROW/etype')").alias("xp_type"),
        F.expr("xpath_long(xml, '/ROW/eid')").alias("xp_id"),
    ).select(
        "event_id",
        "xml",
        F.col("m.eid").alias("rt_id"),
        F.col("m.etype").alias("rt_type"),
        "xp_type",
        "xp_id",
    )


ORACLE_XML_FUNCTIONS_EVENTS = """
SELECT event_id,
       '<ROW>' || chr(10) ||
       '    <eid>' || event_id || '</eid>' || chr(10) ||
       '    <etype>' || event_type || '</etype>' || chr(10) ||
       '</ROW>' AS xml,
       event_id AS rt_id,
       event_type AS rt_type,
       event_type AS xp_type,
       event_id AS xp_id
FROM events
"""

QUERIES["xml_functions_events"] = q_xml_functions_events
ORACLES["xml_functions_events"] = ORACLE_XML_FUNCTIONS_EVENTS


# ---------------------------------------------------------------------------
# Correlated LATERAL subquery join
# ---------------------------------------------------------------------------

LATERAL_TOPK = 2


def q_lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-2 orders via a correlated LATERAL subquery —
    the dependent-join SQL surface (distinct from the window-function
    top-k already gated by top_orders_per_customer: same answer,
    different operator). Catalyst decorrelates the LATERAL into a
    ranked join, so the plan scales as one keyed exchange, not a
    per-row subquery execution."""
    configure_for_oracle_parity(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "_lat_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_lat_orders"
    )
    return spark.sql(
        f"""
        SELECT c.c_custkey, c.c_mktsegment,
               l.o_orderkey, l.o_totalprice
        FROM _lat_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM _lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT {LATERAL_TOPK}
        ) l
        """
    )


ORACLE_LATERAL_TOPK_ORDERS = f"""
SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey, l.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT {LATERAL_TOPK}
) l
"""

QUERIES["lateral_topk_orders"] = q_lateral_topk_orders
ORACLES["lateral_topk_orders"] = ORACLE_LATERAL_TOPK_ORDERS


# ---------------------------------------------------------------------------
# Sliding token-window chunking with overlap (RAG prep)
# ---------------------------------------------------------------------------

CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


def q_sliding_chunks_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fixed-size token windows with stride (64-token windows every
    48 tokens → 16-token overlap) — the standard retrieval-chunking
    shape next to the content-defined CDC chunker
    (extensions/text.py). Pure row-local codegen: tokenize, generate
    window starts with `sequence`, explode, `slice` — the fan-out is
    ~n/stride rows per doc and NOTHING shuffles; at 100 TB the chunk
    table partitions by doc hash exactly like its input. Tokens keep
    their original case — a retrieval chunker must not normalize the
    text it re-emits (unlike the counting paths in
    extensions/vocab.py, which lower)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.col("text"), r"\s+"), lambda x: x != F.lit("")
    )
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0),
        F.greatest(n - 1, F.lit(0)),
        F.lit(CHUNK_STRIDE),
    )
    return (
        d.select(
            "doc_id",
            toks.alias("toks"),
            n.alias("n_tokens"),
            F.explode(starts).alias("start"),
        )
        .filter((F.col("start") == 0) | (F.col("start") < F.col("n_tokens")))
        .select(
            "doc_id",
            (F.col("start") / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
            "start",
            F.least(
                F.lit(CHUNK_WINDOW), F.col("n_tokens") - F.col("start")
            ).cast("bigint").alias("chunk_len"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, F.lit(CHUNK_WINDOW)),
                " ",
            ).alias("chunk_text"),
        )
    )


ORACLE_SLIDING_CHUNKS_DOCUMENTS = rf"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
),
sized AS (
  SELECT doc_id, toks, len(toks) AS n_tokens FROM tok
),
starts AS (
  SELECT doc_id, toks, n_tokens, unnest(
           range(0, greatest(n_tokens, 1), {CHUNK_STRIDE})) AS start
  FROM sized
)
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       start,
       CAST(least({CHUNK_WINDOW}, n_tokens - start) AS BIGINT) AS chunk_len,
       array_to_string(toks[start + 1 : start + {CHUNK_WINDOW}], ' ')
         AS chunk_text
FROM starts
WHERE start = 0 OR start < n_tokens
"""

QUERIES["sliding_chunks_documents"] = q_sliding_chunks_documents
ORACLES["sliding_chunks_documents"] = ORACLE_SLIDING_CHUNKS_DOCUMENTS
