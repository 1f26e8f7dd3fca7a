"""Distributed quality-classifier training (logistic regression on
hashed bag-of-words) — the data-filtering model the GPT-3/LLaMA/CCNet
pipelines train to score web documents against a curated reference
(cf. Brown et al. 2020 §A; Touvron et al. 2023 data section), run
entirely as DataFrame aggregates.

Shape at 100 TB:

- Features are HASHED token indices (`xxhash64 % dim`) — no vocab
  build, no fit pass, the fastText/feature-hashing trick.
- The model is a (idx, weight) table of at most ``dim`` rows (KBs),
  broadcast into each scoring/gradient pass.
- One gradient-descent iteration = per-row margins (a map-literal
  fold of the row's own index array for models ≤ INLINE_MODEL_MAX —
  zero exchanges — else explode→broadcast-join→keyed agg), one keyed
  agg for the per-index gradient, and a ≤``dim``-row collect to
  update the model (the IVF-trainer bounded-collect pattern: model
  state is driver data, corpus never is).
- Scoring is the same join+agg without the gradient — embarrassingly
  parallel, one keyed exchange.

Everything is float64 DataFrame arithmetic; no Python UDFs, no MLlib.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 1024
MAX_MODEL_ROWS = 1_000_000  # hard cap on the per-iteration collect

# Training-loop margin evaluation: models at or below this many active
# indices are inlined into the scoring expression as a map LITERAL
# (z = fold over the row's own index array, zero exchanges), larger
# models fall back to the explode -> broadcast-join -> keyed-agg plan
# (_margins). The literal path removes two shuffles and a broadcast
# per GD iteration; the bound keeps the expression tree a few
# thousand nodes so planning stays O(ms) — past it the model is real
# broadcast material, which is exactly what _margins does.
INLINE_MODEL_MAX = 4096


def hashed_token_features(
    df: DataFrame,
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    out_col: str = "f_idx",
) -> DataFrame:
    """Distinct hashed token indices per row (binary bag-of-words in
    [0, dim)). Row-local codegen: split → hash → pmod → distinct."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    idxs = F.array_distinct(
        F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(dim)))
    )
    return df.withColumn(out_col, idxs)


def _inline_margin(
    features_col: str, w_now: dict[int, float], bias: float
) -> F.Column:
    """z = bias + Σ w[idx] as a single row-local expression: the
    driver-held model becomes a map literal and the row's index array
    is folded over it (missing indices contribute 0.0; a NULL index
    array scores bias alone, matching _margins' explode_outer). Only
    safe for small models (INLINE_MODEL_MAX) — the caller falls back
    to the broadcast-join plan past that."""
    if not w_now:
        return F.lit(float(bias))
    wmap = F.create_map(
        *[
            x
            for k, v in w_now.items()
            for x in (F.lit(int(k)), F.lit(float(v)))
        ]
    )
    z = F.aggregate(
        F.col(features_col),
        F.lit(float(bias)),
        lambda acc, i: acc + F.coalesce(wmap[i], F.lit(0.0)),
    )
    return F.coalesce(z, F.lit(float(bias)))


def _margins(
    feats: DataFrame,
    weights: DataFrame,
    id_col: str,
    features_col: str,
    bias: float,
) -> DataFrame:
    """Per-row raw margin z = b + Σ w[idx] via explode → broadcast
    model join → keyed sum. Rows with no known feature still score
    (left join + coalesce)."""
    exploded = feats.select(
        id_col, F.explode_outer(features_col).alias("idx")
    )
    scored = exploded.join(F.broadcast(weights), "idx", "left")
    return scored.groupBy(id_col).agg(
        (F.sum(F.coalesce(F.col("w"), F.lit(0.0))) + F.lit(bias)).alias("z")
    )


def train_logreg_hashed(
    feats: DataFrame,
    id_col: str,
    features_col: str,
    label_col: str,
    iters: int = 8,
    lr: float = 0.5,
) -> tuple[DataFrame, float]:
    """Batch-gradient-descent logistic regression over hashed
    features. Returns the (idx, w) model DataFrame and the bias.

    Per iteration the driver sees only the ≤|active indices| gradient
    rows (capped at MAX_MODEL_ROWS — raises beyond it, the documented
    bounded-collect contract) and one bias scalar; the corpus itself
    never leaves the executors. ``localCheckpoint`` is unnecessary:
    each iteration's lineage is one join+agg over the cached feature
    table, not a recursive plan."""
    spark = feats.sparkSession
    feats = feats.select(
        id_col, features_col, F.col(label_col).cast("double").alias("_y")
    )
    feats.persist()
    try:
        weights = spark.createDataFrame([], "idx long, w double")
        bias = 0.0
        w_now: dict[int, float] = {}
        n = feats.count()
        for _ in range(iters):
            if len(w_now) <= INLINE_MODEL_MAX:
                # The model lives on the driver between iterations, so
                # a small one can be INLINED into the margin expression
                # instead of joined: z folds the row's own index array
                # over a map literal — no explode of the corpus, no
                # join, no doc-keyed re-aggregation shuffle. Same
                # margins up to float-sum ORDER (the fold adds weights
                # in array order; the join path summed in partition
                # order), which the GD fixpoint and every gate margin
                # tolerate by construction. Measured on the sf0.1 gate:
                # 2.2x end to end (8 iterations, 3 exchanges -> 1 per
                # iteration; plans/r14/logreg_quality_planted_*.txt).
                err = feats.select(
                    id_col,
                    features_col,
                    (
                        F.lit(1.0)
                        / (
                            F.lit(1.0)
                            + F.exp(
                                -_inline_margin(
                                    features_col, w_now, bias
                                )
                            )
                        )
                        - F.col("_y")
                    ).alias("_err"),
                )
            else:
                m = _margins(feats, weights, id_col, features_col, bias)
                err = feats.join(m, id_col).select(
                    id_col,
                    features_col,
                    (
                        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
                        - F.col("_y")
                    ).alias("_err"),
                )
            # ONE aggregate serves both gradients: index -1 (appended
            # to every row) accumulates the bias gradient alongside
            # the feature gradients — one job per iteration, not
            # three. limit() bounds the collect without a separate
            # count job; driver weights are carried in Python (they
            # ARE the model state), not re-collected.
            with_bias = F.concat(
                F.col(features_col), F.array(F.lit(-1).cast("long"))
            )
            grad = (
                err.select(F.explode(with_bias).alias("idx"), "_err")
                .groupBy("idx")
                .agg(F.sum("_err").alias("g"))
            )
            g_list = grad.limit(MAX_MODEL_ROWS + 1).collect()
            if len(g_list) > MAX_MODEL_ROWS:
                raise ValueError(
                    f"model too large to collect: > {MAX_MODEL_ROWS} "
                    "active indices; lower dim or shard the model"
                )
            for r in g_list:
                if r.idx == -1:
                    bias -= lr * r.g / n
                else:
                    w_now[r.idx] = w_now.get(r.idx, 0.0) - lr * r.g / n
            weights = spark.createDataFrame(
                [(int(k), float(v)) for k, v in w_now.items()],
                "idx long, w double",
            )
        return weights, bias
    finally:
        feats.unpersist()


def predict_logreg(
    feats: DataFrame,
    weights: DataFrame,
    id_col: str,
    features_col: str,
    bias: float,
) -> DataFrame:
    """Score rows with the trained model: returns (id, z, y_pred)."""
    m = _margins(feats, weights, id_col, features_col, bias)
    return m.select(
        id_col, "z", (F.col("z") > 0.0).cast("int").alias("y_pred")
    )
