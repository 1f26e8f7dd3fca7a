"""Similarity search over an embedding column (SURVEY.md §7.4).

- Brute-force cosine top-k: correctness baseline. The query set is
  broadcast; the corpus is scanned once, fully partition-parallel;
  per-query top-k via window rank (at true scale: per-partition top-k
  then merge — Spark's TakeOrdered shape).
- Random-hyperplane LSH ANN: the scale path — bucket the corpus by
  sign-pattern, search only the query's bucket (and optionally
  neighboring buckets). Hyperplanes are fixed pseudo-random constants,
  so results are deterministic and the bucket assignment is a pure
  column expression (no Python, no model state).

The dot products run as JVM higher-order functions (zip_with +
aggregate) over double-cast arrays — sequential fold, bit-stable, no
Pandas UDF needed at 64 dims.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EMBEDDING_DIM = 64
N_PLANES = 4
_rng = random.Random(20240613)
HYPERPLANES = [
    [_rng.uniform(-1.0, 1.0) for _ in range(EMBEDDING_DIM)] for _ in range(N_PLANES)
]

# Banded hyperplane LSH for PAIR MINING (near-dup detection), mirroring
# the MinHash band construction in extensions/dedup.py: B bands of R
# planes each; a pair becomes a candidate iff it agrees on every sign
# in at least one band. Recall for a pair with per-plane agreement
# probability p (p = 1 - angle/pi) is 1-(1-p^R)^B — structurally 1.0
# for exact duplicates; genuinely distant pairs land in the same
# 2^R-bucket band with probability ~2^-R, keeping candidate generation
# sub-quadratic.
#
# The band count is chosen PER THRESHOLD at call time (more bands for
# lower thresholds, to hold recall >= NEARDUP_TARGET_RECALL at the
# threshold boundary). Below NEARDUP_MIN_THRESHOLD hyperplane LSH
# stops being a sensible plan at all: at cosine 0.7 a boundary pair
# agrees per plane with p ~ 0.75, so holding 95% recall needs ~30
# bands while random pairs collide per band at 2^-8 — the candidate
# set degenerates toward quadratic. That regime belongs to the exact
# neardup_pairs baseline or token-based (MinHash) blocking instead.
NEARDUP_ROWS = 8
NEARDUP_MIN_THRESHOLD = 0.95
NEARDUP_TARGET_RECALL = 0.95
NEARDUP_MAX_BANDS = 16
_rng_pairs = random.Random(20250813)
# Band-major generation: extending NEARDUP_MAX_BANDS appends new bands
# without changing existing ones (seeded stream prefix is stable).
PAIR_HYPERPLANES = [
    [
        [_rng_pairs.uniform(-1.0, 1.0) for _ in range(EMBEDDING_DIM)]
        for _ in range(NEARDUP_ROWS)
    ]
    for _ in range(NEARDUP_MAX_BANDS)
]


def neardup_bands_for(threshold: float) -> int:
    """Bands needed so a pair AT the threshold is recalled with
    probability >= NEARDUP_TARGET_RECALL: smallest B with
    1-(1-p^R)^B >= target, p = 1 - arccos(threshold)/pi."""
    import math

    p = 1.0 - math.acos(min(threshold, 1.0)) / math.pi
    band_hit = p**NEARDUP_ROWS
    if band_hit >= 1.0:
        return 1
    b = math.ceil(
        math.log(1.0 - NEARDUP_TARGET_RECALL) / math.log(1.0 - band_hit)
    )
    return max(1, min(b, NEARDUP_MAX_BANDS))


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query vector. The broadcast join is
    the right plan at any corpus size (query set is small); the rank
    window shuffles only (query_id, candidate, sim) triples."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = c.crossJoin(q).filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def neardup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs above a cosine threshold. Exact (quadratic) — the
    correctness baseline the LSH path is checked against; at scale the
    same output comes from lsh_bucket + within-bucket pairing."""
    a = corpus.select(
        F.col(id_col).alias("id1"), as_double(F.col(vec_col)).alias("v1")
    )
    b = corpus.select(
        F.col(id_col).alias("id2"), as_double(F.col(vec_col)).alias("v2")
    )
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select("id1", "id2", cosine(F.col("v1"), F.col("v2")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def _band_signature(vec: Column, planes: list[list[float]]) -> Column:
    """R-bit sign pattern of ``vec`` against one band's planes."""
    sig = F.lit(0)
    for r, plane in enumerate(planes):
        p = F.lit(plane)  # single array literal: one py4j call, not dim
        sig = sig + F.when(dot(vec, p) >= 0, F.lit(1 << r)).otherwise(F.lit(0))
    return sig


def neardup_pairs_lsh(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs above a cosine threshold via banded-LSH candidate
    generation + exact cosine verification — the scale path that
    replaces the O(n²) :func:`neardup_pairs` plan.

    Each vector emits one (band_id, signature) bucket key per band;
    candidate pairs come from within-bucket pairing (bucket size
    capped, as in the MinHash/SimHash generators), then every
    candidate is verified with the exact cosine — so precision is
    exact and only recall is approximate (1-(1-p^R)^B, structurally
    1.0 for exact duplicates since every band matches). At 100 TB the
    shuffle is B× the corpus (vectors ride along to the buckets,
    avoiding two corpus-wide join-backs) and pair cost is
    ~B·Σ_bucket m², never n².

    ``threshold`` must be >= NEARDUP_MIN_THRESHOLD — below it the
    hyperplane family can't hold recall without a near-quadratic band
    count (see the constant's comment); use the exact
    :func:`neardup_pairs` or MinHash blocking for that regime. The
    band count is derived from the threshold so recall at the boundary
    is >= NEARDUP_TARGET_RECALL. Buckets larger than MAX_BUCKET_SIZE
    are dropped from pairing (they'd be quadratic hot spots); use
    :func:`neardup_bucket_stats` on the same corpus to count/inspect
    any such buckets rather than trusting silence."""
    from .dedup import MAX_BUCKET_SIZE, _pairs_expr

    if threshold < NEARDUP_MIN_THRESHOLD:
        raise ValueError(
            f"neardup_pairs_lsh supports threshold >= "
            f"{NEARDUP_MIN_THRESHOLD} (got {threshold}): at lower "
            f"thresholds hyperplane-LSH recall collapses (~30 bands "
            f"for 95% recall at 0.7 while candidates go quadratic). "
            f"Use neardup_pairs (exact) or MinHash blocking instead."
        )
    n_bands = neardup_bands_for(threshold)
    v = corpus.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                _band_signature(F.col("v"), PAIR_HYPERPLANES[b]).alias("sig"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = v.select(
        "id", "v", F.explode(bands).alias("band")
    ).select("id", "v", "band.band_id", "band.sig")
    return (
        exploded.groupBy("band_id", "sig")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("id"), F.col("v")))
            ).alias("members")
        )
        .filter((F.size("members") > 1) & (F.size("members") <= MAX_BUCKET_SIZE))
        .select(F.explode(_pairs_expr("members")).alias("p"))
        .select(
            F.col("p.a.id").alias("id1"),
            F.col("p.b.id").alias("id2"),
            cosine(F.col("p.a.v"), F.col("p.b.v")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .distinct()
    )


def neardup_bucket_stats(
    corpus: DataFrame,
    threshold: float = NEARDUP_MIN_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-band bucket-size distribution for the exact banding
    :func:`neardup_pairs_lsh` would use at ``threshold`` — the
    observability companion for its over-cap drop: one row per band
    with the bucket count, max bucket size, and how many buckets
    (and member vectors) exceed MAX_BUCKET_SIZE and would be skipped.
    Run it when a corpus is suspected of hot spots (duplicated zero
    vectors, constant embeddings) before trusting the pair output."""
    from .dedup import MAX_BUCKET_SIZE

    n_bands = neardup_bands_for(threshold)
    v = corpus.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                _band_signature(F.col("v"), PAIR_HYPERPLANES[b]).alias("sig"),
            )
            for b in range(n_bands)
        ]
    )
    sizes = (
        v.select(F.explode(bands).alias("band"))
        .groupBy("band.band_id", "band.sig")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    over = F.col("m") > MAX_BUCKET_SIZE
    return sizes.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("m").alias("max_bucket_size"),
        F.sum(over.cast("long")).alias("n_overcap_buckets"),
        F.sum(F.when(over, F.col("m")).otherwise(F.lit(0))).alias(
            "n_overcap_vectors"
        ),
    )


def lsh_bucket(vec: Column) -> Column:
    """Sign-pattern bucket id from N_PLANES fixed hyperplanes — a pure
    column expression, usable in both batch and streaming."""
    bucket = F.lit(0)
    for i, plane in enumerate(HYPERPLANES):
        p = F.lit(plane)  # single array literal: one py4j call, not dim
        bit = F.when(dot(vec, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


# Hard ceiling on rows ever collected for quantizer training — keeps
# the driver collect bounded no matter what sample_fraction resolves
# to at the actual corpus size.
_MAX_TRAIN_ROWS = 100_000


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
    seed: int = 20240613,
    max_iter: int = 5,
    tol: float = 1e-4,
) -> list[list[float]]:
    """Fit IVF cell centroids: ONE Spark job collects a bounded
    training sample to the driver, then Lloyd's algorithm runs in
    numpy there — the standard IVF coarse-quantizer design (FAISS
    trains its quantizer the same way: on a sample, off the engine).

    Why not distribute the fit? A coarse quantizer needs only a
    bounded sample (~100× n_cells rows), which fits in driver memory
    at ANY corpus size — 100k × 64 doubles is 51 MB; `sample_fraction`
    (and the unconditional `_MAX_TRAIN_ROWS` limit) bound the collect.
    Distributed alternatives measured far worse here: pyspark.ml
    KMeans pays ~5 s of class-loading + k-means|| init per session,
    and a DataFrame-native Lloyd loop pays ~2.5 s/iteration of plan
    build + scheduling for microseconds of actual math. Assignment at
    search time still covers every corpus row via the pure-expression
    scorer below.

    Init: rows sorted by a stable hash of the vector bytes, first
    n_cells — deterministic and decorrelated from storage order.
    Empty cells keep their previous centroid. Stops early when the max
    centroid shift drops below ``tol``. Returns plain python lists so
    cell assignment is a pure column expression (streaming-safe, no
    model object)."""
    import hashlib

    import numpy as np

    train = corpus
    if sample_fraction < 1.0:
        train = train.sample(fraction=sample_fraction, seed=seed)
    rows = (
        train.select(as_double(F.col(vec_col)).alias("v"))
        .limit(_MAX_TRAIN_ROWS)
        .collect()
    )
    x = np.array([r.v for r in rows], dtype=np.float64)
    if len(x) <= n_cells:
        return [list(map(float, v)) for v in x]

    def _key(v: np.ndarray) -> bytes:
        return hashlib.sha256(v.tobytes() + str(seed).encode()).digest()

    order = sorted(range(len(x)), key=lambda i: _key(x[i]))
    centroids = x[order[:n_cells]].copy()

    for _ in range(max_iter):
        # nearest centroid by L2 == argmax of dot(v,c) - |c|^2/2
        scores = x @ centroids.T - 0.5 * (centroids * centroids).sum(axis=1)
        assign = scores.argmax(axis=1)
        updated = centroids.copy()
        for cell in range(n_cells):
            members = x[assign == cell]
            if len(members):
                updated[cell] = members.mean(axis=0)
        shift = float(np.abs(updated - centroids).max())
        centroids = updated
        if shift < tol:
            break
    return [list(map(float, c)) for c in centroids]


def _cell_scores(vec: Column, centroids: list[list[float]]) -> Column:
    """Per-centroid assignment score: dot(v, c) - |c|^2/2 (argmax is
    equivalent to nearest-centroid by L2, minus the shared |v|^2)."""
    scores = []
    for c in centroids:
        carr = F.lit(c)  # single array literal: one py4j call, not dim
        half_norm2 = sum(x * x for x in c) / 2.0
        scores.append(dot(vec, carr) - F.lit(half_norm2))
    return F.array(*scores)


def ivf_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid cell id as a pure expression (0-based).

    Argmax via struct-max so the (n_cells x dim)-sized score expression
    appears ONCE in the plan — ``array_position(s, array_max(s))``
    embeds it twice, and HOF subtrees run interpreted (no codegen CSE),
    which doubled per-row assignment cost."""
    s = _cell_scores(vec, centroids)
    best = F.array_max(
        F.transform(
            s,
            lambda score, i: F.struct(
                score.alias("score"), i.cast("int").alias("cell")
            ),
        )
    )
    return best["cell"]


def _probe_cells(vec: Column, centroids: list[list[float]], n_probe: int) -> Column:
    """The n_probe nearest cell ids, via struct argsort."""
    s = _cell_scores(vec, centroids)
    ranked = F.reverse(
        F.array_sort(
            F.transform(
                s,
                lambda score, i: F.struct(
                    score.alias("score"), i.cast("int").alias("cell")
                ),
            )
        )
    )
    return F.transform(F.slice(ranked, 1, n_probe), lambda x: x["cell"])


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: the corpus is partitioned into Voronoi
    cells of the trained centroids; each query scans only its n_probe
    nearest cells. At 100 TB the corpus is written partitioned by cell
    once (write-side shuffle), after which every query batch touches
    n_probe/n_cells of the data — the classic inverted-file trade of
    recall vs scan fraction, tunable per query via n_probe."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cell", ivf_cell(F.col("cv"), centroids))
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("qv"),
        )
        .withColumn("probes", _probe_cells(F.col("qv"), centroids, n_probe))
        .select("query_id", "qv", F.explode("probes").alias("cell"))
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's hyperplane
    bucket, multi-probed to all buckets within hamming distance 1 of
    the query's sign pattern (recall boost at the cost of N_PLANES+1
    bucket lookups). The corpus side stays single-bucket: at 100 TB it
    is written bucket-partitioned once and each probe touches one
    partition — the IVF-style scale path."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("bucket", lsh_bucket(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket0", lsh_bucket(F.col("qv")))
    if multiprobe:
        probes = F.array(
            F.col("bucket0"),
            *[
                F.col("bucket0").bitwiseXOR(F.lit(1 << i))
                for i in range(N_PLANES)
            ],
        )
        q = q.select(
            "query_id", "qv", F.explode(probes).alias("bucket")
        )
    else:
        q = q.withColumnRenamed("bucket0", "bucket")
    q = F.broadcast(q)
    scored = c.join(q, "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = False,
) -> DataFrame:
    """Embedding-space dedup (the SemDeDup recipe): vectors whose
    cosine similarity reaches ``threshold`` are the same semantic
    content; connected components over the pair graph pick one keeper
    (the minimum id) per semantic cluster, and everything else is
    marked for drop.

    Composition of two already-scale-shaped pieces: pair generation
    (:func:`neardup_pairs_lsh` at scale — banded hyperplane candidates
    + exact verify, never all-pairs; the exact :func:`neardup_pairs`
    baseline when ``use_lsh=False``) and
    :func:`~..extensions.dedup.dedup_groups` (iterative min-label over
    pair-graph nodes only). The corpus is touched once per piece; no
    step is quadratic in corpus size on the LSH path.

    Output: one row per vector — ``group_id`` (min id of its semantic
    cluster, own id for singletons) and ``is_keeper``."""
    from .dedup import dedup_groups

    pair_fn = neardup_pairs_lsh if use_lsh else neardup_pairs
    pairs = pair_fn(
        corpus, threshold, id_col=id_col, vec_col=vec_col
    ).select("id1", "id2")
    groups = dedup_groups(corpus, pairs, id_col=id_col)
    return groups.withColumn(
        "is_keeper", F.col(id_col) == F.col("group_id")
    )


def group_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding centroids, fully distributed: one
    ``posexplode`` turns vectors into (group, dim, value) rows, one
    (group, dim)-keyed mean reduces them — the vector-aggregation
    primitive behind k-means/IVF centroid updates, class prototypes,
    and per-source embedding drift. Unlike ``train_ivf_centroids``
    (bounded-sample FAISS-style training, capped collect), this path
    never touches the driver and scales to any corpus: the shuffle
    carries |groups| × dim partial sums after map-side combine.

    Output is flat (group, dim, centroid) — the join-ready layout for
    assignment scoring; ``collect_list`` it back into vectors only at
    a bounded consumer.
    """
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.posexplode(as_double(F.col(vec_col))).alias("dim", "v"),
        )
        .groupBy("grp", "dim")
        .agg(F.avg("v").alias("centroid"))
        .select(F.col("grp").alias(group_col), "dim", "centroid")
    )
