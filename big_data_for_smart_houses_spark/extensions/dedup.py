"""Deduplication operators for document corpora (SURVEY.md §7.4).

Five families, all partition-parallel with no driver collects:

- exact: hash-groupBy on a normalized fingerprint (one shuffle).
- n-gram Jaccard: shingle-explode + self-join on shingle — only pairs
  sharing >=1 shingle ever materialize, which is the scalable blocking
  (no all-pairs cross join at any scale).
- MinHash + LSH: k hash functions over shingles -> per-doc signature ->
  band-hash buckets -> candidate pairs from bucket self-join. The
  classic sub-quadratic near-dup path for 100 TB corpora.
- SimHash: per-token hash bit-vote -> 64-bit fingerprint -> banded
  blocking (hamming <= 3 guarantees a shared 16-bit band by pigeonhole).
- embedding cosine: see extensions/similarity.py (near-dup threshold
  variant exposed in queries/extensions.py).

Everything is built-in expressions (xxhash64, explode, groupBy) — no
Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, normalized

# Deterministic MinHash parameters: k independent 64-bit hash
# functions h_i(x) = xxhash64(xxhash64(x), i). Rehashing the base
# hash with the function index is ANSI-safe — the classic affine
# permutation a_i·h + b_i mod p overflows 64-bit multiplication for
# nearly every hash value, which silently wraps with ANSI off and
# throws ARITHMETIC_OVERFLOW under Spark 4's default
# spark.sql.ansi.enabled=true. Fixed scheme => reproducible
# signatures.
MINHASH_K = 16
LSH_BANDS = 4
LSH_ROWS = MINHASH_K // LSH_BANDS

# 64-bit fingerprints with 4 x 16-bit bands. Width matters for SCALE,
# not just precision: banded blocking puts two docs in a candidate
# bucket iff they agree on a full band, and real corpora have
# correlated token distributions — with 8-bit bands the hot bucket
# held ~17% of a 5k-doc corpus (sum m^2 ~ 5.5M candidate pairs,
# quadratic blowup); 16-bit bands require agreeing on twice the bits
# and collapse the hot buckets while the hamming<=3 pigeonhole
# guarantee (<=3 flipped bits cannot touch all 4 bands) is unchanged.
SIMHASH_BITS = 64
SIMHASH_BAND_BITS = 16
SIMHASH_BANDS = SIMHASH_BITS // SIMHASH_BAND_BITS


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one hash
    aggregation keyed by md5 — at 100 TB this shuffles only
    (fingerprint, id), never the documents."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_against_history(
    new_docs: DataFrame,
    history_fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental-ingestion dedup: drop new documents whose normalized
    fingerprint already exists in the historical fingerprint store
    (a 1-column `fp` DataFrame — persist `exact_dedup(...)['fp']` per
    batch and union/compact over time), then dedup within the batch.

    This is the production shape for continuous corpus growth: the
    history side carries only fingerprints (16 bytes/doc — billions of
    docs fit in a few tens of GB, a shuffle join; broadcast when it
    still fits), and the new batch is scanned once. Returns the
    surviving new rows with their fingerprint attached so the caller
    can append them to the store."""
    from pyspark.sql import Window

    fps = new_docs.withColumn("fp", fingerprint(F.col(text_col)))
    fresh = fps.join(
        history_fps.select("fp").distinct(), "fp", "left_anti"
    )
    w_first = F.row_number().over(
        Window.partitionBy("fp").orderBy(F.col(id_col))
    )
    return fresh.withColumn("_rn", w_first).filter(F.col("_rn") == 1).drop("_rn")


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (id, shingle)."""
    toks = F.split(normalized(F.col(text_col)), " ")
    # guard: sequence(0, negative) would descend for docs shorter than n
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing at least
    one shingle. The shingle self-join IS the blocking: pair cost is
    proportional to shared-shingle count, not |docs|² — the standard
    scalable exact-verification step after LSH candidate generation."""
    # lazy lineage cut: the shingle stream feeds both the size
    # aggregate and the bucket pairing — materialize once instead of
    # re-tokenizing twice (round 14, ~15% on the sf0.1 gate)
    sh = shingles(df, id_col, text_col, n).localCheckpoint(eager=False)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    # pairs per shingle bucket via collect_list instead of a self-join:
    # one aggregation instead of recomputing the shingle subtree twice,
    # and bucket size is directly capped/inspectable at scale
    inter = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(_pairs_expr("ids")).alias("p"))
        .groupBy(F.col("p.a").alias("id1"), F.col("p.b").alias("id2"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    s1 = sizes.select(F.col(id_col).alias("id1"), F.col("set_size").alias("size1"))
    s2 = sizes.select(F.col(id_col).alias("id2"), F.col("set_size").alias("size2"))
    return (
        inter.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("size1") + F.col("size2") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "n_inter", "size1", "size2", "jaccard")
    )


def _pairs_expr(arr_col: str) -> F.Column:
    """All ordered pairs (a<b) from a sorted array column, as native
    nested transforms — used to turn bucket membership lists into
    candidate pairs without a self-join."""
    return F.expr(
        f"flatten(transform({arr_col}, (x, i) -> "
        f"transform(slice({arr_col}, i + 2, size({arr_col}) - i - 1), "
        f"y -> struct(x AS a, y AS b))))"
    )


# Buckets larger than this are skipped by the LSH pair generators: a
# bucket with m members emits m(m-1)/2 pairs, and at corpus scale a
# degenerate bucket (empty docs, boilerplate) would go quadratic. The
# skipped bucket is recoverable by exact dedup on the fingerprint.
MAX_BUCKET_SIZE = 10_000


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-document MinHash signature: explode shingles once, take k
    independent-hash minimums in a single groupBy (k min-aggregates —
    one shuffle of (id, hash), map-side combined). Each h_i rehashes
    the base shingle hash with the function index
    (xxhash64(h, i) — 12 bytes, far cheaper than rehashing the
    string k times), avoiding any 64-bit multiply so the operator is
    ANSI-mode safe."""
    sh = shingles(df, id_col, text_col, n).withColumn(
        "h", F.xxhash64("shingle")
    )
    aggs = [
        F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"sig_{i}")
        for i in range(MINHASH_K)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_band_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, band_id, band_hash) rows — the LSH index content. This is
    ALSO the persistable band-bucket STORE for incremental ingestion:
    ~LSH_BANDS * 16 bytes per document, so billions of docs fit as an
    ordinary parquet table keyed on (band_id, band_hash)."""
    sig = minhash_signatures(df, id_col, text_col, n)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.col(f"sig_{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
                ).alias("band_hash"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    return sig.select(
        F.col(id_col), F.explode(bands).alias("band")
    ).select(id_col, "band.band_id", "band.band_hash")


def _bucket_pairs(exploded: DataFrame, id_col: str) -> DataFrame:
    return (
        exploded.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_BUCKET_SIZE))
        .select(F.explode(_pairs_expr("ids")).alias("p"))
        .select(F.col("p.a").alias("id1"), F.col("p.b").alias("id2"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """MinHash-LSH candidate pairs: signatures split into bands; docs
    colliding on any band hash become candidates. Sub-quadratic: the
    only join is a self-join on (band_id, band_hash) buckets."""
    return _bucket_pairs(minhash_band_rows(df, id_col, text_col, n), id_col)


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    band_store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Incremental near-dup candidates — the production mode for a
    continuously growing corpus, completing the exact-dedup
    counterpart :func:`dedup_against_history`: the history side is
    NEVER re-shingled or re-hashed. ``band_store`` is the persisted
    :func:`minhash_band_rows` output of all prior batches (append
    each batch's rows after processing); the new batch contributes

    * new-vs-new pairs via the usual capped bucket fold, and
    * new-vs-history pairs via ONE equi-join on (band_id, band_hash)
      — the store side shuffles only its matching band keys, and at
      100 TB the store is a bucketed table on exactly that key so
      even the shuffle is co-located.

    Candidate semantics are IDENTICAL to running
    :func:`minhash_lsh_pairs` over history + batch and keeping only
    pairs that touch the batch (same hash functions, same banding),
    which is what the recall gate asserts structurally. Pairs are
    canonical (id1 < id2) regardless of which side is older."""
    nb = minhash_band_rows(new_docs, id_col, text_col, n)
    within = _bucket_pairs(nb, id_col)
    cross = (
        nb.select(
            F.col(id_col).alias("_new_id"), "band_id", "band_hash"
        )
        .join(
            band_store.select(
                F.col(id_col).alias("_old_id"), "band_id", "band_hash"
            ),
            ["band_id", "band_hash"],
        )
        .filter(F.col("_new_id") != F.col("_old_id"))
        .select(
            F.least("_new_id", "_old_id").alias("id1"),
            F.greatest("_new_id", "_old_id").alias("id2"),
        )
        .distinct()
    )
    return within.unionByName(cross).distinct()


def boilerplate_ngram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_doc_freq: int = 3,
    frac_threshold: float = 0.5,
) -> DataFrame:
    """Cross-document repetition stats (the C4-style boilerplate rule):
    a word n-gram appearing in >= ``min_doc_freq`` distinct documents
    is boilerplate (navigation chrome, license headers, templated
    spam); each document reports how much of it is made of such
    n-grams and a drop flag at ``frac_threshold``.

    Per-document shingles are DISTINCT, so doc_freq counts documents,
    not occurrences. Scale shape mirrors TF-IDF's document-frequency
    join: one shingle-keyed aggregate (map-side combined), one join
    back (shingle-keyed shuffle — the n-gram vocabulary of a 100 TB
    corpus is far too big to broadcast), one per-doc aggregate.
    Documents shorter than ``n`` tokens have no shingles and are
    absent from the output (nothing to judge).

    ``boilerplate_frac`` is a single division of exact integers —
    deterministic, no quantization needed."""
    # lazy lineage cut: sh feeds both the DF aggregate and the join
    # back — tokenize once instead of twice (round 14, 0.69x on the
    # sf0.1 gate)
    sh = shingles(df, id_col, text_col, n).localCheckpoint(eager=False)
    doc_freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    per_doc = (
        sh.join(doc_freq, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("_df") >= min_doc_freq).cast("long")).alias(
                "n_boilerplate"
            ),
        )
    )
    frac = F.col("n_boilerplate") / F.col("n_shingles")
    return per_doc.withColumn("boilerplate_frac", frac).withColumn(
        "is_boilerplate", frac >= F.lit(frac_threshold)
    )


def dedup_groups(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs: every document gets a
    ``group_id`` — the minimum doc id reachable through the pair graph
    (its own id for singletons). This is the step that turns pairwise
    similarity into an actual dedup decision (keep ``group_id``, drop
    the rest), composable with any pair generator (jaccard, MinHash,
    SimHash, embedding LSH).

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels, converging in
    O(graph diameter) rounds — near-dup components are dense and
    shallow (diameter ≤ ~3), so this is 2-4 rounds in practice, with
    ``max_iterations`` as a hard stop. The per-round driver ``count``
    is a deliberate scalar convergence check (the same shape GraphX
    uses); all real work — the edge join and min-aggregate — stays
    distributed, and ``localCheckpoint`` cuts the growing lineage so
    round N does not replay rounds 1..N-1.

    Scale shape: propagation runs ONLY over nodes that appear in some
    pair — at 100 TB the dup-graph node set is a small fraction of the
    corpus, so each round's join touches |V(pairs)| rows, not the
    corpus. The corpus enters exactly once, at the end, via a single
    left join that labels singletons with their own id."""
    if max_iterations < 1:
        raise ValueError("dedup_groups needs max_iterations >= 1")
    # Lazy lineage cut on PAIRS first (round 15): the union below
    # references the pair generator TWICE (one branch per direction),
    # and union branches share no subtree — so materializing edges ran
    # the whole upstream generator (LSH banding + bucket agg + cosine
    # verify for semantic_dedup; bucket pairing + size joins for
    # jaccard) twice. Cutting at pairs computes it once; both branches
    # read the cached rows.
    pairs = pairs.select("id1", "id2").localCheckpoint(eager=False)
    # localCheckpoint on edges: the edge list joins into EVERY round —
    # without a lineage cut each round would re-run the whole upstream
    # pair generator (shingling + bucket joins), multiplying its cost
    # by the round count (measured 1.7x on the sf0.1 gate query). Lazy
    # (eager=False): each round's convergence count materializes the
    # round's state anyway, so the eager variant's extra
    # materialization job per round bought nothing (measured 0.82x).
    edges = (
        pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
        .union(pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst")))
        .localCheckpoint(eager=False)
    )
    # both directions are present, so src alone enumerates every
    # pair-graph node
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iterations):
        neigh = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("label").alias("dst_label")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_label").alias("neighbor_min"))
        )
        updated = labels.join(
            neigh.select(F.col("src").alias("id"), "neighbor_min"), "id", "left"
        ).select(
            "id",
            F.col("label").alias("old_label"),
            F.least(
                F.col("label"),
                F.coalesce(F.col("neighbor_min"), F.col("label")),
            ).alias("label"),
        ).localCheckpoint(eager=False)
        n_changed = updated.filter(F.col("label") < F.col("old_label")).count()
        labels = updated.select("id", "label")
        if n_changed == 0:
            break
    else:
        # A component with diameter > max_iterations would otherwise
        # silently return SPLIT groups — duplicate docs kept with no
        # signal. Surface it: the caller can raise max_iterations or
        # pre-contract the graph.
        raise RuntimeError(
            f"dedup_groups: min-label propagation did not converge in "
            f"{max_iterations} rounds ({n_changed} labels still "
            f"changing) — the pair graph has a component with diameter "
            f"> {max_iterations}; raise max_iterations"
        )
    return (
        corpus.select(F.col(id_col).alias("id"))
        .distinct()
        .join(labels, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("label"), F.col("id")).alias("group_id"),
        )
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, ±1 vote per bit,
    sign of the vote sum becomes the fingerprint bit. One explode +
    one groupBy with SIMHASH_BITS sum-aggregates.

    Scale note: this looks like a one-row-per-token shuffle, but it is
    not — all of a doc's exploded tokens land in the SAME map partition
    as the source row, so the partial HashAggregate collapses them to
    one 33-column row per doc BEFORE the exchange. Shuffle volume is
    ~docs x 264 B regardless of doc length. A zero-shuffle rewrite via
    ``F.aggregate`` over the token array was benchmarked 2x SLOWER
    (higher-order-function lambdas are interpreted per element; this
    path is whole-stage-codegen) — keep the explode form."""
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(normalized(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            (F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v_{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    # assemble via OR of shifted bits: bit 63 as a +(1<<63) literal
    # would overflow signed long, while shiftleft wraps into the sign
    # bit by definition (no ANSI overflow check on shifts)
    fp = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        bit = (
            F.when(F.col(f"v_{i}") > 0, F.lit(1)).otherwise(F.lit(0))
        ).cast("long")
        fp = fp.bitwiseOR(F.shiftleft(bit, i))
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs with banded blocking: 4 bands of 16 bits —
    any pair within hamming distance 3 must agree on >=1 full band
    (pigeonhole), so the self-join runs on band buckets, never all
    pairs. See the SIMHASH_BITS note for why band width is a
    scale-safety parameter, not a tuning nicety."""
    fp = simhash_fingerprints(df, id_col, text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS)
                .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                .alias("band_val"),
            )
            for b in range(SIMHASH_BANDS)
        ]
    )
    exploded = fp.select(id_col, "simhash", F.explode(bands).alias("band")).select(
        id_col, "simhash", "band.band_id", "band.band_val"
    )
    cand = (
        exploded.groupBy("band_id", "band_val")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("id"), "simhash"))
            ).alias("members")
        )
        .filter((F.size("members") > 1) & (F.size("members") <= MAX_BUCKET_SIZE))
        .select(F.explode(_pairs_expr("members")).alias("p"))
        .select(
            F.col("p.a.id").alias("id1"),
            F.col("p.b.id").alias("id2"),
            F.col("p.a.simhash").alias("sh1"),
            F.col("p.b.simhash").alias("sh2"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# Edit-distance near-dup: prefix/suffix blocking + exact levenshtein
# ---------------------------------------------------------------------------

EDITDIST_BLOCK_CHARS = 8


def editdist_blocked_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 1,
    block_chars: int = EDITDIST_BLOCK_CHARS,
) -> DataFrame:
    """Edit-distance near-duplicate pairs — the dedup modality between
    exact (md5 fingerprint) and token-set (MinHash) similarity:
    catches single-character typos / OCR noise that flip the
    fingerprint but barely move the text, which shingle-level Jaccard
    is blind to.

    Recall guarantee (the gate invariant): an equal-length pair one
    SUBSTITUTION apart agrees on the full ``block_chars`` prefix or
    the full suffix (one edit cannot sit in both ends of a text
    >= 2*block_chars), so every such pair collides in at least one
    block — recall 1.0 structurally, same contract as the
    MinHash/SimHash recall gates.

    Never all-pairs: candidates come only from (block key, length)
    buckets (capped at MAX_BUCKET_SIZE like the LSH paths — a
    degenerate shared prefix cannot quadratically explode); texts
    join back BY ID so buckets carry ids, not documents, and the
    exact ``levenshtein`` runs per candidate pair only.
    """
    t = F.col(text_col)
    keyed = df.select(
        F.col(id_col),
        F.concat_ws(
            "\x1f",
            F.lit("p"),
            F.substring(t, 1, block_chars),
            F.length(t).cast("string"),
        ).alias("_pre"),
        F.concat_ws(
            "\x1f",
            F.lit("s"),
            F.substring(t, -block_chars, block_chars),
            F.length(t).cast("string"),
        ).alias("_suf"),
    )
    blocks = keyed.select(
        id_col, F.explode(F.array("_pre", "_suf")).alias("_blk")
    )
    cand = (
        blocks.groupBy("_blk")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_BUCKET_SIZE))
        .select(F.explode(_pairs_expr("ids")).alias("p"))
        .select(F.col("p.a").alias("id1"), F.col("p.b").alias("id2"))
        .distinct()
    )
    t1 = df.select(F.col(id_col).alias("id1"), t.alias("_t1"))
    t2 = df.select(F.col(id_col).alias("id2"), t.alias("_t2"))
    return (
        cand.join(t1, "id1")
        .join(t2, "id2")
        .withColumn(
            "edit_dist", F.levenshtein("_t1", "_t2").cast("int")
        )
        .filter(F.col("edit_dist") <= max_dist)
        .select("id1", "id2", "edit_dist")
    )


def ppjoin_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Prefix-filtering exact set-similarity join (the All-Pairs /
    PPJoin candidate scheme of Bayardo et al. WWW'07 / Xiao et al.
    WWW'08 — public algorithms).

    Same output contract as :func:`ngram_jaccard_pairs` (every pair
    with shingle-set Jaccard >= threshold), but candidate generation
    touches only each set's PREFIX — the ``p = |s| - ceil(t*|s|) + 1``
    globally-rarest shingles under a (document-frequency, shingle)
    total order — instead of all shingles:

    * prefix filter: two sets with ``J >= t`` must share at least one
      prefix token (overlap >= ceil(t*max(|x|,|y|)) and the prefix
      keeps every token that could start such an overlap);
    * length filter: ``J >= t`` implies ``t*|x| <= |y| <= |x|/t``, so
      candidate pairs outside that band are dropped before
      verification.

    Verification recomputes the EXACT intersection via
    ``array_intersect`` on the full sorted shingle arrays, so the
    result is identical to the exhaustive shared-shingle join — which
    is exactly what the oracle replays, making the driver hash gate a
    proof of the prefix filter's completeness, not just of the
    verifier.

    Scale shape: one document-frequency aggregate (shingle-keyed, never
    broadcast), one per-doc window to rank tokens, a prefix-token
    equi-join (candidate volume ~ (1-t) fraction of the full blocking
    join), then an id-keyed join back to the packed shingle arrays.
    ``ceil(t*|s|)`` is guarded with a 1e-9 epsilon: double rounding of
    ``t*|s|`` UP past the true integer ceiling would shorten the prefix
    and silently break completeness (e.g. 0.8*5 -> 4.0000000000000002).
    """
    from pyspark.sql import Window

    # The shingle stream feeds THREE consumers (document frequencies,
    # the prefix ranking, the packed verification arrays); a lazy
    # lineage cut materializes it once instead of re-tokenizing the
    # corpus three times (round 14, measured 1.5x on the sf0.1 gate).
    sh = shingles(df, id_col, text_col, n).localCheckpoint(eager=False)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    # set_size shares the ranking window's id partitioning — one
    # window pass computes both, replacing the former groupBy + join
    # back (two operators and an exchange, round 14).
    w = Window.partitionBy(id_col)
    ranked = sh.join(freq, "shingle").select(
        id_col,
        "shingle",
        F.row_number().over(w.orderBy("_df", "shingle")).alias("_rn"),
        F.count(F.lit(1)).over(w).alias("set_size"),
    )
    prefix_len = (
        F.col("set_size")
        - F.ceil(F.lit(float(threshold)) * F.col("set_size") - F.lit(1e-9))
        + F.lit(1)
    )
    pref = ranked.filter(F.col("_rn") <= prefix_len).select(
        id_col, "shingle", "set_size"
    )
    p1 = pref.select(
        F.col(id_col).alias("id1"),
        F.col("shingle"),
        F.col("set_size").alias("size1"),
    )
    p2 = pref.select(
        F.col(id_col).alias("id2"),
        F.col("shingle"),
        F.col("set_size").alias("size2"),
    )
    cand = (
        p1.join(p2, "shingle")
        .filter(
            (F.col("id1") < F.col("id2"))
            # length filter: t*max(s1,s2) <= min(s1,s2), epsilon-guarded
            # the same way as the prefix length
            & (
                F.least("size1", "size2").cast("double")
                >= F.lit(float(threshold))
                * F.greatest("size1", "size2").cast("double")
                - F.lit(1e-9)
            )
        )
        .select("id1", "id2", "size1", "size2")
        .distinct()
    )
    packed = sh.groupBy(id_col).agg(
        F.sort_array(F.collect_list("shingle")).alias("_toks")
    )
    a1 = packed.select(F.col(id_col).alias("id1"), F.col("_toks").alias("_t1"))
    a2 = packed.select(F.col(id_col).alias("id2"), F.col("_toks").alias("_t2"))
    return (
        cand.join(a1, "id1")
        .join(a2, "id2")
        .withColumn(
            "n_inter", F.size(F.array_intersect("_t1", "_t2")).cast("long")
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("size1") + F.col("size2") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "n_inter", "size1", "size2", "jaccard")
    )


def _deletion_keys(t: F.Column) -> F.Column:
    """The SymSpell blocking-key set of a string: itself plus every
    single-character deletion. ONE definition shared by the miner
    (:func:`deletion_neighborhood_pairs`) and the over-cap report
    (:func:`deletion_neighborhood_overcap`) — the report is only a
    faithful statement of the miner's completeness precondition
    while the two key derivations are byte-identical, so they must
    not be separately editable."""
    return F.array_distinct(
        F.concat(
            F.array(t),
            F.transform(
                F.sequence(F.lit(1), F.length(t)),
                lambda i: F.concat(
                    F.substring(t, F.lit(1), i - 1),
                    F.substring(t, i + 1, F.length(t)),
                ),
            ),
        )
    )


def deletion_neighborhood_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    on_overcap: str = "error",
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> DataFrame:
    """COMPLETE edit-distance-1 pair mining via SymSpell-style
    deletion neighborhoods (Garbe's symmetric delete algorithm,
    public): each string's blocking keys are itself plus every
    single-character deletion, so any two DISTINCT strings within one
    edit share a key structurally —

    * substitution at position i: deleting i from each side yields
      the SAME string, present in both neighborhoods;
    * insertion/deletion (lengths differ by 1): the shorter string IS
      a member of the longer one's deletion neighborhood and of its
      own (identity key);
    * equal strings share the identity key.

    This closes the recall hole :func:`editdist_blocked_pairs`
    documents honestly but cannot avoid: its (prefix|suffix, LENGTH)
    blocks can never collide strings of different lengths, so
    insert/delete typos are invisible there. Here completeness is by
    construction, gated against an exhaustive O(n^2) oracle join
    (queries/extensions.py:edit1_neighborhood_customer).

    Scale shape (100 TB): a string of length L emits L+1 keys — the
    corpus explodes ~|text|-fold into (key, id) rows, shuffles ONCE
    on the key, and buckets are capped at ``max_bucket_size`` like
    every LSH path (a degenerate shared neighborhood cannot go
    quadratic); the exact ``levenshtein`` verification runs per
    CANDIDATE pair only, never all-pairs. Intended for short join
    keys (names, SKUs, emails — entity resolution), not documents:
    neighborhood fan-out is linear in string length, so
    shingle/MinHash modalities stay the right tool above ~100 chars.

    Because the function advertises COMPLETENESS, an over-cap bucket
    must not vanish silently (round-10 advice): ``on_overcap='error'``
    (default) plants an in-plan ``raise_error`` on the bucket branch
    actually consumed downstream — prune-proof, zero cost on the
    happy path — so a degenerate hot key fails the job loudly with
    the key and its size; ``on_overcap='drop'`` restores the capped
    LSH-style behavior for scale runs that prefer bounded work over
    completeness, with :func:`deletion_neighborhood_overcap` as the
    companion report that makes the dropped precondition observable.
    """
    if on_overcap not in ("error", "drop"):
        raise ValueError(f"on_overcap must be error|drop: {on_overcap}")
    blocks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_deletion_keys(F.col(text_col))).alias("_k"),
    )
    buckets = blocks.groupBy("_k").agg(
        F.sort_array(F.collect_set("_id")).alias("_ids0")
    )
    if on_overcap == "error":
        # the guard lives INSIDE the ids expression the pair
        # generator consumes, so column pruning can never eliminate
        # it; raise_error's NullType coerces to the array branch
        ids = F.when(
            F.size("_ids0") > max_bucket_size,
            F.raise_error(
                F.concat(
                    F.lit(
                        "deletion_neighborhood_pairs: bucket over "
                        f"cap ({max_bucket_size}) — completeness "
                        "precondition violated by key '"
                    ),
                    F.col("_k"),
                    F.lit("' with "),
                    F.size("_ids0").cast("string"),
                    F.lit(
                        " members; rerun with on_overcap='drop' to "
                        "accept capped recall"
                    ),
                )
            ),
        ).otherwise(F.col("_ids0"))
    else:
        ids = F.when(
            F.size("_ids0") <= max_bucket_size, F.col("_ids0")
        )
    cand = (
        buckets.select(ids.alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(_pairs_expr("ids")).alias("p"))
        .select(F.col("p.a").alias("id1"), F.col("p.b").alias("id2"))
        .distinct()
    )
    t1 = df.select(
        F.col(id_col).alias("id1"), F.col(text_col).alias("_t1")
    )
    t2 = df.select(
        F.col(id_col).alias("id2"), F.col(text_col).alias("_t2")
    )
    return (
        cand.join(t1, "id1")
        .join(t2, "id2")
        .withColumn(
            "edit_dist", F.levenshtein("_t1", "_t2").cast("bigint")
        )
        .filter(F.col("edit_dist") <= 1)
        .select("id1", "id2", "edit_dist")
    )


def deletion_neighborhood_overcap(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> DataFrame:
    """The observable form of the completeness precondition
    :func:`deletion_neighborhood_pairs` relies on: every deletion
    key shared by more than ``max_bucket_size`` strings, with its
    member count. Empty result == the 'error' mode cannot fire and
    'drop' mode drops nothing; a non-empty result names exactly the
    hot keys whose pairs a capped run loses. Same single shuffle
    shape as the miner (explode -> groupBy key), count-only agg —
    cheap enough to run as a pre-flight check at any scale."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(_deletion_keys(F.col(text_col))).alias("key"),
        )
        .groupBy("key")
        .agg(F.count_distinct("_id").alias("n_members"))
        .filter(F.col("n_members") > max_bucket_size)
        .select("key", "n_members")
    )
