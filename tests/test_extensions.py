"""Unit tests for the sketch-based extension operators that have no
DuckDB oracle: MinHash-LSH, SimHash, hyperplane-LSH ANN. Checked by
construction (planted duplicates must be found) and against the exact
brute-force baselines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_for_smart_houses_spark.extensions import dedup, similarity
from big_data_for_smart_houses_spark.queries.extensions import (
    PLANT_N,
    PLANT_OFFSET,
    TOPK_K,
    TOPK_QUERY_MAX_ID,
    _docs_with_planted_dups,
)
from big_data_for_smart_houses_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted(spark):
    return _docs_with_planted_dups(spark, SF_DIR).cache()


def test_minhash_finds_planted_duplicates(planted):
    pairs = dedup.minhash_lsh_pairs(planted)
    found = {
        (r.id1, r.id2)
        for r in pairs.filter(F.col("id2") >= PLANT_OFFSET).collect()
    }
    # every planted exact dup (jaccard 1.0) must collide in every band
    expected = {(i, i + PLANT_OFFSET) for i in range(PLANT_N)}
    assert expected <= found


def test_minhash_candidates_are_similar(planted):
    """LSH candidates cross-checked against exact jaccard: candidate
    precision need not be 1, but exact dups must dominate and random
    pairs must not flood the candidate set."""
    pairs = dedup.minhash_lsh_pairs(planted)
    n_pairs = pairs.count()
    # 50 planted dups; allow some false candidates but not a quadratic blowup
    assert PLANT_N <= n_pairs < 2000


def test_simhash_finds_planted_duplicates(planted):
    pairs = dedup.simhash_neardup_pairs(planted)
    found = {
        (r.id1, r.id2)
        for r in pairs.filter(F.col("id2") >= PLANT_OFFSET).collect()
    }
    expected = {(i, i + PLANT_OFFSET) for i in range(PLANT_N)}
    assert expected <= found
    # identical docs -> hamming 0
    zero = pairs.filter(
        (F.col("id2") == F.col("id1") + PLANT_OFFSET) & (F.col("hamming") == 0)
    ).count()
    assert zero >= PLANT_N


def test_ann_lsh_recall_vs_brute_force(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    exact = similarity.brute_force_topk(emb, queries, k=TOPK_K)
    approx = similarity.ann_lsh_topk(emb, queries, k=TOPK_K)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_rows = approx.collect()
    approx_set = {(r.query_id, r.neighbor_id) for r in approx_rows}
    assert len(approx_rows) > 0
    # ANN must return *some* true neighbors (8 hyperplanes on random
    # 64-d data is a coarse bucketing; exactness is not the contract)
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall > 0.3
    # every ANN neighbor must share the query's bucket by construction:
    # verify determinism instead — same call, same result
    rerun = {(r.query_id, r.neighbor_id) for r in
             similarity.ann_lsh_topk(emb, queries, k=TOPK_K).collect()}
    assert rerun == approx_set


def test_embedding_neardup_lsh_matches_brute_force(spark):
    """The gated banded-LSH near-dup path must reproduce the exact
    brute-force pair set at the gated threshold — LSH narrows
    candidates, exact cosine verification decides, so precision is
    exact and recall is checked here against the O(n²) baseline
    (which survives only as this cross-check)."""
    from big_data_for_smart_houses_spark.queries.extensions import (
        EMB_PLANT_N,
        EMB_PLANT_OFFSET,
        NEARDUP_LSH_THRESHOLD,
        _emb_with_planted_neardups,
    )

    corpus = _emb_with_planted_neardups(spark, SF_DIR).cache()
    exact = {
        (r.id1, r.id2)
        for r in similarity.neardup_pairs(
            corpus, threshold=NEARDUP_LSH_THRESHOLD
        ).collect()
    }
    lsh = {
        (r.id1, r.id2)
        for r in similarity.neardup_pairs_lsh(
            corpus, threshold=NEARDUP_LSH_THRESHOLD
        ).collect()
    }
    assert lsh == exact
    # and the answer is exactly the planted near-dups (cos ~0.9968)
    assert exact == {(i, i + EMB_PLANT_OFFSET) for i in range(EMB_PLANT_N)}


def test_dedup_groups_multihop_chain(spark):
    """Min-label propagation must traverse chains (a-b, b-c, c-d ->
    one component labeled by the smallest id), handle two disjoint
    components, and leave singletons labeled by themselves."""
    corpus = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 99]], ["doc_id"]
    )
    pairs = spark.createDataFrame(
        [(2, 3), (3, 4), (1, 2), (10, 11)], ["id1", "id2"]
    )
    got = {
        r.doc_id: r.group_id
        for r in dedup.dedup_groups(corpus, pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_minhash_signature_determinism(planted):
    sig1 = dedup.minhash_signatures(planted).orderBy("doc_id").limit(5).collect()
    sig2 = dedup.minhash_signatures(planted).orderBy("doc_id").limit(5).collect()
    assert sig1 == sig2


def test_multimodal_decode_metadata(spark):
    from big_data_for_smart_houses_spark.extensions import multimodal

    docs = spark.createDataFrame(
        [(0, "img payload"), (1, "audio payload"), (2, "video payload" * 10)],
        ["doc_id", "text"],
    )
    assets = multimodal.attach_payloads(docs)
    meta = {r.doc_id: r for r in multimodal.decode_metadata(assets).collect()}
    assert meta[0].modality == "image"
    assert meta[0].width is not None and meta[0].duration_ms is None
    assert meta[1].duration_ms == len("audio payload") * 10
    v = meta[2]
    assert v.n_frames == len("video payload" * 10) // 25
    assert v.width == 320 and v.height == 240


def test_multimodal_resize_plumbing(spark):
    from big_data_for_smart_houses_spark.extensions import multimodal

    docs = spark.createDataFrame(
        [(0, "x" * 10), (3, "y" * 9000)], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in multimodal.resize_images(
            multimodal.attach_payloads(docs), width=8, height=8
        ).collect()
    }
    # short payload zero-padded, long payload truncated — both 64 bytes
    assert len(out[0].payload) == 64 and len(out[3].payload) == 64
    assert bytes(out[0].payload[:10]) == b"x" * 10
    assert bytes(out[0].payload[10:]) == b"\0" * 54


def test_multimodal_frame_sampling_fanout(spark):
    from big_data_for_smart_houses_spark.extensions import multimodal

    # doc_id 2 -> video; 1000 bytes -> 40 frames -> sampled 0,10,20,30
    docs = spark.createDataFrame([(2, "z" * 1000)], ["doc_id", "text"])
    rows = multimodal.sample_frames(
        multimodal.attach_payloads(docs), every_n=10
    ).collect()
    assert [r.frame_index for r in sorted(rows, key=lambda r: r.frame_index)] == [
        0, 10, 20, 30,
    ]
    assert all(len(r.frame) == 25 for r in rows)


def test_ann_ivf_recall_vs_brute_force(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < TOPK_QUERY_MAX_ID)
    centroids = similarity.train_ivf_centroids(emb, n_cells=8)
    assert len(centroids) == 8 and len(centroids[0]) == 64
    exact = similarity.brute_force_topk(emb, queries, k=TOPK_K)
    approx = similarity.ann_ivf_topk(emb, queries, centroids, k=TOPK_K, n_probe=3)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(approx_set) > 0
    recall = len(exact_set & approx_set) / len(exact_set)
    # 3 of 8 Voronoi cells probed; nearest-cell locality must beat
    # the random-scan baseline (3/8) decisively
    assert recall > 0.5, recall
    # deterministic: same centroids -> same result
    rerun = {(r.query_id, r.neighbor_id)
             for r in similarity.ann_ivf_topk(emb, queries, centroids,
                                              k=TOPK_K, n_probe=3).collect()}
    assert rerun == approx_set


def test_dedup_groups_raises_on_non_convergence(spark):
    """A chain whose diameter exceeds max_iterations must raise, not
    silently return split components (duplicate docs kept unnoticed)."""
    ids = list(range(8))
    corpus = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    chain = spark.createDataFrame(
        [(i, i + 1) for i in ids[:-1]], ["id1", "id2"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dedup_groups(corpus, chain, max_iterations=2)
    # enough rounds: the same graph converges to one component
    got = {
        r.doc_id: r.group_id
        for r in dedup.dedup_groups(corpus, chain, max_iterations=10).collect()
    }
    assert set(got.values()) == {0}


def test_neardup_lsh_rejects_low_threshold(spark):
    emb = spark.createDataFrame(
        [(0, [1.0] * 4), (1, [1.0] * 4)], ["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="threshold >= 0.95"):
        similarity.neardup_pairs_lsh(emb, threshold=0.7)


def test_neardup_bands_for_recall_math():
    import math

    # boundary-pair recall with the chosen band count must clear the
    # target everywhere in the supported threshold range
    for t in (0.95, 0.97, 0.99, 0.999, 1.0):
        b = similarity.neardup_bands_for(t)
        assert 1 <= b <= similarity.NEARDUP_MAX_BANDS
        p = 1.0 - math.acos(min(t, 1.0)) / math.pi
        recall = 1.0 - (1.0 - p**similarity.NEARDUP_ROWS) ** b
        assert recall >= similarity.NEARDUP_TARGET_RECALL - 1e-12
    # lower thresholds need more bands
    assert similarity.neardup_bands_for(0.95) > similarity.neardup_bands_for(0.99)


def test_neardup_bucket_stats_counts_overcap(spark):
    from big_data_for_smart_houses_spark.extensions.dedup import (
        MAX_BUCKET_SIZE,
    )

    # a degenerate corpus: many copies of one vector -> one hot bucket
    # per band, over the cap -> stats must surface it
    n = MAX_BUCKET_SIZE + 5
    emb = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0] * 16) for i in range(n)],
        ["vec_id", "embedding"],
    )
    stats = similarity.neardup_bucket_stats(emb).collect()
    assert len(stats) == similarity.neardup_bands_for(
        similarity.NEARDUP_MIN_THRESHOLD
    )
    for r in stats:
        assert r.n_overcap_buckets == 1
        assert r.n_overcap_vectors == n
        assert r.max_bucket_size == n


def test_pagerank_matches_dense_reference(spark):
    """5-node weighted graph with a dangling node (id 4 has no
    out-edges): the distributed superstep must match a dense
    power-iteration reference including dangling-mass
    redistribution, and ranks must stay a probability distribution."""
    import numpy as np

    from big_data_for_smart_houses_spark.extensions.graph import pagerank

    edge_rows = [
        (0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0),
        (2, 0, 1.0), (3, 2, 1.0), (0, 4, 1.0),
    ]
    edges = spark.createDataFrame(
        edge_rows, "src long, dst long, w double"
    )
    got = {
        r.id: r.rank
        for r in pagerank(edges, weight="w", iterations=5).collect()
    }

    n, d = 5, 0.85
    out_w = {0: 4.0, 1: 1.0, 2: 1.0, 3: 1.0}
    rank = {i: 1.0 / n for i in range(n)}
    for _ in range(5):
        dm = sum(rank[i] for i in range(n) if i not in out_w)
        contrib = {i: 0.0 for i in range(n)}
        for s, t, w in edge_rows:
            contrib[t] += rank[s] * (w / out_w[s])
        rank = {
            i: (1 - d) / n + d * (contrib[i] + dm / n) for i in range(n)
        }
    assert set(got) == set(rank)
    for i in rank:
        assert abs(got[i] - rank[i]) < 1e-12, (i, got[i], rank[i])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_validates_args(spark):
    import pytest

    from big_data_for_smart_houses_spark.extensions.graph import pagerank

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(edges, iterations=0)
    with pytest.raises(ValueError):
        pagerank(edges, damping=1.0)


def test_pagerank_rejects_empty_edges(spark):
    import pytest

    from big_data_for_smart_houses_spark.extensions.graph import pagerank

    empty = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(empty)


def test_bfs_distances_hand_graph(spark):
    """Directed graph with a chain, a shortcut, a cycle, and an
    unreachable node: 0→1→2→3→4 (chain), 0→3 (shortcut: dist(3)=1,
    dist(4)=2 — the min-fold must prefer the shortcut even though the
    chain path also reaches them), 4→0 (cycle must not loop forever
    or lower the seed's 0), and 7→8 disconnected (never appears)."""
    from big_data_for_smart_houses_spark.extensions.graph import (
        bfs_distances,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (4, 0), (7, 8)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_hops=4).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}


def test_bfs_distances_hop_bound_truncates(spark):
    """max_hops is a hard frontier bound: on the 4-chain with
    max_hops=2 only nodes at dist <= 2 appear."""
    from big_data_for_smart_houses_spark.extensions.graph import (
        bfs_distances,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_hops=2).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2}


def test_triangle_count_k4_plus_pendant(spark):
    """K4 (4 triangles) plus a pendant edge (no new triangle):
    reversed duplicates and a self-loop must collapse into the simple
    undirected graph before counting."""
    from big_data_for_smart_houses_spark.extensions.graph import (
        triangle_count,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    edges = spark.createDataFrame(
        k4 + [(3, 9), (9, 3), (2, 2)], "src long, dst long"
    )
    row = triangle_count(edges).collect()[0]
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7  # 6 K4 edges + pendant
    assert row["n_triangles"] == 4


def test_triangle_count_triangle_free(spark):
    """A 4-cycle: all degrees equal so orientation falls back to id
    order, node 0 holds exactly one oriented wedge (1,3), and the
    missing 1-3 chord means zero triangles — the wedge is enumerated
    but never closed."""
    from big_data_for_smart_houses_spark.extensions.graph import (
        triangle_count,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3)], "src long, dst long"
    )
    row = triangle_count(edges).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 1


def test_bfs_distances_validates_args(spark):
    import pytest

    from big_data_for_smart_houses_spark.extensions.graph import (
        bfs_distances,
    )

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError):
        bfs_distances(edges, seeds, max_hops=0)


def test_cooccurrence_lift_hand_baskets(spark):
    """Baskets {a,b,c}, {a,b}, {a,d}, {b,c}: pair (a,b) n_ab=2,
    n_a=3, n_b=3, N=4 -> support 0.5, confidence 2/3, lift 8/9.
    Pairs seen once fall under min_pair_count=2; a duplicate item
    row within a basket must collapse before counting."""
    from big_data_for_smart_houses_spark.extensions.market import (
        cooccurrence_lift,
    )

    rows = [
        (1, "a"), (1, "b"), (1, "c"), (1, "a"),  # dup a collapses
        (2, "a"), (2, "b"),
        (3, "a"), (3, "d"),
        (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in cooccurrence_lift(df, "basket", "item").collect()
    }
    assert set(out) == {("a", "b"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab["n_ab"], ab["n_a"], ab["n_b"]) == (2, 3, 3)
    assert ab["support"] == 0.5
    assert ab["confidence"] == 2 / 3
    assert ab["lift"] == (2 * 4) / (3 * 3)


def test_cooccurrence_lift_basket_cap(spark):
    """max_basket_items drops jumbo baskets BEFORE pairing: with the
    cap at 2, the 3-item basket contributes no pairs and (a,b)
    drops below min_pair_count."""
    from big_data_for_smart_houses_spark.extensions.market import (
        cooccurrence_lift,
    )

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = cooccurrence_lift(
        df, "basket", "item", max_basket_items=2
    ).collect()
    assert out == []
    import pytest

    with pytest.raises(ValueError):
        cooccurrence_lift(df, "basket", "item", min_pair_count=0)


def test_triangle_count_matches_brute_force(spark):
    """Random-graph cross-check: the degree-oriented count must equal
    the O(n³) enumeration on seeded Erdős–Rényi graphs (including
    duplicate directed edges feeding the undirected collapse)."""
    import itertools
    import random

    from big_data_for_smart_houses_spark.extensions.graph import (
        triangle_count,
    )

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        n = 12
        und = {
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.35
        }
        # feed as directed edges with random orientation + some dups
        directed = [
            (b, a) if rng.random() < 0.5 else (a, b) for a, b in und
        ] + [(b, a) for a, b in list(und)[::3]]
        expected = sum(
            1
            for x, y, z in itertools.combinations(range(n), 3)
            if (x, y) in und and (y, z) in und and (x, z) in und
        )
        edges = spark.createDataFrame(directed, "src long, dst long")
        row = triangle_count(edges).collect()[0]
        assert row["n_triangles"] == expected, (seed, row, expected)
        assert row["n_edges"] == len(und)


def test_bfs_distances_matches_brute_force(spark):
    """Random-digraph cross-check: frontier BFS must equal a plain
    Python breadth-first search truncated at max_hops."""
    import random
    from collections import deque

    from big_data_for_smart_houses_spark.extensions.graph import (
        bfs_distances,
    )

    for seed in (3, 42):
        rng = random.Random(seed)
        n = 15
        edges = [
            (a, b)
            for a in range(n)
            for b in range(n)
            if a != b and rng.random() < 0.15
        ]
        seeds = [0, 7]
        adj: dict[int, list[int]] = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
        max_hops = 4
        expected = {s: 0 for s in seeds}
        dq = deque(seeds)
        while dq:
            u = dq.popleft()
            if expected[u] >= max_hops:
                continue
            for v in adj.get(u, []):
                if v not in expected:
                    expected[v] = expected[u] + 1
                    dq.append(v)
        e_df = spark.createDataFrame(edges, "src long, dst long")
        s_df = spark.createDataFrame([(s,) for s in seeds], "id long")
        got = {
            r["id"]: r["dist"]
            for r in bfs_distances(e_df, s_df, max_hops=max_hops).collect()
        }
        assert got == expected, (seed, got, expected)


def test_cooccurrence_matches_brute_force(spark):
    """Random-basket cross-check: counts and ratios must equal a
    plain Python pair counter."""
    import itertools
    import random
    from collections import Counter

    from big_data_for_smart_houses_spark.extensions.market import (
        cooccurrence_lift,
    )

    rng = random.Random(11)
    baskets = {
        b: sorted(rng.sample("abcdefgh", rng.randint(1, 5)))
        for b in range(30)
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    n = len(baskets)
    item_c = Counter(i for items in baskets.values() for i in set(items))
    pair_c = Counter(
        p
        for items in baskets.values()
        for p in itertools.combinations(sorted(set(items)), 2)
    )
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in cooccurrence_lift(df, "basket", "item").collect()
    }
    expected = {p for p, c in pair_c.items() if c >= 2}
    assert set(got) == expected
    for p, r in got.items():
        a, b = p
        assert r["n_ab"] == pair_c[p]
        assert (r["n_a"], r["n_b"]) == (item_c[a], item_c[b])
        assert r["lift"] == (pair_c[p] * n) / (item_c[a] * item_c[b])


def test_sssp_weighted_matches_brute_force(spark):
    """Random weighted-digraph cross-check: frontier Bellman-Ford
    must equal an exhaustive ≤max_rounds-edge path relaxation in
    plain Python (the fixed-round invariant the gate relies on)."""
    import random

    from big_data_for_smart_houses_spark.extensions.graph import (
        sssp_weighted,
    )

    for seed in (5, 23):
        rng = random.Random(seed)
        n = 14
        edges = [
            (a, b, 1 + rng.randrange(6))
            for a in range(n)
            for b in range(n)
            if a != b and rng.random() < 0.18
        ]
        seeds = [0, 9]
        max_rounds = 4
        # dist_k[v] = min weight over paths from seeds with <= k edges
        INF = float("inf")
        dist = {v: (0 if v in seeds else INF) for v in range(n)}
        for _ in range(max_rounds):
            nxt = dict(dist)
            for a, b, w in edges:
                if dist[a] + w < nxt[b]:
                    nxt[b] = dist[a] + w
            dist = nxt
        expected = {v: d for v, d in dist.items() if d < INF}
        e_df = spark.createDataFrame(edges, "src long, dst long, w long")
        s_df = spark.createDataFrame([(s,) for s in seeds], "id long")
        got = {
            r["id"]: r["dist"]
            for r in sssp_weighted(
                e_df, s_df, max_rounds=max_rounds
            ).collect()
        }
        assert got == expected, (seed, got, expected)


def test_sssp_weighted_parallel_edges_take_min(spark):
    """Duplicate (src,dst) edges fold to the cheapest weight before
    relaxation, and round truncation is respected."""
    from big_data_for_smart_houses_spark.extensions.graph import (
        sssp_weighted,
    )

    edges = spark.createDataFrame(
        [(0, 1, 9), (0, 1, 2), (1, 2, 3), (0, 2, 99)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {
        r["id"]: r["dist"]
        for r in sssp_weighted(edges, seeds, max_rounds=2).collect()
    }
    assert got == {0: 0, 1: 2, 2: 5}
    one = {
        r["id"]: r["dist"]
        for r in sssp_weighted(edges, seeds, max_rounds=1).collect()
    }
    assert one == {0: 0, 1: 2, 2: 99}

    import pytest

    with pytest.raises(ValueError):
        sssp_weighted(edges, seeds, max_rounds=0)


def test_kmeans_lloyd_matches_brute_force(spark):
    """Random-point cross-check: the distributed superstep loop must
    equal a plain Python Lloyd run under the same determinism
    contract (k-lowest-id seeding, float32-quantized distances and
    means, ties to the lower cid, empty-cluster carry)."""
    import random

    import numpy as np

    from big_data_for_smart_houses_spark.extensions.clustering import (
        kmeans_lloyd,
    )

    def q32(v):
        return float(np.float32(v))

    for seed in (7, 19):
        rng = random.Random(seed)
        n, dim, k, iters = 40, 5, 4, 3
        pts = {
            i: [round(rng.uniform(-2, 2), 3) for _ in range(dim)]
            for i in range(n)
        }
        cent = {cid: list(pts[cid]) for cid in range(k)}
        sizes = {}
        for _ in range(iters):
            asg = {}
            for pid, x in pts.items():
                best = min(
                    (
                        (
                            q32(
                                sum(
                                    (a - b) * (a - b)
                                    for a, b in zip(x, cent[c])
                                )
                            ),
                            c,
                        )
                        for c in range(k)
                    )
                )[1]
                asg[pid] = best
            sizes = {
                c: sum(1 for v in asg.values() if v == c)
                for c in range(k)
            }
            for c in range(k):
                mine = [pts[p] for p, v in asg.items() if v == c]
                if mine:
                    cent[c] = [
                        q32(sum(col) / len(mine))
                        for col in zip(*mine)
                    ]
        df = spark.createDataFrame(
            [(i, x) for i, x in pts.items()],
            "vec_id long, embedding array<double>",
        )
        got = kmeans_lloyd(
            df, k=k, iters=iters, vec_col="embedding"
        ).collect()
        assert len(got) == k * dim
        for r in got:
            assert r["n_points"] == sizes[r["cid"]], (seed, r)
            assert r["c_val"] == cent[r["cid"]][r["pos"]], (seed, r)


def test_kmeans_lloyd_empty_cluster_carries(spark):
    """A seed centroid that attracts nothing keeps its coordinates
    and reports n_points = 0; argument validation raises."""
    import pytest

    from big_data_for_smart_houses_spark.extensions.clustering import (
        kmeans_lloyd,
    )

    # ids 0 and 1 seed the two clusters at the SAME location, so
    # every point — including seed point 1 itself — ties between the
    # two centroids and the tie rule sends it to cid 0: cluster 1 is
    # empty from round 1 and must carry its seed coordinates.
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [0.1, 0.0]),
         (3, [0.0, 0.1])],
        "vec_id long, embedding array<double>",
    )
    out = {
        (r["cid"], r["pos"]): (r["n_points"], r["c_val"])
        for r in kmeans_lloyd(df, k=2, iters=1).collect()
    }
    assert out[(1, 0)] == (0, 0.0) and out[(1, 1)] == (0, 0.0)
    assert out[(0, 0)][0] == 4
    # round 2: the carried (0,0) centroid wins back the two exact
    # (0,0) points from the drifted cluster-0 mean — the recovery
    # path after an empty round.
    out2 = {
        (r["cid"], r["pos"]): r["n_points"]
        for r in kmeans_lloyd(df, k=2, iters=2).collect()
    }
    assert out2[(1, 0)] == 2 and out2[(0, 0)] == 2
    one = spark.createDataFrame(
        [(0, [0.0]), (1, [100.0]), (2, [0.5])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError):
        kmeans_lloyd(one, k=0, iters=1)
    with pytest.raises(ValueError):
        kmeans_lloyd(one, k=2, iters=0)


def test_ppjoin_equals_exhaustive_join(planted):
    """PPJoin's prefix+length filters must drop no true pair: output
    == ngram_jaccard_pairs (exhaustive shared-shingle blocking) at the
    same threshold, row-for-row."""
    t = 0.5
    exact = {
        tuple(r)
        for r in dedup.ngram_jaccard_pairs(planted, threshold=t)
        .select("id1", "id2", "n_inter", "size1", "size2")
        .collect()
    }
    pp = {
        tuple(r)
        for r in dedup.ppjoin_pairs(planted, threshold=t)
        .select("id1", "id2", "n_inter", "size1", "size2")
        .collect()
    }
    assert pp == exact
    assert len(pp) > 0


def test_ppjoin_prefix_actually_prunes(planted):
    """The prefix index must be materially smaller than the full
    shingle index (that's the point of the filter): at t=0.5 each
    set's prefix is ~half its shingles."""
    sh = dedup.shingles(planted)
    full = sh.count()
    # replicate the operator's prefix selection
    from pyspark.sql import Window
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    ranked = sh.join(freq, "shingle").withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("_df", "shingle")),
    )
    sizes = ranked.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    pref = (
        ranked.join(sizes, "doc_id")
        .filter(
            F.col("_rn")
            <= F.col("set_size") - F.ceil(0.5 * F.col("set_size") - 1e-9) + 1
        )
        .count()
    )
    assert pref < 0.6 * full


def test_deletion_neighborhood_pairs_complete_vs_exhaustive(spark):
    """SymSpell deletion-neighborhood join (round 9): the candidate
    blocking is COMPLETE for edit distance <= 1 — verified against a
    pure-Python exhaustive levenshtein over a corpus that plants all
    three edit kinds (substitution, end-insertion, mid-deletion) plus
    unrelated strings. Also pins the documented recall hole of the
    (prefix|suffix, length)-blocked variant: insert/delete pairs have
    different lengths, so editdist_blocked_pairs must MISS them —
    which is exactly why the neighborhood operator exists."""
    import itertools

    from big_data_for_smart_houses_spark.extensions.dedup import (
        deletion_neighborhood_pairs,
        editdist_blocked_pairs,
    )

    rows = [
        (1, "jonathan"), (2, "jonathon"),   # substitution
        (3, "smith"), (4, "smiths"),        # insertion at the end
        (5, "colour"), (6, "color"),        # deletion mid-string
        (7, "abcdefgh"), (8, "abXdefgh"),   # substitution mid
        (9, "totally-different"), (10, "unrelated"),
        (11, "xy"), (12, "x"),              # short strings
    ]

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            nd = [i]
            for j, cb in enumerate(b, 1):
                nd.append(min(d[j] + 1, nd[-1] + 1, d[j - 1] + (ca != cb)))
            d = nd
        return d[-1]

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.id1, r.id2, r.edit_dist)
        for r in deletion_neighborhood_pairs(df).collect()
    )
    want = sorted(
        (a, b, lev(ta, tb))
        for (a, ta), (b, tb) in itertools.combinations(rows, 2)
        if lev(ta, tb) <= 1
    )
    assert got == want
    # the blocked variant finds only the equal-length substitutions
    blocked = sorted(
        (r.id1, r.id2)
        for r in editdist_blocked_pairs(df, block_chars=2).collect()
    )
    assert blocked == [(1, 2), (7, 8)]


def test_deletion_neighborhood_overcap_is_loud_not_silent(spark):
    """Round-10 advice: an over-cap deletion bucket must be
    observable, never a silent recall loss. 'error' mode (the
    default) fails the job in-plan naming the hot key; 'drop' mode
    caps the bucket but the companion report names exactly what was
    dropped; an under-cap corpus is untouched by either mode."""
    import pytest

    from big_data_for_smart_houses_spark.extensions.dedup import (
        deletion_neighborhood_pairs,
        deletion_neighborhood_overcap,
    )

    # five strings sharing the deletion key 'ab' (cap=4 overflows):
    # 'ab' itself + every single-insertion variant xab/axb/abx
    hot = [(1, "ab"), (2, "xab"), (3, "aXb"), (4, "abZ"), (5, "Qab")]
    df = spark.createDataFrame(hot, "doc_id long, text string")

    with pytest.raises(Exception, match="bucket over cap"):
        deletion_neighborhood_pairs(df, max_bucket_size=4).collect()

    # drop mode: the hot bucket's pairs vanish — but observably so
    dropped = deletion_neighborhood_pairs(
        df, on_overcap="drop", max_bucket_size=4
    )
    report = deletion_neighborhood_overcap(df, max_bucket_size=4)
    rep = {(r.key, r.n_members) for r in report.collect()}
    assert ("ab", 5) in rep
    # every surviving pair is still a true edit<=1 pair
    for r in dropped.collect():
        assert r.edit_dist <= 1

    # under-cap corpus: identical results in both modes, empty report
    cold = df.limit(3)
    a = sorted(
        (r.id1, r.id2)
        for r in deletion_neighborhood_pairs(cold).collect()
    )
    b = sorted(
        (r.id1, r.id2)
        for r in deletion_neighborhood_pairs(
            cold, on_overcap="drop"
        ).collect()
    )
    assert a == b and len(a) > 0
    assert deletion_neighborhood_overcap(cold).count() == 0


def test_hdr_sketch_monoid_negatives_and_exact_smalls(spark):
    """HDR quantile sketch (round 10): (1) merge is a true monoid —
    sketches over an arbitrary 3-way split merge to the direct build,
    including negative and zero values (the mirrored store); (2)
    values with |m| < 2^sub_bits get UNIT buckets, so sketch
    quantiles over a small-magnitude corpus are EXACT; (3) bucket ids
    are monotone in the value, so rank selection is order-correct
    across the sign boundary."""
    from pyspark.sql import functions as F

    from big_data_for_smart_houses_spark.extensions.sketches import (
        hdr_build,
        hdr_merge,
        hdr_quantiles,
    )

    vals = [-321.5, -31.0, -0.25, 0.0, 0.07, 0.31, 5.5, 17.0,
            170.25, 9999.99, -9999.99, 0.31, 5.5, -31.0]
    rows = [(i, "g", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    parts = [df.filter(F.col("id") % 3 == k) for k in range(3)]
    split = hdr_merge(
        hdr_merge(hdr_build(parts[0], "v", ["g"]),
                  hdr_build(parts[1], "v", ["g"]), ["g"]),
        hdr_build(parts[2], "v", ["g"]), ["g"],
    )
    direct = hdr_build(df, "v", ["g"])
    assert split.exceptAll(direct).count() == 0
    assert direct.exceptAll(split).count() == 0

    # small-magnitude corpus (|value*100| < 32): unit buckets => the
    # sketch median IS the exact order statistic
    small = spark.createDataFrame(
        [(i, "g", v) for i, v in
         enumerate([-0.31, -0.05, 0.0, 0.01, 0.07, 0.12, 0.25])],
        "id long, g string, v double",
    )
    got = {
        r["probe_pct"]: r["est_scaled"]
        for r in hdr_quantiles(
            hdr_build(small, "v", ["g"]), ["g"], [50, 99]
        ).collect()
    }
    # ceil(0.5*7)=4th of [-31,-5,0,1,7,12,25] -> 1; ceil(.99*7)=7 -> 25
    assert got == {50: 1, 99: 25}


def test_hdr_quantile_error_bound_gate_all_within(spark):
    """The error-bound gate's contract column must be TRUE on every
    row (the hash gate would also catch a drift, but this fails the
    suite loudly if the 2^-(sub_bits+1) guarantee itself breaks)."""
    from big_data_for_smart_houses_spark.queries.stats_gate import (
        q_hdr_quantile_error_bound_events,
    )

    rows = q_hdr_quantile_error_bound_events(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 20  # 5 event types x 4 probes
    assert all(r["within_bound"] for r in rows)


def test_hdr_estimate_integer_exact_past_double_precision(spark):
    """Round-10 review fix: hdr_estimate's midpoint must be ALL
    integer arithmetic. The old `floor((lo+hi)/2)` detoured through
    double, and for quantized magnitudes past 2^53 (|value| >=
    ~4.5e13 at scale=100) the double rounds to a multiple of
    2^(bits-52) — est_scaled drifted from the SQL oracle's exact
    `//` midpoint by hundreds and the hash gate would fail. This
    pins the engine's estimate to the pure-Python integer replay of
    the bucket/midpoint algebra at magnitudes around 2^53..2^60."""
    from big_data_for_smart_houses_spark.extensions.sketches import (
        HDR_SUB_BITS,
        hdr_build,
        hdr_quantiles,
    )

    def py_est(m: int, sub_bits: int = HDR_SUB_BITS) -> int:
        k = 1 << (sub_bits + 1)
        a = abs(m)
        e = a.bit_length() - 1
        shift = max(e - sub_bits, 0)
        idx = shift * k + (a >> shift)
        lo, hi = (idx % k) << shift, (((idx % k) + 1) << shift) - 1
        return (1 if m >= 0 else -1) * ((lo + hi) // 2)

    # values whose cent-quantization lands near/past 2^53
    big = [9.0e13, 9.007199254740993e13, 1.8e14, 7.3e15, 1.15e16]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(big + [-v for v in big])],
        "id long, g string, v double",
    )
    rows = hdr_quantiles(
        hdr_build(df, "v", ["g"]), ["g"], [10, 50, 90]
    ).collect()
    assert rows, "no quantile rows"
    for r in rows:
        # replay the midpoint from the BUCKET id in pure ints
        b = r["bucket"]
        k = 1 << (HDR_SUB_BITS + 1)
        idx = abs(b)
        shift = idx // k
        base = idx % k
        lo, hi = base << shift, ((base + 1) << shift) - 1
        want = (1 if b >= 0 else -1) * ((lo + hi) // 2)
        assert r["est_scaled"] == want, (b, r["est_scaled"], want)
    # and the bucket->estimate algebra agrees with the from-value
    # replay for each planted magnitude
    from pyspark.sql import functions as F
    m_col = F.round(F.col("v") * 100, 0).cast("bigint")
    ms = [r[0] for r in df.select(m_col).collect()]
    from big_data_for_smart_houses_spark.extensions.sketches import (
        hdr_bucket,
        hdr_estimate,
    )
    got = (
        df.select(hdr_estimate(hdr_bucket(m_col)))
        .toPandas()["est_scaled"]
        .tolist()
    )
    assert got == [py_est(m) for m in ms]


def test_hdr_bucket_bit_trick_matches_bitlength_reference(spark):
    """hdr_bucket's smear+popcount floor(log2) (round-10 verdict ask
    #6: no per-row string allocations) must agree with the Python
    bit_length reference on every power-of-two boundary +-2 across
    the int64 magnitude range, both signs, zero, and values past
    2^53 — the exact domain where a float log2 would lose ulps and
    where the old conv-to-binary-string form was provably correct."""
    from pyspark.sql import functions as F

    from big_data_for_smart_houses_spark.extensions.sketches import (
        HDR_SUB_BITS,
        hdr_bucket,
    )

    k = 1 << (HDR_SUB_BITS + 1)

    def py_bucket(m: int) -> int:
        a = abs(m)
        e = a.bit_length() - 1  # -1 for a == 0, same clamp as engine
        shift = max(e - HDR_SUB_BITS, 0)
        base = a >> shift
        sgn = 1 if m > 0 else (-1 if m < 0 else 0)
        return sgn * (shift * k + base)

    vals = {0, 1, -1, 2**63 - 1, -(2**63 - 1)}
    for p in range(1, 63):
        for d in (-2, -1, 0, 1, 2):
            v = (1 << p) + d
            if 0 < v < 2**63:
                vals.add(v)
                vals.add(-v)
    rows = sorted(vals)
    df = spark.createDataFrame([(v,) for v in rows], "m long")
    got = [
        r["bucket"]
        for r in df.select(hdr_bucket(F.col("m")))
        .orderBy("bucket").collect()
    ]
    want = sorted(py_bucket(v) for v in rows)
    assert got == want
