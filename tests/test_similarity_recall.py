"""ANN quality gate: the banded-LSH top-k must recover most of the
exact top-k. The fixture embeddings are uniform-random — LSH's
worst case (true neighbors sit near 90 deg, where hyperplane collision
probability is lowest) — so the floor here is conservative; clustered
real-world embeddings recall far higher at the same band layout."""

from __future__ import annotations

from tests.conftest import SF_CHECK

RECALL_FLOOR = 0.5


def test_ann_recall_vs_bruteforce(spark):
    from projetbigdata_spark.operators.similarity import (
        sim_ann_lsh_topk,
        sim_topk_bruteforce,
    )

    brute = {
        (r.query_id, r.neighbor_id)
        for r in sim_topk_bruteforce(spark, SF_CHECK).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in sim_ann_lsh_topk(spark, SF_CHECK).collect()
    }
    assert brute, "bruteforce produced no neighbors"
    recall = len(brute & ann) / len(brute)
    assert recall >= RECALL_FLOOR, f"ANN recall {recall:.2f} < {RECALL_FLOOR}"


IVF_RECALL_FLOOR = 0.25  # = nprobe/k, the fair-random-partition expectation;
# measured 0.46 at sf0.01 (the coarse quantizer adds signal even on
# uniform-random fixtures). Clustered embeddings recall far higher.


def test_ivf_recall_and_rerank_exactness(spark):
    from projetbigdata_spark.operators.similarity import (
        sim_ivf_topk,
        sim_topk_bruteforce,
    )

    brute = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in sim_topk_bruteforce(spark, SF_CHECK).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in sim_ivf_topk(spark, SF_CHECK).collect()
    }
    recall = len(set(brute) & set(ivf)) / len(brute)
    assert recall >= IVF_RECALL_FLOOR, f"IVF recall {recall:.2f}"
    # the rerank is exact: any pair both tiers return must score identically
    for pair in set(brute) & set(ivf):
        assert brute[pair] == ivf[pair], pair


def test_ivf_sampled_recall_and_rerank_exactness(spark):
    """The sampled-training IVF (quantizer fit on the 20% slice) must
    hold the same recall floor as the full-Lloyd tier, and its rerank
    stays exact — training-set size affects WHICH lists exist, never
    the scored cosines."""
    from projetbigdata_spark.operators.similarity import (
        sim_ivf_sampled_topk,
        sim_topk_bruteforce,
    )

    brute = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in sim_topk_bruteforce(spark, SF_CHECK).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in sim_ivf_sampled_topk(spark, SF_CHECK).collect()
    }
    recall = len(set(brute) & set(ivf)) / len(brute)
    assert recall >= IVF_RECALL_FLOOR, f"sampled IVF recall {recall:.2f}"
    for pair in set(brute) & set(ivf):
        assert brute[pair] == ivf[pair], pair


def test_ivf_posting_lists_partition(spark):
    """The posting lists are a partition of the vector set (each vector
    in exactly one list) and the probe scans nprobe lists per query —
    the properties that make IVF linear-scan-free at scale."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.similarity import (
        K_CENTROIDS,
        _argmin_cid,
        _dists_to_centroids,
        _lloyd_update,
        _micro_arr,
        SEED_HI,
        SEED_LO,
    )
    from projetbigdata_spark.sources.catalog import load_table

    vec = _micro_arr(load_table(spark, SF_CHECK, "embeddings"))
    cents = vec.where(
        (F.col("vec_id") >= SEED_LO) & (F.col("vec_id") < SEED_HI)
    ).select(
        (F.col("vec_id") - SEED_LO).cast("int").alias("cid"),
        F.col("xs").alias("ms"),
    )
    for _ in range(2):
        cents = _lloyd_update(vec, _argmin_cid(_dists_to_centroids(vec, cents)))
    posting = _argmin_cid(_dists_to_centroids(vec, cents))
    n = vec.select("vec_id").distinct().count()
    assert posting.count() == n  # exactly one list per vector
    ncids = posting.select("cid").distinct().count()
    assert 2 <= ncids <= K_CENTROIDS


NEARDUP_RECALL_FLOOR = 0.6  # theory ~0.87 at the 0.4 boundary with
# 4 bands x 2 bits on uniform-random vectors; measured higher. Every
# returned pair must also appear in the exact truth (precision 1.0 —
# the rerank applies the exact threshold).


def test_neardup_recall_and_precision_vs_allpairs(spark):
    from projetbigdata_spark.operators.similarity import (
        sim_neardup_allpairs_exact,
        sim_neardup_pairs,
    )

    truth = {
        (r.vec_a, r.vec_b): r.cosine
        for r in sim_neardup_allpairs_exact(spark, SF_CHECK).collect()
    }
    pruned = {
        (r.vec_a, r.vec_b): r.cosine
        for r in sim_neardup_pairs(spark, SF_CHECK).collect()
    }
    assert truth, "all-pairs baseline produced no pairs"
    assert set(pruned) <= set(truth), "pruned result contains false positives"
    for pair in pruned:
        assert pruned[pair] == truth[pair], pair  # exact rerank
    recall = len(pruned) / len(truth)
    assert recall >= NEARDUP_RECALL_FLOOR, f"neardup recall {recall:.2f}"


def test_ann_candidates_prune(spark):
    """The candidate set must be a strict subset of all pairs —
    otherwise the 'ANN' is a disguised brute force."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.similarity import (
        N_QUERIES,
        _banded_buckets,
    )

    bb = _banded_buckets(spark, SF_CHECK)
    n = bb.select("vec_id").distinct().count()
    qb = bb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band", "bucket"
    )
    ncand = (
        bb.join(qb, ["band", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
        .count()
    )
    assert ncand < 0.9 * N_QUERIES * (n - 1)


# --------------------------------------------------------------------------
# Soak-scale recall study (VERDICT r2 item 5): 20,000 vectors from
# examples/gen_ann_soak.py — 10 deterministic hash-noise replicas of the
# sf0.1 corpus, so every query vector has 9 genuinely-NEAR true
# neighbors (the realistic regime, unlike the uniform-random small
# fixtures). Measured r3 (SCALE.md §Similarity):
#   band_bits=2 (registered): recall 1.000, candidate ratio 0.681
#   band_bits=4 (deployment): recall 0.960, candidate ratio 0.124
#   sim_ivf_topk 1.000 / sim_ivf_sampled_topk 0.980
# Gated on the generated corpus being present.
# --------------------------------------------------------------------------
import os as _os

import pytest as _pytest

ANN_SOAK_DIR = "/tmp/soak/ann"
_soak = _pytest.mark.skipif(
    not _os.path.isdir(f"{ANN_SOAK_DIR}/embeddings.parquet"),
    reason="ANN soak corpus absent — python examples/gen_ann_soak.py",
)


def _topk_pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


@_pytest.fixture(scope="module")
def soak_truth(spark):
    from projetbigdata_spark.operators.similarity import sim_topk_bruteforce

    return _topk_pairs(sim_topk_bruteforce(spark, ANN_SOAK_DIR))


@_soak
@_pytest.mark.parametrize(
    "bits,recall_floor,cand_ceiling",
    [(2, 0.95, 0.75), (4, 0.85, 0.20)],
)
def test_soak_ann_recall_and_candidate_ratio(
    spark, soak_truth, bits, recall_floor, cand_ceiling
):
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.similarity import (
        N_QUERIES,
        _banded_buckets,
        sim_ann_lsh_topk,
    )

    got = _topk_pairs(sim_ann_lsh_topk(spark, ANN_SOAK_DIR, band_bits=bits))
    recall = len(soak_truth & got) / len(soak_truth)
    assert recall >= recall_floor, f"bits={bits} recall {recall:.3f}"

    bb = _banded_buckets(spark, ANN_SOAK_DIR, bits)
    n = bb.select("vec_id").distinct().count()
    qb = bb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q"), "band", "bucket"
    )
    ncand = (
        bb.join(qb, ["band", "bucket"])
        .where(F.col("vec_id") != F.col("q"))
        .select("q", "vec_id")
        .distinct()
        .count()
    )
    ratio = ncand / (N_QUERIES * (n - 1))
    assert ratio <= cand_ceiling, f"bits={bits} candidate ratio {ratio:.3f}"


ANN_100K_DIR = "/tmp/soak/ann100k"
_soak100k = _pytest.mark.skipif(
    not _os.path.isdir(f"{ANN_100K_DIR}/embeddings.parquet"),
    reason="100k ANN soak corpus absent — "
    "python examples/gen_ann_soak.py 50 0.05 /root/testdata/sf0.1 "
    + ANN_100K_DIR,
)


@_soak100k
def test_soak_ivf_k128_recall_100k(spark):
    """Deployment-realistic quantizer at the 100k corpus (VERDICT r3
    item 4): the sampled trainer at k=128/nprobe=8 — probing only
    ~6% of the corpus — must hold recall@5 >= 0.95 vs brute force.
    Measured r4: 1.000 (full sweep table in SCALE.md)."""
    from projetbigdata_spark.operators.similarity import (
        sim_ivf_sampled_topk,
        sim_topk_bruteforce,
    )

    truth = _topk_pairs(sim_topk_bruteforce(spark, ANN_100K_DIR))
    got = _topk_pairs(
        sim_ivf_sampled_topk(spark, ANN_100K_DIR, k=128, nprobe=8)
    )
    recall = len(truth & got) / len(truth)
    assert recall >= 0.95, f"k=128 100k-soak recall {recall:.3f}"


@_soak
def test_soak_ivf_sampled_recall(spark):
    """The faiss-style train-on-20%-slice tier must hold recall at 10x
    the fixture scale — the quantizer sees 4k of 20k vectors."""
    from projetbigdata_spark.operators.similarity import sim_ivf_sampled_topk

    from projetbigdata_spark.operators.similarity import sim_topk_bruteforce

    truth = _topk_pairs(sim_topk_bruteforce(spark, ANN_SOAK_DIR))
    got = _topk_pairs(sim_ivf_sampled_topk(spark, ANN_SOAK_DIR))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.90, f"sampled IVF soak recall {recall:.3f}"


def test_semantic_dedup_precision_and_within_cluster_recall(spark):
    """dedup_semantic's drop list must be PRECISE (every dropped
    vector really has a cosine>=threshold near-dup at the reported
    canonical — checked against the exact all-pairs baseline) and
    COMPLETE within clusters (every all-pairs near-dup pair whose two
    members share a cluster produces a drop for the higher id). Pairs
    split across clusters are the declared SemDeDup recall trade."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.similarity import (
        K_CENTROIDS,
        _argmin_cid,
        _cached_micro_arr,
        _dists_to_centroids,
        _lloyd_update,
        _seed_centroids,
        dedup_semantic,
        sim_neardup_allpairs_exact,
    )

    truth = {
        (r.vec_a, r.vec_b): r.cosine
        for r in sim_neardup_allpairs_exact(spark, SF_CHECK).collect()
    }
    assert truth, "all-pairs baseline produced no pairs"

    # pin k: the engine default is k="auto" (≈√n/2) since r6, but this
    # test's reference clustering below is built with K_CENTROIDS — the
    # drop list must be validated against the SAME partition it was
    # computed from (the registered query wrapper also pins k=16).
    drops = {
        r.vec_id: r
        for r in dedup_semantic(spark, SF_CHECK, k=K_CENTROIDS).collect()
    }
    assert drops, "semantic dedup produced no drops at fixture scale"

    # precision: (dup_of, vec_id) is a real near-dup pair at the exact
    # cosine the baseline computed
    for vec_id, r in drops.items():
        assert r.dup_of < vec_id
        assert truth.get((r.dup_of, vec_id)) == r.cosine, (vec_id, r)

    # within-cluster completeness: rebuild the same assignment and
    # check every co-clustered truth pair got its higher id dropped
    vec = _cached_micro_arr(spark, SF_CHECK)
    cents = _seed_centroids(vec, K_CENTROIDS)
    for _ in range(2):
        cents = _lloyd_update(
            vec, _argmin_cid(_dists_to_centroids(vec, cents))
        ).localCheckpoint()
    cid = {
        r.vec_id: r.cid
        for r in _argmin_cid(_dists_to_centroids(vec, cents)).collect()
    }
    co_clustered = {
        (a, b) for (a, b) in truth if cid.get(a) == cid.get(b)
    }
    assert co_clustered, "no truth pair is co-clustered — fixture moved"
    for a, b in co_clustered:
        assert b in drops, f"co-clustered near-dup ({a},{b}) not dropped"


def test_pq_refine_recall_at_fixture(spark):
    """PQ + exact refine at fixture dials (M=8, K=16, shortlist=100):
    recall vs the cosine brute force on the sf0.01 corpus. The flat
    near-uniform fixture is PQ's HARD case (measured 0.94 here vs
    1.000 on the clustered soak corpus) — the floor guards the
    quantizer/refine plumbing, not the geometry."""
    from projetbigdata_spark.operators.similarity import (
        sim_pq_topk,
        sim_topk_bruteforce,
    )
    from tests.conftest import SF_CHECK

    truth = _topk_pairs(sim_topk_bruteforce(spark, SF_CHECK))
    got = _topk_pairs(sim_pq_topk(spark, SF_CHECK))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.85, f"PQ refine recall {recall:.3f}"


@_soak
def test_soak_pq_refine_recall(spark, soak_truth):
    """On the clustered 20k soak corpus the PQ+refine tier is exact-
    recall at fixture dials (measured 1.000 across m∈{8,16},
    k∈{16,64}, shortlist∈{100,200} — SCALE.md r5 PQ sweep); the 0.95
    floor leaves room for fixture regeneration drift only."""
    from projetbigdata_spark.operators.similarity import sim_pq_topk

    got = _topk_pairs(sim_pq_topk(spark, ANN_SOAK_DIR))
    recall = len(soak_truth & got) / len(soak_truth)
    assert recall >= 0.95, f"soak PQ recall {recall:.3f}"


@_soak
def test_soak_ivfpq_refine_recall(spark, soak_truth):
    """IVF-PQ (coarse posting-list bound × PQ byte bound × exact
    refine) on the clustered 20k soak corpus: exact recall at fixture
    dials (measured 1.000). On the FLAT sf fixtures the coarse tier's
    nprobe=4/16 candidate bound compounds with PQ distortion (0.46 at
    sf0.01) — the adversarial-geometry caveat both parent tiers
    document; the clustered corpus is the geometry the index family
    exists for."""
    from projetbigdata_spark.operators.similarity import sim_ivfpq_topk

    got = _topk_pairs(sim_ivfpq_topk(spark, ANN_SOAK_DIR))
    recall = len(soak_truth & got) / len(soak_truth)
    assert recall >= 0.95, f"soak IVF-PQ recall {recall:.3f}"


def test_mmr_rerank_matches_python_model(spark):
    """sim_mmr_rerank == a from-scratch greedy MMR in Python (same
    integer-micros scores, same neighbor_id tiebreaks), and the
    reranker actually diversifies on this fixture: at least one
    query's MMR selection differs from its pure-relevance top-5, and
    no query's MMR picks are MORE self-similar than its relevance
    picks (max pairwise sim can only go down or tie)."""
    import math

    from projetbigdata_spark.operators.similarity import (
        MMR_SELECT,
        MMR_SHORTLIST,
        N_QUERIES,
        sim_mmr_rerank,
    )

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(
            f"{SF_CHECK}/embeddings.parquet"
        ).collect()
    }
    norm = {i: math.sqrt(sum(x * x for x in v)) for i, v in vecs.items()}

    def micros(a, b):
        c = sum(x * y for x, y in zip(vecs[a], vecs[b])) / (
            norm[a] * norm[b]
        )
        return math.floor(c * 1_000_000 + 0.5)

    expected = {}
    rel_top5 = {}
    for qid in range(N_QUERIES):
        rel = {n: micros(qid, n) for n in vecs if n != qid}
        shortlist = sorted(rel, key=lambda n: (-rel[n], n))[:MMR_SHORTLIST]
        rel_top5[qid] = set(
            sorted(rel, key=lambda n: (-rel[n], n))[:MMR_SELECT]
        )
        sel = [min(shortlist, key=lambda n: (-rel[n], n))]
        while len(sel) < MMR_SELECT:
            remaining = [n for n in shortlist if n not in sel]
            if not remaining:
                break
            sel.append(
                min(
                    remaining,
                    key=lambda n: (
                        -(rel[n] - max(micros(n, s) for s in sel)),
                        n,
                    ),
                )
            )
        expected.update(
            {(qid, i + 1): (n, rel[n]) for i, n in enumerate(sel)}
        )

    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.rel_micros)
        for r in sim_mmr_rerank(spark, SF_CHECK).collect()
    }
    assert got == expected

    # diversification is real on this fixture
    mmr_sets = {
        qid: {n for (q, _), (n, _) in expected.items() if q == qid}
        for qid in range(N_QUERIES)
    }
    assert any(mmr_sets[q] != rel_top5[q] for q in range(N_QUERIES))
    for q in range(N_QUERIES):
        def max_pair(ids):
            ids = sorted(ids)
            return max(
                micros(a, b)
                for i, a in enumerate(ids)
                for b in ids[i + 1 :]
            )
        assert max_pair(mmr_sets[q]) <= max_pair(rel_top5[q]), q


def test_hybrid_rrf_matches_python_fusion(spark):
    """search_hybrid_rrf == Python RRF over its two constituent
    rankings — the vector side recomputed from scratch, the keyword
    side taken from text_search_bm25 (itself pinned to a Python model
    in test_selection_ops) — plus the fusion contract: every reported
    rank pair is consistent, rrf_micros is exactly
    Σ 1e6 // (60 + rank), and the fixture exercises single-list docs
    (NULL on the absent side)."""
    import math

    from projetbigdata_spark.operators.similarity import (
        HYBRID_QUERY_VEC,
        HYBRID_TOP_N,
        RRF_DEPTH,
        RRF_K,
        search_hybrid_rrf,
    )
    from projetbigdata_spark.operators.tfidf import text_search_bm25

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(
            f"{SF_CHECK}/embeddings.parquet"
        ).collect()
    }
    norm = {i: math.sqrt(sum(x * x for x in v)) for i, v in vecs.items()}
    qv, qn = vecs[HYBRID_QUERY_VEC], norm[HYBRID_QUERY_VEC]
    cos = {
        i: round(sum(x * y for x, y in zip(qv, v)) / (qn * norm[i]), 6)
        for i, v in vecs.items()
        if i != HYBRID_QUERY_VEC
    }
    v_rank = {
        d: r + 1
        for r, d in enumerate(
            sorted(cos, key=lambda d: (-cos[d], d))[:RRF_DEPTH]
        )
    }
    bm = sorted(
        [(r.doc_id, r.score_m) for r in text_search_bm25(spark, SF_CHECK).collect()],
        key=lambda kv: (-kv[1], kv[0]),
    )
    t_rank = {d: r + 1 for r, (d, _) in enumerate(bm[:RRF_DEPTH])}

    fused = {}
    for d in set(t_rank) | set(v_rank):
        fused[d] = (
            (1_000_000 // (RRF_K + t_rank[d]) if d in t_rank else 0)
            + (1_000_000 // (RRF_K + v_rank[d]) if d in v_rank else 0)
        )
    expected = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[
        :HYBRID_TOP_N
    ]

    got = [
        (r.doc_id, r.r_text, r.r_vec, r.rrf_micros)
        for r in search_hybrid_rrf(spark, SF_CHECK).collect()
    ]
    assert [(d, s) for d, _, _, s in got] == expected
    for d, rt, rv, s in got:
        assert rt == t_rank.get(d) and rv == v_rank.get(d), d
    # the fixture exercises the single-list path on at least one side
    assert any(rt is None or rv is None for _, rt, rv, _ in got)


def test_hybrid_rrf_ivf_swaps_vector_tier(spark):
    """search_hybrid_rrf_ivf == RRF with the vector side handed to
    sim_ivf_topk: the keyword ranks are identical to the brute
    variant's, the vector ranks are exactly the IVF tier's rnk for
    the query vector, and the fused score is exactly
    Σ 1e6 // (60 + rank) over the sides present."""
    from projetbigdata_spark.operators.similarity import (
        HYBRID_QUERY_VEC,
        HYBRID_TOP_N,
        RRF_K,
        search_hybrid_rrf,
        search_hybrid_rrf_ivf,
        sim_ivf_topk,
    )

    got = [
        (r.doc_id, r.r_text, r.r_vec, r.rrf_micros)
        for r in search_hybrid_rrf_ivf(spark, SF_CHECK).collect()
    ]
    assert 0 < len(got) <= HYBRID_TOP_N

    ivf_rank = {
        r.neighbor_id: r.rnk
        for r in sim_ivf_topk(spark, SF_CHECK).collect()
        if r.query_id == HYBRID_QUERY_VEC
    }
    brute_text = {
        r.doc_id: r.r_text
        for r in search_hybrid_rrf(spark, SF_CHECK).collect()
        if r.r_text is not None
    }
    for d, rt, rv, s in got:
        assert rv == ivf_rank.get(d), d
        if d in brute_text and rt is not None:
            assert rt == brute_text[d], d
        expect = (1_000_000 // (RRF_K + rt) if rt is not None else 0) + (
            1_000_000 // (RRF_K + rv) if rv is not None else 0
        )
        assert s == expect, d
    # the vector side actually contributes (IVF hits present)
    assert any(rv is not None for _, _, rv, _ in got)


def test_mmr_ivf_variant_contract(spark):
    """sim_mmr_rerank_ivf: the shared greedy core over the IVF
    shortlist — every pick must come from the query's IVF top-5 with
    its exact cosine micros, rank 1 is the IVF shortlist's relevance
    argmax, and picks per query == min(MMR_SELECT_IVF, |shortlist|)."""
    import math

    from projetbigdata_spark.operators.similarity import (
        MMR_SELECT_IVF,
        sim_ivf_topk,
        sim_mmr_rerank_ivf,
    )

    ivf = {}
    for r in sim_ivf_topk(spark, SF_CHECK).collect():
        ivf.setdefault(r.query_id, {})[r.neighbor_id] = math.floor(
            r.cosine * 1_000_000 + 0.5
        )

    got = {}
    for r in sim_mmr_rerank_ivf(spark, SF_CHECK).collect():
        got.setdefault(r.query_id, {})[r.rank] = (
            r.neighbor_id,
            r.rel_micros,
        )

    assert set(got) == set(ivf)
    for qid, picks in got.items():
        shortlist = ivf[qid]
        assert len(picks) == min(MMR_SELECT_IVF, len(shortlist))
        assert sorted(picks) == list(range(1, len(picks) + 1))
        for rank, (nid, rel) in picks.items():
            assert shortlist.get(nid) == rel, (qid, rank)
        # rank 1 = relevance argmax with id tiebreak
        best = min(shortlist, key=lambda n: (-shortlist[n], n))
        assert picks[1][0] == best, qid


def test_hybrid_rrf_pq_swaps_vector_tier(spark):
    """search_hybrid_rrf_pq == RRF with the vector side handed to
    sim_pq_topk (completing the brute/IVF/PQ swap family for the
    fusion layer): vector ranks are exactly the PQ tier's rnk for the
    query vector, keyword ranks match the brute variant's, fused
    score is exactly Σ 1e6 // (60 + rank) over the sides present."""
    from projetbigdata_spark.operators.similarity import (
        HYBRID_QUERY_VEC,
        HYBRID_TOP_N,
        RRF_K,
        search_hybrid_rrf,
        search_hybrid_rrf_pq,
        sim_pq_topk,
    )

    got = [
        (r.doc_id, r.r_text, r.r_vec, r.rrf_micros)
        for r in search_hybrid_rrf_pq(spark, SF_CHECK).collect()
    ]
    assert 0 < len(got) <= HYBRID_TOP_N

    pq_rank = {
        r.neighbor_id: r.rnk
        for r in sim_pq_topk(spark, SF_CHECK).collect()
        if r.query_id == HYBRID_QUERY_VEC
    }
    brute_text = {
        r.doc_id: r.r_text
        for r in search_hybrid_rrf(spark, SF_CHECK).collect()
        if r.r_text is not None
    }
    for d, rt, rv, s in got:
        assert rv == pq_rank.get(d), d
        if d in brute_text and rt is not None:
            assert rt == brute_text[d], d
        expect = (1_000_000 // (RRF_K + rt) if rt is not None else 0) + (
            1_000_000 // (RRF_K + rv) if rv is not None else 0
        )
        assert s == expect, d
    # the vector side actually contributes (PQ hits present)
    assert any(rv is not None for _, _, rv, _ in got)


def test_ivf_index_roundtrip_equals_registered_incremental(spark, tmp_path):
    """r11 epoch artifacts, ANN tier (the faiss write_index analogue):
    the persisted (cents, posting, base_norm) trio drives
    incremental_ann_match to the registered sim_ivf_incremental rows
    exactly — load-then-match ≡ build-then-match, so a retrain-cadence
    index on disk is interchangeable with an in-session build."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.similarity import (
        _cached_micro_arr,
        _is_new_col,
        _with_norm,
        build_ivf_base_index,
        incremental_ann_match,
        load_ivf_index,
        save_ivf_index,
        sim_ivf_incremental,
    )
    from projetbigdata_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.01"
    index = build_ivf_base_index(spark, sf)
    path = str(tmp_path / "ivf_index")
    save_ivf_index(index, path)
    loaded = load_ivf_index(spark, path)

    # the on-disk codebook is the k-row table; posting covers the base
    cents, posting, _ = loaded
    assert 0 < cents.count() <= 16
    assert posting.select("vec_id").distinct().count() == posting.count()

    vec = _cached_micro_arr(spark, sf)
    new_micro = vec.where(_is_new_col())
    new_norm = _with_norm(
        load_table(spark, sf, "embeddings").where(_is_new_col())
    )
    got = incremental_ann_match(new_micro, new_norm, *loaded)
    want = sim_ivf_incremental(spark, sf)
    assert got.count() == want.count() > 0
    assert got.subtract(want).count() == 0
    assert want.subtract(got).count() == 0


def test_ivf_posting_stats_laws(spark):
    """r11 index-health audit: the stats frame partitions the corpus
    (sizes sum to the vector count), shares sit on the exact ppm
    floor grid, and imbalance_ppm equals the Cauchy-Schwarz-bounded
    k·Σsz²·1e6 div n² recomputed from the very sizes it reports
    (>= 1e6 exactly — 1e6 iff perfectly balanced; constant across
    rows)."""
    from projetbigdata_spark.operators.similarity import (
        sim_ivf_posting_stats,
    )
    from projetbigdata_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.01"
    rows = sim_ivf_posting_stats(spark, sf).collect()
    n_total = load_table(spark, sf, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_total
    for r in rows:
        assert r.share_ppm == (r.n_vecs * 1_000_000) // n_total
    k = len(rows)
    sq = sum(r.n_vecs ** 2 for r in rows)
    want = (k * sq * 1_000_000) // (n_total * n_total)
    assert {r.imbalance_ppm for r in rows} == {want}
    assert want >= 1_000_000


def test_ivf_remove_ids_equals_rebuild_under_same_codebook(spark):
    """r12 deletion path (VERDICT r11 item 4): remove_from_ivf_index's
    anti-join produces EXACTLY the posting lists a rebuild over
    corpus-minus-deleted yields under the SAME codebook (deletion
    never re-trains or re-buckets — the faiss remove_ids contract),
    and the match over the tombstoned index equals matching against
    that rebuilt index."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.similarity import (
        IVF_DELETE_MOD,
        IVF_DELETE_REMAINDER,
        _argmin_cid,
        _cached_micro_arr,
        _dists_to_centroids,
        _is_new_col,
        build_ivf_base_index,
        remove_from_ivf_index,
    )

    sf = "/root/testdata/sf0.01"
    index = build_ivf_base_index(spark, sf)
    cents, posting, base_norm = index
    deleted = (F.col("vec_id") % IVF_DELETE_MOD) == IVF_DELETE_REMAINDER
    tomb = posting.where(deleted)
    n_tomb = tomb.count()
    assert n_tomb > 0  # the fixture slice genuinely deletes something

    _, posting_t, base_norm_t = remove_from_ivf_index(index, tomb)

    # rebuild the assignment from the surviving base vectors with the
    # SAME centroids: must equal the anti-join, row for row
    vec = _cached_micro_arr(spark, sf)
    base_minus = vec.where(~_is_new_col()).where(~deleted)
    rebuilt = _argmin_cid(_dists_to_centroids(base_minus, cents))
    assert posting_t.count() == posting.count() - n_tomb
    assert posting_t.subtract(rebuilt).count() == 0
    assert rebuilt.subtract(posting_t).count() == 0
    assert base_norm_t.where(deleted).count() == 0


def test_ivf_deleted_row_divergence_and_no_deleted_neighbors(spark):
    """The registered tombstoned probe (sim_ivf_incremental_deleted):
    (a) no deleted vec_id is ever returned as a neighbor; (b) the
    verdicts genuinely diverge from the undeleted row exactly where a
    deleted vector held a top-5 slot; (c) queries whose candidate sets
    never contained a deleted vector are untouched."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.similarity import (
        IVF_DELETE_MOD,
        IVF_DELETE_REMAINDER,
        sim_ivf_incremental,
        sim_ivf_incremental_deleted,
    )

    sf = "/root/testdata/sf0.01"
    deleted_pred = (
        F.col("neighbor_id") % IVF_DELETE_MOD == IVF_DELETE_REMAINDER
    )
    base = sim_ivf_incremental(spark, sf).localCheckpoint()
    got = sim_ivf_incremental_deleted(spark, sf).localCheckpoint()

    assert got.where(deleted_pred).count() == 0
    had_deleted = base.where(deleted_pred).select("query_id").distinct()
    n_affected = had_deleted.count()
    assert n_affected > 0  # the fixture exercises the divergence
    # untouched queries keep identical top-5 rows
    clean_base = base.join(had_deleted, "query_id", "left_anti")
    clean_got = got.join(had_deleted, "query_id", "left_anti")
    assert clean_base.subtract(clean_got).count() == 0
    assert clean_got.subtract(clean_base).count() == 0
    # affected queries lost their deleted neighbors and back-filled
    assert base.subtract(got).where(deleted_pred).count() > 0


def test_posting_stats_frame_reads_tombstoned_index(spark):
    """The audit completes the deletion story: posting_stats_frame
    pointed at a tombstoned index reports the post-delete balance —
    totals shrink by exactly the tombstone count, and the frame obeys
    the same partition/ppm laws as the registered rows."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.similarity import (
        IVF_DELETE_MOD,
        IVF_DELETE_REMAINDER,
        build_ivf_base_index,
        posting_stats_frame,
        remove_from_ivf_index,
    )

    sf = "/root/testdata/sf0.01"
    index = build_ivf_base_index(spark, sf)
    posting = index[1]
    tomb = posting.where(
        F.col("vec_id") % IVF_DELETE_MOD == IVF_DELETE_REMAINDER
    )
    n_before = posting.count()
    n_tomb = tomb.count()
    _, posting_t, _ = remove_from_ivf_index(index, tomb)

    rows = posting_stats_frame(posting_t).collect()
    assert sum(r.n_vecs for r in rows) == n_before - n_tomb
    n_total = n_before - n_tomb
    for r in rows:
        assert r.share_ppm == (r.n_vecs * 1_000_000) // n_total
    k = len(rows)
    sq = sum(r.n_vecs ** 2 for r in rows)
    assert {r.imbalance_ppm for r in rows} == {
        (k * sq * 1_000_000) // (n_total * n_total)
    }


def test_inrow_assign_matches_longform(spark):
    """r13 optimization pin: the in-row assignment tier (_assign_inrow /
    _lloyd_step / _probe_inrow / _pq_assign_inrow) must be row-identical
    to the long-form reference spelling (_dists_to_centroids ->
    _argmin_cid -> _lloyd_update, and the rank-window probe) it
    replaced in every IVF/PQ operator — the argmin fold, the struct
    tiebreak, and the exact bigint mean arithmetic are the invariants.
    Exercised across a full 2-step Lloyd train so any drift compounds
    into a visible assignment change."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.similarity import (
        N_PROBE,
        _argmin_cid,
        _assign_inrow,
        _dists_to_centroids,
        _lloyd_step,
        _lloyd_update,
        _micro_arr,
        _pq_assign,
        _pq_assign_inrow,
        _pq_step,
        _pq_subvectors,
        _pq_update,
        _seed_centroids,
    )
    from pyspark.sql.window import Window
    from projetbigdata_spark.sources.catalog import load_table
    from tests.conftest import SF_CHECK

    vec = _micro_arr(load_table(spark, SF_CHECK, "embeddings"))
    cents_ref = _seed_centroids(vec)
    cents_new = cents_ref
    for _ in range(2):
        cents_ref = _lloyd_update(
            vec, _argmin_cid(_dists_to_centroids(vec, cents_ref))
        ).localCheckpoint()
        cents_new = _lloyd_step(vec, cents_new).localCheckpoint()
    # trained centroids identical (exact bigint means)
    assert cents_ref.subtract(cents_new).count() == 0
    assert cents_new.subtract(cents_ref).count() == 0
    # final assignment identical, including the cid tiebreak
    a_ref = _argmin_cid(_dists_to_centroids(vec, cents_ref))
    a_new = _assign_inrow(vec, cents_new).select("vec_id", "cid")
    assert a_ref.subtract(a_new).count() == 0
    assert a_new.subtract(a_ref).count() == 0
    # probe ranking identical to the rank-window spelling
    wp = Window.partitionBy("vec_id").orderBy("d", "cid")
    p_ref = (
        _dists_to_centroids(vec, cents_ref)
        .withColumn("pr", F.row_number().over(wp))
        .where(F.col("pr") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"), "cid")
    )
    from projetbigdata_spark.operators.similarity import _probe_inrow

    p_new = _probe_inrow(vec, cents_new, N_PROBE)
    assert p_ref.subtract(p_new).count() == 0
    assert p_new.subtract(p_ref).count() == 0
    # PQ twin: trained codebook + final codes identical
    subv = _pq_subvectors(vec).localCheckpoint(eager=False)
    from projetbigdata_spark.operators.similarity import PQ_K, SEED_LO

    book0 = subv.where(
        (F.col("vec_id") >= SEED_LO) & (F.col("vec_id") < SEED_LO + PQ_K)
    ).select(
        "sub",
        (F.col("vec_id") - SEED_LO).cast("int").alias("code"),
        F.col("sxs").alias("ms"),
    )
    book_ref, book_new = book0, book0
    for _ in range(2):
        book_ref = _pq_update(subv, _pq_assign(subv, book_ref)).localCheckpoint()
        book_new = _pq_step(subv, book_new).localCheckpoint()
    assert book_ref.subtract(book_new).count() == 0
    assert book_new.subtract(book_ref).count() == 0
    c_ref = _pq_assign(subv, book_ref)
    c_new = _pq_assign_inrow(subv, book_new).select("vec_id", "sub", "code")
    assert c_ref.subtract(c_new).count() == 0
    assert c_new.subtract(c_ref).count() == 0
