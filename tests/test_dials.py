"""Deployment-dial parameters (r3): the registered queries pin the
fixture-tuned, oracle-mirrored defaults; these tests pin that the
dials themselves work — different values change selectivity in the
right DIRECTION without breaking result contracts."""

from __future__ import annotations

from tests.conftest import SF_CHECK


def test_suggest_df_cap_tracks_posting_mass(spark):
    from projetbigdata_spark.operators.dedup import suggest_df_cap

    tight = suggest_df_cap(spark, SF_CHECK, posting_budget=0.01)
    loose = suggest_df_cap(spark, SF_CHECK, posting_budget=0.9)
    # monotone in the budget; the head bucket is always dropped (it IS
    # the ubiquitous-shingle mass the cap exists to exclude), so even a
    # 0.9 budget returns a cap below the corpus's max df bucket
    assert tight <= loose
    assert isinstance(tight, int) and isinstance(loose, int)
    # degenerate-budget floor (review finding r3): even when the first
    # histogram bucket alone exceeds the budget, the cap must admit
    # df=2 postings — cap 1 would filter the 2<=df<=cap index empty
    # and silently report zero near-duplicate pairs
    assert tight >= 3


def test_jaccard_df_cap_dial_monotone(spark):
    """A larger cap can only ADD candidate shingles, so the pair set
    grows monotonically with the cap (and the tight-cap result is a
    subset of the loose-cap one)."""
    from projetbigdata_spark.operators.dedup import dedup_jaccard_pairs

    tight = {
        (r.doc_a, r.doc_b)
        for r in dedup_jaccard_pairs(spark, SF_CHECK, df_cap=20).collect()
    }
    loose = {
        (r.doc_a, r.doc_b)
        for r in dedup_jaccard_pairs(spark, SF_CHECK, df_cap=500).collect()
    }
    assert tight <= loose


import os as _os

import pytest as _pytest

SOAK_DIR = "/tmp/soak/sf1"


@_pytest.mark.skipif(
    not _os.path.isdir(SOAK_DIR),
    reason="sf1 soak fixtures absent — regenerate with examples/gen_soak.py",
)
def test_jaccard_auto_df_cap_at_soak(spark):
    """The opt-in df_cap="auto" wiring (NEXT r3 item 3) at soak scale:
    the adaptive cap lands at the corpus's posting-mass knee, the
    resulting pair set obeys the monotone-in-cap contract vs the fixed
    registered cap, and the dial has a real selectivity EFFECT — the
    df-capped inverted index it admits carries measurably different
    posting mass than the fixed cap's."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.dedup import (
        SHINGLE_DF_CAP,
        _hashed_shingles,
        dedup_jaccard_pairs,
        suggest_df_cap,
    )

    cap = suggest_df_cap(spark, SOAK_DIR)
    assert cap >= 3  # usable index floor

    auto_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup_jaccard_pairs(spark, SOAK_DIR, df_cap="auto").collect()
    }
    fixed_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup_jaccard_pairs(spark, SOAK_DIR).collect()
    }
    # monotone-in-cap contract holds whichever side the knee lands on
    if cap <= SHINGLE_DF_CAP:
        assert auto_pairs <= fixed_pairs
    else:
        assert fixed_pairs <= auto_pairs

    # the dial genuinely moves index selectivity: posting mass admitted
    # under each cap differs when the caps differ
    df_hist = (
        _hashed_shingles(spark, SOAK_DIR)
        .groupBy("h")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= 2)
    )
    auto_mass = df_hist.where(F.col("df") <= cap).agg(
        F.sum("df")
    ).collect()[0][0]
    fixed_mass = df_hist.where(F.col("df") <= SHINGLE_DF_CAP).agg(
        F.sum("df")
    ).collect()[0][0]
    assert auto_mass and auto_mass > 0
    if cap != SHINGLE_DF_CAP:
        assert auto_mass != fixed_mass


def test_ivf_incremental_k_nprobe_dials(spark):
    """Non-default k/nprobe on the incremental tier still yield a
    full exact-reranked result per covered arrival, with the same
    new-queries/base-neighbors contract, and nprobe=k (probe every
    list) recovers at least the rank-1 neighbors of the registered
    dials — more lists can only improve the candidate pool."""
    from projetbigdata_spark.operators.similarity import (
        sim_ivf_incremental,
    )

    small = sim_ivf_incremental(spark, SF_CHECK, k=8, nprobe=2)
    per_q = {}
    for r in small.collect():
        per_q.setdefault(r.query_id, []).append(r.rnk)
    assert per_q
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())

    full = {
        (r.query_id, r.neighbor_id)
        for r in sim_ivf_incremental(spark, SF_CHECK, k=8, nprobe=8)
        .where("rnk = 1")
        .collect()
    }
    reg_best = {
        (r.query_id, r.neighbor_id)
        for r in sim_ivf_incremental(spark, SF_CHECK)
        .where("rnk = 1")
        .collect()
    }
    # probing every one of the 8 lists is exhaustive for that codebook:
    # its rank-1 per query is the true nearest base neighbor, so any
    # registered-dial rank-1 agreeing on query set must be a subset
    # intersection-wise sanity (codebooks differ, so exact equality is
    # not implied; non-empty overlap is the smoke contract)
    assert full and reg_best
    assert {q for q, _ in full} == {q for q, _ in reg_best}


def test_ivf_incremental_contract(spark):
    """Incremental IVF: every query is a NEW-slice vector, every
    neighbor is a BASE vector (new x old only — never new x new), and
    each query gets at most TOP_K exact-reranked neighbors with dense
    ranks."""
    from projetbigdata_spark.operators.similarity import (
        NEW_MOD,
        NEW_REMAINDER,
        SEED_HI,
        TOP_K,
        sim_ivf_incremental,
    )

    rows = sim_ivf_incremental(spark, SF_CHECK).collect()
    assert rows

    def is_new(v):
        return v % NEW_MOD == NEW_REMAINDER and v >= SEED_HI

    per_q = {}
    for r in rows:
        assert is_new(r.query_id), r
        assert not is_new(r.neighbor_id), r
        per_q.setdefault(r.query_id, []).append(r.rnk)
    for q, rnks in per_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), q
        assert len(rnks) <= TOP_K


def test_sample_assign_realizes_mixture(spark):
    """corpus_sample_assign must (a) be a full-corpus assignment over
    the target languages, (b) give every doc of one language the same
    epochs_micros, and (c) realize the target mixture: summing
    n_repeats * n_tokens per language lands within 2% of
    target_share * total (the hash-bucket fractional rounding is the
    only slack)."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.packing import (
        MIX_TARGETS,
        corpus_sample_assign,
    )

    out = corpus_sample_assign(spark, SF_CHECK).cache()
    per_lang = {
        r.lang: r
        for r in out.groupBy("lang")
        .agg(
            F.countDistinct("epochs_micros").alias("n_eps"),
            F.sum(F.col("n_repeats") * F.col("n_tokens")).alias(
                "sampled_tokens"
            ),
            F.sum("n_tokens").alias("natural_tokens"),
        )
        .collect()
    }
    assert all(r.n_eps == 1 for r in per_lang.values())
    total = sum(r.natural_tokens for r in per_lang.values())
    for lang, share in MIX_TARGETS.items():
        if lang not in per_lang:
            continue
        realized = per_lang[lang].sampled_tokens / total
        assert abs(realized - share) <= 0.02 * max(share, 1e-9) + 0.002, (
            lang,
            realized,
            share,
        )
    out.unpersist()


def test_ivf_k_nprobe_dials(spark):
    """Non-default k/nprobe still yield a full exact-reranked top-k
    result per query (the contract), and probing every list at the
    default k reproduces the registered result or better."""
    from projetbigdata_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        sim_ivf_topk,
    )

    out = sim_ivf_topk(spark, SF_CHECK, k=8, nprobe=2)
    rows = out.collect()
    assert len(rows) == N_QUERIES * TOP_K
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, set()).add(r.rnk)
    assert all(v == set(range(1, TOP_K + 1)) for v in per_q.values())


def test_semantic_dedup_auto_k(spark):
    """dedup_semantic's DEFAULT k auto-dials (VERDICT r5 item 1, the
    df_cap="auto" precedent): k="auto" resolves to ≈ √n/2 from a
    metadata-cheap count, so the registered fixture constant can never
    be silently inherited at corpus scale where pair work ∝ n²/k. The
    registered row still pins k=16 (the oracle's seed range)."""
    from projetbigdata_spark.operators.similarity import (
        COSINE_THRESHOLD,
        _auto_k,
        dedup_semantic,
    )

    # the rule itself: ≈ √n/2, floored at 2
    assert _auto_k(500) == 11
    assert _auto_k(2_000) == 22
    assert _auto_k(250_000) == 250
    assert _auto_k(1) == 2
    for n in (100, 10_000, 1_000_000):
        assert abs(_auto_k(n) - (n**0.5) / 2) <= 0.5

    # the default path resolves and keeps the output contract: every
    # drop row names a strictly lower-id canonical in the same cluster
    got = dedup_semantic(spark, SF_CHECK).collect()  # k defaults to auto
    assert len(got) > 0
    assert got[0].__fields__ == ["vec_id", "dup_of", "cid", "cosine"]
    for r in got:
        assert r.dup_of < r.vec_id
        assert r.cosine >= COSINE_THRESHOLD


def test_seed_centroids_sparse_ids_fallback(spark):
    """_seed_centroids must yield EXACTLY k centroids even when the
    vec_ids are sparse or don't start near SEED_LO (ADVICE r6): the
    fixed id window [SEED_LO, SEED_LO+k) silently under-seeds on such
    a corpus, degrading pair work back toward n²/actual_k — the exact
    failure k="auto" was added to prevent. The fallback seeds the
    first k rows AFTER the first SEED_LO rows in vec_id order, and on
    contiguous ids the fast path and the fallback agree exactly."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.similarity import (
        SEED_LO,
        _seed_centroids,
    )

    k = 4
    dims = list(range(3))

    def vec_frame(ids):
        return spark.createDataFrame(
            [(i, [float(i) + d for d in dims]) for i in ids],
            "vec_id bigint, xs array<double>",
        )

    # contiguous ids: fast path fires; cid i holds vec SEED_LO + i
    cont = {
        r.cid: r.ms
        for r in _seed_centroids(vec_frame(range(40)), k).collect()
    }
    assert sorted(cont) == list(range(k))
    for cid, ms in cont.items():
        assert ms[0] == float(SEED_LO + cid)

    # SPARSE ids (multiples of 7: only 14 and 21 fall in the window):
    # the old window seeded 2 of 4; the fallback must seed exactly k,
    # picking rank positions SEED_LO..SEED_LO+k-1 => ids 70,77,84,91
    sparse_ids = [i * 7 for i in range(40)]
    sp = {
        r.cid: r.ms
        for r in _seed_centroids(vec_frame(sparse_ids), k).collect()
    }
    assert sorted(sp) == list(range(k))
    for cid, ms in sp.items():
        assert ms[0] == float((SEED_LO + cid) * 7)

    # SHIFTED ids (corpus starts at 1000, nothing in the window)
    sh = {
        r.cid: r.ms
        for r in _seed_centroids(
            vec_frame(range(1000, 1040)), k
        ).collect()
    }
    assert sorted(sh) == list(range(k))
    for cid, ms in sh.items():
        assert ms[0] == float(1000 + SEED_LO + cid)


def test_seed_centroids_tiny_and_empty_corpus(spark):
    """ADVICE r7 (low): on a corpus with n <= SEED_LO the rank-based
    fallback silently returned ZERO centroids — every downstream
    k-means/dedup output went empty with no error. Now it re-anchors
    at offset 0 (first min(k, n) vectors). A genuinely EMPTY corpus
    yields an empty centroid frame, NOT an error — empty-in/empty-out
    is the registered contract (tests/test_empty_inputs.py runs the
    sim family on 0-row tables); the zero-centroid hazard the advice
    names is specifically the non-empty case, covered above."""
    from projetbigdata_spark.operators.similarity import (
        SEED_LO,
        _seed_centroids,
    )

    k = 4
    dims = list(range(3))

    def vec_frame(ids):
        return spark.createDataFrame(
            [(i, [float(i) + d for d in dims]) for i in ids],
            "vec_id bigint, xs array<double>",
        )

    # n = SEED_LO - 2 <= SEED_LO: first min(k, n) vectors, cid = rank
    tiny_n = max(SEED_LO - 2, 1)
    tiny = {
        r.cid: r.ms
        for r in _seed_centroids(vec_frame(range(tiny_n)), k).collect()
    }
    assert sorted(tiny) == list(range(min(k, tiny_n)))
    for cid, ms in tiny.items():
        assert ms[0] == float(cid)

    # n < k (and <= SEED_LO): all n vectors become centroids
    few = {
        r.cid: r.ms
        for r in _seed_centroids(vec_frame(range(2)), k).collect()
    }
    assert sorted(few) == [0, 1]

    assert _seed_centroids(vec_frame([]), k).count() == 0


def test_seed_centroids_memoizes_fastpath_verdict(spark):
    """ADVICE r7 (low): the fast-path count job runs once per
    (DataFrame object, k) — composed reports calling into the seeding
    repeatedly (three tier-overlap subtrees) reuse the verdict."""
    from projetbigdata_spark.operators.similarity import _seed_centroids

    k = 4
    vec = spark.createDataFrame(
        [(i, [float(i)]) for i in range(40)],
        "vec_id bigint, xs array<double>",
    )
    _seed_centroids(vec, k)
    assert vec.__dict__.get("_seed_fastpath_ok") == {k}
    # second call must not clear or rebuild the memo
    _seed_centroids(vec, k)
    assert vec.__dict__.get("_seed_fastpath_ok") == {k}


def test_bucket_cap_dial_monotone(spark):
    """VERDICT r8 item 2: the per-(band,bucket) candidate cap keeps
    the `cap` smallest doc_ids per bucket, so a larger cap can only
    ADD candidate pairs — edges monotone in the cap, a
    beyond-max-bucket cap exactly reproduces the uncapped edge set,
    and capped components REFINE the uncapped partition (fewer edges
    split, never merge)."""
    from projetbigdata_spark.operators.dedup import (
        dedup_components_minhash,
        dedup_minhash_estimate,
    )

    def edges(cap):
        return {
            (r.doc_a, r.doc_b)
            for r in dedup_minhash_estimate(
                spark, SF_CHECK, bucket_cap=cap
            ).collect()
        }

    tight, mid, uncapped = edges(2), edges(3), edges(None)
    assert tight <= mid <= uncapped
    assert tight < uncapped  # the fixture's 3-4-doc buckets DO cap
    # cap beyond the corpus max bucket size (4 at sf0.01) == off
    assert edges(1024) == uncapped

    capped_comp = {
        r.doc_id: r.component_id
        for r in dedup_components_minhash(
            spark, SF_CHECK, bucket_cap=2
        ).collect()
    }
    full_comp = {
        r.doc_id: r.component_id
        for r in dedup_components_minhash(spark, SF_CHECK).collect()
    }
    # refinement: docs sharing a CAPPED component share the full one
    assert set(capped_comp) <= set(full_comp)
    from collections import defaultdict

    groups = defaultdict(set)
    for d, c in capped_comp.items():
        groups[c].add(d)
    for members in groups.values():
        assert len({full_comp[d] for d in members}) == 1


def test_suggest_bucket_cap_contract(spark):
    """Power-of-2 >= 2, monotone in the coverage quantile, and sits at
    or above the corpus's common-case bucket size (only the tail gets
    truncated at the default 99.9% coverage)."""
    from projetbigdata_spark.operators.dedup import suggest_bucket_cap

    loose = suggest_bucket_cap(spark, SF_CHECK)  # 99.9% of buckets
    tight = suggest_bucket_cap(spark, SF_CHECK, coverage_ppm=500_000)
    assert tight <= loose
    for cap in (tight, loose):
        assert cap >= 2 and (cap & (cap - 1)) == 0  # power of 2
    # at sf0.01 the max bucket is 4 -> the 99.9% ceiling admits it
    assert loose >= 4


def test_bucket_cap_report_prices_the_dial(spark):
    """The telemetry's pairs_capped must equal the ACTUAL capped
    emission: sum over buckets of min(m, cap)·(min(m, cap)-1)/2 —
    cross-checked against the real capped candidate join, and the
    uncapped column against the uncapped join's candidate count."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.dedup import (
        BUCKET_CAP_DEFAULT,
        _band_explode,
        _signatures,
        dedup_bucket_cap_report,
    )

    rep = dedup_bucket_cap_report(spark, SF_CHECK).collect()
    assert all(r.pairs_capped <= r.pairs_uncapped for r in rep)
    assert any(r.n_buckets_capped > 0 for r in rep)  # fixture trips it

    # recompute per-band pair emission from raw bucket membership
    rows = _band_explode(_signatures(spark, SF_CHECK)).collect()
    from collections import Counter, defaultdict

    sizes = Counter((r.band, r.bucket) for r in rows)
    want_un, want_cap = defaultdict(int), defaultdict(int)
    for (band, _), m in sizes.items():
        want_un[band] += m * (m - 1) // 2
        mc = min(m, BUCKET_CAP_DEFAULT)
        want_cap[band] += mc * (mc - 1) // 2
    got = {r.band: (r.pairs_uncapped, r.pairs_capped) for r in rep}
    assert got == {
        b: (want_un[b], want_cap[b]) for b in want_un
    }
