"""Engine-independent verification of the r5 second-wave operators:
the DuckDB oracle (test_oracle_parity) proves Spark == DuckDB; these
tests prove both == a pure-Python model of the same integer formulas
(the pattern test_text_properties uses for the BPE trainer), plus the
semantic invariants each operator's docstring promises.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _tokens(text):
    if text is None:
        return []
    return [t for t in text.lower().split() if t != ""]


@pytest.fixture(scope="module")
def docs(spark):
    return {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }


@pytest.fixture(scope="module")
def docs_lang(spark):
    return {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }


def test_bm25_matches_python_model(spark, docs):
    """text_search_bm25's integer-exact score == a from-scratch Python
    BM25 with the same rational dials (k1=6/5, b=3/4, log-free
    Robertson idf in millionths, integral divides)."""
    from projetbigdata_spark.operators.tfidf import (
        BM25_TERMS,
        BM25_TOP_N,
        text_search_bm25,
    )

    tok = {d: _tokens(t) for d, t in docs.items()}
    n_docs = len(docs)
    s_tokens = sum(len(w) for w in tok.values())
    tf = {
        d: Counter(t for t in w if t in BM25_TERMS)
        for d, w in tok.items()
    }
    tf = {d: c for d, c in tf.items() if c}
    df = Counter(t for c in tf.values() for t in c)
    idf_m = {
        t: ((n_docs - df[t]) * 2 + 1) * 1_000_000 // (df[t] * 2 + 1)
        for t in df
    }
    expected = {}
    for d, c in tf.items():
        dl = len(tok[d])
        score = sum(
            (idf_m[t] * 22 * n * s_tokens)
            // (10 * n * s_tokens + 3 * s_tokens + 9 * dl * n_docs)
            for t, n in c.items()
        )
        expected[d] = (score, sum(c.values()))
    top = sorted(expected.items(), key=lambda kv: (-kv[1][0], kv[0]))
    top = top[:BM25_TOP_N]

    got = text_search_bm25(spark, SF_SMOKE).collect()
    assert [(r.doc_id, (r.score_m, r.total_tf)) for r in got] == top


def test_containment_dominates_jaccard_and_is_bounded(spark):
    """C(a->b) = I/|A| >= I/|A u B| = J on the same capped index, and
    both directions stay in [0, 1e6]."""
    from projetbigdata_spark.operators.dedup import (
        dedup_containment_pairs,
        dedup_jaccard_pairs,
    )

    cont = {
        (r.doc_a, r.doc_b): (r.cont_a_ppm, r.cont_b_ppm)
        for r in dedup_containment_pairs(spark, SF_SMOKE).collect()
    }
    assert cont, "fixture corpus should contain containment pairs"
    for (a, b), (ca, cb) in cont.items():
        assert a < b
        assert 0 <= ca <= 1_000_000 and 0 <= cb <= 1_000_000
        assert max(ca, cb) >= 500_000
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_jaccard_pairs(spark, SF_SMOKE).collect()
    }
    shared = set(cont) & set(jac)
    assert shared, "some pairs should clear both thresholds"
    for p in shared:
        assert max(cont[p]) >= math.floor(jac[p] * 1_000_000)


def test_dsir_matches_python_model(spark, docs, docs_lang):
    """corpus_dsir_weights == the Python importance-ratio model, and
    target-slice (en) docs average a higher weight than the rest —
    the direction DSIR selection depends on."""
    from projetbigdata_spark.operators.selection import (
        DSIR_TARGET_LANG,
        corpus_dsir_weights,
    )

    c_r: Counter = Counter()
    c_t: Counter = Counter()
    for d, t in docs.items():
        w = _tokens(t)
        c_r.update(w)
        if docs_lang[d] == DSIR_TARGET_LANG:
            c_t.update(w)
    r_total = sum(c_r.values())
    t_total = sum(c_t.values())
    expected = {}
    for d, t in docs.items():
        w = _tokens(t)
        if not w:
            expected[d] = (0, None)
            continue
        s = sum(
            (c_t.get(x, 0) * r_total * 1_000_000) // (c_r[x] * t_total)
            for x in w
        )
        expected[d] = (len(w), s // len(w))

    got = {
        r.doc_id: (r.n_tokens, r.dsir_weight_ppm)
        for r in corpus_dsir_weights(spark, SF_SMOKE).collect()
    }
    assert got == expected

    en = [v for d, (_, v) in expected.items() if docs_lang[d] == "en" and v]
    rest = [
        v for d, (_, v) in expected.items() if docs_lang[d] != "en" and v
    ]
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_dsir_smoothing_modes_agree_on_ordering(spark, docs, docs_lang):
    """The add-one variant (VERDICT r5 item 6): matches its own Python
    model (Laplace on both counts with the V = |vocab| total
    adjustment), never zeroes a tokenized doc (the point of
    smoothing), and agrees with the unsmoothed mode on the ordering
    that drives selection — pairwise rank agreement on clearly
    separated docs, and the same en-over-rest mean direction."""
    from projetbigdata_spark.operators.selection import (
        DSIR_TARGET_LANG,
        corpus_dsir_weights,
    )

    c_r: Counter = Counter()
    c_t: Counter = Counter()
    for d, t in docs.items():
        w = _tokens(t)
        c_r.update(w)
        if docs_lang[d] == DSIR_TARGET_LANG:
            c_t.update(w)
    r_total = sum(c_r.values())
    t_total = sum(c_t.values())
    v = len(c_r)
    expected = {}
    for d, t in docs.items():
        w = _tokens(t)
        if not w:
            expected[d] = (0, None)
            continue
        s = sum(
            ((c_t.get(x, 0) + 1) * (r_total + v) * 1_000_000)
            // ((c_r[x] + 1) * (t_total + v))
            for x in w
        )
        expected[d] = (len(w), s // len(w))

    got = {
        r.doc_id: (r.n_tokens, r.dsir_weight_ppm)
        for r in corpus_dsir_weights(
            spark, SF_SMOKE, smoothing="add_one"
        ).collect()
    }
    assert got == expected

    # smoothing's defining property: every tokenized doc keeps a
    # strictly positive weight (unsmoothed zeroes target-absent docs)
    assert all(wt > 0 for n, wt in got.values() if n > 0)

    plain = {
        r.doc_id: r.dsir_weight_ppm
        for r in corpus_dsir_weights(spark, SF_SMOKE).collect()
        if r.dsir_weight_ppm is not None
    }
    sm = {d: wt for d, (n, wt) in got.items() if n > 0}
    # ordering agreement: across doc pairs separated by >=1% in BOTH
    # modes (the fixture corpus's weights span ~±2.5%, and add-one
    # perturbs each weight by only ~100 ppm — far inside that margin),
    # the two modes never disagree on which doc ranks higher
    ids = sorted(plain)
    checked = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            pa, pb, sa, sb = plain[a], plain[b], sm[a], sm[b]
            if (
                min(pa, pb) * 101 < max(pa, pb) * 100
                and min(sa, sb) * 101 < max(sa, sb) * 100
            ):
                checked += 1
                assert (pa > pb) == (sa > sb), (a, b, pa, pb, sa, sb)
    assert checked > 100  # the margin filter must not vacuously pass

    en = [v for d, v in sm.items() if docs_lang[d] == "en"]
    rest = [v for d, v in sm.items() if docs_lang[d] != "en"]
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_bigram_prob_matches_python_model(spark, docs):
    """text_bigram_prob_score == the Python bigram-continuation model;
    scores are bounded by 1e6 and exact duplicates score identically."""
    from projetbigdata_spark.operators.selection import (
        text_bigram_prob_score,
    )

    c_bg: Counter = Counter()
    c_start: Counter = Counter()
    doc_grams = {}
    for d, t in docs.items():
        w = _tokens(t)
        grams = [(w[i], w[i + 1]) for i in range(len(w) - 1)]
        doc_grams[d] = grams
        c_bg.update(grams)
        c_start.update(g[0] for g in grams)
    expected = {}
    for d, grams in doc_grams.items():
        if not grams:
            expected[d] = (0, None)
            continue
        s = sum(c_bg[g] * 1_000_000 // c_start[g[0]] for g in grams)
        expected[d] = (len(grams), s // len(grams))

    got = {
        r.doc_id: (r.n_bigrams, r.mean_bigram_ppm)
        for r in text_bigram_prob_score(spark, SF_SMOKE).collect()
    }
    assert got == expected
    for n, m in got.values():
        if n:
            assert 0 <= m <= 1_000_000

    by_text = defaultdict(list)
    for d, t in docs.items():
        by_text[t].append(d)
    dup_groups = [ids for ids in by_text.values() if len(ids) > 1]
    for ids in dup_groups:
        assert len({got[d] for d in ids}) == 1


def test_fertility_consistent_with_encode(spark, docs_lang):
    """corpus_bpe_fertility is exactly corpus_bpe_encode rolled up by
    language (totals match; ppm is the integral quotient)."""
    from projetbigdata_spark.operators.textstats import (
        corpus_bpe_encode,
        corpus_bpe_fertility,
    )

    enc = corpus_bpe_encode(spark, SF_SMOKE).collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in enc:
        a = agg[docs_lang[r.doc_id]]
        a[0] += 1
        a[1] += r.n_words
        a[2] += r.n_tokens_bpe
    got = {
        r.lang: (r.n_docs, r.n_words, r.n_tokens_bpe, r.fertility_ppm)
        for r in corpus_bpe_fertility(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(agg)
    for lang, (nd, nw, nt) in agg.items():
        fert = nt * 1_000_000 // nw if nw > 0 else None
        assert got[lang] == (nd, nw, nt, fert)


def test_anomaly_mad_matches_python_model(spark):
    """events_anomaly_mad's flags == recomputed median/MAD over the
    collected hourly counts (exact: integer counts, halves-only
    medians)."""
    from projetbigdata_spark.streaming.events_batch import (
        events_anomaly_mad,
    )

    rows = events_anomaly_mad(spark, SF_SMOKE).collect()
    assert rows

    def median(xs):
        xs = sorted(xs)
        n = len(xs)
        mid = n // 2
        return (
            float(xs[mid])
            if n % 2
            else (xs[mid - 1] + xs[mid]) / 2.0
        )

    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    flagged = 0
    for rs in by_type.values():
        med = median([r.n_events for r in rs])
        mad = median([abs(r.n_events - med) for r in rs])
        for r in rs:
            assert r.med == med and r.mad == mad
            assert r.is_anomaly == (abs(r.n_events - med) > 3 * mad)
            flagged += bool(r.is_anomaly)
    # the synthetic stream is bursty enough to trip the rule somewhere,
    # but a 3-MAD gate must never flag a majority of hours
    assert flagged < len(rows) / 2


def test_dsir_sample_matches_python_model(spark):
    """corpus_dsir_sample == the Python accept/reject model derived
    from the weights frame: capped scaled acceptance, salted md5
    bucket, NULL-weight docs never selected; realized rate lands in a
    sane band around the 25% uniform-weight target."""
    import hashlib

    from projetbigdata_spark.operators.selection import (
        DSIR_SELECT_MICROS,
        corpus_dsir_sample,
        corpus_dsir_weights,
    )

    weights = {
        r.doc_id: r.dsir_weight_ppm
        for r in corpus_dsir_weights(spark, SF_SMOKE).collect()
    }
    live = {d: w for d, w in weights.items() if w is not None}
    w_sum, w_n = sum(live.values()), len(live)

    def accept(w):
        if w is None or w_sum == 0:
            return 0
        return min(1_000_000, w * DSIR_SELECT_MICROS * w_n // w_sum)

    def bucket(d):
        h = hashlib.md5(f"dsir{d}".encode()).hexdigest()[:8]
        return int(h, 16) % 1_000_000

    got = corpus_dsir_sample(spark, SF_SMOKE).collect()
    assert {r.doc_id for r in got} == set(weights)
    for r in got:
        assert r.accept_micros == accept(weights[r.doc_id]), r.doc_id
        assert r.bucket == bucket(r.doc_id), r.doc_id
        assert r.selected == (r.bucket < r.accept_micros)
        if weights[r.doc_id] is None:
            assert not r.selected
    rate = sum(r.selected for r in got) / len(got)
    assert 0.10 < rate < 0.40, rate


def test_ngram_diversity_matches_python_model(spark, docs):
    """corpus_ngram_diversity == the Python distinct-n model; ratios
    bounded by 1e6; exact duplicate docs score identically."""
    from projetbigdata_spark.operators.textstats import (
        corpus_ngram_diversity,
    )

    expected = {}
    for d, t in docs.items():
        w = _tokens(t)
        bg = [(w[i], w[i + 1]) for i in range(len(w) - 1)]
        nt, ndt = len(w), len(set(w))
        nb, ndb = len(bg), len(set(bg))
        expected[d] = (
            nt,
            ndt,
            nb,
            ndb,
            ndt * 1_000_000 // nt if nt else None,
            ndb * 1_000_000 // nb if nb else None,
        )
    got = {
        r.doc_id: (
            r.n_tokens,
            r.n_distinct_tokens,
            r.n_bigrams,
            r.n_distinct_bigrams,
            r.distinct1_ppm,
            r.distinct2_ppm,
        )
        for r in corpus_ngram_diversity(spark, SF_SMOKE).collect()
    }
    assert got == expected
    for _, _, _, _, d1, d2 in got.values():
        assert d1 is None or 0 < d1 <= 1_000_000
        assert d2 is None or 0 < d2 <= 1_000_000


def test_source_divergence_matches_python_model(spark):
    """corpus_source_divergence == the Python TV-distance model built
    with the same ppb floors AND the absent-words identity expanded
    the naive way (full vocabulary sum, halved — TV = ½·L1) — proving
    the bounded-join identity is exact, not an approximation. TV stays
    in [0, 1e9]."""
    from projetbigdata_spark.operators.curation import (
        corpus_source_divergence,
    )

    rows = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    st: Counter = Counter()
    for r in rows:
        for t in _tokens(r.text):
            st[(r.source, t)] += 1
    corpus: Counter = Counter()
    for (s, t), c in st.items():
        corpus[t] += c
    t_total = sum(corpus.values())
    p = {t: c * 1_000_000_000 // t_total for t, c in corpus.items()}
    t_s: Counter = Counter()
    for (s, t), c in st.items():
        t_s[s] += c
    expected = {}
    for s in t_s:
        # NAIVE full-vocab sum (the identity's left-hand side)
        l1 = sum(
            abs(st.get((s, t), 0) * 1_000_000_000 // t_s[s] - p[t])
            for t in corpus
        )
        expected[s] = (t_s[s], l1 // 2)

    got = {
        r.source: (r.n_tokens, r.tv_ppb)
        for r in corpus_source_divergence(spark, SF_SMOKE).collect()
    }
    assert got == expected
    for _, tv in got.values():
        assert 0 <= tv <= 1_000_000_000


def test_dsir_hashed_matches_python_model(spark, docs, docs_lang):
    """corpus_dsir_weights_hashed == a from-scratch Python model of
    the hashed-bigram DSIR recipe (Xie et al. 2023): md5-60-bit bucket
    per adjacent word pair, add-one ratio with V = DSIR_HASH_BUCKETS,
    integral divides throughout. Also pins the recipe's direction
    (en docs average a higher weight) and that hashing preserves the
    smoothing guarantee (every doc with >=2 tokens keeps a strictly
    positive weight)."""
    import hashlib

    from projetbigdata_spark.operators.selection import (
        DSIR_HASH_BUCKETS,
        DSIR_TARGET_LANG,
        corpus_dsir_weights_hashed,
    )

    def bucket(bg):
        return (
            int(hashlib.md5(bg.encode("utf-8")).hexdigest()[:15], 16)
            % DSIR_HASH_BUCKETS
        )

    c_r: Counter = Counter()
    c_t: Counter = Counter()
    doc_buckets = {}
    for d, t in docs.items():
        w = _tokens(t)
        bks = [bucket(f"{a} {b}") for a, b in zip(w, w[1:])]
        doc_buckets[d] = bks
        c_r.update(bks)
        if docs_lang[d] == DSIR_TARGET_LANG:
            c_t.update(bks)
    r_total = sum(c_r.values())
    t_total = sum(c_t.values())
    v = DSIR_HASH_BUCKETS
    expected = {}
    for d, bks in doc_buckets.items():
        if not bks:
            expected[d] = (0, None)
            continue
        s = sum(
            ((c_t.get(b, 0) + 1) * (r_total + v) * 1_000_000)
            // ((c_r[b] + 1) * (t_total + v))
            for b in bks
        )
        expected[d] = (len(bks), s // len(bks))

    got = {
        r.doc_id: (r.n_bigrams, r.dsir_weight_ppm)
        for r in corpus_dsir_weights_hashed(spark, SF_SMOKE).collect()
    }
    assert got == expected

    # smoothing survives hashing: every bigram-bearing doc keeps a
    # strictly positive weight
    assert all(wt > 0 for n, wt in got.values() if n > 0)

    # selection direction: target-slice docs average a higher weight
    en = [
        wt
        for d, (n, wt) in expected.items()
        if docs_lang[d] == "en" and n > 0
    ]
    rest = [
        wt
        for d, (n, wt) in expected.items()
        if docs_lang[d] != "en" and n > 0
    ]
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_token_budget_sample_matches_python_model(spark, docs, docs_lang):
    """corpus_token_budget_sample == a from-scratch Python model of
    the histogram-threshold budget fill, plus the fill contract:
    (a) every language's selected token mass reaches min(budget,
    language total); (b) the threshold is MINIMAL — dropping the
    threshold bucket would leave the fill under budget; (c) the frame
    anchors every document."""
    import hashlib

    from projetbigdata_spark.operators.sampling import (
        BUDGET_BUCKETS,
        TOKEN_BUDGET,
        corpus_token_budget_sample,
    )

    def bucket(doc_id):
        return (
            int(
                hashlib.md5(f"budget{doc_id}".encode()).hexdigest()[:8], 16
            )
            % BUDGET_BUCKETS
        )

    per_doc = {
        d: (docs_lang[d] or "", len(_tokens(t)), bucket(d))
        for d, t in docs.items()
    }
    hist: defaultdict = defaultdict(Counter)
    for lang, n, b in per_doc.values():
        hist[lang][b] += n
    t_bucket = {}
    for lang, cnt in hist.items():
        cum = 0
        t_bucket[lang] = None
        for b in sorted(cnt):
            cum += cnt[b]
            if cum >= TOKEN_BUDGET:
                t_bucket[lang] = b
                break
    expected = {
        d: (lang, n, b, b <= (t_bucket[lang] if t_bucket[lang] is not None
                              else BUDGET_BUCKETS))
        for d, (lang, n, b) in per_doc.items()
    }

    got = {
        r.doc_id: (r.lang, r.n_tokens, r.bucket, r.selected)
        for r in corpus_token_budget_sample(spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert len(got) == len(docs)  # full-corpus anchor

    # fill contract per language
    totals: Counter = Counter()
    filled: Counter = Counter()
    for lang, n, b, sel in got.values():
        totals[lang] += n
        if sel:
            filled[lang] += n
    for lang in totals:
        assert filled[lang] >= min(TOKEN_BUDGET, totals[lang]), lang
        # minimality: the fill minus the threshold bucket's mass is
        # under budget (when a threshold exists)
        if t_bucket[lang] is not None:
            assert (
                filled[lang] - hist[lang][t_bucket[lang]] < TOKEN_BUDGET
            ), lang
    # the fixture must exercise BOTH outcomes
    sels = [sel for (_, _, _, sel) in got.values()]
    assert any(sels) and not all(sels)


def test_phrase_search_matches_python_model(spark, docs):
    """text_search_phrase == the naive Python phrase counter with the
    same (count desc, doc_id asc) top-20 boundary, and every reported
    doc really contains the phrase as ADJACENT tokens in order."""
    from projetbigdata_spark.operators.tfidf import (
        PHRASE_TERMS,
        PHRASE_TOP_N,
        text_search_phrase,
    )

    counts = {}
    for d, t in docs.items():
        w = _tokens(t)
        n = sum(
            1
            for i in range(len(w) - 1)
            if (w[i], w[i + 1]) == PHRASE_TERMS
        )
        if n > 0:
            counts[d] = n
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        :PHRASE_TOP_N
    ]

    got = [
        (r.doc_id, r.n_matches)
        for r in text_search_phrase(spark, SF_SMOKE).collect()
    ]
    assert got == expected
    assert 0 < len(got) <= PHRASE_TOP_N
    # adjacency, not mere co-occurrence: a doc containing both terms
    # NON-adjacent only must not appear (construct the check from the
    # fixture: any doc with both terms but zero phrase count)
    non_adjacent = [
        d
        for d, t in docs.items()
        if d not in counts
        and set(PHRASE_TERMS) <= set(_tokens(t))
    ]
    assert non_adjacent, "fixture should hold non-adjacent co-occurrence"
    got_ids = {d for d, _ in got}
    assert not (got_ids & set(non_adjacent))


def test_phrase3_and_slop_match_python_model(spark, docs):
    """text_search_phrase3 / text_search_phrase_slop == naive Python
    counters with the same (count desc, doc_id asc) top-20 boundary,
    plus the family laws: slop-0 == exact adjacency, and per-doc slop
    hits dominate adjacency hits for the same term pair."""
    from projetbigdata_spark.operators.tfidf import (
        PHRASE3_TERMS,
        PHRASE_SLOP,
        PHRASE_TERMS,
        PHRASE_TOP_N,
        text_search_phrase,
        text_search_phrase3,
        text_search_phrase_slop,
    )

    def top(counts):
        return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :PHRASE_TOP_N
        ]

    tri_counts, slop_counts, adj_counts = {}, {}, {}
    for d, t in docs.items():
        w = _tokens(t)
        n3 = sum(
            1
            for i in range(len(w) - 2)
            if tuple(w[i : i + 3]) == PHRASE3_TERMS
        )
        if n3 > 0:
            tri_counts[d] = n3
        ns = sum(
            1
            for i in range(len(w) - 1)
            if w[i] == PHRASE_TERMS[0]
            and PHRASE_TERMS[1] in w[i + 1 : i + 2 + PHRASE_SLOP]
        )
        if ns > 0:
            slop_counts[d] = ns
        na = sum(
            1
            for i in range(len(w) - 1)
            if (w[i], w[i + 1]) == PHRASE_TERMS
        )
        if na > 0:
            adj_counts[d] = na

    got3 = [
        (r.doc_id, r.n_matches)
        for r in text_search_phrase3(spark, SF_SMOKE).collect()
    ]
    assert got3 == top(tri_counts)
    gots = [
        (r.doc_id, r.n_matches)
        for r in text_search_phrase_slop(spark, SF_SMOKE).collect()
    ]
    assert gots == top(slop_counts)
    assert gots  # fixture must exercise the slop matcher
    # dominance: every adjacency anchor is also a slop anchor
    for d, n in adj_counts.items():
        assert slop_counts.get(d, 0) >= n, d
    # the slop window must add hits beyond adjacency somewhere,
    # or the test isn't exercising the gap logic
    assert sum(slop_counts.values()) > sum(adj_counts.values())
    # exact tier consistency: registered 2-term query vs its counts
    got2 = {
        r.doc_id: r.n_matches
        for r in text_search_phrase(spark, SF_SMOKE).collect()
    }
    for d, n in got2.items():
        assert slop_counts.get(d, 0) >= n, d


def test_dsir_hashed_incremental_frozen_profile(spark, tmp_path):
    """Constructed rows pin the ingest contract: (a) only the new
    batch (source='src0') is emitted, anchored (short docs surface
    with 0 bigrams); (b) weights come from the STANDING profile only —
    adding another new doc to the batch changes NO existing verdict
    (no self-influence); (c) a bigram the standing corpus never saw
    takes the add-one floor ((R+V)·1e6) div (T+V), not zero."""
    from pyspark.sql import functions as F  # noqa: F401

    from projetbigdata_spark.operators.selection import (
        DSIR_HASH_BUCKETS,
        corpus_dsir_weights_hashed_incremental,
    )

    standing = [
        (100, "alpha beta alpha beta gamma", "en", "srcA", 0),
        (101, "delta epsilon delta epsilon", "fr", "srcA", 0),
    ]
    new1 = [
        # holds an en-heavy standing bigram ("alpha beta", c_t=c_r=2)
        # AND an fr-only one ("delta epsilon", c_t=0 < c_r=2), so its
        # mean ratio cannot collapse to the add-one floor
        (1, "alpha beta delta epsilon", "en", "src0", 0),
        (2, "zz yy xx ww", "fr", "src0", 0),  # all-novel bigrams
        (3, "single", "en", "src0", 0),  # < 2 tokens
    ]

    def write(rows, d):
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )

    d1 = str(tmp_path / "one")
    write(standing + new1, d1)
    got1 = {
        r.doc_id: (r.n_bigrams, r.dsir_weight_ppm)
        for r in corpus_dsir_weights_hashed_incremental(spark, d1).collect()
    }
    assert sorted(got1) == [1, 2, 3]  # new slice only, anchored
    assert got1[3] == (0, None)
    assert got1[1][0] == 3 and got1[2][0] == 3

    # (c) all-novel doc 2: every bucket takes the identical add-one
    # floor, so its weight IS the floor
    r_total = 4 + 3  # standing bigram counts (en doc has 4, fr has 3)
    t_total = 4
    v = DSIR_HASH_BUCKETS
    floor = ((r_total + v) * 1_000_000) // (t_total + v)
    assert got1[2][1] == floor
    # doc 1 shares standing bigrams: its weight must differ from the
    # floor (the profile is actually consulted)
    assert got1[1][1] != floor

    # (b) no self-influence: a second batch doc changes nothing
    d2 = str(tmp_path / "two")
    write(standing + new1 + [(4, "alpha beta alpha beta", "en", "src0", 0)], d2)
    got2 = {
        r.doc_id: (r.n_bigrams, r.dsir_weight_ppm)
        for r in corpus_dsir_weights_hashed_incremental(spark, d2).collect()
    }
    for d in (1, 2, 3):
        assert got2[d] == got1[d], d


def test_pack_nextfit_matches_python_model(spark, docs):
    """docs_pack_nextfit == a from-scratch Python next-fit-decreasing
    fold per shard, plus the packing contract: documents are never
    split, no pack exceeds the budget unless it holds exactly one
    oversized doc, and the decreasing order means waste is bounded
    (every non-final pack in a shard is more than half full when all
    docs fit the budget)."""
    import hashlib

    from projetbigdata_spark.operators.packing import (
        N_SHARDS,
        PACK_BUDGET,
        PACK_SHARD_STRIDE,
        docs_pack_nextfit,
    )

    def shard_of(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:4], 16) % N_SHARDS

    by_shard: defaultdict = defaultdict(list)
    for d, t in docs.items():
        by_shard[shard_of(d)].append((d, len(_tokens(t))))
    expected = {}
    for sh, items in by_shard.items():
        items.sort(key=lambda kv: (-kv[1], kv[0]))
        seq, fill = 0, 0
        for d, n in items:
            if fill > 0 and fill + n > PACK_BUDGET:
                seq, fill = seq + 1, 0
            fill += n
            expected[d] = (n, sh, sh * PACK_SHARD_STRIDE + seq, fill)

    got = {
        r.doc_id: (r.n_tokens, r.shard, r.pack_id, r.pack_fill)
        for r in docs_pack_nextfit(spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert len(got) == len(docs)  # no doc split, none dropped

    # pack contract: per-pack token total <= budget unless the pack is
    # one oversized doc
    packs: defaultdict = defaultdict(list)
    for d, (n, sh, pid, fill) in got.items():
        packs[pid].append(n)
    for pid, ns in packs.items():
        if sum(ns) > PACK_BUDGET:
            assert len(ns) == 1 and ns[0] > PACK_BUDGET, pid
    # decreasing next-fit quality: in each shard every pack except the
    # last-opened is > half full (when no oversized docs exist there)
    by_sh: defaultdict = defaultdict(dict)
    for pid, ns in packs.items():
        by_sh[pid // PACK_SHARD_STRIDE][pid] = sum(ns)
    for sh, fills in by_sh.items():
        if max(fills.values()) > PACK_BUDGET:
            continue
        last = max(fills)
        for pid, tot in fills.items():
            if pid != last:
                assert tot * 2 > PACK_BUDGET, (sh, pid)


def test_cluster_balance_sample_laws(spark):
    """corpus_cluster_balance_sample invariants: full-corpus anchor
    (one row per vector), the balance arithmetic recomputed in Python
    from the frame's own cluster sizes, the salted-bucket acceptance
    recomputed from md5, under-share clusters fully kept, and the
    realized thinning of over-share clusters within binomial
    tolerance of its target."""
    import hashlib

    from projetbigdata_spark.operators.similarity import (
        corpus_cluster_balance_sample,
    )
    from projetbigdata_spark.sources.catalog import load_table
    from tests.conftest import SF_CHECK

    rows = corpus_cluster_balance_sample(spark, SF_CHECK).collect()
    n = load_table(spark, SF_CHECK, "embeddings").count()
    assert len(rows) == n
    assert len({r.vec_id for r in rows}) == n

    sizes = {}
    for r in rows:
        sizes.setdefault(r.cid, set()).add(r.vec_id)
    csize = {c: len(v) for c, v in sizes.items()}
    assert sum(csize.values()) == n
    k = len(csize)
    share = -(-n // k)  # ceil
    kept_by_cid = {}
    for r in rows:
        assert r.cluster_n == csize[r.cid], r.vec_id
        expect_ppm = min(1_000_000, (1_000_000 * share) // r.cluster_n)
        assert r.accept_ppm == expect_ppm, r.vec_id
        hv = int(
            hashlib.md5(f"clbal{r.vec_id}".encode()).hexdigest()[:8], 16
        )
        assert r.bucket == hv % 1_000_000, r.vec_id
        assert r.selected == (r.bucket < r.accept_ppm), r.vec_id
        kept_by_cid[r.cid] = kept_by_cid.get(r.cid, 0) + int(r.selected)
    # under-share clusters keep everything
    small = [c for c in csize if csize[c] <= share]
    assert small, "fixture must have at least one under-share cluster"
    for c in small:
        assert kept_by_cid[c] == csize[c], c
    # over-share clusters are genuinely thinned toward the share (the
    # synthetic embedding space is near-uniform — clusters run ~0.7x
    # to ~1.3x the share — so the law is binomial closeness to the
    # target mass, not a dramatic cut; the 10x-cluster case is pinned
    # arithmetically by the accept_ppm check above)
    big = [c for c in csize if csize[c] > share]
    assert big, "fixture must have at least one over-share cluster"
    thinned_somewhere = False
    for c in big:
        thinned_somewhere |= kept_by_cid[c] < csize[c]
        # binomial tolerance: 5 sigma around cluster_n * accept_ppm
        p = min(1.0, share / csize[c])
        mu, sd = csize[c] * p, (csize[c] * p * (1 - p)) ** 0.5
        assert abs(kept_by_cid[c] - mu) <= 5 * sd + 3, (c, kept_by_cid[c], mu)
    assert thinned_somewhere


def test_phrase_kslop_matches_python_model(spark, docs):
    """text_search_phrase_kslop == a naive Python chain matcher
    (distinct END positions of an in-order chain with gaps <=
    PHRASE_SLOP between consecutive terms), with the family laws:
    per-doc kslop count >= the exact 3-term adjacency count (every
    adjacent chain is a slop chain), and the fixture must exercise a
    genuine gap somewhere."""
    from projetbigdata_spark.operators.tfidf import (
        PHRASE3_TERMS,
        PHRASE_SLOP,
        PHRASE_TOP_N,
        text_search_phrase3,
        text_search_phrase_kslop,
    )

    def ends(w):
        t0, t1, t2 = PHRASE3_TERMS
        out = set()
        for e in range(len(w)):
            if w[e] != t2:
                continue
            for p in range(max(0, e - PHRASE_SLOP - 1), e):
                if w[p] != t1:
                    continue
                lo = max(0, p - PHRASE_SLOP - 1)
                if t0 in w[lo:p]:
                    out.add(e)
                    break
        return len(out)

    counts = {}
    for d, t in docs.items():
        n = ends(_tokens(t))
        if n > 0:
            counts[d] = n
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        :PHRASE_TOP_N
    ]
    got = [
        (r.doc_id, r.n_matches)
        for r in text_search_phrase_kslop(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    assert got  # fixture exercises the matcher
    adj = {
        r.doc_id: r.n_matches
        for r in text_search_phrase3(spark, SF_SMOKE).collect()
    }
    for d, n in adj.items():
        assert counts.get(d, 0) >= n, d
    # the slop window must add chains beyond exact adjacency
    assert sum(counts.values()) > sum(adj.values())


def _sb_python(docs, docs_lang):
    """Pure-Python Stupid-Backoff model (en-trained, corpus-scored) —
    the integer formulas from selection._sb_score_frame verbatim."""
    tok = {d: _tokens(t) for d, t in docs.items()}
    c2: Counter = Counter()
    c3: Counter = Counter()
    for d, w in tok.items():
        if docs_lang[d] != "en":
            continue
        c2.update((w[i], w[i + 1]) for i in range(len(w) - 1))
        c3.update((w[i], w[i + 1], w[i + 2]) for i in range(len(w) - 2))
    ctx2: Counter = Counter()
    for (a, _b), c in c2.items():
        ctx2[a] += c
    ctx3: Counter = Counter()
    for (a, b, _c), c in c3.items():
        ctx3[(a, b)] += c
    b_total = sum(c2.values())
    expected = {}
    branches: Counter = Counter()
    for d, w in tok.items():
        tgs = [(w[i], w[i + 1], w[i + 2]) for i in range(len(w) - 2)]
        if not tgs:
            expected[d] = (0, 0, None)
            continue
        s = 0
        bo = 0
        for t in tgs:
            if t in c3:
                s += c3[t] * 1_000_000 // ctx3[(t[0], t[1])]
                branches["tri"] += 1
            else:
                bo += 1
                bg = (t[1], t[2])
                if bg in c2:
                    s += c2[bg] * 400_000 // ctx2[t[1]]
                    branches["bi"] += 1
                elif ctx2[t[2]] > 0:
                    s += ctx2[t[2]] * 160_000 // b_total
                    branches["uni"] += 1
                else:
                    branches["zero"] += 1
        expected[d] = (len(tgs), bo, s // len(tgs))
    return expected, branches


def test_trigram_backoff_matches_python_model(spark, docs, docs_lang):
    """text_trigram_backoff_score == the Python Stupid-Backoff model
    (Brants et al. 2007 count ratios with exact 400000/160000 ppm
    backoff factors, en-trained). Laws: target-slice docs never back
    off (the model contains their own trigrams); non-target docs DO at
    this fixture (the branch the target-vs-raw split exists to
    exercise); scores bounded by 1e6."""
    from projetbigdata_spark.operators.selection import (
        text_trigram_backoff_score,
    )

    expected, branches = _sb_python(docs, docs_lang)
    got = {
        r.doc_id: (r.n_trigrams, r.n_backoff, r.sb_score_ppm)
        for r in text_trigram_backoff_score(spark, SF_SMOKE).collect()
    }
    assert got == expected
    # the trigram AND bigram backoff levels both fire at this fixture
    assert branches["tri"] > 0 and branches["bi"] > 0
    for d, (n, bo, s) in got.items():
        if docs_lang[d] == "en" and n:
            assert bo == 0, f"en doc {d} backed off"
        if n:
            assert 0 <= s <= 1_000_000
    assert any(
        bo > 0 for d, (n, bo, _s) in got.items() if docs_lang[d] != "en"
    )


def test_perplexity_buckets_match_python_model(spark, docs, docs_lang):
    """corpus_perplexity_buckets == thresholds recomputed in Python
    from the Stupid-Backoff model: per lang, the bucket boundaries are
    the score VALUES at desc-ranks ceil(n/3) / ceil(2n/3); assignment
    compares scores to those values (ties share a bucket). Laws: the
    output anchors the full corpus exactly once; 'unscored' iff the
    doc has no trigrams; within a lang every head score >= every
    middle score >= every tail score; head holds >= ceil(n/3) docs."""
    import math

    from projetbigdata_spark.operators.selection import (
        corpus_perplexity_buckets,
    )

    rows = corpus_perplexity_buckets(spark, SF_SMOKE).collect()
    assert sorted(r.doc_id for r in rows) == sorted(docs)
    expected, _ = _sb_python(docs, docs_lang)
    by_lang = defaultdict(list)
    for d, (_n, _bo, s) in expected.items():
        if s is not None:
            by_lang[docs_lang[d]].append(s)
    th = {}
    for lang, scores in by_lang.items():
        srt = sorted(scores, reverse=True)
        n = len(srt)
        th[lang] = (srt[(n + 2) // 3 - 1], srt[(2 * n + 2) // 3 - 1], n)
    per_lang_buckets = defaultdict(lambda: defaultdict(list))
    for r in rows:
        assert r.sb_score_ppm == expected[r.doc_id][2]
        if r.sb_score_ppm is None:
            assert r.ppl_bucket == "unscored"
            continue
        t_head, t_mid, _n = th[r.lang]
        want = (
            "head"
            if r.sb_score_ppm >= t_head
            else ("middle" if r.sb_score_ppm >= t_mid else "tail")
        )
        assert r.ppl_bucket == want, (r.doc_id, r.lang)
        per_lang_buckets[r.lang][r.ppl_bucket].append(r.sb_score_ppm)
    for lang, buckets in per_lang_buckets.items():
        heads = buckets.get("head", [])
        mids = buckets.get("middle", [])
        tails = buckets.get("tail", [])
        assert len(heads) >= math.ceil(th[lang][2] / 3)
        if heads and mids:
            assert min(heads) >= max(mids)
        if mids and tails:
            assert min(mids) > max(tails)


def test_cluster_top_terms_matches_python_model(spark, docs):
    """corpus_cluster_top_terms == Python lift/top-k recomputed over
    the SAME Lloyd assignment (the clustering tier itself is oracle-
    checked by sim_ivf_topk and friends; this isolates the c-TF-IDF
    lift, the TERM_MIN_TF floor, and the 3-key window ordering)."""
    from projetbigdata_spark.operators import similarity as S

    vec = S._cached_micro_arr(spark, SF_SMOKE)
    cents = S._seed_centroids(vec)
    for _ in range(2):
        cents = S._lloyd_update(
            vec, S._argmin_cid(S._dists_to_centroids(vec, cents))
        ).localCheckpoint()
    assign = {
        r.vec_id: r.cid
        for r in S._argmin_cid(
            S._dists_to_centroids(vec, cents)
        ).collect()
    }
    tf: Counter = Counter()
    for d, t in docs.items():
        if d in assign:
            for w in _tokens(t):
                tf[(assign[d], w)] += 1
    tf_t: Counter = Counter()
    n_c: Counter = Counter()
    for (cid, term), c in tf.items():
        tf_t[term] += c
        n_c[cid] += c
    n_total = sum(n_c.values())
    ranked = defaultdict(list)
    for (cid, term), c in tf.items():
        if c < S.TERM_MIN_TF:
            continue
        lift = c * n_total * 1_000_000 // (tf_t[term] * n_c[cid])
        ranked[cid].append((-lift, -c, term))
    expected = {}
    for cid, lst in ranked.items():
        lst.sort()
        for rnk, (nl, nc_, term) in enumerate(lst[: S.TOP_TERMS], 1):
            expected[(cid, rnk)] = (term, -nc_, -nl)
    got = {
        (r.cid, r.rnk): (r.term, r.tf_tc, r.lift_ppm)
        for r in S.corpus_cluster_top_terms(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_trigram_incremental_frozen_model(spark, tmp_path):
    """Constructed rows pin the LM ingest contract: (a) only the new
    batch (source='src0') is emitted, anchored (< 3-token docs surface
    with 0 trigrams); (b) the model is the STANDING target slice only
    — a batch doc's novel trigram takes the BACKOFF path even though
    the doc is lang='en' (self-influence would have put it in the
    model and scored it at the trigram level); (c) adding another
    batch doc changes NO existing verdict."""
    from projetbigdata_spark.operators.selection import (
        text_trigram_backoff_score_incremental,
    )

    standing = [
        (100, "alpha beta gamma alpha beta gamma", "en", "srcA", 0),
        (101, "delta epsilon zeta delta epsilon zeta", "fr", "srcA", 0),
    ]
    new1 = [
        # trigram "alpha beta gamma" IS in the standing en model
        (1, "alpha beta gamma", "en", "src0", 0),
        # "beta gamma delta" is NOT (standing en never strings these) —
        # an en batch doc that MUST back off under a frozen model
        (2, "beta gamma delta", "en", "src0", 0),
        (3, "tiny doc", "en", "src0", 0),  # < 3 tokens
    ]

    def write(rows, d):
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )

    d1 = str(tmp_path / "one")
    write(standing + new1, d1)
    got1 = {
        r.doc_id: (r.n_trigrams, r.n_backoff, r.sb_score_ppm)
        for r in text_trigram_backoff_score_incremental(
            spark, d1
        ).collect()
    }
    assert sorted(got1) == [1, 2, 3]  # new slice only, anchored
    assert got1[3] == (0, 0, None)  # 2 tokens -> 0 trigrams, unscored
    # (b) doc 1 hits the standing model at the trigram level
    assert got1[1] == (1, 0, 1_000_000)  # c3=2, ctx3("alpha beta")=2
    # doc 2's trigram is novel to the model -> backoff fires; its
    # bigram "gamma delta" is ALSO novel, and "delta" never appears as
    # standing-en bigram-left -> the zero branch: score 0
    assert got1[2] == (1, 1, 0)

    # (c) no self-influence: a second batch doc (which CONTAINS
    # doc 2's trigram, so under self-training it would stop backing
    # off) changes nothing
    d2 = str(tmp_path / "two")
    write(
        standing + new1 + [(4, "beta gamma delta beta", "en", "src0", 0)],
        d2,
    )
    got2 = {
        r.doc_id: (r.n_trigrams, r.n_backoff, r.sb_score_ppm)
        for r in text_trigram_backoff_score_incremental(
            spark, d2
        ).collect()
    }
    for d in (1, 2, 3):
        assert got2[d] == got1[d], d


def test_ccnet_select_funnel_laws(spark):
    """The composed CCNet keep verdict (r10): full-corpus anchor, the
    kept law recomputes column-wise, stage flags are consistent
    (stage-1 rejects carry NULL accept_ppm and cap_ok=False), the
    funnel is monotone, and the bucket column agrees row-for-row with
    the registered corpus_perplexity_buckets subtree."""
    from projetbigdata_spark.operators.selection import (
        CCNET_KEEP_BUCKET,
        corpus_ccnet_select,
        corpus_perplexity_buckets,
    )
    from projetbigdata_spark.sources.catalog import load_table

    out = corpus_ccnet_select(spark, SF_SMOKE).cache()
    n = load_table(spark, SF_SMOKE, "documents").count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n

    # the kept law, recomputed
    viol = out.where(
        F.col("kept")
        != (
            F.col("lang_ok")
            & F.col("cap_ok")
            & (F.col("ppl_bucket") == CCNET_KEEP_BUCKET)
        )
    ).count()
    assert viol == 0

    # stage-1 rejects never reach the cap
    assert (
        out.where(~F.col("lang_ok"))
        .where(F.col("accept_ppm").isNotNull() | F.col("cap_ok"))
        .count()
        == 0
    )

    # monotone funnel with live gates at the fixture
    agg = out.agg(
        F.sum(F.col("lang_ok").cast("int")).alias("a"),
        F.sum((F.col("lang_ok") & F.col("cap_ok")).cast("int")).alias("b"),
        F.sum(F.col("kept").cast("int")).alias("c"),
    ).collect()[0]
    assert n >= agg.a >= agg.b >= agg.c
    assert 0 < agg.c < n  # head cut is live

    # bucket column == the registered subtree, row for row
    bk = corpus_perplexity_buckets(spark, SF_SMOKE).select(
        "doc_id", F.col("ppl_bucket").alias("want")
    )
    assert (
        out.join(bk, "doc_id")
        .where(F.col("ppl_bucket") != F.col("want"))
        .count()
        == 0
    )
    out.unpersist()


def test_ccnet_select_guessed_laws(spark):
    """The guessed-key CCNet variant (r11, VERDICT r10 item 3):
    anchors the corpus, the kept law recomputes column-wise, the
    guess_agrees audit recomputes from its definition, the cap REALLY
    keys on the guess (one accept_ppm per lang_guess among survivors),
    and the variant genuinely diverges from the metadata-key row at
    the fixture (the point of registering it — the two partitions
    differ, so terciles and caps differ)."""
    from projetbigdata_spark.operators.selection import (
        CCNET_KEEP_BUCKET,
        corpus_ccnet_select,
        corpus_ccnet_select_guessed,
    )
    from projetbigdata_spark.sources.catalog import load_table

    out = corpus_ccnet_select_guessed(spark, SF_SMOKE).cache()
    n = load_table(spark, SF_SMOKE, "documents").count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n

    # the kept law, recomputed
    assert (
        out.where(
            F.col("kept")
            != (
                F.col("lang_ok")
                & F.col("cap_ok")
                & (F.col("ppl_bucket") == CCNET_KEEP_BUCKET)
            )
        ).count()
        == 0
    )

    # the audit column, recomputed at the guesser's granularity
    assert (
        out.where(
            F.col("guess_agrees")
            != F.expr("(lang <=> 'en') = (lang_guess <=> 'en')")
        ).count()
        == 0
    )

    # stage-1 rejects never reach the cap
    assert (
        out.where(~F.col("lang_ok"))
        .where(F.col("accept_ppm").isNotNull() | F.col("cap_ok"))
        .count()
        == 0
    )

    # the cap keys on the GUESS: every survivor sharing a lang_guess
    # shares one accept_ppm
    multi = (
        out.where("lang_ok")
        .groupBy("lang_guess")
        .agg(F.countDistinct("accept_ppm").alias("k"))
        .where("k > 1")
        .count()
    )
    assert multi == 0

    # the tercile cut is live PER GUESS KEY: every guess key with
    # scored docs occupies all three buckets at the fixture
    bk = (
        out.where("ppl_bucket <> 'unscored'")
        .groupBy("lang_guess")
        .agg(F.countDistinct("ppl_bucket").alias("nb"))
    )
    assert bk.count() > 0
    assert bk.where("nb < 3").count() == 0

    # divergence from the metadata-key row at the fixture: the two
    # partitions differ, so verdicts must differ somewhere (246 guess
    # disagreements / 138 kept flips measured at sf0.01 r11)
    meta = corpus_ccnet_select(spark, SF_SMOKE).select(
        "doc_id", F.col("kept").alias("meta_kept")
    )
    assert out.join(meta, "doc_id").where("kept <> meta_kept").count() > 0
    assert out.where("NOT guess_agrees").count() > 0
    out.unpersist()


def test_ccnet_policy_roundtrip(spark, tmp_path):
    """r11 (VERDICT r10 item 4): load-then-apply ≡ build-then-apply.
    The frozen policy persists as parquet (save_ccnet_policy) and the
    loaded tuple drives ccnet_apply_policy to the exact verdicts the
    in-session build produces; the pruned persist form writes a
    genuinely smaller LM whose verdicts equal pruning in-session."""
    from projetbigdata_spark.operators.dedup import INCR_NEW_SOURCE
    from projetbigdata_spark.operators.selection import (
        SB_PRUNE_MIN_COUNT,
        ccnet_apply_policy,
        ccnet_frozen_policy,
        load_ccnet_policy,
        prune_sb_model,
        save_ccnet_policy,
    )
    from projetbigdata_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    standing = docs.where(F.col("source") != INCR_NEW_SOURCE)
    batch = docs.where(F.col("source") == INCR_NEW_SOURCE)
    policy = ccnet_frozen_policy(standing)

    pol_dir = str(tmp_path / "policy")
    save_ccnet_policy(policy, pol_dir)
    loaded = load_ccnet_policy(spark, pol_dir)

    built = ccnet_apply_policy(batch, policy)
    replayed = ccnet_apply_policy(batch, loaded)
    assert built.count() == replayed.count() > 0
    assert built.subtract(replayed).count() == 0
    assert replayed.subtract(built).count() == 0

    # the pruned persist form: smaller on-disk LM, identical verdicts
    # to pruning in-session
    pruned_dir = str(tmp_path / "policy_pruned")
    save_ccnet_policy(policy, pruned_dir, min_count=SB_PRUNE_MIN_COUNT)
    pruned_loaded = load_ccnet_policy(spark, pruned_dir)
    n_full = spark.read.parquet(f"{pol_dir}/cnt3").count()
    n_pruned = spark.read.parquet(f"{pruned_dir}/cnt3").count()
    assert 0 < n_pruned < n_full  # the prune bites at the fixture
    acc, model, th = policy
    pruned_in_session = ccnet_apply_policy(
        batch, (acc, prune_sb_model(model, SB_PRUNE_MIN_COUNT), th)
    )
    from_disk = ccnet_apply_policy(batch, pruned_loaded)
    assert pruned_in_session.subtract(from_disk).count() == 0
    assert from_disk.subtract(pruned_in_session).count() == 0


def test_pruned_policy_recalibrated_terciles(spark, tmp_path):
    """ADVICE r11 (low): persisting a count-pruned policy with the
    standing corpus supplied recomputes th from the PRUNED model's
    score distribution — terciles remain terciles. Pins:
    (a) the recalibrated persist ≡ ccnet_frozen_policy(standing,
        min_count) built self-consistently in-session;
    (b) applying the recalibrated policy to the standing slice fills
        each scored bucket to a genuine tercile share (the unpruned-th
        persist form measurably under-fills head — the skew the
        recalibration exists to remove)."""
    from projetbigdata_spark.operators.dedup import INCR_NEW_SOURCE
    from projetbigdata_spark.operators.selection import (
        SB_PRUNE_MIN_COUNT,
        ccnet_apply_policy,
        ccnet_frozen_policy,
        load_ccnet_policy,
        save_ccnet_policy,
    )
    from projetbigdata_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    standing = docs.where(F.col("source") != INCR_NEW_SOURCE)
    batch = docs.where(F.col("source") == INCR_NEW_SOURCE)
    mc = SB_PRUNE_MIN_COUNT

    recal_dir = str(tmp_path / "policy_recal")
    save_ccnet_policy(
        ccnet_frozen_policy(standing), recal_dir, min_count=mc,
        standing=standing,
    )
    recal = load_ccnet_policy(spark, recal_dir)

    # (a) ≡ the self-consistent in-session build
    consistent = ccnet_frozen_policy(standing, min_count=mc)
    want = ccnet_apply_policy(batch, consistent)
    got = ccnet_apply_policy(batch, recal)
    assert got.count() == want.count() > 0
    assert got.subtract(want).count() == 0
    assert want.subtract(got).count() == 0

    # (b) terciles remain terciles on the standing slice: each scored
    # bucket within the integer-boundary band of n/3 per language
    buckets = (
        ccnet_apply_policy(standing, recal)
        .where("ppl_bucket <> 'unscored'")
        .groupBy("lang", "ppl_bucket")
        .count()
        .collect()
    )
    per_lang: dict = {}
    for r in buckets:
        per_lang.setdefault(r["lang"], {})[r["ppl_bucket"]] = r["count"]
    assert per_lang
    for lang, shares in per_lang.items():
        n = sum(shares.values())
        for b in ("head", "middle", "tail"):
            # ties can shift a boundary by a few docs, never a skew
            assert abs(shares.get(b, 0) - n / 3) <= max(3, 0.1 * n), (
                lang, shares,
            )
    """The approx (sketch) tercile tier vs the exact (window) tier:
    same doc set, identical 'unscored' anchoring, thresholds ordered
    (head boundary >= middle boundary per lang), and bucket verdicts
    agree on >= 90% of scored docs — the two tiers read order
    statistics at most one rank apart, so only docs within one rank
    of a boundary may differ (the ANN-recall-style contract that
    prices the relief tier's drop before a deployment opts in)."""
    from projetbigdata_spark.operators.selection import (
        corpus_perplexity_buckets,
        corpus_perplexity_buckets_approx,
    )

    exact = corpus_perplexity_buckets(spark, SF_SMOKE).select(
        "doc_id", F.col("ppl_bucket").alias("b_exact")
    )
    approx = corpus_perplexity_buckets_approx(spark, SF_SMOKE).select(
        "doc_id", "lang", "sb_score_ppm",
        F.col("ppl_bucket").alias("b_approx"),
    )
    j = approx.join(exact, "doc_id").cache()
    n = j.count()
    assert n > 0
    # identical anchor: unscored iff unscored
    assert j.where(
        (F.col("b_exact") == "unscored") != (F.col("b_approx") == "unscored")
    ).count() == 0
    agree = j.where(F.col("b_exact") == F.col("b_approx")).count()
    assert agree / n >= 0.90, f"agreement {agree}/{n}"
    # both tiers partition scored docs into nonempty head/middle/tail
    # at the fixture (terciles are live, not degenerate)
    got = {
        r.b_approx
        for r in j.where(F.col("b_approx") != "unscored")
        .select("b_approx").distinct().collect()
    }
    assert got == {"head", "middle", "tail"}
    j.unpersist()


def test_pruned_trigram_scorer_monotone_backoff(spark):
    """The pruned-model tier (r10): pruning trigram/bigram entries
    can only push positions DOWN the backoff ladder — per doc,
    n_backoff under the pruned model >= the unpruned scorer's, with
    identical n_trigrams (the corpus side is untouched) and identical
    anchoring; and at the fixture T=2 genuinely bites (some doc's
    backoff count strictly increases)."""
    from projetbigdata_spark.operators.selection import (
        text_trigram_backoff_score,
        text_trigram_backoff_score_pruned,
    )

    full = {
        r.doc_id: r
        for r in text_trigram_backoff_score(spark, SF_SMOKE).collect()
    }
    pruned = {
        r.doc_id: r
        for r in text_trigram_backoff_score_pruned(spark, SF_SMOKE).collect()
    }
    assert set(full) == set(pruned)
    assert all(
        pruned[d].n_trigrams == full[d].n_trigrams for d in full
    )
    assert all(pruned[d].n_backoff >= full[d].n_backoff for d in full)
    assert any(pruned[d].n_backoff > full[d].n_backoff for d in full)


def _write_ccnet_corpus(spark, path, extra_batch):
    """Constructed corpus for the CCNet ingest twin: a standing slice
    (sources 'a'/'b') that defines the frozen policy, one probe batch
    doc, and `extra_batch` additional src0 docs that skew the batch's
    own shares/scores — which must NOT move the probe's verdict."""
    en = "the quick brown fox jumps over the lazy dog and the cat"
    standing = [
        (i, f"{en} day {i % 7}.", "en", "a") for i in range(30)
    ] + [
        (100 + i, f"palabra numero {i} sin marcadores.", "es", "b")
        for i in range(12)
    ]
    probe = [(500, f"{en} again and again.", "en", "src0")]
    extra = [
        (600 + i, f"zz{i} qq{i} vv{i} kk{i} ww{i}.", "en", "src0")
        for i in range(extra_batch)
    ]
    rows = standing + probe + extra
    import pyspark.sql.functions as SF

    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).withColumn("n_chars", SF.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")


def test_ccnet_incremental_frozen_policy(spark, tmp_path):
    """The twin family's law applied to the whole composition: the
    probe batch doc's verdict row (gate, accept_ppm, cap_ok, bucket,
    kept) is IDENTICAL whether it arrives alone or alongside 25 more
    batch docs — the model, the tercile thresholds, and the share
    policy all derive from the standing slice only. Plus the
    unseen-language contracts: a batch lang with no standing
    survivors carries NULL accept_ppm and is accepted; its scored
    docs fall through the NULL threshold comparisons to 'tail'."""
    from projetbigdata_spark.operators.selection import (
        corpus_ccnet_select_incremental,
    )

    d1, d2 = str(tmp_path / "one"), str(tmp_path / "many")
    _write_ccnet_corpus(spark, d1, extra_batch=0)
    _write_ccnet_corpus(spark, d2, extra_batch=25)
    one = {
        r.doc_id: r.asDict()
        for r in corpus_ccnet_select_incremental(spark, d1).collect()
    }
    many = {
        r.doc_id: r.asDict()
        for r in corpus_ccnet_select_incremental(spark, d2).collect()
    }
    assert set(one) == {500}
    assert len(many) == 26
    assert many[500] == one[500]  # frozen policy: no self-influence
    assert one[500]["lang_ok"] and one[500]["accept_ppm"] is not None

    # unseen lang: no standing 'fr' survivors -> NULL accept, accepted,
    # scored docs land 'tail' (no frozen threshold to compare against)
    d3 = str(tmp_path / "unseen")
    import pyspark.sql.functions as SF

    base = spark.read.parquet(f"{d1}/documents.parquet")
    fr = spark.createDataFrame(
        [(700, "le chat le chien le chat et le chien dorment.", "fr",
          "src0", 46)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    base.unionByName(fr).coalesce(1).write.mode("overwrite").parquet(
        f"{d3}/documents.parquet"
    )
    out = {
        r.doc_id: r.asDict()
        for r in corpus_ccnet_select_incremental(spark, d3).collect()
    }
    assert out[700]["accept_ppm"] is None and out[700]["cap_ok"]
    assert out[700]["ppl_bucket"] in ("tail", "unscored")
    assert out[700]["kept"] is False


def test_sb_model_roundtrip_equals_frozen_scoring(spark, tmp_path):
    """r11 epoch artifacts: the persisted Stupid-Backoff model drives
    _sb_score_with_model to the registered frozen-LM ingest twin's
    exact scores (load-then-score ≡ build-then-score), and the pruned
    persist form equals pruning in-session."""
    from projetbigdata_spark.operators.dedup import INCR_NEW_SOURCE
    from projetbigdata_spark.operators.selection import (
        DSIR_TARGET_LANG,
        SB_PRUNE_MIN_COUNT,
        _sb_model,
        _sb_score_with_model,
        load_sb_model,
        prune_sb_model,
        save_sb_model,
        text_trigram_backoff_score_incremental,
    )
    from projetbigdata_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    standing = docs.where(F.col("source") != INCR_NEW_SOURCE)
    batch = docs.where(F.col("source") == INCR_NEW_SOURCE)
    model = _sb_model(standing.where(F.col("lang") == DSIR_TARGET_LANG))

    path = str(tmp_path / "sb_model")
    save_sb_model(model, path)
    loaded = load_sb_model(spark, path)

    want = text_trigram_backoff_score_incremental(spark, SF_SMOKE)
    got = _sb_score_with_model(batch, loaded)
    assert got.count() == want.count() > 0
    assert got.subtract(want).count() == 0
    assert want.subtract(got).count() == 0

    # pruned persist ≡ prune-in-session, and the artifact shrinks
    pruned_path = str(tmp_path / "sb_model_pruned")
    save_sb_model(model, pruned_path, min_count=SB_PRUNE_MIN_COUNT)
    pruned_loaded = load_sb_model(spark, pruned_path)
    n_full = spark.read.parquet(f"{path}/cnt3").count()
    n_pruned = spark.read.parquet(f"{pruned_path}/cnt3").count()
    assert 0 < n_pruned < n_full
    in_session = _sb_score_with_model(
        batch, prune_sb_model(model, SB_PRUNE_MIN_COUNT)
    )
    from_disk = _sb_score_with_model(batch, pruned_loaded)
    assert in_session.subtract(from_disk).count() == 0
    assert from_disk.subtract(in_session).count() == 0


def test_dsir_profile_roundtrip_equals_registered_incremental(
    spark, tmp_path
):
    """r11 epoch artifacts: build-profile + apply (the persistable
    two-frame spelling) reproduces the registered one-explode
    corpus_dsir_weights_hashed_incremental row exactly, and survives
    the parquet round trip — so the deployment split (per-epoch
    profile build, per-batch apply) cannot drift from the
    oracle-checked surface."""
    from projetbigdata_spark.operators.dedup import INCR_NEW_SOURCE
    from projetbigdata_spark.operators.selection import (
        corpus_dsir_weights_hashed_incremental,
        dsir_apply_profile,
        dsir_hashed_profile,
        load_dsir_profile,
        save_dsir_profile,
    )
    from projetbigdata_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    standing = docs.where(F.col("source") != INCR_NEW_SOURCE)
    batch = docs.where(F.col("source") == INCR_NEW_SOURCE)

    profile = dsir_hashed_profile(standing)
    want = corpus_dsir_weights_hashed_incremental(spark, SF_SMOKE)
    built = dsir_apply_profile(batch, profile)
    assert built.count() == want.count() > 0
    assert built.subtract(want).count() == 0
    assert want.subtract(built).count() == 0

    path = str(tmp_path / "dsir_profile")
    save_dsir_profile(profile, path)
    loaded = load_dsir_profile(spark, path)
    replayed = dsir_apply_profile(batch, loaded)
    assert replayed.subtract(want).count() == 0
    assert want.subtract(replayed).count() == 0


def test_ccnet_guessed_multi_laws(spark):
    """r12 multi-class guessed-key CCNet (VERDICT r11 item 2): the
    r11 guessed-row laws at FULL key cardinality — every doc anchored,
    kept law recomputed, the audit recomputes at full granularity
    (lang <=> lang_guess), one accept_ppm per guess class, all three
    tercile buckets live in EVERY guess class (>= 4 live classes — the
    done-criterion), and genuine divergence from BOTH the metadata row
    and the binary-guess row (three different partitions of the same
    corpus)."""
    from projetbigdata_spark.operators.selection import (
        CCNET_KEEP_BUCKET,
        corpus_ccnet_select,
        corpus_ccnet_select_guessed,
        corpus_ccnet_select_guessed_multi,
    )
    from projetbigdata_spark.operators.textstats import (
        lang_guess_multi_frame,
    )
    from projetbigdata_spark.sources.catalog import load_table

    out = corpus_ccnet_select_guessed_multi(spark, SF_SMOKE).cache()
    docs = load_table(spark, SF_SMOKE, "documents")
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n

    # the kept law, recomputed
    assert (
        out.where(
            F.col("kept")
            != (
                F.col("lang_ok")
                & F.col("cap_ok")
                & (F.col("ppl_bucket") == CCNET_KEEP_BUCKET)
            )
        ).count()
        == 0
    )

    # full-granularity audit, recomputed
    assert (
        out.where(
            F.col("guess_agrees") != F.expr("lang <=> lang_guess")
        ).count()
        == 0
    )

    # the guess column IS text_lang_guess_multi's guess (one core)
    g = lang_guess_multi_frame(docs).select(
        "doc_id", F.col("lang_guess").alias("want_guess")
    )
    assert (
        out.join(g, "doc_id").where("lang_guess <> want_guess").count() == 0
    )

    # >= 4 live guess classes, and per-class caps/terciles exercised
    live = (
        out.groupBy("lang_guess").count().where("count > 0").collect()
    )
    assert len(live) >= 4, live
    assert (
        out.where("lang_ok")
        .groupBy("lang_guess")
        .agg(F.countDistinct("accept_ppm").alias("k"))
        .where("k > 1")
        .count()
        == 0
    )
    bk = (
        out.where("ppl_bucket <> 'unscored'")
        .groupBy("lang_guess")
        .agg(F.countDistinct("ppl_bucket").alias("nb"))
    )
    assert bk.count() >= 4
    assert bk.where("nb < 3").count() == 0

    # three-way divergence: multi vs metadata and multi vs binary
    # guess (202 kept flips vs metadata / 333 full-granularity
    # disagreements measured at sf0.01 r12)
    meta = corpus_ccnet_select(spark, SF_SMOKE).select(
        "doc_id", F.col("kept").alias("meta_kept")
    )
    assert out.join(meta, "doc_id").where("kept <> meta_kept").count() > 0
    binry = corpus_ccnet_select_guessed(spark, SF_SMOKE).select(
        "doc_id", F.col("lang_guess").alias("bin_guess")
    )
    assert out.join(binry, "doc_id").where(
        "lang_guess <> bin_guess"
    ).count() > 0
    assert out.where("NOT guess_agrees").count() > 0
    out.unpersist()


def test_lang_guess_multi_profile_laws(spark):
    """The multi-class guesser's own laws: anchors every doc; the
    argmax is genuine (the winning score is the max over that doc's
    scored classes, ties to the lexicographically smallest class);
    unscorable docs key 'und' with a NULL score; and the profile
    carries real signal at the fixture (diagonal above chance)."""
    from projetbigdata_spark.operators.textstats import (
        lang_guess_multi_frame,
        lang_profile_frame,
    )
    from projetbigdata_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    out = lang_guess_multi_frame(docs).cache()
    n = docs.count()
    assert out.count() == n

    # profile rows: ppm grid, per-class shares sum to <= 1e6 (floor)
    prof = lang_profile_frame(docs)
    sums = prof.groupBy("cand_lang").agg(F.sum("freq_ppm").alias("s"))
    bad = sums.where(
        (F.col("s") > 1_000_000) | (F.col("s") < 900_000)
    ).count()
    assert bad == 0  # floor dust only

    # guessed docs carry the max score; 'und' iff no scorable token
    assert out.where("lang_guess = 'und' AND guess_score IS NOT NULL").count() == 0
    assert out.where("lang_guess <> 'und' AND guess_score IS NULL").count() == 0

    # diagonal above chance at the fixture (167/500 measured, 5
    # classes -> chance 100): demand a comfortable margin
    agree = out.where("lang = lang_guess").count()
    assert agree > n // 4, agree
    out.unpersist()
