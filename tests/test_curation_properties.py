"""Property-based checks (hypothesis) for the curation tier: the
registered Spark queries must agree with straightforward Python models
on arbitrary tiny corpora — including shapes the fixtures never
produce (empty docs, all-duplicate corpora, docs shorter than the
gram/span width). Few examples, each a full staged-parquet run: the
value is the adversarial corpus shapes, not volume."""

from __future__ import annotations

import hashlib
import tempfile
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

VOCAB = ["aa", "bb", "cc", "dd"]

corpora = st.lists(
    st.lists(st.sampled_from(VOCAB), max_size=14).map(" ".join),
    min_size=1,
    max_size=8,
)


def _stage(spark, texts) -> str:
    d = tempfile.mkdtemp()
    rows = [
        (i, t, "en", "src0", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _toks(t: str) -> list[str]:
    return [w for w in t.lower().split() if w]


def _key(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 100


@settings(max_examples=6, deadline=None)
@given(texts=corpora)
def test_unigram_freq_score_matches_model(spark, texts):
    from projetbigdata_spark.operators.curation import (
        text_unigram_freq_score,
    )

    d = _stage(spark, texts)
    got = {
        r.doc_id: (r.n_tokens, r.n_hapax, r.min_count, r.mean_freq_ppb)
        for r in text_unigram_freq_score(spark, d).collect()
    }
    toks = {i: _toks(t) for i, t in enumerate(texts)}
    counts = Counter(w for ws in toks.values() for w in ws)
    total = sum(counts.values())
    for i, ws in toks.items():
        if not ws:
            assert got[i] == (0, 0, None, None), (i, got[i])
            continue
        ppbs = [counts[w] * 10**9 // total for w in ws]
        expect = (
            len(ws),
            sum(1 for w in ws if counts[w] == 1),
            min(counts[w] for w in ws),
            sum(ppbs) // len(ws),
        )
        assert got[i] == expect, (i, texts, got[i], expect)


@settings(max_examples=6, deadline=None)
@given(texts=corpora)
def test_span_profile_matches_model(spark, texts):
    from projetbigdata_spark.operators.curation import (
        SPAN_K,
        dedup_span_profile,
    )

    d = _stage(spark, texts)
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_span_ppm)
        for r in dedup_span_profile(spark, d).collect()
    }
    keys = {}
    for i, t in enumerate(texts):
        ws = _toks(t)
        keys[i] = {
            _key(" ".join(ws[j : j + SPAN_K]))
            for j in range(len(ws) - SPAN_K + 1)
        }
    first = {}
    df = Counter()
    for i in sorted(keys):
        for k in keys[i]:
            first.setdefault(k, i)
            df[k] += 1
    for i in sorted(keys):
        n = len(keys[i])
        dup = sum(1 for k in keys[i] if df[k] > 1 and i > first[k])
        ppm = dup * 10**6 // n if n else None
        assert got[i] == (n, dup, ppm), (i, texts, got[i], (n, dup, ppm))


@settings(max_examples=6, deadline=None)
@given(texts=corpora)
def test_contamination_matches_model(spark, texts):
    from projetbigdata_spark.operators.curation import (
        NGRAM_N,
        contamination_ngram_overlap,
    )

    d = _stage(spark, texts)
    got = {
        r.doc_id: (r.split, r.n_grams, r.n_hit, r.is_contaminated)
        for r in contamination_ngram_overlap(spark, d).collect()
    }
    grams = {}
    split = {}
    for i, t in enumerate(texts):
        ws = _toks(t)
        grams[i] = {
            _key(" ".join(ws[j : j + NGRAM_N]))
            for j in range(len(ws) - NGRAM_N + 1)
        }
        b = _bucket(i)
        split[i] = "train" if b < 80 else ("val" if b < 90 else "test")
    train = set().union(
        *(grams[i] for i in grams if split[i] == "train"), set()
    )
    evals = {i for i in grams if split[i] != "train"}
    assert set(got) == evals
    for i in evals:
        hit = len(grams[i] & train)
        expect = (split[i], len(grams[i]), hit, hit > 0)
        assert got[i] == expect, (i, texts, got[i], expect)


@settings(max_examples=25, deadline=None)
@given(
    text=st.text(
        alphabet=st.sampled_from(list("ab1.@+- xyz")), max_size=60
    )
)
def test_redact_matches_python_re(spark, text):
    import re

    from projetbigdata_spark.operators.curation import (
        EMAIL_RE,
        IP_RE,
        PHONE_RE,
        redact_pii,
    )

    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(redact_pii(F.col("text")).alias("r")).first().r
    expect = re.sub(
        IP_RE,
        "<IP>",
        re.sub(PHONE_RE, "<PHONE>", re.sub(EMAIL_RE, "<EMAIL>", text)),
    )
    assert got == expect, (text, got, expect)


def test_quantile_rank_ceilings_exact():
    """The pure-integer rank ceilings corpus_quality_quantiles uses —
    (n+9) div 10, (n+1) div 2, (9n+9) div 10 — must equal
    ceil(p*n) computed with exact rational arithmetic for every
    corpus size (the float spelling 0.1*n mis-ceils at boundaries,
    e.g. 0.1*500 = 50.000000000000007)."""
    from fractions import Fraction
    from math import ceil

    for n in range(1, 20001):
        assert (n + 9) // 10 == ceil(Fraction(1, 10) * n), n
        assert (n + 1) // 2 == ceil(Fraction(1, 2) * n), n
        assert (9 * n + 9) // 10 == ceil(Fraction(9, 10) * n), n


def test_quantile_disc_model_parity(spark):
    """corpus_quality_quantiles' explicit window spelling equals a
    pure-Python percentile_disc over adversarial corpora: ties,
    single-doc languages, all-identical scores."""
    from math import ceil

    from projetbigdata_spark.operators.curation import (
        corpus_quality_quantiles,
    )
    from projetbigdata_spark.functions.text import STOPWORDS

    sw = set(STOPWORDS)
    texts = (
        ["aa bb", "aa aa", "the the the aa", "aa", "bb cc dd aa bb"]
        + ["the aa"] * 3          # ties on identical scores
        + ["zz " * 30]            # long doc, zero stopwords
    )
    d = _stage(spark, texts)
    got = {
        r.lang: r for r in corpus_quality_quantiles(spark, d).collect()
    }

    # python model over the same integer grids
    stats = []
    for t in texts:
        w = [x for x in t.lower().split() if x]
        if not w:
            continue
        n_stop = sum(1 for x in w if x in sw)
        uniq = len(set(w))
        stats.append(
            (
                n_stop * 1_000_000 // len(w),
                1_000_000 - uniq * 1_000_000 // len(w),
            )
        )
    n = len(stats)

    def disc(vals, p_num, p_den):
        # exact integer ceiling — not ceil(p*n) in floats, which is
        # the boundary bug class this file exists to catch
        rank = (p_num * n + p_den - 1) // p_den
        return sorted(vals)[rank - 1] if n else None

    stops = [s for s, _ in stats]
    dups = [d_ for _, d_ in stats]
    r = got["en"]
    assert r.n_docs == n
    assert r.stop_ppm_p10 == disc(stops, 1, 10)
    assert r.stop_ppm_p50 == disc(stops, 1, 2)
    assert r.stop_ppm_p90 == disc(stops, 9, 10)
    assert r.dup_ppm_p10 == disc(dups, 1, 10)
    assert r.dup_ppm_p50 == disc(dups, 1, 2)
    assert r.dup_ppm_p90 == disc(dups, 9, 10)


def test_sample_assign_matches_python_model(spark):
    """corpus_sample_assign vs an independent pure-Python model on a
    multi-language corpus with an out-of-mixture language and empty
    docs: per-doc epochs_micros and n_repeats must match exactly
    (integer arithmetic end-to-end — any float sneaking into the
    Spark path would diverge at the div boundaries)."""
    import tempfile

    from projetbigdata_spark.operators.packing import (
        MIX_TARGETS,
        corpus_sample_assign,
    )

    rows = [
        (0, "aa bb cc", "en"),
        (1, "aa aa", "en"),
        (2, "", "en"),                 # empty doc: 0 tokens
        (3, "dd dd dd dd", "fr"),
        (4, "bb", "fr"),
        (5, "cc cc cc", "xx"),         # language outside MIX_TARGETS
        (6, "aa " * 40, "de"),
        (7, "", "zh"),                 # in-mixture lang with ZERO
        # tokens: must yield epochs 0, not an ANSI divide-by-zero
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {
        r.doc_id: (r.n_tokens, r.bucket, r.epochs_micros, r.n_repeats)
        for r in corpus_sample_assign(spark, d).collect()
    }

    # python model
    n_tok = {i: len(_toks(t)) for i, t, _ in rows}
    lang_of = {i: lang for i, _, lang in rows}
    lang_tokens: Counter = Counter()
    for i, _, lang in rows:
        lang_tokens[lang] += n_tok[i]
    total = sum(lang_tokens.values())
    eps = {
        lang: (
            int(round(MIX_TARGETS[lang] * 1_000_000)) * total
            // lang_tokens[lang]
            if lang in MIX_TARGETS and lang_tokens[lang] > 0
            else 0
        )
        for lang in lang_tokens
    }
    assert set(got) == {i for i, _, _ in rows}
    for i, _, lang in rows:
        bucket = (
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            % 1_000_000
        )
        e = eps[lang]
        expect = (
            n_tok[i],
            bucket,
            e,
            e // 1_000_000 + (1 if bucket < e % 1_000_000 else 0),
        )
        assert got[i] == expect, (i, got[i], expect)


def test_temperature_mix_matches_python_model(spark):
    """corpus_temperature_mix vs an independent Python model: the
    T=2 weights (floor(sqrt(lang_tokens)*1000) grid, integral-divide
    normalization), per-doc epochs and repeats — exact, including the
    up-weighting property (the low-resource language's epochs exceed
    the high-resource language's) and the zero-token language."""
    import math
    import tempfile

    from projetbigdata_spark.operators.packing import (
        corpus_temperature_mix,
    )

    rows = [
        (0, "aa bb cc dd " * 20, "en"),   # high-resource: 80 tokens
        (1, "aa aa aa aa", "en"),
        (2, "dd dd", "fr"),               # low-resource: 3 tokens
        (3, "bb", "fr"),
        (4, "", "zh"),                    # zero-token language
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {
        r.doc_id: (
            r.n_tokens, r.bucket, r.weight_micros, r.epochs_micros,
            r.n_repeats,
        )
        for r in corpus_temperature_mix(spark, d).collect()
    }

    n_tok = {i: len(_toks(t)) for i, t, _ in rows}
    lang_tokens: Counter = Counter()
    for i, _, lang in rows:
        lang_tokens[lang] += n_tok[i]
    total = sum(lang_tokens.values())
    grid = {
        lang: math.floor(math.sqrt(n) * 1000)
        for lang, n in lang_tokens.items()
    }
    gsum = sum(grid.values())
    w = {lang: grid[lang] * 1_000_000 // gsum for lang in grid}
    eps = {
        lang: (
            w[lang] * total // lang_tokens[lang]
            if lang_tokens[lang] > 0
            else 0
        )
        for lang in grid
    }
    assert set(got) == {i for i, _, _ in rows}
    for i, _, lang in rows:
        bucket = (
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            % 1_000_000
        )
        e = eps[lang]
        expect = (
            n_tok[i],
            bucket,
            w[lang],
            e,
            e // 1_000_000 + (1 if bucket < e % 1_000_000 else 0),
        )
        assert got[i] == expect, (i, got[i], expect)

    # temperature up-weighting: fr (3 tokens) must train at MORE
    # epochs than en (84 tokens), and weights must nearly exhaust the
    # 1e6 grid (flooring loses < |langs| micros)
    assert eps["fr"] > eps["en"]
    assert 1_000_000 - len(grid) < sum(w.values()) <= 1_000_000
