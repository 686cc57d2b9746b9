"""Property-based checks (hypothesis) for the Catalyst text
expressions — the pure-SQL twins of the reference's Python string ops
must agree with a straightforward Python model on arbitrary input, not
just the fixture corpus."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

TOKEN_RE = re.compile(r"\s+")

# printable-ish text with whitespace runs, unicode kept out of scope
# (the fixtures are ASCII; unicode normalization is documented out of
# SQL-oracle scope)
texts = st.text(
    alphabet=st.sampled_from(list("abcdefgh XYZ.,!?<>/\t\n  ")), max_size=80
)


def py_tokenize(s: str) -> list[str]:
    return [t for t in TOKEN_RE.split(s.lower()) if t != ""]


def py_ngrams(tokens: list[str], n: int) -> list[str]:
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


@settings(max_examples=30, deadline=None)
@given(texts=st.lists(texts, min_size=1, max_size=8))
def test_tokenize_matches_python_model(spark, texts):
    from pyspark.sql import functions as F

    from projetbigdata_spark.functions.text import tokenize

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {
        r.i: list(r.toks)
        for r in df.select("i", tokenize("text").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_tokenize(t), (t, got[i])


@settings(max_examples=30, deadline=None)
@given(
    tokens=st.lists(
        st.text(alphabet=st.sampled_from(list("abcxyz")), min_size=1, max_size=5),
        max_size=10,
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_ngrams_matches_python_model(spark, tokens, n):
    from pyspark.sql import functions as F

    from projetbigdata_spark.functions.text import ngrams

    df = spark.createDataFrame([(tokens,)], "toks array<string>")
    got = list(df.select(ngrams(F.col("toks"), n).alias("g")).first().g)
    assert got == py_ngrams(tokens, n), (tokens, n, got)


# ---------------------------------------------------------------------------
# Float-determinism policy property (r3): every equality/threshold
# comparison on an aggregated ratio in this engine goes through the
# integer-grid spelling  (micros - micros % den) / den / 1e6  (jaccard,
# window_distribution, q11/q15 revenue). Property: the grid value
# always equals the true rational floored to 6dp — i.e. the spelling
# is EXACTLY floor(num/den * 1e6) / 1e6, independent of float
# summation order, for any positive integers.
# ---------------------------------------------------------------------------
from fractions import Fraction

from hypothesis import given
from hypothesis import strategies as st


@given(
    num=st.integers(min_value=0, max_value=10**9),
    den=st.integers(min_value=1, max_value=10**9),
)
def test_integer_grid_division_is_exact_6dp_floor(num, den):
    micros = num * 1_000_000
    # the engine spelling, evaluated exactly as Spark/DuckDB would:
    # (micros - micros % den) is divisible by den, the quotient is an
    # integer < 2^53 (exact in double), and the final /1e6 is ONE
    # division of that exact integer — identical in every engine.
    grid = (micros - micros % den) / den / 1_000_000.0
    q = micros // den  # floor(num * 1e6 / den), exactly
    assert (micros - micros % den) // den == q
    assert q < 2**53
    assert grid == q / 1_000_000.0


def test_search_topk_conjunctive_semantics(spark, tmp_path):
    """text_search_topk on constructed docs: conjunctive gate (a doc
    missing any term never surfaces), exact integer scoring vs a
    hand-computed model, rank order with doc_id tiebreak."""
    from projetbigdata_spark.operators.tfidf import (
        SEARCH_TERMS,
        text_search_topk,
    )

    assert SEARCH_TERMS == ("hash", "join", "scan")
    texts = [
        "hash join scan",                  # all terms once
        "hash hash join join scan scan",   # all terms twice
        "hash join",                       # missing scan -> excluded
        "scan scan scan",                  # missing two -> excluded
        "hash join scan scan",             # mixed tf
        "nothing relevant here",
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    rows = text_search_topk(spark, d).collect()
    got = [(r.doc_id, r.score, r.total_tf) for r in rows]

    # model: df(hash)=3 (docs 0,1,4... plus doc 2) -> recount:
    # hash in docs {0,1,2,4}, join in {0,1,2,4}, scan in {0,1,3,4}
    df = {"hash": 4, "join": 4, "scan": 4}
    w = {t: 1_000_000 // df[t] for t in df}
    def score(tf_map):
        return sum(tf_map[t] * w[t] for t in tf_map)
    expect = [
        (1, score({"hash": 2, "join": 2, "scan": 2}), 6),
        (4, score({"hash": 1, "join": 1, "scan": 2}), 4),
        (0, score({"hash": 1, "join": 1, "scan": 1}), 3),
    ]
    assert got == expect, (got, expect)


def _python_bpe(word_counts, n_merges):
    """Reference BPE trainer: greedy left-to-right merge application,
    ties broken lexicographically on (p1, p2)."""
    state = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(1, n_merges + 1):
        from collections import Counter

        pc = Counter()
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best_n = max(pc.values())
        p1, p2 = min(p for p, c in pc.items() if c == best_n)
        merges.append((step, p1, p2, best_n))
        new = {}
        for syms, c in state.items():
            out = []
            for x in syms:
                if out and out[-1] == p1 and x == p2:
                    out[-1] = p1 + p2
                else:
                    out.append(x)
            new[tuple(out)] = new.get(tuple(out), 0) + c
        state = new
    return merges


def test_bpe_merges_match_python_model(spark, tmp_path):
    """corpus_bpe_merges (Spark array-fold) AND its DuckDB oracle
    (double-separator string replace) vs the reference Python BPE
    trainer — on a corpus built to hit the hard cases: consecutive
    same-pair runs (aaaa), merges at word start/end, a merged symbol
    adjacent to its own pair (abab), tie-broken pairs, and single-char
    words."""
    import duckdb

    from projetbigdata_spark.operators.textstats import (
        _bpe_merges_sql,
        corpus_bpe_merges,
    )

    texts = [
        "aaaa aaaa abab",        # same-pair runs + re-adjacent merges
        "ab ab ba a b",          # ties and word boundaries
        "xy xyz zyx x aaaa",
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    wc = {}
    for t in texts:
        for w in t.lower().split():
            if w:
                wc[w] = wc.get(w, 0) + 1
    expect = set(_python_bpe(wc, 3))

    got_spark = {
        (r.step, r.p1, r.p2, r.n)
        for r in corpus_bpe_merges(spark, d).collect()
    }
    assert got_spark == expect, (got_spark, expect)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    got_duck = set(
        tuple(row) for row in con.execute(_bpe_merges_sql()).fetchall()
    )
    assert got_duck == expect, (got_duck, expect)


def _write_docs(spark, tmp_path, texts):
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _duck_docs(d):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    return con


def test_bpe_pair_exhaustion_keeps_vocab(spark, tmp_path):
    """ADVICE r4: when the corpus runs out of adjacent pairs before
    BPE_N_MERGES, the remaining steps must be NO-OPS — the vocab is
    the surviving symbol inventory, not an empty frame, and the
    merges table carries exactly the learned steps. Both engines."""
    from projetbigdata_spark.operators.textstats import (
        _bpe_merges_sql,
        _bpe_vocab_sql,
        corpus_bpe_merges,
        corpus_bpe_vocab,
    )

    # one mergeable pair total: step 1 learns (a,b); steps 2-3 see a
    # corpus of single-symbol words
    d = _write_docs(spark, tmp_path, ["ab ab a b"])

    expect_merges = {(1, "a", "b", 2)}
    got_spark = {
        (r.step, r.p1, r.p2, r.n)
        for r in corpus_bpe_merges(spark, d).collect()
    }
    assert got_spark == expect_merges, got_spark

    expect_vocab = {("ab", 2), ("a", 1), ("b", 1)}
    got_vocab = {
        (r.symbol, r.n) for r in corpus_bpe_vocab(spark, d).collect()
    }
    assert got_vocab == expect_vocab, got_vocab

    con = _duck_docs(d)
    assert {
        tuple(r) for r in con.execute(_bpe_merges_sql()).fetchall()
    } == expect_merges
    assert {
        tuple(r) for r in con.execute(_bpe_vocab_sql()).fetchall()
    } == expect_vocab


def test_bpe_separator_byte_in_word(spark, tmp_path):
    """ADVICE r4: \\x01 is not whitespace, so a binary-junk word can
    carry the oracle's separator byte. Both engines exclude such words
    from the trainable vocabulary; the rest of the corpus trains
    identically."""
    from projetbigdata_spark.operators.textstats import (
        _bpe_merges_sql,
        _bpe_vocab_sql,
        corpus_bpe_merges,
        corpus_bpe_vocab,
    )

    d = _write_docs(
        spark, tmp_path, ["a\x01b aa aa ax", "\x01 aa q\x01"]
    )
    # trainable words: aa x3, ax x1 -> step1 (a,a,3): aa->[aa]; ax
    # stays [a,x]; step2 (a,x,1); step3 exhausted
    expect_merges = {(1, "a", "a", 3), (2, "a", "x", 1)}
    got_spark = {
        (r.step, r.p1, r.p2, r.n)
        for r in corpus_bpe_merges(spark, d).collect()
    }
    assert got_spark == expect_merges, got_spark

    expect_vocab = {("aa", 3), ("ax", 1)}
    got_vocab = {
        (r.symbol, r.n) for r in corpus_bpe_vocab(spark, d).collect()
    }
    assert got_vocab == expect_vocab, got_vocab

    con = _duck_docs(d)
    assert {
        tuple(r) for r in con.execute(_bpe_merges_sql()).fetchall()
    } == expect_merges
    assert {
        tuple(r) for r in con.execute(_bpe_vocab_sql()).fetchall()
    } == expect_vocab


def test_bpe_encode_matches_python_model(spark, tmp_path):
    """corpus_bpe_encode (train 3 merges, then tokenize the corpus
    with them) vs the Python reference: per-doc subword counts after
    greedy merge application, zero-count rows for docs with no
    trainable words."""
    from projetbigdata_spark.operators.textstats import (
        BPE_N_MERGES,
        corpus_bpe_encode,
    )

    texts = ["aaaa aaaa abab", "ab ab ba a b", "", "xy xyz zyx x aaaa"]
    d = _write_docs(spark, tmp_path, texts)

    wc = {}
    for t in texts:
        for w in t.lower().split():
            if w:
                wc[w] = wc.get(w, 0) + 1
    merges = _python_bpe(wc, BPE_N_MERGES)

    def encode_len(word):
        syms = list(word)
        for _step, p1, p2, _n in merges:
            out = []
            for x in syms:
                if out and out[-1] == p1 and x == p2:
                    out[-1] = p1 + p2
                else:
                    out.append(x)
            syms = out
        return len(syms)

    expect = {}
    for i, t in enumerate(texts):
        words = [w for w in t.lower().split() if w]
        expect[i] = (len(words), sum(encode_len(w) for w in words))

    got = {
        r.doc_id: (r.n_words, r.n_tokens_bpe)
        for r in corpus_bpe_encode(spark, d).collect()
    }
    assert got == expect, (got, expect)
    assert got[2] == (0, 0)  # the empty doc keeps a zero row


def _python_bpe_batched(word_counts, n_sweeps, b):
    """Batched reference: top-b pairs from ONE snapshot per sweep,
    applied sequentially in rank order (stale counts within a sweep)."""
    from collections import Counter

    state = {tuple(w): c for w, c in word_counts.items()}
    res = []
    for sweep in range(1, n_sweeps + 1):
        pc = Counter()
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:b]
        for rnk, ((p1, p2), n) in enumerate(ranked, 1):
            res.append((sweep, rnk, p1, p2, n))
            new = {}
            for syms, c in state.items():
                out = []
                for x in syms:
                    if out and out[-1] == p1 and x == p2:
                        out[-1] = p1 + p2
                    else:
                        out.append(x)
                new[tuple(out)] = new.get(tuple(out), 0) + c
            state = new
    return res


def test_bpe_batched_matches_python_model(spark, tmp_path):
    """corpus_bpe_merges_batched AND its unrolled oracle vs the
    batched reference — including the overlap case (a,a)+(a,b) picked
    from the same snapshot and a corpus that exhausts mid-sweep."""
    from projetbigdata_spark.operators.textstats import (
        _bpe_batched_sql,
        corpus_bpe_merges_batched,
    )

    texts = ["aaaa aaaa abab", "ab ab ba a b", "xy xyz zyx x aaaa",
             "ab ab a b"]
    d = _write_docs(spark, tmp_path, texts)

    wc = {}
    for t in texts:
        for w in t.lower().split():
            if w:
                wc[w] = wc.get(w, 0) + 1
    expect = set(_python_bpe_batched(wc, 2, 2))

    got_spark = {
        (r.sweep, r.rnk, r.p1, r.p2, r.n)
        for r in corpus_bpe_merges_batched(spark, d).collect()
    }
    assert got_spark == expect, (got_spark, expect)

    con = _duck_docs(d)
    got_duck = {
        tuple(r) for r in con.execute(_bpe_batched_sql()).fetchall()
    }
    assert got_duck == expect, (got_duck, expect)

    # exhaustion mid-sweep: one mergeable pair, b=2 -> rank 2 is a
    # no-op and sweep 2 sees no pairs
    d2 = _write_docs(spark, tmp_path / "x", ["ab ab a b"])
    got2 = {
        (r.sweep, r.rnk, r.p1, r.p2, r.n)
        for r in corpus_bpe_merges_batched(spark, d2).collect()
    }
    assert got2 == {(1, 1, "a", "b", 2)}, got2


def test_feature_hashing_matches_python_model(spark):
    """text_feature_hashing == the hashlib model (same 60-bit md5 key,
    same bucket/sign split), and the accounting invariants hold:
    Σn over a doc's buckets == its token count, |signed_sum| <= n with
    matching parity (each token contributes exactly ±1)."""
    import hashlib
    from collections import defaultdict

    from tests.conftest import SF_SMOKE

    from projetbigdata_spark.operators.features import (
        HASH_BUCKETS,
        text_feature_hashing,
    )

    rows = {
        r.doc_id: (r.text or "").lower().split()
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    expected: dict = defaultdict(lambda: [0, 0])
    for d, toks in rows.items():
        for t in toks:
            hv = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            cell = expected[(d, hv % HASH_BUCKETS)]
            cell[0] += 1
            cell[1] += 1 if (hv // HASH_BUCKETS) % 2 == 0 else -1
    got = {
        (r.doc_id, r.bucket): (r.n, r.signed_sum)
        for r in text_feature_hashing(spark, SF_SMOKE).collect()
    }
    assert got == {k: tuple(v) for k, v in expected.items()}

    per_doc: dict = defaultdict(int)
    for (d, b), (n, s) in got.items():
        assert 0 <= b < HASH_BUCKETS
        assert abs(s) <= n and (n - s) % 2 == 0
        per_doc[d] += n
    assert per_doc == {d: len(t) for d, t in rows.items() if t}
