"""Behavioral tests for the r9 Gopher tier (operators/repetition.py):
corpus_gopher_clean (the Rae et al. 2021 A1.1 quality-rule verdict)
and text_gopher_repetition (the full table-A1 repetition profile).

The parquet fixtures are single-line, near-repetition-free synthetic
text, so the registered driver rows value-check mostly degenerate
paths; these tests pin the LIVE semantics — per-rule verdict flips,
within-doc duplicate lines, overlapping dup-gram coverage (interval
UNION, no double counting), top-gram tie-breaks — on constructed
corpora, including written-table Spark<->DuckDB parity runs of the
exact registered artifacts."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from projetbigdata_spark.operators.repetition import (
    GOPHER_DUP_NS,
    GOPHER_TOP_NS,
    corpus_gopher_clean,
    text_gopher_repetition,
)

PPM = 1_000_000


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id bigint, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text")
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


# --- the Python reference model for text_gopher_repetition -----------


def _rep_model(text):
    t = text or ""
    w = [x for x in re.split(r"\s+", t.lower()) if x != ""]
    nl = [line for line in t.split("\n") if line != ""]
    L = len(w)
    total_chars = sum(len(x) for x in w) + max(L - 1, 0)
    ncl = len(nl)
    dup_idx = [i for i in range(ncl) if nl[i] in nl[:i]]
    line_chars = sum(len(x) for x in nl)
    out = {
        "n_tokens": L,
        "total_chars": total_chars,
        "n_content_lines": ncl,
        "dup_line_ppm": (len(dup_idx) * PPM // ncl) if ncl else None,
        "dup_line_char_ppm": (
            sum(len(nl[i]) for i in dup_idx) * PPM // line_chars
        )
        if line_chars > 0
        else None,
    }
    for n in GOPHER_TOP_NS:
        grams = [" ".join(w[i : i + n]) for i in range(L - n + 1)]
        if grams and total_chars > 0:
            c = Counter(grams)
            mc = max(c.values())
            clen = max(len(g) for g in c if c[g] == mc)
            out[f"top_{n}gram_char_ppm"] = mc * clen * PPM // total_chars
        else:
            out[f"top_{n}gram_char_ppm"] = None
    for n in GOPHER_DUP_NS:
        if L >= n and total_chars > 0:
            keys = [" ".join(w[i : i + n]) for i in range(L - n + 1)]
            cnt = Counter(keys)
            covered: set[int] = set()
            for i, g in enumerate(keys):
                if cnt[g] > 1:
                    covered.update(range(i, i + n))
            tok = sum(len(w[p]) for p in covered)
            gaps = sum(
                1 for p in range(L - 1) if p in covered and p + 1 in covered
            )
            out[f"dup_{n}gram_char_ppm"] = (tok + gaps) * PPM // total_chars
        else:
            out[f"dup_{n}gram_char_ppm"] = None
    return out


REP_TEXTS = [
    # overlapping dup 6-grams: "a1..a6" repeats; its chars must count
    # ONCE however many of the derived dup 5/6-grams cover them
    (1, "a1 a2 a3 a4 a5 a6 zz a1 a2 a3 a4 a5 a6 yy qq ww ee rr tt uu"),
    # pathological repetition: every profile column saturates
    (2, ("spam " * 30).strip()),
    # repeated + empty lines: empty lines are NOT content lines
    (3, "hello world.\n\nhello world.\nbye now.\n\nhello world."),
    # top-gram tie-break: 'aa bb' and 'ccc dddd' both occur twice ->
    # the longer one claims the share
    (4, "aa bb ccc dddd aa bb ccc dddd xx"),
    # no repetition at all
    (5, "one two three four five six seven eight nine ten"),
    # degenerate rows
    (6, None),
    (7, ""),
    (8, "solo"),
    # within-the-first-doc repeats in a SHORT doc (< every dup n)
    (9, "x y x y"),
    # long repetition-free doc: the verdict's kept=True case (short
    # docs like 5 fail top-gram ceilings VACUOUSLY of repetition —
    # one 2-gram is >20% of a 10-token doc's chars by arithmetic)
    (10, " ".join(f"w{i:03d}" for i in range(80))),
]


def test_gopher_repetition_matches_python_model(spark, tmp_path):
    d = _write_docs(spark, tmp_path, REP_TEXTS)
    got = {r["doc_id"]: r.asDict() for r in
           text_gopher_repetition(spark, d).collect()}
    assert set(got) == {i for i, _ in REP_TEXTS}
    for doc_id, text in REP_TEXTS:
        want = _rep_model(text)
        have = {k: v for k, v in got[doc_id].items() if k != "doc_id"}
        assert have == want, (doc_id, have, want)
    # the constructed corpus actually exercises the paths the fixtures
    # can't: saturated profile, dup lines, dup 5..10-grams
    assert got[2]["dup_10gram_char_ppm"] == PPM  # full coverage
    assert got[1]["dup_6gram_char_ppm"] > 0
    assert got[3]["dup_line_ppm"] > 0
    assert got[4]["top_2gram_char_ppm"] == 2 * len("ccc dddd") * PPM // got[
        4
    ]["total_chars"]


def test_gopher_repetition_overlap_counts_chars_once(spark, tmp_path):
    """Interval-union semantics: a doc that is one long repeated run
    has MANY overlapping dup 5-grams, but coverage is exactly the
    doc's chars — ppm == 1e6, never more (a per-occurrence sum would
    overshoot several-fold)."""
    d = _write_docs(spark, tmp_path, [(1, ("ab " * 20).strip())])
    row = text_gopher_repetition(spark, d).collect()[0]
    for n in GOPHER_DUP_NS:
        assert row[f"dup_{n}gram_char_ppm"] == PPM


def test_gopher_repetition_matches_oracle_on_constructed_corpus(
    spark, tmp_path
):
    """Value-exact Spark<->DuckDB parity of the registered artifacts on
    a corpus that exercises every live path."""
    import duckdb

    from projetbigdata_spark.operators.repetition import ORACLE_SQL

    d = _write_docs(spark, tmp_path, REP_TEXTS)
    got = {
        r["doc_id"]: tuple(r.asDict().items())
        for r in text_gopher_repetition(spark, d).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    cur = con.execute(ORACLE_SQL["text_gopher_repetition"])
    cols = [c[0] for c in cur.description]
    want = {
        r[0]: tuple(zip(cols, r, strict=True)) for r in cur.fetchall()
    }
    assert got == want


# --- corpus_gopher_clean rule flips -----------------------------------

# 60 words, mean length in [3,10], all alphabetic, two required words
# ('the', 'with'), no symbols, no bullets/ellipses -> passes every rule
_GOOD = " ".join(["the", "with"] + [f"word{i:02d}" for i in range(58)])

GOPHER_CASES = [
    (0, _GOOD, True),
    # < 50 words
    (1, "the with only a few words here", False),
    # mean word length < 3 (the pads are 2-char; 'the'/'with' stay)
    (2, " ".join(["the", "with"] + ["ab"] * 58), False),
    # mean word length > 10
    (3, " ".join(["the", "with"] + ["x" * 30] * 58), False),
    # symbol-to-word ratio > 0.1 (ten '#' on 60 words)
    (4, _GOOD + " " + "#" * 10, False),
    # every line bullet-started (> 90%)
    (5, "\n".join("- " + _GOOD for _ in range(3)), False),
    # every line ellipsis-terminated (> 30%)
    (6, "\n".join(_GOOD + "..." for _ in range(3)), False),
    # > 20% purely-numeric words
    (7, " ".join(["the", "with"] + ["word"] * 40 + ["1234"] * 18), False),
    # zero required stop words
    (8, " ".join(f"term{i:02d}" for i in range(60)), False),
]


def test_gopher_clean_rules_on_constructed_corpus(spark, tmp_path):
    d = _write_docs(spark, tmp_path, [(i, t) for i, t, _ in GOPHER_CASES])
    rows = {r["doc_id"]: r for r in corpus_gopher_clean(spark, d).collect()}
    for i, _, want_kept in GOPHER_CASES:
        assert rows[i]["kept"] is want_kept, (i, rows[i].asDict())
    good = rows[0]
    assert good["n_words"] == 60
    assert 3 * PPM <= good["mean_word_len_micros"] <= 10 * PPM
    assert good["n_required"] == 2
    # the symbol case counts '...' runs and '#' marks
    assert rows[4]["symbol_word_ppm"] > PPM // 10
    assert rows[6]["ellipsis_line_ppm"] == PPM


def test_gopher_clean_matches_oracle_on_constructed_corpus(spark, tmp_path):
    import duckdb

    from projetbigdata_spark.operators.repetition import ORACLE_SQL

    rows = [(i, t) for i, t, _ in GOPHER_CASES] + [
        (100, None),
        (101, ""),
        (102, "• bullet\nplain line.\nalmost done…"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: tuple(r.asDict().items())
        for r in corpus_gopher_clean(spark, d).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    cur = con.execute(ORACLE_SQL["corpus_gopher_clean"])
    cols = [c[0] for c in cur.description]
    want = {
        r[0]: tuple(zip(cols, r, strict=True)) for r in cur.fetchall()
    }
    assert got == want
    assert got[100][-1] == ("kept", False)  # null text fails word count


def test_gopher_repetition_clean_verdict_flips(spark, tmp_path):
    """The A1 ceiling verdict over the profile: a saturated-repetition
    doc fails every defined rule, a repetition-free doc passes all,
    and a doc too short to define any n-gram passes VACUOUSLY (NULL
    signals measure nothing). Python model = the published ceilings
    applied to the already-verified profile model."""
    from projetbigdata_spark.operators.repetition import (
        GOPHER_REP_CEILINGS_PPM,
        corpus_gopher_repetition_clean,
    )

    d = _write_docs(spark, tmp_path, REP_TEXTS)
    got = {
        r["doc_id"]: r.asDict()
        for r in corpus_gopher_repetition_clean(spark, d).collect()
    }
    for doc_id, text in REP_TEXTS:
        prof = _rep_model(text)
        want_failed = sum(
            1
            for c, t in GOPHER_REP_CEILINGS_PPM
            if prof.get(c) is not None and prof[c] > t
        )
        assert got[doc_id]["n_rules_failed"] == want_failed, (doc_id, prof)
        assert got[doc_id]["kept"] is (want_failed == 0)
    assert got[2]["kept"] is False and got[2]["n_rules_failed"] >= 8
    assert got[10]["kept"] is True  # long + repetition-free
    # doc 5 (10 tokens, zero repetition) FAILS the top-gram ceilings
    # by pure arithmetic — the published rules presuppose long docs;
    # pinning this documents why the verdict composes AFTER the
    # word-count floor of corpus_gopher_clean
    assert got[5]["kept"] is False
    assert got[8]["kept"] is True  # 'solo': every signal NULL -> vacuous
