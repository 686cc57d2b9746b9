"""NLTK-fidelity tier gates (VERDICT r1 item 4).

The Catalyst twin must reproduce NLTK's wordpunct_tokenize exactly on
a fixed sentence set; the real-NLTK pandas-UDF paths are parity-tested
only when the lib is importable (skipped here otherwise — this
container has no nltk)."""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_SMOKE

SENTENCES = [
    "Good muffins cost $3.88\nin New York.  Please buy me two of them.",
    "This movie was GREAT!<br /><br />I mean it... 10/10, don't miss-it.",
    "can't won't it's o'clock",
    "",
    "punctuation---heavy ?!? text (with) [brackets] {and} <tags>",
]

WORDPUNCT = re.compile(r"\w+|[^\w\s]+", re.ASCII)


def _py_wordpunct(s: str) -> list[str]:
    """NLTK's WordPunctTokenizer is re.findall(r'\\w+|[^\\w\\s]+') —
    replicated with re.ASCII to match the JVM/RE2 charclass semantics
    the engine documents for ASCII corpora."""
    return [
        w.lower() for w in WORDPUNCT.findall(s.replace("<br /><br />", " "))
    ]


def test_catalyst_twin_matches_python_regex(spark):
    from pyspark.sql import functions as F

    from projetbigdata_spark.functions.nltk_tier import wordpunct_tokens

    df = spark.createDataFrame([(i, s) for i, s in enumerate(SENTENCES)], "i int, text string")
    got = {
        r.i: list(r.toks)
        for r in df.select("i", wordpunct_tokens("text").alias("toks")).collect()
    }
    for i, s in enumerate(SENTENCES):
        assert got[i] == _py_wordpunct(s), (i, s)


def test_rule_pos_tags_aligns_with_tokens(spark):
    from pyspark.sql import functions as F

    from projetbigdata_spark.functions.nltk_tier import pos_tags, wordpunct_tokens

    df = spark.createDataFrame([(s,) for s in SENTENCES if s], "text string")
    out = df.select(
        wordpunct_tokens("text").alias("toks")
    ).select(F.size("toks").alias("n"), F.size(pos_tags("toks")).alias("m"))
    for r in out.collect():
        assert r.n == r.m  # one tag per token


def test_nltk_udf_parity_with_catalyst_twin(spark):
    pytest.importorskip("nltk", reason="nltk not installed in this container")
    from projetbigdata_spark.functions.nltk_tier import (
        nltk_wordpunct_tokens_udf,
        wordpunct_tokens,
    )

    df = spark.createDataFrame([(i, s) for i, s in enumerate(SENTENCES)], "i int, text string")
    twin = {
        r.i: list(r.t)
        for r in df.select("i", wordpunct_tokens("text").alias("t")).collect()
    }
    real = {
        r.i: list(r.t)
        for r in df.select("i", nltk_wordpunct_tokens_udf()("text").alias("t")).collect()
    }
    assert twin == real


def test_nltk_pos_udf_runs(spark):
    pytest.importorskip("nltk", reason="nltk not installed in this container")
    from pyspark.sql import functions as F

    from projetbigdata_spark.functions.nltk_tier import (
        nltk_pos_tags_udf,
        wordpunct_tokens,
    )

    df = spark.createDataFrame([(SENTENCES[0],)], "text string")
    tags = (
        df.select(wordpunct_tokens("text").alias("toks"))
        .select(nltk_pos_tags_udf()(F.col("toks")).alias("tags"))
        .first()
        .tags
    )
    assert len(tags) > 0


def test_universal_tag_deterministic_classes(spark):
    """The context-free universal tagger must nail the lexically
    determined slice of nltk.pos_tag(tagset='universal'): punctuation,
    numerals, and the English closed classes (en-ptb map: DT->DET,
    PRP/WP->PRON, IN->ADP incl. subordinators, CC->CONJ, TO/POS->PRT,
    RB lemmas->ADV). Open-class fallback: domain VERB/ADJ lists, -ly
    ADV, NOUN."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.functions.nltk_tier import universal_tag

    expected = {
        ".": ".", "!": ".", "...": ".", "?!?": ".",
        "3": "NUM", "88": "NUM", "10/10": "NUM", "3.88": "NUM",
        "the": "DET", "a": "DET", "every": "DET", "which": "DET",
        "they": "PRON", "it": "PRON", "whom": "PRON",
        "of": "ADP", "between": "ADP", "because": "ADP", "although": "ADP",
        "and": "CONJ", "or": "CONJ", "but": "CONJ",
        "to": "PRT", "'s": "PRT",
        "not": "ADV", "never": "ADV", "quickly": "ADV",
        # ASCII \w divergence (documented in nltk_tier.py): non-ASCII
        # letters fall in [^\w\s]+ on the JVM/RE2 side -> '.'
        "там": ".",
        "scan": "VERB", "merge": "VERB",
        "slow": "ADJ", "big": "ADJ",
        "muffins": "NOUN", "york": "NOUN",
    }
    df = spark.createDataFrame(
        [(t,) for t in expected], "tok string"
    ).select("tok", universal_tag(F.col("tok")).alias("tag"))
    got = {r.tok: r.tag for r in df.collect()}
    assert got == expected


def test_rule_pos_tags_universal_aligns(spark):
    from pyspark.sql import functions as F

    from projetbigdata_spark.functions.nltk_tier import (
        rule_pos_tags_universal,
        wordpunct_tokens,
    )

    df = spark.createDataFrame([(s,) for s in SENTENCES], "text string")
    out = df.select(
        F.size(wordpunct_tokens("text")).alias("n"),
        F.size(rule_pos_tags_universal(wordpunct_tokens("text"))).alias("m"),
    )
    assert all(r.n == r.m for r in out.collect())


def test_universal_tag_agreement_with_real_nltk(spark):
    """Gated divergence audit (VERDICT r2 item 8): where nltk IS
    importable, the rule tier must agree with
    pos_tag(tagset='universal') 100% on punctuation/NUM/DET/CONJ/PRT
    tokens of the fixed sentence set, and >=70% overall (the contextual
    remainder — noun/verb homographs, IN-vs-RB adverbials — is the
    documented divergence, COVERAGE.md §2.9-T3)."""
    pytest.importorskip("nltk", reason="nltk not installed in this container")
    from nltk import pos_tag
    from pyspark.sql import functions as F

    from projetbigdata_spark.functions.nltk_tier import (
        universal_tag,
        wordpunct_tokens,
    )

    df = spark.createDataFrame([(s,) for s in SENTENCES if s], "text string")
    toks = df.select(F.explode(wordpunct_tokens("text")).alias("tok"))
    rows = toks.select("tok", universal_tag(F.col("tok")).alias("tag")).collect()
    agree = total = 0
    exact_classes = {".", "NUM", "DET", "CONJ", "PRT"}
    for r in rows:
        ref = pos_tag([r.tok], tagset="universal")[0][1]
        total += 1
        if ref == r.tag:
            agree += 1
        elif ref in exact_classes or r.tag in exact_classes:
            raise AssertionError(f"{r.tok}: rule={r.tag} nltk={ref}")
    assert agree / total >= 0.70
