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
