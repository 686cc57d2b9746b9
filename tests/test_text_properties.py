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
