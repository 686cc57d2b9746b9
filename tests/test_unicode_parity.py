r"""Unicode oracle-parity map (r3): the engine guarantees value-exact
DuckDB parity on ASCII corpora; this pins exactly where the JVM and
DuckDB/RE2 text semantics agree and where they diverge, so the parity
domain is a tested contract instead of folklore.

Probed r3 (Spark 4.1 Java regex vs DuckDB RE2/ICU):
  AGREE:   ASCII, Latin accents, emoji, CJK, NBSP, combining marks,
           tab/newline/CR whitespace, lower() on all of the above.
  DIVERGE: \x0b vertical tab — Java \s contains it, RE2's does not
           (DuckDB emits it as a punctuation token);
           Turkish İ (U+0130) — Java lower() yields i+combining-dot
           (two codepoints), DuckDB/ICU folds to plain 'i'.
Both divergences sit OUTSIDE the fixtures' ASCII domain; deployments
tokenizing non-ASCII corpora should normalize NFC + strip \x0b first
(COVERAGE.md §2.9-T2 note)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

AGREE_TEXTS = [
    "the quick Brown fox",
    "café naïve Ürümqi",
    "hello 😀 world 🎉!",
    "你好 世界 spark 测试",
    "a\tb\nc\r\nd",
    "a b",      # NBSP
    "éclair",  # combining acute
    "MiXeD CaSe 123 !?",
]

DUCK_TOKS = r"""
SELECT array_to_string(list_transform(
    regexp_extract_all(replace(?, '<br /><br />', ' '), '\w+|[^\w\s]+'),
    x -> lower(x)), '|')
"""


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _spark_toks(spark, text):
    from projetbigdata_spark.functions.nltk_tier import wordpunct_tokens

    return (
        spark.createDataFrame([(text,)], "text string")
        .select(F.concat_ws("|", wordpunct_tokens("text")).alias("t"))
        .first()
        .t
    )


@pytest.mark.parametrize("text", AGREE_TEXTS)
def test_tokenizer_parity_on_agreeing_classes(spark, duck, text):
    assert _spark_toks(spark, text) == duck.execute(DUCK_TOKS, [text]).fetchone()[0]


def test_documented_divergences_still_hold(spark, duck):
    r"""If either engine changes its \s or case-folding semantics, this
    fails and the COVERAGE.md §2.9-T2 note must be re-audited."""
    s_vtab = _spark_toks(spark, "a\x0bb")
    d_vtab = duck.execute(DUCK_TOKS, ["a\x0bb"]).fetchone()[0]
    assert s_vtab == "a|b" and d_vtab == "a|\x0b|b"

    s_tr = _spark_toks(spark, "İstanbul")
    d_tr = duck.execute(DUCK_TOKS, ["İstanbul"]).fetchone()[0]
    # İ is non-\w in both ASCII regexes -> its own token; the
    # divergence is the case-fold of that token
    assert s_tr == "i̇|stanbul" and d_tr == "i|stanbul"
