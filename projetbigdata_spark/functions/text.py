"""Text column expressions — the reference's P1/P2/T1/F1 operators
(SURVEY.md §2.2/§2.3/§2.9) as pure Catalyst expressions.

Reference semantics being rebuilt:
  - cleanLower  (script1.py:37-39): strip `<br /><br />` + lowercase.
  - preProcess  (script5.py:47-51): tokenize + lowercase each token.
  - stopword filter (transformers.py:34-36): drop tokens in stopword set.
  - NGram (script3.py:52-54): space-joined n-grams.

Everything here stays JVM-side (whole-stage codegen) — no Python UDFs.
The exact token/stopword definitions are mirrored literally in the
DuckDB oracle SQL (registry), so every operator is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed, deterministic stopword list (the reference uses NLTK's English
# list, transformers.py:34; we pin an explicit subset so the SQL oracle
# can embed the identical literal — NLTK fidelity is documented
# divergence, SURVEY.md §4.3).
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "in", "is", "it", "of", "on", "or", "that", "the", "to", "with",
)


def sql_stopword_list() -> str:
    """The stopword set as a SQL IN-list literal (for oracle parity)."""
    return ", ".join(f"'{w}'" for w in STOPWORDS)


def clean_lower(col: Column | str) -> Column:
    """P1 `cleanLower` (script1.py:37-39): `<br />` HTML-break strip +
    lowercase, as one Catalyst expression chain."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(c, r"<br\s*/>", " "))


def tokenize(col: Column | str) -> Column:
    """T1 whitespace tokenizer (script2.py:50 `Tokenizer`): lowercase +
    split on runs of whitespace; empty tokens dropped.

    Oracle equivalent: string_split_regex(lower(text), '\\s+') with
    '' filtered out.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(c), r"\s+")
    return F.filter(toks, lambda t: t != F.lit(""))


def filter_stopwords(tokens: Column) -> Column:
    """F1 stopword filter (transformers.py:34-36) on an array column
    via a higher-order function — no UDF, no shuffle. Preserves
    duplicates + order, which term-frequency semantics require; an
    array_except spelling would dedup and reorder (the earlier
    remove_stopwords variant was deleted for exactly that footgun)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.filter(tokens, lambda t: ~F.array_contains(sw, t))


def ngrams(tokens: Column, n: int = 2) -> Column:
    """T4 `NGram` (script3.py:52-54): space-joined n-grams of a token
    array, as a Catalyst expression (sequence + transform + slice):

        [t0..tk] -> ["t0 t1", "t1 t2", ...]       (n=2)

    Matches pyspark.ml.feature.NGram output exactly (verified in tests)
    while staying usable inside plain selects and SQL oracles.
    """
    k = F.size(tokens) - (n - 1)
    # sequence(1, k) descends when k < 1, so guard the short-array case.
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n))
    )
