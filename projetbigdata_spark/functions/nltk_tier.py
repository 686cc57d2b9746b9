"""NLTK-fidelity tokenize/POS tier (SURVEY.md §2.9 T2/T3, VERDICT r1
item 4) — reproduces the reference's exact NLTK preprocessing
(reference transformers.py:45-77 `NLTKPosTagger` with
`nltk.pos_tag(tagset='universal')`, script5.py:47-51 /
main_firstTry_cluster.py:144-169 `preProcess`: replace "<br /><br />",
`wordpunct_tokenize`, lowercase) behind an availability flag.

Three fidelity levels:

  1. `wordpunct_tokens` — EXACT Catalyst twin, always available.
     NLTK's wordpunct_tokenize is literally `re.findall(r"\\w+|[^\\w\\s]+")`
     (nltk.tokenize.regexp.WordPunctTokenizer); regexp_extract_all runs
     the same pattern JVM-side, so the fidelity path costs nothing at
     100 TB. (Divergence: Java `\\w` is ASCII where Python's is Unicode
     — identical on the ASCII fixtures; at deployment add (?U).)
  2. `nltk_wordpunct_tokens_udf` — Arrow-batched pandas UDF calling the
     real nltk tokenizer, for byte-exact parity audits when the lib is
     installed. Parity with (1) is pytest-asserted (skipped if absent).
  3. `nltk_pos_tags_udf` — Arrow-batched `nltk.pos_tag(tagset=...)`.
     A trained perceptron can't be re-expressed in Catalyst; when nltk
     is absent the engine's rule tagger (operators/features.py) is the
     documented stand-in.

`pos_tags` picks the best available tier at call time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORDPUNCT_PATTERN = r"\w+|[^\w\s]+"  # nltk WordPunctTokenizer regex

try:  # availability flag — nltk is an optional deployment dep
    import nltk  # noqa: F401

    NLTK_AVAILABLE = True
except ImportError:
    NLTK_AVAILABLE = False


def clean_breaks(col: str | Column) -> Column:
    """The reference's pre-tokenize cleanup (script5.py:48): the IMDB
    corpus's literal "<br /><br />" markup becomes a space."""
    return F.replace(
        F.col(col) if isinstance(col, str) else col,
        F.lit("<br /><br />"),
        F.lit(" "),
    )


def wordpunct_tokens(col: str | Column, lowercase: bool = True) -> Column:
    """Exact JVM-side wordpunct_tokenize: tokenize FIRST, lowercase
    AFTER, matching the reference's preProcess order
    (main_firstTry_cluster.py:144-169)."""
    toks = F.regexp_extract_all(
        clean_breaks(col), F.lit(WORDPUNCT_PATTERN), 0
    )
    if lowercase:
        toks = F.transform(toks, F.lower)
    return toks


def nltk_wordpunct_tokens_udf():
    """Arrow-batched real-NLTK tokenizer (audit path). Raises if nltk
    is unavailable — callers gate on NLTK_AVAILABLE."""
    if not NLTK_AVAILABLE:
        raise ImportError("nltk not installed; use wordpunct_tokens")
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def tok(s: pd.Series) -> pd.Series:
        from nltk.tokenize import wordpunct_tokenize

        return s.map(
            lambda t: [
                w.lower()
                for w in wordpunct_tokenize(
                    (t or "").replace("<br /><br />", " ")
                )
            ]
        )

    return tok


def nltk_pos_tags_udf(tagset: str = "universal"):
    """Arrow-batched `nltk.pos_tag(tokens, tagset=...)` returning the
    tag sequence (the reference keeps `zip(*tagged)[1]` — tags only,
    transformers.py:71-77)."""
    if not NLTK_AVAILABLE:
        raise ImportError("nltk not installed; use the rule tagger")
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def tag(tokens: pd.Series) -> pd.Series:
        import nltk as _nltk

        return tokens.map(
            lambda ts: [t for _, t in _nltk.pos_tag(list(ts or []), tagset=tagset)]
        )

    return tag


def pos_tags(tokens_col: str | Column, tagset: str = "universal") -> Column:
    """Best-available POS tags for a tokens array column: real NLTK
    perceptron when importable, else the deterministic rule tagger
    (same universal tagset, divergence documented in features.py)."""
    col = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    if NLTK_AVAILABLE:
        return nltk_pos_tags_udf()(col)
    from projetbigdata_spark.operators.features import rule_pos_tags

    return rule_pos_tags(col)


# --------------------------------------------------------------------------
# registered surface: the exact-twin tokenizer is oracle-checked (rows
# joined to one string so array formatting can't skew the hash)
# --------------------------------------------------------------------------
def text_wordpunct_tokens(spark, sf_dir: str):
    from projetbigdata_spark.session import tune
    from projetbigdata_spark.sources.catalog import load_table

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = wordpunct_tokens("text")
    return docs.select(
        "doc_id",
        F.concat_ws("|", toks).alias("tokens"),
        F.size(toks).cast("int").alias("n_tokens"),
    )


WORDPUNCT_SQL = r"""
SELECT doc_id,
       array_to_string(
           list_transform(
               regexp_extract_all(replace(text, '<br /><br />', ' '),
                                  '\w+|[^\w\s]+'),
               t -> lower(t)),
           '|') AS tokens,
       CAST(len(regexp_extract_all(replace(text, '<br /><br />', ' '),
                                   '\w+|[^\w\s]+')) AS INT) AS n_tokens
FROM documents
"""


QUERIES = {"text_wordpunct_tokens": text_wordpunct_tokens}
ORACLE_SQL = {"text_wordpunct_tokens": WORDPUNCT_SQL}
