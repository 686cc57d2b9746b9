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
    perceptron when importable, else the deterministic rule tagger.
    The fallback exists only for the universal tagset (the one the
    reference uses, script4_bis.py:49) — asking for another tagset
    without NLTK raises instead of silently answering in the wrong
    tagset (review finding r3)."""
    col = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    if NLTK_AVAILABLE:
        return nltk_pos_tags_udf(tagset=tagset)(col)
    if tagset != "universal":
        raise NotImplementedError(
            f"tagset={tagset!r} needs NLTK; the rule fallback only "
            "implements the universal tagset"
        )
    return rule_pos_tags_universal(col)


# --------------------------------------------------------------------------
# Universal-tagset rule tier (divergence-audit result, r3).
#
# nltk.pos_tag(tagset='universal') = averaged-perceptron PTB tags folded
# through the public Petrov-Das-McDonald (2012) en-ptb map. The
# perceptron itself can't run JVM-side, but a large slice of its output
# is lexically determined: punctuation ('.'), numerals (CD->NUM), and
# the English closed classes (DT/PDT/WDT->DET, PRP/PRP$/WP->PRON,
# IN->ADP, CC->CONJ, TO/RP/POS->PRT, RB/WRB->ADV on adverb lemmas).
# universal_tag() encodes exactly that deterministic slice as one
# Catalyst CASE; open-class words fall back to the engine's domain
# VERB/ADJ lists, -ly ADV heuristic, then NOUN (the perceptron's own
# unknown-word prior is noun-heavy). Remaining divergence is the
# genuinely contextual part — noun/verb homographs and IN-vs-RB words —
# enumerated in COVERAGE.md §2.9-T3 and measured by the gated agreement
# test (tests/test_nltk_tier.py) wherever nltk is importable.
# --------------------------------------------------------------------------
UNIVERSAL_DET = (
    "a an the this that these those each every all both some any no "
    "another such which whatever whichever"
).split()
UNIVERSAL_PRON = (
    "i you he she it we they me him her us them mine yours his hers ours "
    "theirs myself yourself himself herself itself ourselves yourselves "
    "themselves who whom whose what something anything nothing everything "
    "someone anyone everyone nobody somebody everybody"
).split()
UNIVERSAL_ADP = (
    "of in on at by for with from about into onto over under between "
    "through during against among across within without behind beyond "
    "above below near since until upon toward towards because although "
    "though while if unless whereas per via"
).split()  # IN -> ADP (incl. subordinating conjunctions, per en-ptb map)
UNIVERSAL_CONJ = "and or but nor plus minus versus".split()  # CC -> CONJ
UNIVERSAL_PRT = "to 's not".split()  # TO/POS -> PRT; nltk tags not->RB->ADV
UNIVERSAL_ADV = (
    "not very too also just now then here there when where why how always "
    "never often sometimes again soon already still yet almost quite "
    "rather enough perhaps maybe together apart twice once"
).split()  # RB/WRB -> ADV


def universal_tag(col: Column) -> Column:
    """Context-free universal tag for one (lowercased) token.

    Precedence: punctuation > numeral > ADV lemma list (so 'not' beats
    the PRT list, matching nltk's RB tag for it) > closed classes >
    domain VERB/ADJ lists > -ly ADV > NOUN."""
    from projetbigdata_spark.operators.features import TAG_ADJ, TAG_VERB

    prt = [w for w in UNIVERSAL_PRT if w not in UNIVERSAL_ADV]
    return (
        F.when(col.rlike(r"^[^\w\s]+$"), F.lit("."))
        .when(col.rlike(r"^\d+([.,/:-]\d+)*$"), F.lit("NUM"))
        .when(col.isin(*UNIVERSAL_ADV), F.lit("ADV"))
        .when(col.isin(*UNIVERSAL_DET), F.lit("DET"))
        .when(col.isin(*UNIVERSAL_PRON), F.lit("PRON"))
        .when(col.isin(*UNIVERSAL_ADP), F.lit("ADP"))
        .when(col.isin(*UNIVERSAL_CONJ), F.lit("CONJ"))
        .when(col.isin(*prt), F.lit("PRT"))
        .when(col.isin(*TAG_VERB), F.lit("VERB"))
        .when(col.isin(*TAG_ADJ), F.lit("ADJ"))
        .when(col.rlike(r"^\w+ly$"), F.lit("ADV"))
        .otherwise(F.lit("NOUN"))
    )


def rule_pos_tags_universal(tokens: Column) -> Column:
    """Full-universal-tagset fallback tier: one tag per token, aligned
    with the input array (like the reference's NLTKPosTagger keeping
    tags only, transformers.py:71-77)."""
    return F.transform(tokens, universal_tag)


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


def text_pos_universal(spark, sf_dir: str):
    """T3 rule tier end-to-end: wordpunct-tokenize each document and
    tag every token with the context-free universal tagger (one
    Catalyst CASE per token — zero exchanges, pure map-side). Tags are
    pipe-joined per doc so the oracle compares one string."""
    from projetbigdata_spark.session import tune
    from projetbigdata_spark.sources.catalog import load_table

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    tags = rule_pos_tags_universal(wordpunct_tokens("text"))
    return docs.select(
        "doc_id",
        F.concat_ws("|", tags).alias("tags"),
        F.size(tags).cast("int").alias("n_tokens"),
    )


def _universal_tag_sql_case(var: str) -> str:
    """DuckDB twin of universal_tag() built from the SAME word lists —
    single source of truth for both engines."""
    from projetbigdata_spark.operators.features import TAG_ADJ, TAG_VERB

    def _in(words):
        return ", ".join("'{}'".format(w.replace("'", "''")) for w in words)

    prt = [w for w in UNIVERSAL_PRT if w not in UNIVERSAL_ADV]
    return (
        f"CASE WHEN regexp_full_match({var}, '[^\\w\\s]+') THEN '.' "
        f"WHEN regexp_full_match({var}, '\\d+([.,/:-]\\d+)*') THEN 'NUM' "
        f"WHEN {var} IN ({_in(UNIVERSAL_ADV)}) THEN 'ADV' "
        f"WHEN {var} IN ({_in(UNIVERSAL_DET)}) THEN 'DET' "
        f"WHEN {var} IN ({_in(UNIVERSAL_PRON)}) THEN 'PRON' "
        f"WHEN {var} IN ({_in(UNIVERSAL_ADP)}) THEN 'ADP' "
        f"WHEN {var} IN ({_in(UNIVERSAL_CONJ)}) THEN 'CONJ' "
        f"WHEN {var} IN ({_in(prt)}) THEN 'PRT' "
        f"WHEN {var} IN ({_in(TAG_VERB)}) THEN 'VERB' "
        f"WHEN {var} IN ({_in(TAG_ADJ)}) THEN 'ADJ' "
        f"WHEN regexp_full_match({var}, '\\w+ly') THEN 'ADV' "
        f"ELSE 'NOUN' END"
    )


def _pos_universal_sql() -> str:
    return rf"""
WITH toks AS (
    SELECT doc_id,
           list_transform(
               regexp_extract_all(replace(text, '<br /><br />', ' '),
                                  '\w+|[^\w\s]+'),
               t -> lower(t)) AS w
    FROM documents
)
SELECT doc_id,
       array_to_string(
           list_transform(w, t -> {_universal_tag_sql_case('t')}), '|') AS tags,
       CAST(len(w) AS INT) AS n_tokens
FROM toks
"""


QUERIES = {
    "text_wordpunct_tokens": text_wordpunct_tokens,
    "text_pos_universal": text_pos_universal,
}
ORACLE_SQL = {
    "text_wordpunct_tokens": WORDPUNCT_SQL,
    "text_pos_universal": _pos_universal_sql(),
}
