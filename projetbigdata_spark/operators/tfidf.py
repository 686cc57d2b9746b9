"""TF / IDF / TF-IDF as relational plans (SURVEY.md §2.5 A2/A3).

The reference computes these with HashingTF + IDF.fit (script1.py:52-53)
— mllib black boxes. Here the same statistics are plain DataFrame aggs,
SQL-checkable and scale-transparent:

  TF   : explode + groupBy(doc, token) hash-agg       (1 shuffle)
  DF   : groupBy(token) countDistinct(doc)            (1 shuffle)
  IDF  : ln((N+1)/(df+1)) — Spark ml IDF's exact formula
  TFIDF: tf join idf on token (token dim is small post-agg -> broadcast)

The ml HashingTF/IDF estimators themselves are exercised in ml/ (the
pipeline path); this module is their query-semantics twin, which is the
form you'd actually run at 100 TB (no vocabulary broadcast, no vector
materialization until the ML boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.functions.text import ngrams, tokenize
from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_documents_parallel, load_table


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents_parallel(spark, sf_dir)
    return docs.select(
        "doc_id", F.explode(tokenize("text")).alias("token")
    )


def text_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term frequency per (doc, token) — A2's semantics without the
    hashing trick (exact tokens, no collisions)."""
    tune(spark)
    return (
        _doc_tokens(spark, sf_dir)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )


TF_SQL = """
SELECT doc_id, token, count(*) AS tf
FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token
    FROM documents
)
WHERE token <> ''
GROUP BY doc_id, token
"""


def text_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency + inverse document frequency per token.
    idf = ln((N+1)/(df+1)) — pyspark.ml.feature.IDF's formula, computed
    from exact integer counts so both engines take ln of the same
    double."""
    tune(spark)
    # n_docs is a 1-row count over the doc_id column only — no heavy
    # per-row compute, so the bare scan (no width repartition) is right
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    df_tbl = (
        _doc_tokens(spark, sf_dir)
        .groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    return df_tbl.crossJoin(F.broadcast(n_docs)).select(
        "token",
        "df",
        F.round(
            F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 6
        ).alias("idf"),
    )


IDF_SQL = """
WITH tok AS (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token
    FROM documents
),
dfreq AS (
    SELECT token, count(DISTINCT doc_id) AS df
    FROM tok WHERE token <> '' GROUP BY token
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
SELECT token, df, round(ln((n_docs + 1) / (df + 1.0)), 6) AS idf
FROM dfreq, n
"""


def text_tfidf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf×idf, top-5 terms per document — the reference's TF-IDF
    vectorization re-expressed as a ranked long-format table (the
    form a retrieval/quality pipeline consumes at scale)."""
    from pyspark.sql.window import Window

    tune(spark)
    tf = text_tf(spark, sf_dir)
    # IDF derived FROM the tf aggregate: tf has one row per (doc,
    # token), so df(token) = count(*) over a token-partitioned WINDOW.
    # Profiled at sf0.1 (SCALE.md): the previous agg+broadcast-join
    # spelling recomputed the whole tf subtree twice (ReuseExchange
    # can't canonicalize the two branches), so the corpus was scanned
    # and token-aggregated 2x. The window shuffles the same tf rows by
    # token that the df agg did — equal shuffle volume, one tf
    # computation, no join. 2.5s -> 1.6s warm at sf0.1.
    # bare scan: n_docs is a 1-row doc_id count (see text_idf note)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    wdf = Window.partitionBy("token")
    scored = (
        tf.withColumn("df", F.count("*").over(wdf))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf")
                * F.round(F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 6),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= 5
    )


TFIDF_SQL = f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token
    FROM documents
),
tf AS (
    SELECT doc_id, token, count(*) AS tf
    FROM tok WHERE token <> '' GROUP BY doc_id, token
),
dfreq AS (
    SELECT token, count(DISTINCT doc_id) AS df FROM tok
    WHERE token <> '' GROUP BY token
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.token,
           round(tf.tf * round(ln((n_docs + 1) / (df + 1.0)), 6), 6) AS tfidf
    FROM tf JOIN dfreq USING (token), n
)
SELECT doc_id, token, tfidf,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, token) AS INT) AS rnk
FROM scored
QUALIFY rnk <= 5
"""


def text_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 NGram (script3.py:52-54) distributional profile: top-50
    corpus bigrams. The n-gram expansion itself is a Catalyst
    higher-order-function expression (functions/text.py)."""
    from pyspark.sql.window import Window

    from projetbigdata_spark.functions.text import ngrams

    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    grams = docs.select(
        F.explode(ngrams(tokenize("text"), 2)).alias("bigram")
    )
    counts = grams.groupBy("bigram").agg(F.count("*").alias("freq"))
    w = Window.orderBy(F.col("freq").desc(), F.col("bigram"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 50)
    )


NGRAM_SQL = """
WITH toks AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS w
    FROM documents
),
grams AS (
    SELECT w[i] || ' ' || w[i + 1] AS bigram
    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
),
counts AS (SELECT bigram, count(*) AS freq FROM grams GROUP BY bigram)
SELECT bigram, freq,
       CAST(row_number() OVER (ORDER BY freq DESC, bigram) AS INT) AS rnk
FROM counts
QUALIFY rnk <= 50
"""


SEARCH_TERMS = ("hash", "join", "scan")  # the fixed query; a serving
# layer parameterizes this — constant here so the oracle is static
SEARCH_TOP_N = 20


def text_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive keyword search over the corpus — the retrieval
    query a curation/inspection UI runs against the inverted index:
    documents containing ALL query terms, ranked by an integer-exact
    tf×rarity score (rarity = 1e6 div df — the idf slot without ln(),
    whose last-ulp libm divergence is the documented cross-engine
    residual), top-20 with doc_id tiebreak.

    Scale posture: the term filter lands directly on the exploded
    token stream (|terms| tiny ⟹ the postings that survive are a
    vanishing fraction of the corpus), df/tf are two skinny hash-aggs,
    the per-term weight table is |terms| rows (broadcast), the
    conjunctive gate is count(distinct token) = |terms| inside the
    same per-doc agg, and the global top-20 is TakeOrderedAndProject —
    no full sort, no single-partition window, no driver collect."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(tokenize("text")).alias("token")
    ).where(F.col("token").isin(*SEARCH_TERMS))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_tbl = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_tbl), "token")
        .groupBy("doc_id")
        .agg(
            F.expr("sum(tf * (CAST(1000000 AS BIGINT) div df))").alias(
                "score"
            ),
            F.countDistinct("token").alias("n_terms"),
            F.sum("tf").cast("bigint").alias("total_tf"),
        )
        .where(F.col("n_terms") == len(SEARCH_TERMS))
    )
    return (
        scored.select("doc_id", "score", "total_tf")
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(SEARCH_TOP_N)
    )


_terms_list = ", ".join(f"'{t}'" for t in SEARCH_TERMS)

SEARCH_SQL = f"""
WITH tok AS (
    SELECT doc_id, t AS token
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS w
          FROM documents),
         LATERAL unnest(w) AS u(t)
    WHERE t IN ({_terms_list})
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
scored AS (
    SELECT tf.doc_id,
           CAST(sum(tf.tf * (CAST(1000000 AS BIGINT) // df.df))
                AS BIGINT) AS score,
           count(DISTINCT tf.token) AS n_terms,
           CAST(sum(tf.tf) AS BIGINT) AS total_tf
    FROM tf JOIN df USING (token)
    GROUP BY tf.doc_id
)
SELECT doc_id, score, total_tf
FROM scored
WHERE n_terms = {len(SEARCH_TERMS)}
ORDER BY score DESC, doc_id
LIMIT {SEARCH_TOP_N}
"""


BM25_TERMS = ("hash", "scan", "window")  # static so the oracle is static
BM25_TOP_N = 20
# BM25 dials as exact rationals: k1 = 6/5 (1.2), b = 3/4 (0.75).
# Substituting avgdl = S/N into the classic form and clearing
# denominators gives, per (doc, term):
#   tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
#     = 22·tf·S / (10·tf·S + 3·S + 9·dl·N)
# — a ratio of integers, so the whole score stays in exact integer
# arithmetic (the idf slot uses the log-free Robertson surrogate
# (2(N-df)+1)/(2df+1) in millionths; ln() is the documented libm
# cross-engine residual this repo keeps out of hash-checked queries).


def text_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISJUNCTIVE ranked retrieval — BM25 with integer-exact
    arithmetic: any document containing at least one query term is
    scored by sum over matched terms of idf_m × saturation, where
    saturation applies BM25's per-term tf dampening and length
    normalization (k1=1.2, b=0.75 as exact rationals, see above).
    Complements text_search_topk (conjunctive, no length norm): this
    is the ranking a retrieval/inspection UI actually serves.

    Scale posture: identical skeleton to text_search_topk — the term
    filter lands on the exploded token stream, df/dl are skinny
    hash-aggs, the |terms|-row idf table broadcasts (carrying the
    corpus totals N and S as columns, so no second scalar crossJoin
    reaches the scored stream), and the top-20 is
    TakeOrderedAndProject. BOTH sides of the integral divide are
    widened through DECIMAL(38,0) (HUGEINT in the oracle): at 100 TB
    S~1e14 and idf_m~1e15 put the numerator near 1e35, and the
    denominator's 10·tf·S term passes int64 as soon as tf ≥ 10 at
    that S — both far past int64, comfortably inside 38 digits."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(tokenize("text")).alias("token"))
    # dl and tf are each consumed twice downstream; the plan barrier
    # (localCheckpoint, the dedup_jaccard_pairs idiom) stops Catalyst
    # re-executing the corpus scan per consumer — exactly 2 corpus
    # passes total (dl, tf), plus the metadata-cheap docs count.
    dl = (
        tok.groupBy("doc_id")
        .agg(F.count("*").alias("dl"))
        .localCheckpoint(eager=False)
    )
    totals = dl.agg(F.sum("dl").alias("s_tokens")).crossJoin(
        F.broadcast(docs.agg(F.count("*").alias("n_docs")))
    )
    tf = (
        tok.where(F.col("token").isin(*BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    # the |terms|-row idf table CARRIES the corpus totals as columns,
    # so one broadcast join hands scored everything scalar it needs
    idf = (
        tf.groupBy("token")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(totals))
        .select(
            "token",
            "s_tokens",
            "n_docs",
            F.expr(
                "((n_docs - df) * 2 + 1) * CAST(1000000 AS BIGINT)"
                " div (df * 2 + 1)"
            ).alias("idf_m"),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "tf",
            F.expr(
                "CAST((CAST(idf_m AS DECIMAL(38,0)) * 22 * tf * s_tokens)"
                " div (10 * CAST(tf AS DECIMAL(38,0)) * s_tokens"
                "      + 3 * CAST(s_tokens AS DECIMAL(38,0))"
                "      + 9 * CAST(dl AS DECIMAL(38,0)) * n_docs)"
                " AS BIGINT)"
            ).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("term_score").cast("bigint").alias("score_m"),
            F.sum("tf").cast("bigint").alias("total_tf"),
        )
    )
    return (
        scored.orderBy(F.col("score_m").desc(), "doc_id")
        .limit(BM25_TOP_N)
        .select("doc_id", "score_m", "total_tf")
    )


_bm25_terms_list = ", ".join(f"'{t}'" for t in BM25_TERMS)

BM25_SQL = f"""
WITH tok AS (
    SELECT doc_id, t AS token
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS w
          FROM documents),
         LATERAL unnest(w) AS u(t)
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
totals AS (
    SELECT (SELECT count(*) FROM tok) AS s_tokens,
           (SELECT count(*) FROM documents) AS n_docs
),
tf AS (
    SELECT doc_id, token, count(*) AS tf FROM tok
    WHERE token IN ({_bm25_terms_list})
    GROUP BY 1, 2
),
idf AS (
    SELECT token,
           ((n_docs - df) * 2 + 1) * CAST(1000000 AS BIGINT)
               // (df * 2 + 1) AS idf_m
    FROM (SELECT token, count(*) AS df FROM tf GROUP BY token), totals
),
scored AS (
    SELECT tf.doc_id,
           CAST(sum((idf.idf_m::HUGEINT * 22 * tf.tf * t.s_tokens)
                // (10 * tf.tf::HUGEINT * t.s_tokens
                    + 3 * t.s_tokens::HUGEINT
                    + 9 * dl.dl::HUGEINT * t.n_docs)) AS BIGINT) AS score_m,
           CAST(sum(tf.tf) AS BIGINT) AS total_tf
    FROM tf
    JOIN idf USING (token)
    JOIN dl USING (doc_id), totals t
    GROUP BY tf.doc_id
)
SELECT doc_id, score_m, total_tf
FROM scored
ORDER BY score_m DESC, doc_id
LIMIT {BM25_TOP_N}
"""


PHRASE_TERMS = ("hash", "join")  # static so the oracle is static; a
# search API parameterizes the phrase
PHRASE_TOP_N = 20


def text_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-PHRASE search — the positional-retrieval query the
    conjunctive (text_search_topk) and ranked (text_search_bm25)
    tiers can't express: documents where the query terms appear
    ADJACENT and in order ("hash join", not hash…join), ranked by
    occurrence count with doc_id tiebreak, top-20.

    Spark-first plan: phrase adjacency is a WITHIN-document property,
    so on a scan-side engine it needs no positional-index self-join at
    all — the match count is an in-row fold (count of bigrams equal to
    the phrase over the same ngrams() kernel NGram/T4 uses), one scan,
    zero joins, TakeOrderedAndProject for the top-k. The classic
    IR spelling (positional postings joined on doc_id with pos+1 —
    what Lucene does against a PREBUILT index) only wins when the
    index is amortized across many queries; for an in-pipeline audit
    query the corpus scan is already the floor, and this plan adds
    nothing to it. Deterministic tiebreak (score desc, doc_id asc)
    keeps the LIMIT boundary engine-exact."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    # adjacency via zip_with(w, w[1:]) — two scalar equality checks
    # per position instead of MINTING every bigram string through the
    # ngrams kernel (concat_ws per window measured ~3× the whole scan:
    # 3.1s → ~1s at sf0.1); identical semantics, same oracle
    w = tokenize(F.coalesce(F.col("text"), F.lit("")))
    matched = F.zip_with(
        w,
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda x, y: (x == F.lit(PHRASE_TERMS[0]))
        & (y == F.lit(PHRASE_TERMS[1])),
    )
    return (
        docs.select(
            "doc_id",
            F.size(F.filter(matched, lambda p: p))
            .cast("bigint")
            .alias("n_matches"),
        )
        .where(F.col("n_matches") > 0)
        .orderBy(F.col("n_matches").desc(), "doc_id")
        .limit(PHRASE_TOP_N)
    )


PHRASE_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(
               string_split_regex(lower(coalesce(text, '')), '\\s+'),
               t -> t <> '') AS w
    FROM documents
),
m AS (
    SELECT doc_id,
           len([i FOR i IN generate_series(1, len(w) - 1)
                IF w[i] = '{PHRASE_TERMS[0]}'
                AND w[i + 1] = '{PHRASE_TERMS[1]}']) AS n_matches
    FROM toks
)
SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches
FROM m
WHERE n_matches > 0
ORDER BY n_matches DESC, doc_id
LIMIT {PHRASE_TOP_N}
"""


PHRASE3_TERMS = ("small", "query", "line")  # static k=3 phrase (has
# matches at every fixture SF, so no check tier ever passes on 0 rows)
PHRASE_SLOP = 2  # max tokens BETWEEN the two phrase terms (0 = adjacent)


def _phrase_matched(w, terms):
    """In-row k-term phrase matcher (VERDICT r7 item 3): a boolean
    array whose position i says terms[0..k-1] == w[i..i+k-1]. The k=2
    zip_with(w, w[1:]) spelling generalized by CHAINING shifted
    zip_withs — match[j] = match[j-1] AND w shifted by j equals
    terms[j] — so it stays one scan / zero joins for any k and never
    materializes position indices or n-gram strings (a sequence() +
    per-position element_at draft measured 7-8x slower at sf0.1:
    array indexing per position beats nothing, but per-position
    zip iteration beats indexing). Trailing positions where the
    shifted array runs out compare against zip_with's NULL padding
    and fold to NULL, which F.filter(..., p -> p) drops — no phantom
    matches on docs shorter than k."""

    def step(term):
        return lambda p, y: p & (y == F.lit(term))

    m = F.transform(w, lambda x: x == F.lit(terms[0]))
    for j, t in enumerate(terms[1:], start=1):
        m = F.zip_with(
            m,
            F.slice(w, j + 1, F.greatest(F.size(w) - j, F.lit(0))),
            step(t),
        )
    return m


def text_search_phrase3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-TERM exact-phrase search (k=3) — the generalization a real
    retrieval user reaches for after the 2-term query: documents
    where PHRASE3_TERMS appear consecutively in order, ranked by
    occurrence count, doc_id tiebreak, top-20. Same plan class as
    text_search_phrase: the match count is an in-row fold over the
    token array (one corpus scan, zero joins,
    TakeOrderedAndProject); per-position work is k equality checks,
    so a 100 TB scan pays O(k·tokens) compute and nothing else."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    w = tokenize(F.coalesce(F.col("text"), F.lit("")))
    matched = _phrase_matched(w, PHRASE3_TERMS)
    return (
        docs.select(
            "doc_id",
            F.size(F.filter(matched, lambda p: p))
            .cast("bigint")
            .alias("n_matches"),
        )
        .where(F.col("n_matches") > 0)
        .orderBy(F.col("n_matches").desc(), "doc_id")
        .limit(PHRASE_TOP_N)
    )


def text_search_phrase_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROXIMITY phrase search — "within n words": count positions i
    with w[i] = terms[0] and terms[1] somewhere in the next
    PHRASE_SLOP + 1 tokens (ordered, gap <= PHRASE_SLOP; slop 0
    degenerates to the exact-adjacency query). Still an in-row fold,
    spelled as the positional OR of PHRASE_SLOP + 1 gap-g adjacency
    matchers — each gap is one zip_with(w, w[g+1:]) pair check,
    OR-folded positionally — so the scan stays O(slop·tokens) with
    zero joins and no positional index (a sequence() + exists-over-
    slice draft measured ~5x slower at sf0.1, the same per-position-
    indexing trap the k-term matcher dodges). Counts anchor positions
    (one per left-term occurrence with >= 1 partner), not pairs — the
    Lucene sloppy-phrase doc-hit convention, and the count a
    dedup/audit consumer can reconcile against the exact tier (slop
    hits ⊇ adjacency hits per doc, pinned in tests)."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    w = tokenize(F.coalesce(F.col("text"), F.lit("")))

    def gap_match(g):
        return F.zip_with(
            w,
            F.slice(w, 2 + g, F.greatest(F.size(w) - 1 - g, F.lit(0))),
            lambda x, y: (x == F.lit(PHRASE_TERMS[0]))
            & (y == F.lit(PHRASE_TERMS[1])),
        )

    matched = gap_match(0)
    for g in range(1, PHRASE_SLOP + 1):
        matched = F.zip_with(
            matched,
            gap_match(g),
            lambda p, q: F.coalesce(p, F.lit(False))
            | F.coalesce(q, F.lit(False)),
        )
    return (
        docs.select(
            "doc_id",
            F.size(F.filter(matched, lambda p: p))
            .cast("bigint")
            .alias("n_matches"),
        )
        .where(F.col("n_matches") > 0)
        .orderBy(F.col("n_matches").desc(), "doc_id")
        .limit(PHRASE_TOP_N)
    )


def text_search_phrase_kslop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-TERM proximity phrase search — the two r8 generalizations
    COMPOSED (the full Lucene sloppy-PhraseQuery shape): count END
    positions where PHRASE3_TERMS all matched in order with at most
    PHRASE_SLOP tokens between consecutive terms. The fold tracks
    "a valid prefix of terms[0..j] ENDS here" as a boolean array:
    b_0[i] = (w[i] = t0); b_j[i] = (w[i] = t_j) AND OR over gaps
    g = 1..slop+1 of b_{j-1}[i-g] — each step is slop+1 RIGHT-shifts
    of the previous array (prepend g falses) OR-folded positionally,
    then one equality AND. Still one corpus scan, zero joins,
    O(k·slop·tokens) in-row compute, TakeOrderedAndProject — chain
    ends beyond the array compare against zip_with's NULL padding and
    fold to NULL, which the counting filter drops. Slop 0 degenerates
    to text_search_phrase3 exactly (pinned in tests); the count
    convention is distinct end positions (one per chain end, however
    many gap configurations reach it) — the doc-hit convention the
    2-term slop query uses, spelled at k terms."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    w = tokenize(F.coalesce(F.col("text"), F.lit("")))

    def shift_right(arr, g):
        return F.concat(
            F.array_repeat(F.lit(False), g),
            F.slice(arr, 1, F.greatest(F.size(arr) - g, F.lit(0))),
        )

    def or_zip(a, b):
        return F.zip_with(
            a,
            b,
            lambda p, q: F.coalesce(p, F.lit(False))
            | F.coalesce(q, F.lit(False)),
        )

    b = F.transform(w, lambda x: x == F.lit(PHRASE3_TERMS[0]))
    for t in PHRASE3_TERMS[1:]:
        reach = shift_right(b, 1)
        for g in range(2, PHRASE_SLOP + 2):
            reach = or_zip(reach, shift_right(b, g))
        b = F.zip_with(
            F.transform(w, lambda x: x == F.lit(t)),
            reach,
            lambda here, prev: here & prev,
        )
    return (
        docs.select(
            "doc_id",
            F.size(F.filter(b, lambda p: p)).cast("bigint").alias(
                "n_matches"
            ),
        )
        .where(F.col("n_matches") > 0)
        .orderBy(F.col("n_matches").desc(), "doc_id")
        .limit(PHRASE_TOP_N)
    )


PHRASE_KSLOP_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(
               string_split_regex(lower(coalesce(text, '')), '\\s+'),
               t -> t <> '') AS w
    FROM documents
),
m AS (
    SELECT doc_id,
           len([e FOR e IN generate_series(1, len(w))
                IF w[e] = '{PHRASE3_TERMS[2]}'
                AND len([p FOR p IN generate_series(
                             greatest(1, e - {PHRASE_SLOP + 1}), e - 1)
                         IF w[p] = '{PHRASE3_TERMS[1]}'
                         AND list_contains(
                                 w[greatest(1, p - {PHRASE_SLOP + 1})
                                   : p - 1],
                                 '{PHRASE3_TERMS[0]}')]) > 0]) AS n_matches
    FROM toks
)
SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches
FROM m
WHERE n_matches > 0
ORDER BY n_matches DESC, doc_id
LIMIT {PHRASE_TOP_N}
"""


PHRASE3_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(
               string_split_regex(lower(coalesce(text, '')), '\\s+'),
               t -> t <> '') AS w
    FROM documents
),
m AS (
    SELECT doc_id,
           len([i FOR i IN generate_series(1, len(w) - 2)
                IF w[i] = '{PHRASE3_TERMS[0]}'
                AND w[i + 1] = '{PHRASE3_TERMS[1]}'
                AND w[i + 2] = '{PHRASE3_TERMS[2]}']) AS n_matches
    FROM toks
)
SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches
FROM m
WHERE n_matches > 0
ORDER BY n_matches DESC, doc_id
LIMIT {PHRASE_TOP_N}
"""


PHRASE_SLOP_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(
               string_split_regex(lower(coalesce(text, '')), '\\s+'),
               t -> t <> '') AS w
    FROM documents
),
m AS (
    SELECT doc_id,
           len([i FOR i IN generate_series(1, len(w) - 1)
                IF w[i] = '{PHRASE_TERMS[0]}'
                AND list_contains(w[i + 1 : i + {PHRASE_SLOP + 1}],
                                  '{PHRASE_TERMS[1]}')]) AS n_matches
    FROM toks
)
SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches
FROM m
WHERE n_matches > 0
ORDER BY n_matches DESC, doc_id
LIMIT {PHRASE_TOP_N}
"""


QUERIES = {
    "text_search_phrase": text_search_phrase,
    "text_search_phrase3": text_search_phrase3,
    "text_search_phrase_slop": text_search_phrase_slop,
    "text_search_phrase_kslop": text_search_phrase_kslop,
    "text_tf": text_tf,
    "text_idf": text_idf,
    "text_tfidf_top": text_tfidf_top,
    "text_ngram_counts": text_ngram_counts,
    "text_search_topk": text_search_topk,
    "text_search_bm25": text_search_bm25,
}

ORACLE_SQL = {
    "text_search_phrase": PHRASE_SQL,
    "text_search_phrase3": PHRASE3_SQL,
    "text_search_phrase_slop": PHRASE_SLOP_SQL,
    "text_search_phrase_kslop": PHRASE_KSLOP_SQL,
    "text_tf": TF_SQL,
    "text_idf": IDF_SQL,
    "text_tfidf_top": TFIDF_SQL,
    "text_ngram_counts": NGRAM_SQL,
    "text_search_topk": SEARCH_SQL,
    "text_search_bm25": BM25_SQL,
}
