"""Repetition-based quality signals + winnowing fingerprints — the
filter family LLM curation pipelines run corpus-wide (Gopher/C4-style
repetition rules; MOSS-style winnowing for robust local fingerprinting).

Both are single-scan shapes:

  text_repetition_scores — per-doc token-repetition statistics. The
      scalar stats (n_tokens, distinct share) are IN-ROW array
      expressions (no shuffle at all); only the top-bigram share needs
      a (doc, bigram) hash-agg — one shuffle, partial-agg friendly.
  text_winnow_fingerprints — winnowing (Schleimer et al., SIGMOD'03):
      k-gram rolling hashes -> min hash per sliding window of w hashes
      -> distinct selected (doc, hash) fingerprints. Guarantees any
      shared run >= w+k-1 tokens shares a fingerprint — the property
      plain rolling-hash sampling (text_fingerprints) lacks. All
      hashing is exact integer md5-derived, so the oracle mirrors it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.functions.text import ngrams, tokenize
from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_documents_parallel


def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition profile per document:
    - dup_word_frac: 1 - |distinct tokens| / |tokens| (in-row, no shuffle)
    - top_bigram_share: occurrences of the most frequent bigram over
      total bigrams (one (doc, bigram) hash-agg)
    High values on either axis mark template/boilerplate docs that
    repetition filters drop before training."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    toks = docs.select("doc_id", tokenize("text").alias("w"))
    scalar = toks.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        # empty/whitespace-only doc: 0 tokens -> NULL fraction (the
        # oracle's 0/0.0 is NULL too); an unguarded divide crashes
        # under Spark 4's default ANSI mode (review finding r3)
        F.round(
            F.when(
                F.size("w") > 0,
                1 - F.size(F.array_distinct("w")) / F.size("w"),
            ),
            6,
        ).alias("dup_word_frac"),
    )
    bi = toks.select("doc_id", F.explode(ngrams(F.col("w"), 2)).alias("bigram"))
    bigram_counts = bi.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    bigram_share = bigram_counts.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_share")
    )
    return scalar.join(bigram_share, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "dup_word_frac",
        F.coalesce("top_bigram_share", F.lit(0.0)).alias("top_bigram_share"),
    )


REPETITION_SQL = """
WITH toks AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS w
    FROM documents
),
scalar AS (
    SELECT doc_id, len(w) AS n_tokens,
           round(1 - len(list_distinct(w)) / CAST(len(w) AS DOUBLE), 6)
               AS dup_word_frac
    FROM toks
),
bi AS (
    SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
),
bc AS (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY 1, 2),
share AS (
    SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 6)
               AS top_bigram_share
    FROM bc GROUP BY doc_id
)
SELECT s.doc_id, CAST(n_tokens AS INT) AS n_tokens, dup_word_frac,
       coalesce(top_bigram_share, 0.0) AS top_bigram_share
FROM scalar s LEFT JOIN share USING (doc_id)
"""


WINNOW_K = 4  # k-gram length (tokens)
WINNOW_W = 5  # window of consecutive k-gram hashes to min over


def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection: token k-gram hashes (first 8
    md5 hex digits — exact bigint), then per sliding window of W
    consecutive hashes keep the minimum (ties -> leftmost is implied by
    min over the same value), dedup per doc. Shared token runs of
    length >= W+K-1 between two docs are GUARANTEED to share a selected
    fingerprint — the detection floor plain stride sampling lacks.

    Plan: one generator for k-grams (in-row), hash in codegen, ONE
    window (partitionBy doc ordered by position, W-1 preceding frame)
    for the min, then distinct. Single shuffle on doc_id."""
    from pyspark.sql.window import Window

    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    toks = docs.select("doc_id", tokenize("text").alias("w"))
    kg = toks.select(
        "doc_id",
        F.posexplode(ngrams(F.col("w"), WINNOW_K)).alias("pos", "kgram"),
    )
    h = F.expr("CAST(conv(substring(md5(kgram), 1, 8), 16, 10) AS BIGINT)")
    hashed = kg.select("doc_id", "pos", h.alias("h"))
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), 0)
    )
    selected = (
        hashed.withColumn("wmin", F.min("h").over(win))
        # the first W-1 positions have incomplete windows; winnowing
        # starts selecting once a full window exists
        .where(F.col("pos") >= WINNOW_W - 1)
        .select("doc_id", F.col("wmin").alias("fingerprint"))
        .distinct()
    )
    return selected


WINNOW_SQL = f"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS w
    FROM documents
),
kg AS (
    SELECT doc_id, i - 1 AS pos,
           array_to_string(w[i:i+{WINNOW_K - 1}], ' ') AS kgram
    FROM toks,
         LATERAL (SELECT unnest(generate_series(1, len(w) - {WINNOW_K - 1}))
                  AS i)
    WHERE len(w) >= {WINNOW_K}
),
hashed AS (
    SELECT doc_id, pos,
           CAST('0x' || substr(md5(kgram), 1, 8) AS BIGINT) AS h
    FROM kg
),
winmin AS (
    SELECT doc_id, pos,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                        AND CURRENT ROW) AS fingerprint
    FROM hashed
)
SELECT DISTINCT doc_id, fingerprint
FROM winmin
WHERE pos >= {WINNOW_W - 1}
"""


# --- Gopher quality rules (Rae et al. 2021, appendix A1.1) -----------
#
# The published MassiveText document-quality recipe, spelled with
# integer cross-multiplication so every rule is EXACT in both engines
# (0.1 word-ratio ceiling -> n*10 <= d, never a float compare).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3  # mean word length in [3, 10] chars
GOPHER_MAX_MEAN_LEN = 10
GOPHER_MAX_SYMBOL_X10 = 1  # symbol-to-word ratio <= 0.1  ('#', '...', U+2026)
GOPHER_MAX_BULLET_X10 = 9  # <= 90% of lines start with a bullet
GOPHER_MAX_ELLIPSIS_X10 = 3  # <= 30% of lines end with an ellipsis
GOPHER_MIN_ALPHA_X10 = 8  # >= 80% of words contain an alphabetic char
GOPHER_REQUIRED_WORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)
GOPHER_MIN_REQUIRED = 2  # doc must contain >= 2 of the required words

_PPM = "CAST(1000000 AS BIGINT)"


def corpus_gopher_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher / MassiveText document-quality verdict (Rae et al.
    2021, A1.1) — the second-most-reused published rule recipe after
    C4 (corpus_c4_clean is its sibling): word-count bounds, mean-word-
    length bounds, symbol-to-word ceiling ('#', '...', U+2026),
    bullet-start / ellipsis-end line ceilings, alpha-word floor, and
    the required-stop-word presence rule. Output per doc: the audit
    counts + exact ppm ratios + the composed `kept` verdict.

    Every rule threshold is evaluated as integer cross-multiplication
    (n_sym*10 <= n_words, not n_sym/n_words <= 0.1), so the verdict is
    bit-exact in both engines with zero float compares; the ppm
    columns are display-side integer div.

    Scale posture: ZERO joins, zero shuffles — one codegen'd in-row
    projection over the line/token arrays, the same scan-bound class
    as corpus_c4_clean (and the reason rule filters run before
    anything that shuffles in real pipelines).

    Fixture honesty (the corpus_c4_clean posture): the synthetic docs
    carry at most one of the eight required stop words, so the
    registered row's `kept` is all-false via the n_required rule —
    still value-hash-checked on every audit column; the rules' live
    behavior (docs passing, each rule flipping the verdict alone) is
    pinned on constructed corpora in tests/test_repetition_ops.py
    including a written-table Spark<->DuckDB parity run."""
    tune(spark)
    return gopher_clean_of(load_documents_parallel(spark, sf_dir))


def gopher_clean_of(docs: DataFrame) -> DataFrame:
    """Frame-level core of corpus_gopher_clean over any (doc_id, text)
    frame — factored (the line_dedup_frame convention) so the
    streaming twin and the constructed-frame tests share one
    implementation with the registered query."""
    t = F.coalesce(F.col("text"), F.lit(""))
    w = tokenize(t)
    lines = F.split(t, "\n", -1)
    req = F.array(*[F.lit(x) for x in GOPHER_REQUIRED_WORDS])
    counts = docs.select(
        "doc_id",
        F.size(w).cast("bigint").alias("n_words"),
        F.aggregate(
            w, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
        ).alias("sum_len"),
        F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
        .cast("bigint")
        .alias("n_alpha"),
        (
            (F.length(t) - F.length(F.translate(t, "#", "")))
            + (F.length(t) - F.length(F.translate(t, "\u2026", "")))
            + (F.size(F.split(t, r"\.\.\.", -1)) - 1)
        )
        .cast("bigint")
        .alias("n_symbols"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(F.filter(lines, lambda l: l.rlike(r"^[ \t]*[-*\u2022]")))
        .cast("bigint")
        .alias("n_bullet_lines"),
        # [ \t\r]* before $: lines split from CRLF text end in \r, and
        # Java's $ matches BEFORE a trailing \r (it's a line
        # terminator) while RE2's does not \u2014 the explicit \r keeps
        # both engines on the same verdict (caught by the multiline
        # golden lane's CRLF doc)
        F.size(
            F.filter(
                lines, lambda l: l.rlike(r"(\.\.\.|\u2026)[ \t\r]*$")
            )
        )
        .cast("bigint")
        .alias("n_ellipsis_lines"),
        F.size(F.filter(req, lambda x: F.array_contains(w, x)))
        .cast("bigint")
        .alias("n_required"),
    )
    return counts.select(
        "doc_id",
        "n_words",
        "n_lines",
        F.expr(
            f"CASE WHEN n_words > 0 THEN (sum_len * {_PPM}) div n_words END"
        ).alias("mean_word_len_micros"),
        F.expr(
            f"CASE WHEN n_words > 0 THEN (n_symbols * {_PPM}) div n_words END"
        ).alias("symbol_word_ppm"),
        F.expr(f"(n_bullet_lines * {_PPM}) div n_lines").alias(
            "bullet_line_ppm"
        ),
        F.expr(f"(n_ellipsis_lines * {_PPM}) div n_lines").alias(
            "ellipsis_line_ppm"
        ),
        F.expr(
            f"CASE WHEN n_words > 0 THEN (n_alpha * {_PPM}) div n_words END"
        ).alias("alpha_word_ppm"),
        "n_required",
        (
            (F.col("n_words") >= GOPHER_MIN_WORDS)
            & (F.col("n_words") <= GOPHER_MAX_WORDS)
            & (F.col("sum_len") >= GOPHER_MIN_MEAN_LEN * F.col("n_words"))
            & (F.col("sum_len") <= GOPHER_MAX_MEAN_LEN * F.col("n_words"))
            & (
                F.col("n_symbols") * 10
                <= GOPHER_MAX_SYMBOL_X10 * F.col("n_words")
            )
            & (
                F.col("n_bullet_lines") * 10
                <= GOPHER_MAX_BULLET_X10 * F.col("n_lines")
            )
            & (
                F.col("n_ellipsis_lines") * 10
                <= GOPHER_MAX_ELLIPSIS_X10 * F.col("n_lines")
            )
            & (
                F.col("n_alpha") * 10
                >= GOPHER_MIN_ALPHA_X10 * F.col("n_words")
            )
            & (F.col("n_required") >= GOPHER_MIN_REQUIRED)
        ).alias("kept"),
    )


_REQ_LIST = ", ".join(f"'{x}'" for x in GOPHER_REQUIRED_WORDS)

GOPHER_CLEAN_SQL = f"""
WITH base AS (
    SELECT doc_id,
           coalesce(text, '') AS t,
           list_filter(string_split_regex(lower(coalesce(text, '')),
                                          '\\s+'), x -> x <> '') AS w,
           string_split(coalesce(text, ''), chr(10)) AS lines
    FROM documents
),
counts AS (
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_words,
           CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0)
                AS BIGINT) AS sum_len,
           CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                AS BIGINT) AS n_alpha,
           CAST((length(t) - length(replace(t, '#', '')))
                + (length(t) - length(replace(t, '\u2026', '')))
                + (len(string_split(t, '...')) - 1) AS BIGINT) AS n_symbols,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(list_filter(lines,
                l -> regexp_matches(l, '^[ \\t]*[-*\u2022]')))
                AS BIGINT) AS n_bullet_lines,
           CAST(len(list_filter(lines,
                l -> regexp_matches(l, '(\\.\\.\\.|\u2026)[ \\t\\r]*$')))
                AS BIGINT) AS n_ellipsis_lines,
           CAST(len(list_filter([{_REQ_LIST}], x -> list_contains(w, x)))
                AS BIGINT) AS n_required
    FROM base
)
SELECT doc_id, n_words, n_lines,
       CASE WHEN n_words > 0
            THEN (sum_len * {_PPM}) // n_words END AS mean_word_len_micros,
       CASE WHEN n_words > 0
            THEN (n_symbols * {_PPM}) // n_words END AS symbol_word_ppm,
       (n_bullet_lines * {_PPM}) // n_lines AS bullet_line_ppm,
       (n_ellipsis_lines * {_PPM}) // n_lines AS ellipsis_line_ppm,
       CASE WHEN n_words > 0
            THEN (n_alpha * {_PPM}) // n_words END AS alpha_word_ppm,
       n_required,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
        AND sum_len >= {GOPHER_MIN_MEAN_LEN} * n_words
        AND sum_len <= {GOPHER_MAX_MEAN_LEN} * n_words
        AND n_symbols * 10 <= {GOPHER_MAX_SYMBOL_X10} * n_words
        AND n_bullet_lines * 10 <= {GOPHER_MAX_BULLET_X10} * n_lines
        AND n_ellipsis_lines * 10 <= {GOPHER_MAX_ELLIPSIS_X10} * n_lines
        AND n_alpha * 10 >= {GOPHER_MIN_ALPHA_X10} * n_words
        AND n_required >= {GOPHER_MIN_REQUIRED}) AS kept
FROM counts
"""


# --- Full Gopher repetition profile (Rae et al. 2021, table A1) ------
#
# text_repetition_scores above is the cheap 2-column profile; this is
# the COMPLETE published signal set: within-doc duplicate-line
# fraction (count + chars), top-n-gram character share for n=2..4, and
# duplicated-n-gram character COVERAGE (interval union, chars counted
# once however many dup grams overlap them) for n=5..10.
GOPHER_TOP_NS = (2, 3, 4)
GOPHER_DUP_NS = (5, 6, 7, 8, 9, 10)


def _rep_key(gram: Column) -> Column:
    """60-bit md5 key (the curation._gram_key idiom) so only 8-byte
    keys + two small ints reach the shuffle — never gram text."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("bigint")


def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE Gopher repetition-rule profile (Rae et al. 2021,
    table A1) per document — the published MassiveText repetition
    filter set that text_repetition_scores only samples:

    - dup_line_ppm / dup_line_char_ppm: within-doc duplicate LINES
      (occurrences after the first, over content-bearing lines —
      empty lines carry no content and are excluded, the dedup_lines
      stance), by count and by characters.
    - top_{2,3,4}gram_char_ppm: characters claimed by the most
      frequent n-gram (freq × its char length, every occurrence — the
      Gopher definition) over total normalized chars.
    - dup_{5..10}gram_char_ppm: characters COVERED by n-grams that
      occur more than once in the doc — an exact interval UNION over
      token positions (overlapping dup grams never double-count a
      character), the dedup_span_removal coverage fold aimed at
      within-doc repetition.

    Char base `total_chars` is the single-space-normalized join
    length (sum of token lengths + one separator per gap) — exact,
    engine-portable, and independent of the original whitespace.
    Columns are NULL when undefined (no tokens / no n-grams of that
    length), 0 when defined but repetition-free; all ppm is integer
    div on the exact grid.

    Plan: ONE corpus tokenize (plan-barriered — consumed by the gram
    explode and the final fold); ONE generator emits all nine n-gram
    sizes as (n, pos, 60-bit key, charlen) structs, so the corpus is
    scanned once, not nine times; one (doc,n,key) hash-agg (partial-
    agg friendly: within-doc keys repeat); top-share folds to ≤3
    struct-max rows per doc, dup-gram start positions fold to ONE
    struct-array row per affected doc (the span-removal idiom — wide
    text never transits a shuffle); coverage itself is an in-row
    higher-order fold, O(n_grams × dup_starts) worst-case per doc —
    the same compute class as dedup_span_removal's kept-filter, and
    bounded by the doc, never the corpus.

    Null/empty text: anchored with n_tokens = 0 and NULL profile —
    the tokenize-keeps-the-row contract."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    t = F.coalesce(F.col("text"), F.lit(""))
    toks = docs.select(
        "doc_id",
        tokenize(t).alias("w"),
        F.filter(F.split(t, "\n", -1), lambda l: l != "").alias("nl"),
    ).localCheckpoint(eager=False)

    def gram_structs(n: int) -> Column:
        # each size carries only what its consumer reads: positions
        # for the dup sizes (the coverage fold), charlen for the top
        # sizes (the share numerator) — the other slot rides NULL
        return F.transform(
            ngrams(F.col("w"), n),
            lambda g, i: F.struct(
                F.lit(n).alias("n"),
                F.when(F.lit(n in GOPHER_DUP_NS), i + 1).alias("i0"),
                _rep_key(g).alias("k"),
                F.when(F.lit(n in GOPHER_TOP_NS), F.length(g)).alias(
                    "clen"
                ),
            ),
        )

    # Shuffle-layout note (all three spellings MEASURED at sf0.1):
    # this two-stream layout writes 34.6 MB — the count stream (4
    # skinny cols -> the (doc,n,k) hash-agg) plus a dup-sizes-only
    # position stream probing the dup keys. A single doc_id-
    # repartitioned stream with subset-partitioned downstream aggs
    # measured 52.7 MB (the 5-col stream shuffles for BOTH consumers;
    # exchange reuse never materialized under AQE), and gathering
    # positions with collect_list INSIDE the (doc,n,k) agg measured
    # 51.1 MB (ObjectHashAggregate partials serialize one boxed array
    # per group). Gram text never shuffles in any spelling; ~34 MB
    # for 11 profile columns over 9 gram sizes is ~3 MB per signal —
    # the dedup_span_profile class.
    # plan barrier (r13): TWO consumers read the exploded gram stream
    # (the (doc,n,k) count agg and the dup-position probe's left side)
    # — unbarriered, the 9-size generate with its per-gram md5 (the
    # family's dominant CPU) executes once PER consumer (measured
    # 4.3 -> 3.6 s at sf0.1 from this one line). The materialized rows
    # are the same skinny (doc, n, i0, k, clen) quintuples the two
    # shuffle streams already carry — ~24 B/gram to local disk buys
    # back a full corpus-side gram generation.
    grams = (
        toks.select(
            "doc_id",
            F.explode(
                F.concat(
                    *[gram_structs(n) for n in GOPHER_TOP_NS + GOPHER_DUP_NS]
                )
            ).alias("g"),
        )
        .select("doc_id", "g.n", "g.i0", "g.k", "g.clen")
        .localCheckpoint(eager=False)
    )
    stats = grams.select("doc_id", "n", "k", "clen").groupBy(
        "doc_id", "n", "k"
    ).agg(F.count("*").alias("c"), F.max("clen").alias("clen"))
    # top-share: lexicographic struct-max = max freq, then max charlen
    # among ties (the oracle mirrors it as a join on c = max(c))
    top = (
        stats.where(F.col("n").isin(list(GOPHER_TOP_NS)))
        .groupBy("doc_id")
        .agg(
            *[
                F.max(
                    F.when(F.col("n") == n, F.struct("c", "clen"))
                ).alias(f"t{n}")
                for n in GOPHER_TOP_NS
            ]
        )
    )
    dup_starts = (
        grams.where(F.col("n") >= min(GOPHER_DUP_NS))
        .select("doc_id", "n", "i0", "k")
        .join(
            stats.where(
                (F.col("n") >= min(GOPHER_DUP_NS)) & (F.col("c") > 1)
            ).select("doc_id", "n", "k"),
            ["doc_id", "n", "k"],
        )
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("n", F.col("i0").alias("s"))).alias(
                "starts"
            )
        )
    )
    base = (
        toks.join(top, "doc_id", "left")
        .join(dup_starts, "doc_id", "left")
        .select(
            "doc_id",
            "w",
            "nl",
            *[f"t{n}" for n in GOPHER_TOP_NS],
            F.coalesce(
                "starts", F.array().cast("array<struct<n:int,s:int>>")
            ).alias("starts"),
        )
    )

    L = F.size("w")

    def covered(n: int, p: Column) -> Column:
        return F.exists(
            F.col("starts"),
            lambda s: (s["n"] == n) & (s["s"] <= p) & (p < s["s"] + F.lit(n)),
        )

    def dup_chars(n: int) -> Column:
        tok = F.aggregate(
            F.transform(
                F.sequence(F.lit(1), L),
                lambda p: F.when(
                    covered(n, p), F.length(F.element_at(F.col("w"), p))
                ).otherwise(F.lit(0)),
            ),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
        gaps = F.size(
            F.filter(
                F.sequence(F.lit(1), L - 1),
                lambda p: covered(n, p) & covered(n, p + 1),
            )
        )
        return F.when(L >= n, tok + gaps)

    nlp = F.size("nl")
    line_is_dup = lambda p: F.exists(  # noqa: E731
        F.slice(F.col("nl"), 1, p - 1),
        lambda e: e == F.element_at(F.col("nl"), p),
    )
    counted = base.select(
        "doc_id",
        L.cast("bigint").alias("n_tokens"),
        (
            F.aggregate(
                F.col("w"), F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
            )
            + F.greatest(L - 1, F.lit(0))
        )
        .cast("bigint")
        .alias("total_chars"),
        nlp.cast("bigint").alias("n_content_lines"),
        F.when(
            nlp > 0,
            F.size(F.filter(F.sequence(F.lit(1), nlp), line_is_dup)),
        )
        .cast("bigint")
        .alias("n_dup_lines"),
        F.when(
            nlp > 0,
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), nlp),
                    lambda p: F.when(
                        line_is_dup(p),
                        F.length(F.element_at(F.col("nl"), p)),
                    ).otherwise(F.lit(0)),
                ),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ),
        ).alias("dup_line_chars"),
        F.aggregate(
            F.col("nl"), F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
        ).alias("line_chars"),
        *[F.col(f"t{n}") for n in GOPHER_TOP_NS],
        *[dup_chars(n).alias(f"dup{n}_chars") for n in GOPHER_DUP_NS],
    )
    return counted.select(
        "doc_id",
        "n_tokens",
        "total_chars",
        "n_content_lines",
        F.expr(
            f"CASE WHEN n_content_lines > 0 THEN "
            f"(n_dup_lines * {_PPM}) div n_content_lines END"
        ).alias("dup_line_ppm"),
        F.expr(
            f"CASE WHEN line_chars > 0 THEN "
            f"(dup_line_chars * {_PPM}) div line_chars END"
        ).alias("dup_line_char_ppm"),
        *[
            F.expr(
                f"CASE WHEN t{n} IS NOT NULL AND total_chars > 0 THEN "
                f"(CAST(t{n}.c AS BIGINT) * t{n}.clen * 1000000)"
                f" div total_chars END"
            ).alias(f"top_{n}gram_char_ppm")
            for n in GOPHER_TOP_NS
        ],
        *[
            F.expr(
                f"CASE WHEN dup{n}_chars IS NOT NULL AND total_chars > 0 "
                f"THEN (dup{n}_chars * {_PPM}) div total_chars END"
            ).alias(f"dup_{n}gram_char_ppm")
            for n in GOPHER_DUP_NS
        ],
    )


def _gopher_repetition_sql() -> str:
    """The oracle mirror, generated per n (the per-n CTE bodies are a
    template; the coverage fold recomputes the covered() predicate
    inline — same values, O(sf0.01) cost)."""
    gram_selects = "\n    UNION ALL\n".join(
        f"""    SELECT doc_id, {n} AS n, i,
           CAST('0x' || substr(md5(
                array_to_string(w[i:i+{n - 1}], ' ')), 1, 15)
                AS BIGINT) AS k,
           length(array_to_string(w[i:i+{n - 1}], ' ')) AS clen
    FROM toks, LATERAL unnest(generate_series(1, len(w) - {n - 1})) AS u(i)
    WHERE len(w) >= {n}"""
        for n in GOPHER_TOP_NS + GOPHER_DUP_NS
    )
    top_joins = "\n".join(
        f"    LEFT JOIN top tp{n} ON tp{n}.doc_id = t.doc_id"
        f" AND tp{n}.n = {n}"
        for n in GOPHER_TOP_NS
    )
    dup_joins = "\n".join(
        f"    LEFT JOIN dupstarts d{n} ON d{n}.doc_id = t.doc_id"
        f" AND d{n}.n = {n}"
        for n in GOPHER_DUP_NS
    )
    top_cols = ",\n".join(
        f"           tp{n}.topc AS top{n}c, tp{n}.topclen AS top{n}clen"
        for n in GOPHER_TOP_NS
    )
    dup_cols = ",\n".join(
        f"           coalesce(d{n}.starts, []) AS s{n}" for n in GOPHER_DUP_NS
    )

    def cov(n: int, p: str) -> str:
        return (
            f"len(list_filter(s{n}, s -> s <= {p} AND {p} < s + {n})) > 0"
        )

    dup_chars_cols = ",\n".join(
        f"""           CASE WHEN len(w) >= {n} THEN
               coalesce(list_sum([CASE WHEN {cov(n, 'p')}
                   THEN length(w[p]) ELSE 0 END
                   FOR p IN generate_series(1, len(w))]), 0)
               + len(list_filter(generate_series(1, len(w) - 1),
                     p -> {cov(n, 'p')} AND {cov(n, 'p + 1')}))
           END AS dup{n}_chars"""
        for n in GOPHER_DUP_NS
    )
    top_ppm = ",\n".join(
        f"""       CASE WHEN top{n}c IS NOT NULL AND total_chars > 0 THEN
            CAST((top{n}c * top{n}clen * 1000000) // total_chars AS BIGINT)
       END AS top_{n}gram_char_ppm"""
        for n in GOPHER_TOP_NS
    )
    dup_ppm = ",\n".join(
        f"""       CASE WHEN dup{n}_chars IS NOT NULL AND total_chars > 0 THEN
            CAST((dup{n}_chars * 1000000) // total_chars AS BIGINT)
       END AS dup_{n}gram_char_ppm"""
        for n in GOPHER_DUP_NS
    )
    top_carry = ",\n".join(
        f"           top{n}c, top{n}clen" for n in GOPHER_TOP_NS
    )
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(coalesce(text, '')),
                                          '\\s+'), x -> x <> '') AS w,
           list_filter(string_split(coalesce(text, ''), chr(10)),
                       l -> l <> '') AS nl
    FROM documents
),
grams AS (
{gram_selects}
),
stats AS (
    SELECT doc_id, n, k, count(*) AS c, max(clen) AS clen
    FROM grams GROUP BY 1, 2, 3
),
mx AS (
    SELECT doc_id, n, max(c) AS mc FROM stats
    WHERE n <= {max(GOPHER_TOP_NS)} GROUP BY 1, 2
),
top AS (
    SELECT st.doc_id, st.n, mx.mc AS topc, max(st.clen) AS topclen
    FROM stats st
    JOIN mx ON st.doc_id = mx.doc_id AND st.n = mx.n AND st.c = mx.mc
    GROUP BY st.doc_id, st.n, mx.mc
),
dupstarts AS (
    SELECT g.doc_id, g.n, list(g.i) AS starts
    FROM grams g JOIN stats st USING (doc_id, n, k)
    WHERE st.c > 1 AND g.n >= {min(GOPHER_DUP_NS)}
    GROUP BY 1, 2
),
base AS (
    SELECT t.doc_id, t.w, t.nl,
{top_cols},
{dup_cols}
    FROM toks t
{top_joins}
{dup_joins}
),
counted AS (
    SELECT doc_id, w, nl,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0)
                + greatest(len(w) - 1, 0) AS BIGINT) AS total_chars,
           CAST(len(nl) AS BIGINT) AS n_content_lines,
           CASE WHEN len(nl) > 0 THEN
               CAST(len(list_filter(generate_series(1, len(nl)),
                   p -> len(list_filter(nl[1:p-1], e -> e = nl[p])) > 0))
                   AS BIGINT)
           END AS n_dup_lines,
           CASE WHEN len(nl) > 0 THEN
               CAST(coalesce(list_sum([CASE
                   WHEN len(list_filter(nl[1:p-1], e -> e = nl[p])) > 0
                   THEN length(nl[p]) ELSE 0 END
                   FOR p IN generate_series(1, len(nl))]), 0) AS BIGINT)
           END AS dup_line_chars,
           CAST(coalesce(list_sum(list_transform(nl, x -> length(x))), 0)
                AS BIGINT) AS line_chars,
{top_carry},
{dup_chars_cols}
    FROM base
)
SELECT doc_id, n_tokens, total_chars, n_content_lines,
       CASE WHEN n_content_lines > 0 THEN
            CAST((n_dup_lines * 1000000) // n_content_lines AS BIGINT)
       END AS dup_line_ppm,
       CASE WHEN line_chars > 0 THEN
            CAST((dup_line_chars * 1000000) // line_chars AS BIGINT)
       END AS dup_line_char_ppm,
{top_ppm},
{dup_ppm}
FROM counted
"""


# Gopher table-A1 repetition CEILINGS (Rae et al. 2021) on the exact
# ppm grid — a doc is dropped when ANY signal exceeds its published
# ceiling. NULL signals (doc too short to define the n-gram size)
# vacuously pass: there is nothing to measure.
GOPHER_REP_CEILINGS_PPM: tuple[tuple[str, int], ...] = (
    ("dup_line_ppm", 300_000),
    ("dup_line_char_ppm", 200_000),
    ("top_2gram_char_ppm", 200_000),
    ("top_3gram_char_ppm", 180_000),
    ("top_4gram_char_ppm", 160_000),
    ("dup_5gram_char_ppm", 150_000),
    ("dup_6gram_char_ppm", 140_000),
    ("dup_7gram_char_ppm", 130_000),
    ("dup_8gram_char_ppm", 120_000),
    ("dup_9gram_char_ppm", 110_000),
    ("dup_10gram_char_ppm", 100_000),
)


def corpus_gopher_repetition_clean(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Gopher repetition rules made EXECUTABLE — the verdict pass
    text_gopher_repetition audits (profile → verdict, the
    dedup_span_profile → dedup_span_removal relationship): every
    profile signal compared against its PUBLISHED table-A1 ceiling
    (dup lines 30%/20% chars, top 2/3/4-grams 20/18/16%, dup
    5..10-grams 15..10% — Rae et al. 2021), on the exact ppm grid so
    the verdict is bit-exact in both engines. Output per doc:
    (doc_id, n_tokens, n_rules_failed, kept) — the failed-rule count
    is the same per-rule telemetry dial the quality verdict's ratio
    columns provide.

    Plan: the profile plan plus one in-row projection — nothing new
    shuffles; the oracle nests the profile SQL verbatim as a CTE (the
    corpus_bpe_fertility composition idiom). Together with
    corpus_gopher_clean this completes the full published Gopher
    document filter (quality rules + repetition rules)."""
    prof = text_gopher_repetition(spark, sf_dir)
    failed = sum(
        F.coalesce(F.col(c) > F.lit(t), F.lit(False)).cast("int")
        for c, t in GOPHER_REP_CEILINGS_PPM
    )
    return prof.select(
        "doc_id",
        "n_tokens",
        failed.cast("int").alias("n_rules_failed"),
        (failed == 0).alias("kept"),
    )


def _gopher_repetition_clean_sql() -> str:
    failed = "\n             + ".join(
        f"CASE WHEN coalesce({c} > {t}, FALSE) THEN 1 ELSE 0 END"
        for c, t in GOPHER_REP_CEILINGS_PPM
    )
    return f"""
WITH profile AS ({_gopher_repetition_sql()})
SELECT doc_id, n_tokens,
       CAST({failed} AS INT) AS n_rules_failed,
       ({failed}) = 0 AS kept
FROM profile
"""


QUERIES = {
    "text_repetition_scores": text_repetition_scores,
    "text_winnow_fingerprints": text_winnow_fingerprints,
    "corpus_gopher_clean": corpus_gopher_clean,
    "text_gopher_repetition": text_gopher_repetition,
    "corpus_gopher_repetition_clean": corpus_gopher_repetition_clean,
}

ORACLE_SQL = {
    "text_repetition_scores": REPETITION_SQL,
    "text_winnow_fingerprints": WINNOW_SQL,
    "corpus_gopher_clean": GOPHER_CLEAN_SQL,
    "text_gopher_repetition": _gopher_repetition_sql(),
    "corpus_gopher_repetition_clean": _gopher_repetition_clean_sql(),
}
