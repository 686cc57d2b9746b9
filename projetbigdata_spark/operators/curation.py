"""Corpus-curation operators a large-scale training-data pipeline runs
between raw ingest and tokenization: n-gram eval decontamination
(the GPT-3-style overlap check), unigram corpus-frequency quality
scoring (the exact-arithmetic sibling of a CCNet LM-perplexity
filter), the final keep/canonical dedup materialization, and PII
redaction for log-derived text.

Complements the minhash-based dedup_contamination
(operators/dedup.py): minhash answers "is this eval doc a near-dup of
a train doc"; the n-gram overlap here answers the finer "what fraction
of this eval doc's n-grams appear ANYWHERE in train" — the form used
to decontaminate benchmark suites, where a single leaked passage
matters even if the doc as a whole is novel.

Scale posture (100 TB):
  - every join is an equi-join on a fixed-width hashed key (15-hex-digit
    md5 prefix → bigint), never on the raw n-gram string — a 13-gram
    shuffle key would be ~100 bytes/row; the hash is 8;
  - the train n-gram side is a distinct hash-agg (map-side partial);
  - all ratios are exact integers (ppb / micros via integer division),
    so the DuckDB oracle hashes bit-identically — no float order risk;
  - redaction is one codegen'd projection pass, zero exchanges.

Reference tie-in: the reference's dictionary-membership filter
(script3.py:75-77 `if w in dico`) is the same shape as the train-gram
membership probe here — re-expressed as a distributed semi-join
instead of a broadcast Python dict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.functions.text import ngrams, tokenize
from projetbigdata_spark.operators.sampling import _hash_bucket
from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import (
    load_documents_parallel,
    load_table,
)

NGRAM_N = 5  # production decontamination uses 8-13; fixture docs are
# ~50 tokens from a ~40-word vocabulary, so 5-grams already make chance
# collisions negligible (40^5 possible vs ~2e4 train grams) while
# leaving true duplicate passages detectable.


def _gram_key(gram: Column) -> Column:
    """60-bit join key for an n-gram: first 15 hex digits of md5 →
    bigint. Engine-portable (same md5, same base-16 conv), collision
    probability ~n²/2⁶¹ — and any collision affects Spark and the
    oracle identically, so parity is unaffected."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("bigint")


def _split_col() -> Column:
    """The deterministic md5-bucket split — the ONE definition in
    operators/sampling.split_col, so decontamination can never drift
    from the assigned splits."""
    from projetbigdata_spark.operators.sampling import split_col

    return split_col()


def _spread_input(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Rebalance a scan whose partition count is below the target
    parallelism before a compute-heavy gram projection — now a thin
    delegate to catalog.parallel_scan with the measured text-tier
    width dial (r13): one conditional round-robin widen, skipped on
    any already-multi-split scan (the 100 TB case), width derived
    from input bytes instead of raw core count (the r12 scaling block
    measured full-core fan-out SLOWER than 8-way at sf0.1)."""
    from projetbigdata_spark.sources.catalog import (
        DOC_BYTES_PER_TASK,
        parallel_scan,
    )

    return parallel_scan(spark, df, bytes_per_task=DOC_BYTES_PER_TASK)


def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-eval-document n-gram decontamination score: the fraction of
    the doc's distinct 5-grams that occur in ANY train-split document.

    Output (one row per val/test doc, short docs included):
      doc_id, split, n_grams, n_hit, overlap_ppm (exact integer parts-
      per-million, NULL when the doc is too short to have a 5-gram),
      is_contaminated (any hit).

    Plan: grams are hashed to their 60-bit key INSIDE the per-doc
    array (transform → array_distinct), so only 8-byte longs ever
    reach explode/shuffle — never the ~100-byte gram strings (16%
    faster at the 50k-doc soak, and the shuffle-width win grows with
    n). "Distinct grams" therefore means distinct gram KEYS in both
    engines — identical modulo in-doc 60-bit collisions, which both
    engines would see alike. Train keys → distinct hash-agg; eval keys
    left-join them (AQE broadcasts the train side when it fits);
    one groupBy(doc_id); anchor join so docs with < NGRAM_N tokens
    surface with n_grams=0 instead of vanishing (the dedup_incremental
    anchoring lesson, ADVICE r2). The shared gram derivation is
    recomputed for the train and eval branches rather than
    materialized: the arrays are corpus-sized, and the re-derivation
    is the cheap map-side part of the plan — the right trade at
    100 TB."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    gkeys = F.array_distinct(
        F.transform(
            ngrams(tokenize("text"), NGRAM_N), lambda g: _gram_key(g)
        )
    )
    d = docs.select(
        "doc_id", _split_col().alias("split"), gkeys.alias("gk")
    )
    train_keys = (
        d.where(F.col("split") == "train")
        .select(F.explode("gk").alias("k"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ev = d.where(F.col("split") != "train")
    eval_grams = ev.select("doc_id", F.explode("gk").alias("k"))
    scored = (
        eval_grams.join(train_keys, "k", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_hit"),
        )
    )
    anchor = ev.select("doc_id", "split")
    return (
        anchor.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "split",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
            F.expr(
                "CASE WHEN coalesce(n_grams, 0) > 0 "
                "THEN (n_hit * CAST(1000000 AS BIGINT)) div n_grams END"
            ).alias("overlap_ppm"),
            (F.coalesce(F.col("n_hit"), F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


CONTAMINATION_NGRAM_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           CASE WHEN CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 4)
                     AS BIGINT) % 100 < 80 THEN 'train'
                WHEN CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 4)
                     AS BIGINT) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       t -> t <> '') AS w
    FROM documents
),
grams AS (
    SELECT doc_id, split,
           list_distinct(
               CASE WHEN len(w) >= {NGRAM_N} THEN
                   [CAST('0x' || substr(md5(
                        array_to_string(w[i:i+{NGRAM_N - 1}], ' ')), 1, 15)
                        AS BIGINT)
                    for i in generate_series(1, len(w) - {NGRAM_N - 1})]
               ELSE [] END) AS gs
    FROM toks
),
train_keys AS (
    SELECT DISTINCT k
    FROM grams, LATERAL unnest(gs) AS t(k)
    WHERE split = 'train'
),
eval_grams AS (
    SELECT doc_id, k
    FROM grams, LATERAL unnest(gs) AS t(k)
    WHERE split <> 'train'
),
scored AS (
    SELECT e.doc_id,
           count(*) AS n_grams,
           sum(CASE WHEN tk.k IS NULL THEN 0 ELSE 1 END) AS n_hit
    FROM eval_grams e LEFT JOIN train_keys tk ON e.k = tk.k
    GROUP BY e.doc_id
)
SELECT g.doc_id,
       g.split,
       CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(s.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(CASE WHEN coalesce(s.n_grams, 0) > 0
                 THEN (s.n_hit * CAST(1000000 AS BIGINT)) // s.n_grams
            END AS BIGINT) AS overlap_ppm,
       coalesce(s.n_hit, 0) > 0 AS is_contaminated
FROM grams g LEFT JOIN scored s ON g.doc_id = s.doc_id
WHERE g.split <> 'train'
"""


SPAN_K = 10  # token-window width for span-level dedup


def span_profile_of(docs: DataFrame) -> DataFrame:
    """Frame-level core of dedup_span_profile: the span-duplication
    profile of ANY (doc_id, text) frame — factored out (r7) so a
    pipeline can RE-profile a rewritten corpus, closing the
    profile → removal → re-profile loop dedup_span_removal promises
    (examples/corpus_curation.py span_clean). Identical plan and
    output contract to the registered query, which now delegates
    here."""
    skeys = F.array_distinct(
        F.transform(
            ngrams(tokenize("text"), SPAN_K), lambda g: _gram_key(g)
        )
    )
    d = docs.select("doc_id", skeys.alias("sk"))
    spans = d.select("doc_id", F.explode("sk").alias("k"))
    stats = spans.groupBy("k").agg(
        F.min("doc_id").alias("first_doc"), F.count("*").alias("df")
    )
    per_doc = (
        spans.join(stats, "k")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(
                F.when(
                    (F.col("df") > 1) & (F.col("doc_id") > F.col("first_doc")),
                    1,
                ).otherwise(0)
            ).alias("n_dup_spans"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce(F.col("n_dup_spans"), F.lit(0))
        .cast("bigint")
        .alias("n_dup_spans"),
        F.expr(
            "CASE WHEN coalesce(n_spans, 0) > 0 THEN "
            "(n_dup_spans * CAST(1000000 AS BIGINT)) div n_spans END"
        ).alias("dup_span_ppm"),
    )


def dedup_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplication profile — the granularity between
    whole-document dedup and n-gram contamination: for every document,
    how many of its 10-token windows (stride 1) also occur in an
    EARLIER document (doc_id order = keep-first semantics, matching
    dedup_exact's keeper rule). The corpus-wide duplicated-span rate
    is what substring-dedup pipelines (exact-substring dedup on
    suffix-array clusters) decide to cut; this profile is the audit
    that tells you whether that pass is worth running.

    Plan: spans hashed in-array to 60-bit keys (8-byte explode/shuffle
    rows, as in contamination_ngram_overlap); one groupBy(span) for
    (min_doc, df); the span→stats join arrives already partitioned on
    the span key; one groupBy(doc); anchor join resurfaces short docs
    with n_spans=0. The dataflow lives in span_profile_of (frame-level
    core, r7) so a rewritten corpus can be re-profiled."""
    tune(spark)
    return span_profile_of(
        load_documents_parallel(spark, sf_dir)
    )


SPAN_PROFILE_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       t -> t <> '') AS w
    FROM documents
),
keys AS (
    SELECT doc_id,
           list_distinct(
               CASE WHEN len(w) >= {SPAN_K} THEN
                   [CAST('0x' || substr(md5(
                        array_to_string(w[i:i+{SPAN_K - 1}], ' ')), 1, 15)
                        AS BIGINT)
                    for i in generate_series(1, len(w) - {SPAN_K - 1})]
               ELSE [] END) AS sk
    FROM toks
),
spans AS (
    SELECT doc_id, k FROM keys, LATERAL unnest(sk) AS t(k)
),
stats AS (
    SELECT k, min(doc_id) AS first_doc, count(*) AS df
    FROM spans GROUP BY k
),
per_doc AS (
    SELECT s.doc_id,
           count(*) AS n_spans,
           sum(CASE WHEN st.df > 1 AND s.doc_id > st.first_doc
                    THEN 1 ELSE 0 END) AS n_dup_spans
    FROM spans s JOIN stats st USING (k)
    GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(CASE WHEN coalesce(p.n_spans, 0) > 0
                 THEN (p.n_dup_spans * CAST(1000000 AS BIGINT))
                      // p.n_spans
            END AS BIGINT) AS dup_span_ppm
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING dedup made EXECUTABLE — the removal pass that
    dedup_span_profile above audits (the profile "tells you whether
    that pass is worth running"; this IS the pass). The Spark-first
    spelling of suffix-array substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better") on
    fixed SPAN_K-token windows: every token position covered by a
    10-token window whose key already occurs in an EARLIER document
    (keep-first at doc granularity, the profile's n_dup_spans rule —
    repeats *within* the first document are kept) is cut, and the
    surviving tokens are reassembled in order. Output: (doc_id,
    n_tokens, n_cut, text_deduped) — the rewritten corpus plus the
    audit counts, so a pipeline chains profile → removal → re-profile.

    Plan: ONE corpus tokenize (plan-barriered — consumed by the span
    explode AND the reassembly join); spans hashed in-array to 60-bit
    keys (8-byte shuffle rows, the dedup_span_profile idiom); one
    groupBy(key) for first_doc; the dup-start positions fold back to
    ONE int-array row per affected doc, and the cut itself is an
    in-row higher-order filter (position-indexed lambda, zero extra
    shuffle). At 100 TB the wide text rows move only through the
    final projection — never through the span join.

    Null/empty text: coalesced to '' on BOTH sides (n_tokens = 0,
    text_deduped = '') — the tokenize-keeps-the-row contract."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        tokenize(F.coalesce(F.col("text"), F.lit(""))).alias("w"),
    ).localCheckpoint(eager=False)
    spans = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(ngrams(F.col("w"), SPAN_K), lambda g: _gram_key(g))
        ).alias("i0", "k"),
    )
    stats = spans.groupBy("k").agg(F.min("doc_id").alias("first_doc"))
    dup_starts = (
        spans.join(stats, "k")
        .where(F.col("doc_id") > F.col("first_doc"))
        .groupBy("doc_id")
        .agg(F.collect_list(F.col("i0") + 1).alias("starts"))
    )
    base = toks.join(dup_starts, "doc_id", "left").select(
        "doc_id",
        "w",
        F.coalesce("starts", F.array().cast("array<int>")).alias("starts"),
    )
    kept = F.filter(
        F.col("w"),
        lambda t, i: ~F.exists(
            F.col("starts"),
            lambda s: (s <= i + 1) & (i + 1 < s + F.lit(SPAN_K)),
        ),
    )
    return base.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        (F.size("w") - F.size(kept)).cast("bigint").alias("n_cut"),
        F.array_join(kept, " ").alias("text_deduped"),
    )


SPAN_REMOVAL_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(
               string_split_regex(lower(coalesce(text, '')), '\\s+'),
               t -> t <> '') AS w
    FROM documents
),
spans AS (
    SELECT doc_id, i,
           CAST('0x' || substr(md5(
                array_to_string(w[i:i+{SPAN_K - 1}], ' ')), 1, 15)
                AS BIGINT) AS k
    FROM toks, LATERAL unnest(generate_series(1, len(w) - {SPAN_K - 1}))
         AS u(i)
    WHERE len(w) >= {SPAN_K}
),
stats AS (SELECT k, min(doc_id) AS first_doc FROM spans GROUP BY k),
dupstarts AS (
    SELECT s.doc_id, list(s.i) AS starts
    FROM spans s JOIN stats st USING (k)
    WHERE s.doc_id > st.first_doc
    GROUP BY s.doc_id
),
base AS (
    SELECT t.doc_id, t.w, coalesce(d.starts, []) AS starts
    FROM toks t LEFT JOIN dupstarts d USING (doc_id)
),
kept AS (
    SELECT doc_id, len(w) AS n_tokens,
           [w[p] FOR p IN generate_series(1, len(w))
            IF len(list_filter(starts,
                   s -> s <= p AND p < s + {SPAN_K})) = 0] AS kw
    FROM base
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens - len(kw) AS BIGINT) AS n_cut,
       -- array_to_string([]) is NULL in DuckDB, '' in Spark's
       -- array_join: pin the fully-cut-doc case to ''
       coalesce(array_to_string(kw, ' '), '') AS text_deduped
FROM kept
"""


def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINE-level dedup (VERDICT r8 item 4) — the CCNet / RefinedWeb
    move where the unit of deduplication is the newline-delimited
    LINE, not the doc (dedup_exact) or the k-token window
    (dedup_span_removal): boilerplate lines (nav bars, cookie
    banners, footers) repeat across a crawl verbatim, so every line
    whose content already appears in an EARLIER document is dropped
    and the doc is REWRITTEN from its surviving lines. Keep-first at
    doc granularity, exactly the span rule: repeats *within* the
    first document are kept, every occurrence in a later doc is cut.
    Empty lines carry no content and are never deduped — they always
    survive, so paragraph structure is preserved.

    Output: (doc_id, n_lines, n_lines_cut, text_deduped), full-corpus
    anchored — a pipeline chains this exactly like the span pass
    (profile → cut → re-profile), and n_lines_cut is the per-doc
    audit column.

    Plan (the dedup_span_removal idiom with newline units): one
    line-split pass (plan-barriered — consumed by the unit explode
    AND the reassembly join); lines hashed in-array to 60-bit keys so
    only (doc_id, pos, key) 8-byte-key rows reach the shuffle — wide
    line text never transits the join; one groupBy(key) for
    first_doc; cut positions fold back to ONE int-array row per
    affected doc; the rewrite is an in-row indexed filter + join with
    chr(10). At 100 TB the text moves only through the final
    projection.

    Null/empty text: coalesced to '' (split -> [''] = one empty line,
    kept) — n_lines = 1, n_lines_cut = 0, text_deduped = '' — the
    tokenize-keeps-the-row contract. The synthetic fixtures are
    single-line corpora, so the unit degenerates to exact-doc
    keep-first there: the sf0.01 driver row value-checks the anchored
    identity rebuild (that corpus has zero exact dups), sf0.1's 8
    replica texts exercise the cut end-to-end, and the ×100-replica
    soaks exercise it at scale; multi-line rebuilding, within-doc
    repeats, and empty-line preservation are pinned by the
    constructed-frame parity test in tests/test_curation_ops.py."""
    tune(spark)
    return line_dedup_frame(
        load_documents_parallel(spark, sf_dir)
    )


def dedup_lines_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document line dedup — the in-row complement of
    dedup_lines (which cuts lines seen in EARLIER documents and
    deliberately keeps within-doc repeats): here each document keeps
    only the FIRST occurrence of every non-empty line it contains,
    the classic 'strip repeated boilerplate inside one page' move
    (nav chrome repeated top and bottom, pagination artifacts,
    chat-log stutter). Empty lines carry no content and always
    survive (the dedup_lines stance), so paragraph structure is
    preserved. Output mirrors dedup_lines: (doc_id, n_lines,
    n_lines_cut, text_deduped), full-corpus anchored.

    Scale posture: ZERO joins, zero shuffles — keep-first within a
    row is a positional in-row filter (line i survives iff no equal
    line at j < i), O(lines²) string compares per doc where lines
    are tens, not thousands — the corpus_c4_clean scan-bound class.
    Composition: run this BEFORE the cross-doc pass so within-doc
    stutter can't vote a line into the corpus-level first_doc index.

    Null/empty text: coalesced to '' -> one empty line, kept —
    n_lines = 1, n_lines_cut = 0, text_deduped = ''. Fixture honesty:
    single-line fixtures cut nothing (the registered row value-checks
    the anchored identity rebuild); live multi-line behavior is
    pinned on constructed corpora + the committed multiline golden
    lane."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    lines = F.split(F.coalesce(F.col("text"), F.lit("")), "\n", -1)
    # stage the split once, then filter positionally against it
    # (line i survives iff empty, or no equal line among ls[1..i])
    staged = docs.select("doc_id", lines.alias("_ls"))
    kept = F.filter(
        F.col("_ls"),
        lambda l, i: (l == "")
        | ~F.exists(F.slice(F.col("_ls"), 1, i), lambda e: e == l),
    )
    return staged.select(
        "doc_id",
        F.size("_ls").cast("bigint").alias("n_lines"),
        (F.size("_ls") - F.size(kept)).cast("bigint").alias("n_lines_cut"),
        F.array_join(kept, "\n").alias("text_deduped"),
    )


DEDUP_LINES_WITHIN_SQL = """
WITH base AS (
    SELECT doc_id,
           string_split(coalesce(text, ''), chr(10)) AS ls
    FROM documents
),
kept AS (
    SELECT doc_id, len(ls) AS n_lines,
           [ls[i] FOR i IN generate_series(1, len(ls))
            IF ls[i] = ''
               OR len(list_filter(ls[1:i-1], e -> e = ls[i])) = 0] AS kl
    FROM base
)
SELECT doc_id,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_lines - len(kl) AS BIGINT) AS n_lines_cut,
       coalesce(array_to_string(kl, chr(10)), '') AS text_deduped
FROM kept
"""


# --- text normalization (the pre-dedup pass) --------------------------
#
# Unicode punctuation folding as a 1:1 char map (both engines'
# translate() are codepoint maps on these BMP chars): curly quotes ->
# ASCII, en/em dash + minus -> '-', and EVERY Unicode Zs space -> ' '
# (ADVICE r9: the complete category, not just NBSP/figure/narrow-NBSP/
# ideographic -- en/em/thin/hair spaces et al. defeated the "hash keys
# mean content equality" claim). Spelled as \u escapes so the map is
# auditable codepoint by codepoint.
_NORM_FROM = (
    "\u2018\u2019\u201a\u201b"  # single quotes: curly pair, low-9, rev-9
    "\u201c\u201d\u201e\u201f"  # double quotes: curly pair, low-9, rev-9
    "\u2013\u2014\u2212"  # en dash, em dash, minus sign
    "\u00a0\u1680"  # NBSP, ogham space mark
    "\u2000\u2001\u2002\u2003"  # en quad, em quad, en space, em space
    "\u2004\u2005\u2006\u2007"  # 3/4/6-per-em space, figure space
    "\u2008\u2009\u200a"  # punctuation space, thin space, hair space
    "\u202f\u205f\u3000"  # narrow NBSP, math space, ideographic space
    "\t"  # tab
)
_NORM_TO = "''''\"\"\"\"---" + " " * 17
assert len(_NORM_FROM) == len(_NORM_TO)
# Stripped outright: C0 controls (minus \t\n\r -- folded above /
# kept), DEL, ZERO WIDTH SPACE (U+200B -- a word-break hint with no
# width; crawls are full of it and it defeats exact keys), and U+FEFF
# (BOM / zero-width no-break space -- the classic mid-document paste
# artifact). ZWNJ/ZWJ (U+200C/D) are deliberately KEPT: they are
# orthographically meaningful in Persian/Indic scripts and stripping
# them would corrupt non-Latin corpora (ADVICE r9 scope note).
_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\u200b\ufeff]"


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-dedup text normalization pass (the ftfy-lite subset
    every real pipeline runs BEFORE hashing): curly quotes / unicode
    dashes / the complete Unicode Zs space category folded to ASCII
    (1:1 translate map), 'HORIZONTAL ELLIPSIS' expanded to '...',
    CRLF/CR folded to LF, C0 control chars + DEL + ZWSP + BOM
    stripped (ZWNJ/ZWJ kept — orthographic in Persian/Indic), and
    per-line space-squeeze + trim —
    newlines themselves are PRESERVED because line structure feeds
    dedup_lines downstream. Case is NOT folded (tokenize owns that).
    Output: (doc_id, text_norm, changed, len_before, len_after).

    Why it's load-bearing at 100 TB: every dedup tier keys on
    md5(text) — a curly quote vs a straight quote defeats exact dedup
    and shifts every shingle; normalizing first is what makes hash
    keys mean content equality (pinned: two docs differing only by
    quote style become exact-key equals after this pass).

    Scale posture: ZERO joins, zero shuffles — one codegen'd
    projection (translate + replace + two regexp passes + an in-row
    line fold); idempotent by construction (normalize∘normalize =
    normalize, pinned). Null text: text_norm = '', the anchor
    contract."""
    tune(spark)
    return normalize_frame(load_table(spark, sf_dir, "documents"))


def normalize_frame(docs: DataFrame) -> DataFrame:
    """Frame-level core of text_normalize over any (doc_id, text)
    frame — factored (the gopher_clean_of convention) so the
    streaming twin and constructed-frame tests share one
    implementation with the registered query."""
    t = F.coalesce(F.col("text"), F.lit(""))
    t1 = F.translate(t, _NORM_FROM, _NORM_TO)
    t2 = F.regexp_replace(t1, "…", "...")
    t3 = F.regexp_replace(t2, "\r\n?", "\n")
    t4 = F.regexp_replace(t3, _CTRL_RE, "")
    squeezed = F.array_join(
        F.transform(
            F.split(t4, "\n", -1),
            lambda l: F.trim(F.regexp_replace(l, " +", " ")),
        ),
        "\n",
    )
    return docs.select(
        "doc_id",
        squeezed.alias("text_norm"),
        (squeezed != t).alias("changed"),
        F.length(t).cast("bigint").alias("len_before"),
        F.length(squeezed).cast("bigint").alias("len_after"),
    )


def _text_normalize_sql() -> str:
    # the translate map embeds quote chars: single-quote doubles for
    # the SQL literal
    nfrom = _NORM_FROM.replace("'", "''")
    nto = _NORM_TO.replace("'", "''")
    return f"""
WITH base AS (
    SELECT doc_id, coalesce(text, '') AS t FROM documents
),
folded AS (
    SELECT doc_id, t,
           regexp_replace(
               regexp_replace(
                   replace(translate(t, '{nfrom}', '{nto}'),
                           '…', '...'),
                   chr(13) || chr(10) || '?', chr(10), 'g'),
               '{_CTRL_RE}', '', 'g') AS t4
    FROM base
),
squeezed AS (
    SELECT doc_id, t,
           array_to_string(
               list_transform(string_split(t4, chr(10)),
                              l -> trim(regexp_replace(l, ' +', ' ', 'g'))),
               chr(10)) AS text_norm
    FROM folded
)
SELECT doc_id, text_norm,
       text_norm <> t AS changed,
       CAST(length(t) AS BIGINT) AS len_before,
       CAST(length(text_norm) AS BIGINT) AS len_after
FROM squeezed
"""


def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keyed on NORMALIZED text — the text_normalize →
    dedup composition as its own registered row: documents that
    differ only in punctuation style (curly vs straight quotes,
    em dash vs hyphen, NBSP vs space, CRLF vs LF, spacing runs)
    collapse into ONE group here while the raw tier (dedup_exact)
    counts them as distinct. Same output contract as dedup_exact —
    (content_md5, keep_id, n_copies), keep-first by doc_id — so the
    two tiers diff directly: rows where this tier's n_copies exceeds
    the raw tier's are exactly the punctuation-variant clusters, the
    standard audit for 'how much dup mass does normalization
    unlock'. Refinement law (pinned): every raw-exact group maps
    into exactly one normalized group, so n_copies here >= the raw
    tier's for the same surviving key.

    Plan: the zero-shuffle normalize projection + dedup_exact's one
    hash-agg — the same single-exchange class; only the 16-byte md5
    and doc_id shuffle. Fixture honesty: the fixtures are ASCII
    single-line text where normalize is the identity, so the
    registered row value-checks equal to dedup_exact's grouping;
    punctuation-twin collapse is pinned on constructed corpora and
    the committed multiline golden lane (its CRLF/quote docs)."""
    tune(spark)
    base = normalize_frame(load_table(spark, sf_dir, "documents"))
    return (
        base.select(
            "doc_id", F.md5(F.lower("text_norm")).alias("content_md5")
        )
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def _dedup_exact_normalized_sql() -> str:
    return f"""
WITH normalized AS ({_text_normalize_sql()})
SELECT md5(lower(text_norm)) AS content_md5,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM normalized
GROUP BY 1
"""


def line_dedup_frame(docs: DataFrame) -> DataFrame:
    """Frame-level core of dedup_lines over any (doc_id, text) frame —
    factored so the constructed-frame tests and the registered query
    share one implementation (the hashed_features_of convention)."""
    lines = docs.select(
        "doc_id",
        F.split(F.coalesce(F.col("text"), F.lit("")), "\n").alias("ls"),
    ).localCheckpoint(eager=False)
    units = lines.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.col("ls"),
                lambda l: F.when(l != "", _gram_key(l)),
            )
        ).alias("i0", "k"),
    ).where(F.col("k").isNotNull())
    stats = units.groupBy("k").agg(F.min("doc_id").alias("first_doc"))
    cuts = (
        units.join(stats, "k")
        .where(F.col("doc_id") > F.col("first_doc"))
        .groupBy("doc_id")
        .agg(F.collect_list(F.col("i0") + 1).alias("cut_pos"))
    )
    base = lines.join(cuts, "doc_id", "left").select(
        "doc_id",
        "ls",
        F.coalesce("cut_pos", F.array().cast("array<int>")).alias(
            "cut_pos"
        ),
    )
    kept = F.filter(
        F.col("ls"),
        lambda l, i: ~F.array_contains(F.col("cut_pos"), i + 1),
    )
    return base.select(
        "doc_id",
        F.size("ls").cast("bigint").alias("n_lines"),
        F.size("cut_pos").cast("bigint").alias("n_lines_cut"),
        F.array_join(kept, "\n").alias("text_deduped"),
    )


DEDUP_LINES_SQL = """
WITH ls AS (
    SELECT doc_id,
           string_split(coalesce(text, ''), chr(10)) AS ls
    FROM documents
),
units AS (
    SELECT doc_id, i,
           CAST('0x' || substr(md5(ls[i]), 1, 15) AS BIGINT) AS k
    FROM ls, LATERAL unnest(generate_series(1, len(ls))) AS u(i)
    WHERE ls[i] <> ''
),
stats AS (SELECT k, min(doc_id) AS first_doc FROM units GROUP BY k),
cuts AS (
    SELECT u.doc_id, list(u.i) AS cut_pos
    FROM units u JOIN stats s USING (k)
    WHERE u.doc_id > s.first_doc
    GROUP BY u.doc_id
),
base AS (
    SELECT l.doc_id, l.ls, coalesce(c.cut_pos, []) AS cut_pos
    FROM ls l LEFT JOIN cuts c USING (doc_id)
)
SELECT doc_id,
       CAST(len(ls) AS BIGINT) AS n_lines,
       CAST(len(cut_pos) AS BIGINT) AS n_lines_cut,
       coalesce(array_to_string(
           list_filter(ls, (x, i) -> NOT list_contains(cut_pos, i)),
           chr(10)), '') AS text_deduped
FROM base
"""


def dedup_lines_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dedup_lines' INGEST twin (the dedup_incremental /
    dedup_span_removal_incremental contract): drop every line of an
    INCOMING batch (source = 'src0') whose content appears anywhere in
    the STANDING corpus, and never re-pair the standing corpus against
    itself. new×new line repeats are deliberately NOT cut (the fold-in
    pass's job) — the probe side is |new-batch lines| against a frozen
    distinct-key line index, the per-batch shape a daily crawl ingest
    runs. Empty lines are never deduped (they carry no content).

    Output: (doc_id, n_lines, n_lines_cut, text_deduped) for every
    NEW doc, anchored on the batch slice of the document table. Same
    null/'' contract as the batch pass."""
    tune(spark)
    from projetbigdata_spark.operators.dedup import INCR_NEW_SOURCE

    docs = load_documents_parallel(spark, sf_dir)
    lines = docs.select(
        "doc_id",
        "source",
        F.split(F.coalesce(F.col("text"), F.lit("")), "\n").alias("ls"),
    ).localCheckpoint(eager=False)
    units = lines.select(
        "doc_id",
        "source",
        F.posexplode(
            F.transform(
                F.col("ls"),
                lambda l: F.when(l != "", _gram_key(l)),
            )
        ).alias("i0", "k"),
    ).where(F.col("k").isNotNull())
    old_keys = (
        units.where(F.col("source") != INCR_NEW_SOURCE)
        .select("k")
        .distinct()
    )
    cuts = (
        units.where(F.col("source") == INCR_NEW_SOURCE)
        .join(old_keys, "k", "semi")
        .groupBy("doc_id")
        .agg(F.collect_list(F.col("i0") + 1).alias("cut_pos"))
    )
    base = (
        lines.where(F.col("source") == INCR_NEW_SOURCE)
        .join(cuts, "doc_id", "left")
        .select(
            "doc_id",
            "ls",
            F.coalesce("cut_pos", F.array().cast("array<int>")).alias(
                "cut_pos"
            ),
        )
    )
    kept = F.filter(
        F.col("ls"),
        lambda l, i: ~F.array_contains(F.col("cut_pos"), i + 1),
    )
    return base.select(
        "doc_id",
        F.size("ls").cast("bigint").alias("n_lines"),
        F.size("cut_pos").cast("bigint").alias("n_lines_cut"),
        F.array_join(kept, "\n").alias("text_deduped"),
    )


DEDUP_LINES_INCR_SQL = """
WITH ls AS (
    SELECT doc_id, source,
           string_split(coalesce(text, ''), chr(10)) AS ls
    FROM documents
),
units AS (
    SELECT doc_id, source, i,
           CAST('0x' || substr(md5(ls[i]), 1, 15) AS BIGINT) AS k
    FROM ls, LATERAL unnest(generate_series(1, len(ls))) AS u(i)
    WHERE ls[i] <> ''
),
old_keys AS (
    SELECT DISTINCT k FROM units WHERE source <> 'src0'
),
cuts AS (
    SELECT u.doc_id, list(u.i) AS cut_pos
    FROM units u JOIN old_keys o USING (k)
    WHERE u.source = 'src0'
    GROUP BY u.doc_id
),
base AS (
    SELECT l.doc_id, l.ls, coalesce(c.cut_pos, []) AS cut_pos
    FROM ls l LEFT JOIN cuts c USING (doc_id)
    WHERE l.source = 'src0'
)
SELECT doc_id,
       CAST(len(ls) AS BIGINT) AS n_lines,
       CAST(len(cut_pos) AS BIGINT) AS n_lines_cut,
       coalesce(array_to_string(
           list_filter(ls, (x, i) -> NOT list_contains(cut_pos, i)),
           chr(10)), '') AS text_deduped
FROM base
"""


def dedup_span_removal_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dedup_span_removal's INGEST twin (the dedup_incremental
    contract): cut an incoming batch (source = 'src0') against the
    STANDING corpus's span index only — any SPAN_K-token window that
    occurs anywhere in an old document cuts the positions it covers
    in a new document, and the standing corpus is never re-paired
    against itself. new×new repeats are deliberately NOT cut here
    (they are the fold-in pass's job, exactly as dedup_incremental
    leaves new×new pairs to the next full dedup) — so the probe side
    is |new-batch spans| against a frozen distinct-key index, the
    per-batch shape a daily crawl ingest actually runs.

    Output: (doc_id, n_tokens, n_cut, text_deduped) for every NEW
    doc, anchored on the document table (a <SPAN_K-token doc still
    surfaces, uncut). Same null/'' contract as the batch pass."""
    tune(spark)
    from projetbigdata_spark.operators.dedup import INCR_NEW_SOURCE

    docs = load_documents_parallel(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        "source",
        tokenize(F.coalesce(F.col("text"), F.lit(""))).alias("w"),
    ).localCheckpoint(eager=False)
    spans = toks.select(
        "doc_id",
        "source",
        F.posexplode(
            F.transform(ngrams(F.col("w"), SPAN_K), lambda g: _gram_key(g))
        ).alias("i0", "k"),
    )
    old_keys = (
        spans.where(F.col("source") != INCR_NEW_SOURCE)
        .select("k")
        .distinct()
    )
    dup_starts = (
        spans.where(F.col("source") == INCR_NEW_SOURCE)
        .join(old_keys, "k", "semi")
        .groupBy("doc_id")
        .agg(F.collect_list(F.col("i0") + 1).alias("starts"))
    )
    base = (
        toks.where(F.col("source") == INCR_NEW_SOURCE)
        .join(dup_starts, "doc_id", "left")
        .select(
            "doc_id",
            "w",
            F.coalesce("starts", F.array().cast("array<int>")).alias(
                "starts"
            ),
        )
    )
    kept = F.filter(
        F.col("w"),
        lambda t, i: ~F.exists(
            F.col("starts"),
            lambda s: (s <= i + 1) & (i + 1 < s + F.lit(SPAN_K)),
        ),
    )
    return base.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        (F.size("w") - F.size(kept)).cast("bigint").alias("n_cut"),
        F.array_join(kept, " ").alias("text_deduped"),
    )


SPAN_REMOVAL_INCR_SQL = f"""
WITH toks AS (
    SELECT doc_id, source,
           list_filter(
               string_split_regex(lower(coalesce(text, '')), '\\s+'),
               t -> t <> '') AS w
    FROM documents
),
spans AS (
    SELECT doc_id, source, i,
           CAST('0x' || substr(md5(
                array_to_string(w[i:i+{SPAN_K - 1}], ' ')), 1, 15)
                AS BIGINT) AS k
    FROM toks, LATERAL unnest(generate_series(1, len(w) - {SPAN_K - 1}))
         AS u(i)
    WHERE len(w) >= {SPAN_K}
),
old_keys AS (
    SELECT DISTINCT k FROM spans WHERE source <> 'src0'
),
dupstarts AS (
    SELECT s.doc_id, list(s.i) AS starts
    FROM spans s SEMI JOIN old_keys o ON s.k = o.k
    WHERE s.source = 'src0'
    GROUP BY s.doc_id
),
base AS (
    SELECT t.doc_id, t.w, coalesce(d.starts, []) AS starts
    FROM toks t LEFT JOIN dupstarts d USING (doc_id)
    WHERE t.source = 'src0'
),
kept AS (
    SELECT doc_id, len(w) AS n_tokens,
           [w[p] FOR p IN generate_series(1, len(w))
            IF len(list_filter(starts,
                   s -> s <= p AND p < s + {SPAN_K})) = 0] AS kw
    FROM base
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens - len(kw) AS BIGINT) AS n_cut,
       coalesce(array_to_string(kw, ' '), '') AS text_deduped
FROM kept
"""


def text_unigram_freq_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality proxy in exact integer arithmetic: per doc,
    the mean corpus frequency of its tokens in parts-per-billion, the
    minimum token count, and the hapax count (tokens occurring exactly
    once corpus-wide). Low mean frequency / many hapaxes ≈ the noisy,
    OOV-heavy docs a CCNet-style perplexity filter drops.

    A true LM log-likelihood needs ln(), whose last-ulp behavior
    differs between Java and libm (the documented geomean residual,
    functions/udafs.py) — so the registered, hash-checked score stays
    in integers: freq_ppb(w) = count(w)·1e9 div N (associative integer
    sums, order-independent), doc score = sum(freq_ppb) div n_tokens.
    The count·1e9 product is widened through DECIMAL(38,0) before the
    integral divide (ADVICE r3): a common token in a 100 TB corpus has
    count ~1e12, whose ·1e9 product overflows int64 and would abort
    under ANSI mode — decimal(38) holds it with ~17 digits to spare,
    and the post-division quotient is ≤1e9, safely back in bigint.

    Plan: one token-count hash-agg, one equi-join token→count, one
    1-row total crossJoin (broadcast), one groupBy(doc_id), anchored
    left-join so token-less docs surface with n_tokens=0."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokenize("text")).alias("token")
    )
    counts = tok.groupBy("token").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("n_total"))
    per_tok = (
        tok.join(counts, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "c",
            F.expr(
                "CAST((CAST(c AS DECIMAL(38,0)) * 1000000000) div n_total"
                " AS BIGINT)"
            ).alias("freq_ppb"),
        )
    )
    scored = per_tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.min("c").alias("min_count"),
        F.expr("sum(freq_ppb) div count(*)").alias("mean_freq_ppb"),
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("n_hapax"), F.lit(0)).cast("bigint").alias("n_hapax"),
        F.col("min_count").cast("bigint").alias("min_count"),
        F.col("mean_freq_ppb").cast("bigint").alias("mean_freq_ppb"),
    )


UNIGRAM_FREQ_SQL = """
WITH tok AS (
    SELECT doc_id, t AS token
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS w
          FROM documents),
         LATERAL unnest(w) AS u(t)
),
counts AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
total AS (SELECT sum(c) AS n_total FROM counts),
per_tok AS (
    SELECT tok.doc_id, counts.c,
           CAST((counts.c::HUGEINT * 1000000000) // total.n_total
                AS BIGINT) AS freq_ppb
    FROM tok JOIN counts USING (token), total
),
scored AS (
    SELECT doc_id,
           count(*) AS n_tokens,
           sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax,
           min(c) AS min_count,
           sum(freq_ppb) // count(*) AS mean_freq_ppb
    FROM per_tok GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(s.n_hapax, 0) AS BIGINT) AS n_hapax,
       CAST(s.min_count AS BIGINT) AS min_count,
       CAST(s.mean_freq_ppb AS BIGINT) AS mean_freq_ppb
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaned-corpus materialization at the end of the dedup
    ladder: every document labeled with its canonical representative
    (the min doc_id of its near-dup component, itself when it has no
    near-dup) and a keep flag — exactly the frame a pipeline joins
    against to emit the deduplicated training corpus.

    Consumes the verified-Jaccard component labels via the r4
    exact-clone-collapse tier (dedup_components_verified_prefiltered —
    row-identical to dedup_components, same COMPONENTS_SQL oracle, but
    clique edges between exact replicas never reach the
    posting-expansion verification join, which is where this
    full-corpus materialization spends its wall at crawl scale); docs
    outside every component pass through the left join untouched, so
    the output is always full-corpus (one row per document, keep-count
    + drop-count add up — auditable, not implied)."""
    from projetbigdata_spark.operators.dedup import (
        dedup_components_verified_prefiltered,
    )

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    comp = dedup_components_verified_prefiltered(spark, sf_dir)
    return docs.join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("component_id"), F.col("doc_id")).alias(
            "canonical_id"
        ),
        (
            F.col("component_id").isNull()
            | (F.col("component_id") == F.col("doc_id"))
        ).alias("keep"),
        "n_chars",
    )


def _keep_canonical_sql() -> str:
    from projetbigdata_spark.operators.dedup import COMPONENTS_SQL

    return f"""
SELECT d.doc_id,
       coalesce(c.component_id, d.doc_id) AS canonical_id,
       (c.component_id IS NULL OR c.component_id = d.doc_id) AS keep,
       d.n_chars
FROM documents d
LEFT JOIN ({COMPONENTS_SQL}) c ON d.doc_id = c.doc_id
"""


# --- PII redaction -----------------------------------------------------
# The fixtures contain no real PII (synthetic word-salad documents,
# numeric event props), so the registered query derives contact-shaped
# strings from events columns — the regexes fire on every row, which is
# what actually verifies Java-regex ↔ RE2 dialect parity; behavioral
# coverage on free-form text (mixed/absent/multiple PII spans) lives in
# tests/test_curation_ops.py on constructed rows. Patterns avoid
# lookaround/backrefs so Spark (java.util.regex) and DuckDB (RE2)
# accept the identical strings.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
IP_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


def redact_pii(col: Column) -> Column:
    """Scrub emails, then phone numbers, then IPv4 addresses (ordered
    so earlier replacements can't manufacture later matches)."""
    c = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PHONE_RE, "<PHONE>")
    return F.regexp_replace(c, IP_RE, "<IP>")


def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over log-derived text: build each event's contact
    line (user email, support phone, client IP — derived
    deterministically from events columns), count each PII class, and
    emit the scrubbed string. Zero exchanges — one codegen'd projection
    pass, the shape this runs as over 100 TB of raw logs."""
    tune(spark)
    from projetbigdata_spark.sources.catalog import load_events

    # load_events, not load_table: a TIMESTAMP(NANOS) fixture fails
    # footer conversion at read time even though this query never
    # touches ts — every events consumer goes through the probe
    ev = load_events(spark, sf_dir)
    contact = F.concat(
        F.lit("user"),
        F.col("user_id").cast("string"),
        F.lit("@example.com +1-555-"),
        F.lpad((F.col("event_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip=10."),
        (F.col("user_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("event_id") % 256).cast("string"),
    )
    base = ev.select("event_id", contact.alias("contact"))
    return base.select(
        "event_id",
        F.size(F.regexp_extract_all("contact", F.lit(EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("contact", F.lit(PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        F.size(F.regexp_extract_all("contact", F.lit(IP_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_ips"),
        redact_pii(F.col("contact")).alias("redacted"),
    )


REDACT_SQL = f"""
WITH base AS (
    SELECT event_id,
           'user' || user_id || '@example.com +1-555-' ||
           lpad((event_id % 10000)::VARCHAR, 4, '0') ||
           ' ip=10.' || (user_id % 256) || '.0.' || (event_id % 256)
               AS contact
    FROM events
)
SELECT event_id,
       CAST(len(regexp_extract_all(contact, '{EMAIL_RE}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(contact, '{PHONE_RE}')) AS BIGINT)
           AS n_phones,
       CAST(len(regexp_extract_all(contact, '{IP_RE}')) AS BIGINT)
           AS n_ips,
       regexp_replace(
           regexp_replace(
               regexp_replace(contact, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g'),
           '{IP_RE}', '<IP>', 'g') AS redacted
FROM base
"""


# --- composed end-to-end curation audit -------------------------------
# The gate ceilings — ONE definition shared with
# examples/corpus_curation.py so the registered audit and the example
# pipeline can never drift apart.
CURATE_MIN_TOKENS = 20
CURATE_MAX_STOPWORD_RATIO = 0.6
CURATE_MAX_DUP_WORD_FRAC = 0.70  # Gopher-style repetition ceilings
CURATE_MAX_TOP_BIGRAM_SHARE = 0.10
CURATE_MAX_EVAL_OVERLAP_PPM = 500_000  # eval doc dropped if >50% of
# its 5-grams appear in train (GPT-3-style decontamination ceiling)


def corpus_curate(
    spark: SparkSession, sf_dir: str, thresholds: str = "fixed"
) -> DataFrame:
    """The WHOLE curation ladder as one audited dataflow (VERDICT r3
    item 3): quality gate -> repetition gate -> exact dedup -> minhash
    near-dup components -> deterministic split -> eval
    decontamination, composed exactly as examples/corpus_curation.py
    runs them, but emitting the per-document AUDIT frame instead of
    the filtered corpus: one row per document with every stage's
    verdict and the final `kept` flag. Auditable by construction —
    keep/drop counts per stage fall out of a groupBy, and
    `where(kept)` reproduces the example's survivor set.

    Stage semantics mirror the example precisely:
      - the dedup keeper flags are computed over the FULL corpus (an
        exact group whose keeper failed the quality gate loses the
        whole group — conjunction of full-corpus flags ≡ the example's
        sequential filters);
      - decontamination uses the RAW-corpus train grams (conservative
        superset — see the example's step-4b note);
      - NULL-score docs (too short to tokenize) fail their gates via
        explicit coalesce(.., false), identically in both engines.

    Plan: five independent oracle-green subtrees (quality, repetition,
    exact groups, minhash components, contamination) joined back on
    doc_id / content_md5 — each subtree keeps its own audited scale
    posture; the composition adds only doc_id equi-joins (AQE
    broadcasts the k-row component and eval-only contamination sides).

    Reference tie-in: this is the reference's script1.py:33-90 dataflow
    shape (load -> clean -> filter -> dedupe -> split) re-expressed as
    a single declarative audit.

    thresholds="calibrated" (opt-in, NEXT r4 item 3) swaps the FIXED
    quality/repetition ceilings for CORPUS-RELATIVE per-language p90s
    from corpus_quality_quantiles (broadcast |langs|-row join) — the
    CCNet loop closed: each language keeps its cleanest 90% by its own
    stopword/dup-word distribution instead of sharing English-tuned
    constants. The min-token floor, dedup, split, and decontamination
    stages are unchanged; the registered query keeps "fixed" so the
    oracle SQL stays constant-for-constant."""
    if thresholds not in ("fixed", "calibrated"):
        raise ValueError(f"thresholds must be fixed|calibrated: {thresholds!r}")
    from projetbigdata_spark.operators.dedup import (
        dedup_components_prefiltered,
    )
    from projetbigdata_spark.operators.textstats import _SW_ARRAY

    tune(spark)
    # ONE shared token-stats pass (r13, guide §2.4/§5): the quality
    # gate, the repetition gate's scalar half, the exact-dedup groups,
    # the docs anchor AND (calibrated) the per-lang quantiles all
    # derive from the same per-doc counts — before this the audit
    # tokenized the corpus 3× (quality, repetition, quantiles) and
    # md5-hashed it twice (docs anchor, dedup_exact) in separate
    # subtrees. The barriered stats frame computes tokenize +
    # array_distinct + stopword-filter + md5 ONCE; every derived
    # column keeps the subtree-identical expression (same ints, same
    # single IEEE division), so the audit is row-identical and the
    # oracle SQL is unchanged. Wide text never crosses the barrier —
    # only counts and the 32-char md5.
    #
    # content key coalesce: md5(NULL) is NULL and an inner join on a
    # NULL key silently DROPS null-text docs from the audit in both
    # engines — null-text docs form one '<NULL>' exact group instead
    # (keeper = min doc_id, matching dedup_exact's NULL-group keep_id)
    toks = tokenize("text")
    stats = (
        load_documents_parallel(spark, sf_dir)
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.md5(F.lower("text")), F.lit("<NULL>")).alias(
                "content_md5"
            ),
            _split_col().alias("split"),
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_unique"),
            F.size(
                F.filter(
                    toks, lambda t: F.array_contains(F.expr(_SW_ARRAY), t)
                )
            ).alias("n_stop"),
        )
        .localCheckpoint(eager=False)
    )
    from projetbigdata_spark.operators.textstats import _ratio_micros

    docs = stats.select("doc_id", "lang", "content_md5", "split")
    qual = stats.select(
        "doc_id",
        "n_tokens",
        "n_unique",
        _ratio_micros(F.col("n_stop"), F.col("n_tokens")).alias("stop_ratio"),
    )
    # repetition scalar from the shared counts (identical expression to
    # text_repetition_scores: int/int -> one double division, round 6);
    # the bigram share keeps its own explode pass (different stream)
    bi = load_documents_parallel(spark, sf_dir).select(
        "doc_id", F.explode(ngrams(tokenize("text"), 2)).alias("bigram")
    )
    bigram_share = (
        bi.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_share"))
    )
    rep = (
        stats.select(
            "doc_id",
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    1 - F.col("n_unique") / F.col("n_tokens"),
                ),
                6,
            ).alias("dup_word_frac"),
        )
        .join(bigram_share, "doc_id", "left")
        .select(
            "doc_id",
            "dup_word_frac",
            F.coalesce("top_bigram_share", F.lit(0.0)).alias(
                "top_bigram_share"
            ),
        )
    )
    # exact-dedup keepers from the same pass: dedup_exact is
    # groupBy(md5(lower(text))).agg(min(doc_id)) — the '<NULL>' key
    # here IS its NULL group, same keeper
    ex = stats.groupBy("content_md5").agg(F.min("doc_id").alias("keep_id"))
    # prefiltered tier, not plain dedup_components_minhash: row-
    # identical output (same oracle SQL registered for both), but
    # exact-clone cliques collapse BEFORE label propagation — 1.75x
    # at the replica-heavy sf5 soak where this subtree dominates the
    # composed audit's wall (SCALE.md)
    comp = dedup_components_prefiltered(spark, sf_dir)
    cont = contamination_ngram_overlap(spark, sf_dir).select(
        "doc_id", "overlap_ppm"
    )

    if thresholds == "calibrated":
        # per-lang p90 ceilings on the SAME integer-ppm grids the
        # quantile query ranks on (stop_ratio is the floor-grid ratio,
        # so stop_ratio*1e6 recovers stop_ppm exactly; dup_ppm is
        # re-derived from n_unique/n_tokens) — computed over the shared
        # stats frame (one corpus pass), expressions unchanged
        qq = F.broadcast(
            _quality_quantiles_of(
                stats.select(
                    "doc_id", "lang", "n_tokens", "n_unique", "n_stop"
                )
            ).select("lang", "stop_ppm_p90", "dup_ppm_p90")
        )
        docs = docs.join(qq, "lang", "left")
        # round, not cast-truncate: stop_ratio is grid/1e6 through two
        # IEEE roundings, so *1e6 can sit one ulp under the integer
        pass_quality = (F.col("n_tokens") >= CURATE_MIN_TOKENS) & (
            F.round(F.col("stop_ratio") * 1_000_000).cast("bigint")
            <= F.col("stop_ppm_p90")
        )
        dup_ppm = F.when(
            F.col("n_tokens") > 0,
            F.expr(
                "1000000 - (n_unique * CAST(1000000 AS BIGINT))"
                " div n_tokens"
            ),
        )  # NULL (not /0 crash under ANSI) for token-less docs
        pass_repetition = F.coalesce(
            dup_ppm <= F.col("dup_ppm_p90"), F.lit(False)
        ) & F.coalesce(
            F.col("top_bigram_share") <= CURATE_MAX_TOP_BIGRAM_SHARE,
            F.lit(False),
        )
    else:
        pass_quality = (F.col("n_tokens") >= CURATE_MIN_TOKENS) & (
            F.col("stop_ratio") <= CURATE_MAX_STOPWORD_RATIO
        )
        pass_repetition = F.coalesce(
            (F.col("dup_word_frac") <= CURATE_MAX_DUP_WORD_FRAC)
            & (F.col("top_bigram_share") <= CURATE_MAX_TOP_BIGRAM_SHARE),
            F.lit(False),
        )
    is_exact_keeper = F.col("doc_id") == F.col("keep_id")
    is_neardup_keeper = F.col("component_id").isNull() | (
        F.col("component_id") == F.col("doc_id")
    )
    is_contaminated = F.coalesce(
        F.col("overlap_ppm") > CURATE_MAX_EVAL_OVERLAP_PPM, F.lit(False)
    )
    return (
        docs.join(qual, "doc_id")
        .join(rep, "doc_id")
        .join(ex, "content_md5")
        .join(comp, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .select(
            "doc_id",
            "split",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            pass_quality.alias("pass_quality"),
            pass_repetition.alias("pass_repetition"),
            is_exact_keeper.alias("is_exact_keeper"),
            is_neardup_keeper.alias("is_neardup_keeper"),
            "overlap_ppm",
            is_contaminated.alias("is_contaminated"),
            (
                pass_quality
                & pass_repetition
                & is_exact_keeper
                & is_neardup_keeper
                & ~is_contaminated
            ).alias("kept"),
        )
    )


def corpus_curate_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-registered twin of corpus_curate(thresholds="calibrated")
    (VERDICT r4 item 5): the same composed curation-ladder audit, with
    the quality/repetition ceilings swapped for CORPUS-RELATIVE
    per-language p90s from corpus_quality_quantiles — each language
    keeps its cleanest 90% by its own stopword/dup-word distribution.
    Registered separately so the calibrated gate path carries its own
    full-oracle driver row instead of only the pytest gate-flip check;
    the oracle composes the quantile CTE into the fixed audit SQL
    constant-for-constant."""
    return corpus_curate(spark, sf_dir, thresholds="calibrated")


def _corpus_curate_sql(thresholds: str = "fixed") -> str:
    from projetbigdata_spark.operators.dedup import (
        COMPONENTS_MINHASH_SQL,
        EXACT_SQL,
    )
    from projetbigdata_spark.operators.repetition import REPETITION_SQL
    from projetbigdata_spark.operators.textstats import QUALITY_SQL

    if thresholds == "calibrated":
        # per-lang p90 ceilings: same expressions as the Spark branch —
        # round() (not cast-truncate) recovers the integer ppm grid
        # from the twice-IEEE-rounded stop_ratio, and dup_ppm is CASE-
        # guarded exactly like the Spark F.when (x // 0 is NULL in
        # DuckDB but div-by-zero aborts under Spark ANSI)
        qq_cte = f"qq AS ({_quality_quantiles_sql()}),"
        qq_join = "LEFT JOIN qq ON qq.lang = d.lang"
        pass_quality = (
            f"(q.n_tokens >= {CURATE_MIN_TOKENS}"
            " AND CAST(round(q.stop_ratio * 1000000) AS BIGINT)"
            " <= qq.stop_ppm_p90)"
        )
        dup_ppm = (
            "CASE WHEN q.n_tokens > 0 THEN 1000000"
            " - (q.n_unique * CAST(1000000 AS BIGINT)) // q.n_tokens END"
        )
        pass_repetition = (
            f"(coalesce({dup_ppm} <= qq.dup_ppm_p90, FALSE)"
            f" AND coalesce(r.top_bigram_share"
            f" <= {CURATE_MAX_TOP_BIGRAM_SHARE}, FALSE))"
        )
    else:
        qq_cte = ""
        qq_join = ""
        pass_quality = (
            f"(q.n_tokens >= {CURATE_MIN_TOKENS}"
            f" AND q.stop_ratio <= {CURATE_MAX_STOPWORD_RATIO})"
        )
        pass_repetition = (
            f"coalesce(r.dup_word_frac <= {CURATE_MAX_DUP_WORD_FRAC}"
            f" AND r.top_bigram_share <= {CURATE_MAX_TOP_BIGRAM_SHARE},"
            " FALSE)"
        )

    return f"""
WITH {qq_cte}
qual AS (SELECT doc_id, n_tokens, n_unique, stop_ratio
         FROM ({QUALITY_SQL})),
rep AS (SELECT doc_id, dup_word_frac, top_bigram_share
        FROM ({REPETITION_SQL})),
ex AS (SELECT coalesce(content_md5, '<NULL>') AS content_md5, keep_id
       FROM ({EXACT_SQL})),
comp AS (SELECT * FROM ({COMPONENTS_MINHASH_SQL})),
cont AS (SELECT doc_id, overlap_ppm FROM ({CONTAMINATION_NGRAM_SQL})),
d AS (
    SELECT doc_id, lang,
           coalesce(md5(lower(text)), '<NULL>') AS content_md5,
           CASE WHEN CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 4)
                     AS BIGINT) % 100 < 80 THEN 'train'
                WHEN CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 4)
                     AS BIGINT) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
)
SELECT d.doc_id, d.split,
       CAST(q.n_tokens AS BIGINT) AS n_tokens,
       {pass_quality} AS pass_quality,
       {pass_repetition} AS pass_repetition,
       (d.doc_id = e.keep_id) AS is_exact_keeper,
       (c.component_id IS NULL OR c.component_id = d.doc_id)
           AS is_neardup_keeper,
       ct.overlap_ppm,
       coalesce(ct.overlap_ppm > {CURATE_MAX_EVAL_OVERLAP_PPM}, FALSE)
           AS is_contaminated,
       ({pass_quality}
        AND {pass_repetition}
        AND d.doc_id = e.keep_id
        AND (c.component_id IS NULL OR c.component_id = d.doc_id)
        AND NOT coalesce(ct.overlap_ppm > {CURATE_MAX_EVAL_OVERLAP_PPM},
                         FALSE)) AS kept
FROM d
JOIN qual q USING (doc_id)
JOIN rep r USING (doc_id)
JOIN ex e USING (content_md5)
LEFT JOIN comp c USING (doc_id)
LEFT JOIN cont ct USING (doc_id)
{qq_join}
"""


def corpus_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE (domain) curation telemetry — the frame behind
    domain-level triage decisions in web-corpus pipelines (CCNet /
    RefinedWeb drop or down-weight whole domains, not documents, when
    a domain is mostly boilerplate): docs, token mass, language
    spread, exact-duplicate rate, and the share of docs passing the
    quality gate, one row per source. The gate here is the
    EXACT-boundary multiplicative form (n_stop*1e6 <= cap*n_tokens —
    no division, so no ANSI /0 guard needed); corpus_curate's fixed
    gate compares the floor-grid ratio, which can differ only for a
    doc sitting exactly on the cap boundary.

    All ratios are exact integer ppm (associative sums + one integral
    divide), so the oracle hashes bit-identically. Scale posture: one
    map-side token/flag projection, then the two count-distinct
    dimensions (lang, content_md5) ride Spark's Expand + two-phase
    distinct agg on the domain key — 2 exchanges of skinny rows
    (PLANS.md), tripled pre-shuffle row count but each row ~50 bytes.
    Domains are the natural partition of a web corpus and the output
    is |domains| rows (small); skewed mega-domains cost hot reducers
    for ONE domain's partial merges, not a fan-out."""
    from projetbigdata_spark.operators.textstats import _SW_ARRAY

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    per_doc = docs.select(
        "source",
        "lang",
        F.md5(F.lower("text")).alias("content_md5"),
        F.size(toks).alias("n_tokens"),
        (
            (F.size(toks) >= CURATE_MIN_TOKENS)
            & (
                F.size(
                    F.filter(
                        toks,
                        lambda t: F.array_contains(F.expr(_SW_ARRAY), t),
                    )
                    # stop_ratio <= cap on the exact 1e6 grid, spelled
                    # multiplication-only so no division NULLs appear:
                    # n_stop*1e6 <= cap*1e6*n_tokens. Both sides widen
                    # to BIGINT before multiplying: size() is int32 and
                    # n*1e6 wraps (or ANSI-aborts) past ~2147 tokens,
                    # and the DuckDB oracle's len() is already BIGINT.
                ).cast("bigint")
                * F.lit(1_000_000)
                <= F.lit(int(CURATE_MAX_STOPWORD_RATIO * 1_000_000))
                * F.size(toks).cast("bigint")
            )
        ).alias("pass_quality"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("content_md5").cast("bigint").alias("n_unique_texts"),
        F.expr(
            "((count(*) - count(DISTINCT content_md5)) "
            "* CAST(1000000 AS BIGINT)) div count(*)"
        ).alias("dup_ppm"),
        F.expr(
            "(sum(CASE WHEN pass_quality THEN 1 ELSE 0 END) "
            "* CAST(1000000 AS BIGINT)) div count(*)"
        ).alias("quality_pass_ppm"),
    )


def _domain_stats_sql() -> str:
    from projetbigdata_spark.functions.text import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    cap = int(CURATE_MAX_STOPWORD_RATIO * 1_000_000)
    return f"""
WITH per_doc AS (
    SELECT source, lang, md5(lower(text)) AS content_md5,
           len(w) AS n_tokens,
           (len(w) >= {CURATE_MIN_TOKENS}
            AND len(list_filter(w, t -> t IN ({sw}))) * 1000000
                <= {cap} * len(w)) AS pass_quality
    FROM (SELECT source, lang, text,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             t -> t <> '') AS w
          FROM documents)
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT content_md5) AS BIGINT) AS n_unique_texts,
       CAST(((count(*) - count(DISTINCT content_md5)) * 1000000)
            // count(*) AS BIGINT) AS dup_ppm,
       CAST((sum(CASE WHEN pass_quality THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS quality_pass_ppm
FROM per_doc
GROUP BY source
"""


def dedup_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-SIZE histogram: for the minhash component
    graph, how many clusters have exactly s members — the audit that
    tells you whether duplication is a few mega-clusters (template
    spam: collapse wins huge) or a long tail of pairs (marginal).
    Isolated docs (no near-dup) are excluded — components carries only
    docs in some cluster, and every cluster there has >= 2 members by
    construction. Output: (cluster_size, n_clusters, n_docs).

    Plan: two skinny hash-aggs over the component labels (|docs in
    clusters| rows, then |clusters| rows) — telemetry-priced at any
    scale."""
    from projetbigdata_spark.operators.dedup import dedup_components_minhash

    tune(spark)
    comp = dedup_components_minhash(spark, sf_dir)
    sizes = comp.groupBy("component_id").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count("*").alias("n_clusters"),
            (F.count("*") * F.col("cluster_size"))
            .cast("bigint")
            .alias("n_docs"),
        )
        .select(
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "n_clusters",
            "n_docs",
        )
    )


def _component_sizes_sql() -> str:
    from projetbigdata_spark.operators.dedup import COMPONENTS_MINHASH_SQL

    return f"""
WITH comp AS (SELECT * FROM ({COMPONENTS_MINHASH_SQL})),
sizes AS (
    SELECT component_id, count(*) AS cluster_size
    FROM comp GROUP BY component_id
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       count(*) AS n_clusters,
       CAST(count(*) * cluster_size AS BIGINT) AS n_docs
FROM sizes
GROUP BY cluster_size
"""


def corpus_quality_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language calibration quantiles for the quality gates —
    corpus-relative thresholds are how CCNet-style filters are
    actually tuned (an absolute stopword cap that's right for English
    is wrong for Chinese): discrete p10/p50/p90 of the per-doc
    stopword ppm and duplicate-word ppm, one row per language.

    Quantiles are percentile_disc semantics computed EXPLICITLY (value
    at row ceil(p*n) of the sort, ties broken by doc_id) because
    Spark's exact `percentile` interpolates while DuckDB's
    quantile_disc doesn't — and the rank index uses pure-integer
    ceilings ((n+9) div 10, (n+1) div 2, (9n+9) div 10): a float
    0.1*n at a boundary (0.1*500 = 50.000000000000007) would ceil to
    the WRONG row in one engine. Metrics are integer-ppm grids, so
    output hashes bit-identically.

    Scale posture: per-doc stats are one map pass; each quantile
    needs a per-language sort — two lang-keyed window shuffles of
    skinny (lang, ppm, doc_id) rows. A mega-language partition sorts
    on one reducer at extreme scale; the deployment relief valve is
    approx_percentile (t-digest, map-side mergeable) once thresholds
    only need ~1% accuracy — this exact spelling is the calibrator
    and the oracle anchor."""
    from projetbigdata_spark.operators.textstats import _SW_ARRAY

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    d = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.size(
            F.filter(toks, lambda t: F.array_contains(F.expr(_SW_ARRAY), t))
        ).alias("n_stop"),
    )
    return _quality_quantiles_of(d)


def _quality_quantiles_of(d: DataFrame) -> DataFrame:
    """Frame-level quantile core over any per-doc (doc_id, lang,
    n_tokens, n_unique, n_stop) counts frame — factored r13 (the
    line_dedup_frame convention) so corpus_curate's calibrated branch
    reuses the audit's ONE shared token-stats pass instead of
    re-tokenizing the corpus; expressions are byte-identical to the
    registered corpus_quality_quantiles."""
    from pyspark.sql.window import Window

    stats = d.where(F.col("n_tokens") > 0).select(
        "doc_id",
        "lang",
        F.expr("(n_stop * CAST(1000000 AS BIGINT)) div n_tokens").alias(
            "stop_ppm"
        ),
        F.expr(
            "1000000 - (n_unique * CAST(1000000 AS BIGINT)) div n_tokens"
        ).alias("dup_ppm"),
    )
    ws = Window.partitionBy("lang").orderBy("stop_ppm", "doc_id")
    wd = Window.partitionBy("lang").orderBy("dup_ppm", "doc_id")
    ranked = stats.select(
        "lang",
        "stop_ppm",
        "dup_ppm",
        F.row_number().over(ws).alias("rn_stop"),
        F.row_number().over(wd).alias("rn_dup"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"),
    )

    def pick(rn: str, col: str, num: int, den: int, add: int) -> Column:
        # value at row ceil(num*n/den) == (num*n + add) div den
        return F.max(
            F.when(
                F.col(rn) == F.expr(f"({num} * n + {add}) div {den}"),
                F.col(col),
            )
        )

    return ranked.groupBy("lang").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        pick("rn_stop", "stop_ppm", 1, 10, 9).alias("stop_ppm_p10"),
        pick("rn_stop", "stop_ppm", 1, 2, 1).alias("stop_ppm_p50"),
        pick("rn_stop", "stop_ppm", 9, 10, 9).alias("stop_ppm_p90"),
        pick("rn_dup", "dup_ppm", 1, 10, 9).alias("dup_ppm_p10"),
        pick("rn_dup", "dup_ppm", 1, 2, 1).alias("dup_ppm_p50"),
        pick("rn_dup", "dup_ppm", 9, 10, 9).alias("dup_ppm_p90"),
    )


def corpus_quality_quantiles_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """corpus_quality_quantiles' SKEW-RELIEF tier made executable
    (r10, VERDICT r9 item 3 — the twin of selection.py's
    corpus_perplexity_buckets_approx): the per-language p10/p50/p90
    thresholds come from a grouped `percentile_approx` sketch instead
    of the exact tier's two per-lang `row_number` windows — map-side
    mergeable partial aggs, NO per-lang sort, so the mega-language
    reducer the exact tier's docstring warns about never exists in
    this plan. Same output contract and columns as the exact tier.

    Oracle note (measured, r10): in the sketch's exact regime
    (per-lang scored count <= PPL_APPROX_ACCURACY) Spark's
    percentile_approx returns EXACTLY the ascending order statistic
    at the RATIONAL rank ceil(p*n) — probed across n up to 5000,
    multi-partition merges, and the float-hazard points (n=2151
    p=0.1 where ceil of the double product would read 51-vs-50
    wrong; n=3334 p=1/3) — i.e. bit-identical to the exact tier's
    integer rank ceilings (n+9) div 10 / (n+1) div 2 / (9n+9) div
    10. So this row's DuckDB oracle IS the exact tier's oracle, and
    the two registered tiers must hash-match each other at fixture
    scale; past the exact regime they diverge by design (rank error
    <= n/accuracy) and the skew study in SCALE.md prices the swap."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    from projetbigdata_spark.operators.selection import (
        PPL_APPROX_ACCURACY,
    )
    from projetbigdata_spark.operators.textstats import _SW_ARRAY

    toks = tokenize("text")
    d = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.size(
            F.filter(toks, lambda t: F.array_contains(F.expr(_SW_ARRAY), t))
        ).alias("n_stop"),
    ).where(F.col("n_tokens") > 0)
    stats = d.select(
        "lang",
        F.expr("(n_stop * CAST(1000000 AS BIGINT)) div n_tokens").alias(
            "stop_ppm"
        ),
        F.expr(
            "1000000 - (n_unique * CAST(1000000 AS BIGINT)) div n_tokens"
        ).alias("dup_ppm"),
    )
    ps = F.array(F.lit(0.1), F.lit(0.5), F.lit(0.9))
    return stats.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.percentile_approx(
            "stop_ppm", ps, F.lit(PPL_APPROX_ACCURACY)
        ).alias("qs"),
        F.percentile_approx(
            "dup_ppm", ps, F.lit(PPL_APPROX_ACCURACY)
        ).alias("qd"),
    ).select(
        "lang",
        "n_docs",
        F.col("qs")[0].alias("stop_ppm_p10"),
        F.col("qs")[1].alias("stop_ppm_p50"),
        F.col("qs")[2].alias("stop_ppm_p90"),
        F.col("qd")[0].alias("dup_ppm_p10"),
        F.col("qd")[1].alias("dup_ppm_p50"),
        F.col("qd")[2].alias("dup_ppm_p90"),
    )


def _quality_quantiles_sql() -> str:
    from projetbigdata_spark.functions.text import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH d AS (
    SELECT doc_id, lang,
           len(w) AS n_tokens,
           len(list_distinct(w)) AS n_unique,
           len(list_filter(w, t -> t IN ({sw}))) AS n_stop
    FROM (SELECT doc_id, lang,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             t -> t <> '') AS w
          FROM documents)
    WHERE len(w) > 0
),
stats AS (
    SELECT doc_id, lang,
           (n_stop * CAST(1000000 AS BIGINT)) // n_tokens AS stop_ppm,
           1000000 - (n_unique * CAST(1000000 AS BIGINT)) // n_tokens
               AS dup_ppm
    FROM d
),
ranked AS (
    SELECT lang, stop_ppm, dup_ppm,
           row_number() OVER (PARTITION BY lang
                              ORDER BY stop_ppm, doc_id) AS rn_stop,
           row_number() OVER (PARTITION BY lang
                              ORDER BY dup_ppm, doc_id) AS rn_dup,
           count(*) OVER (PARTITION BY lang) AS n
    FROM stats
)
SELECT lang,
       CAST(max(n) AS BIGINT) AS n_docs,
       max(CASE WHEN rn_stop = (1 * n + 9) // 10 THEN stop_ppm END)
           AS stop_ppm_p10,
       max(CASE WHEN rn_stop = (1 * n + 1) // 2 THEN stop_ppm END)
           AS stop_ppm_p50,
       max(CASE WHEN rn_stop = (9 * n + 9) // 10 THEN stop_ppm END)
           AS stop_ppm_p90,
       max(CASE WHEN rn_dup = (1 * n + 9) // 10 THEN dup_ppm END)
           AS dup_ppm_p10,
       max(CASE WHEN rn_dup = (1 * n + 1) // 2 THEN dup_ppm END)
           AS dup_ppm_p50,
       max(CASE WHEN rn_dup = (9 * n + 9) // 10 THEN dup_ppm END)
           AS dup_ppm_p90
FROM ranked
GROUP BY lang
"""


def corpus_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-DRIFT telemetry: per source, the total-variation distance
    (in exact ppb) between the source's unigram distribution and the
    whole corpus's — the quantitative form of 'this domain reads
    differently', used to triage which sources need their own quality
    calibration (corpus_quality_quantiles) or a mixture down-weight.
    TV rather than KL/JS because TV needs no ln(): with p in exact ppb
    integers, Σ|p_s − p| is bit-deterministic across engines. tv_ppb
    carries TV's standard ½ factor (TV = ½·L1), so it ranges 0..1e9
    and compares directly against literature thresholds (ADVICE r5 —
    earlier rounds reported the raw L1 sum, 0..2e9).

    The absent-words identity keeps the join bounded: words the source
    never uses contribute p(w) each, so

        2·TV_s = Σ_{w∈s} (|p_s(w) − p(w)| − p(w)) + Σ_all p(w)

    — only (source, word) pairs that EXIST are materialized (the
    natural output of one hash-agg over the token stream), never the
    |vocab| × |sources| dense grid; the corpus term Σp is a 1-row
    broadcast constant (≈1e9 minus floor dust, computed exactly, not
    assumed). At 100 TB the shuffle is the per-source vocabularies —
    the same key-bounded posture as corpus_domain_stats.

    Plan: one (source, token) hash-agg; corpus counts are a rollup of
    it (plan-barriered — consumed by the rollup AND the probe); totals
    ride broadcast 1-row crossJoins; one groupBy(source)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokenize("text")).alias("token"))
    st = (
        tok.groupBy("source", "token")
        .agg(F.count("*").alias("c_s"))
        .localCheckpoint(eager=False)
    )
    corpus = (
        st.groupBy("token")
        .agg(F.sum("c_s").alias("c"))
        .crossJoin(
            F.broadcast(
                st.agg(F.sum("c_s").cast("bigint").alias("t_total"))
            )
        )
        .select(
            "token",
            F.expr(
                "CAST((CAST(c AS DECIMAL(38,0)) * 1000000000)"
                " div t_total AS BIGINT)"
            ).alias("p_ppb"),
        )
        .localCheckpoint(eager=False)
    )
    s_ppb = corpus.agg(F.sum("p_ppb").cast("bigint").alias("s_ppb"))
    src_tot = st.groupBy("source").agg(
        F.sum("c_s").cast("bigint").alias("t_s")
    )
    per_word = (
        st.join(src_tot, "source")
        .join(corpus, "token")
        .select(
            "source",
            "t_s",
            F.expr(
                "abs(CAST((CAST(c_s AS DECIMAL(38,0)) * 1000000000)"
                " div t_s AS BIGINT) - p_ppb) - p_ppb"
            ).alias("term"),
        )
    )
    return (
        per_word.groupBy("source")
        .agg(
            F.max("t_s").alias("n_tokens"),
            F.sum("term").cast("bigint").alias("present_term"),
        )
        .crossJoin(F.broadcast(s_ppb))
        .select(
            "source",
            "n_tokens",
            F.expr("CAST((present_term + s_ppb) div 2 AS BIGINT)").alias(
                "tv_ppb"
            ),
        )
    )


SOURCE_DIVERGENCE_SQL = """
WITH tok AS (
    SELECT source, t AS token
    FROM (SELECT source,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS w
          FROM documents),
         LATERAL unnest(w) AS u(t)
),
st AS (SELECT source, token, count(*) AS c_s FROM tok GROUP BY 1, 2),
corpus AS (
    SELECT token,
           CAST((sum(c_s)::HUGEINT * 1000000000)
                // (SELECT sum(c_s) FROM st) AS BIGINT) AS p_ppb
    FROM st GROUP BY token
),
s_ppb AS (SELECT CAST(sum(p_ppb) AS BIGINT) AS s_ppb FROM corpus),
src_tot AS (SELECT source, CAST(sum(c_s) AS BIGINT) AS t_s
            FROM st GROUP BY source),
per_word AS (
    SELECT st.source, src_tot.t_s,
           abs(CAST((st.c_s::HUGEINT * 1000000000) // src_tot.t_s
                    AS BIGINT) - corpus.p_ppb) - corpus.p_ppb AS term
    FROM st
    JOIN src_tot USING (source)
    JOIN corpus USING (token)
)
SELECT p.source,
       max(p.t_s) AS n_tokens,
       CAST((sum(p.term) + any_value(s.s_ppb)) // 2 AS BIGINT) AS tv_ppb
FROM per_word p, s_ppb s
GROUP BY p.source
"""


def dedup_span_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-level TRAIN decontamination — the surgical variant of
    eval-leak handling: instead of DROPPING a contaminated train doc
    (or, as contamination_ngram_overlap/dedup_contamination do,
    flagging EVAL docs), cut from every TRAIN document exactly the
    SPAN_K-token windows that also occur in ANY val/test document, and
    keep the rewritten doc. This is how production pipelines remove
    benchmark leakage without shrinking the training set (the
    eval-side twin of dedup_span_removal's keep-first rule; same
    machinery as the _incremental probe with the eval slice as the
    frozen index). The split is the shared deterministic md5 split
    (operators/sampling.split_col), so the cut can never drift from
    the assigned eval sets.

    Output: (doc_id, n_tokens, n_cut, text_decontaminated) for every
    TRAIN doc (anchored on the train slice — an uncontaminated or
    <SPAN_K-token doc surfaces uncut). Eval docs are not rewritten
    (benchmarks are immutable by definition).

    Plan/scale posture: identical to dedup_span_removal_incremental —
    ONE corpus tokenize behind a plan barrier, 60-bit hashed span
    keys, the probe is |train spans| semi-joined against the DISTINCT
    eval-span index (|eval| << |train| at deployment: the index side
    is the small one), dup positions fold to ONE int-array row per
    affected doc, the cut is an in-row higher-order filter, and wide
    text rows never transit the span join."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        _split_col().alias("split"),
        tokenize(F.coalesce(F.col("text"), F.lit(""))).alias("w"),
    ).localCheckpoint(eager=False)
    spans = toks.select(
        "doc_id",
        "split",
        F.posexplode(
            F.transform(ngrams(F.col("w"), SPAN_K), lambda g: _gram_key(g))
        ).alias("i0", "k"),
    )
    eval_keys = (
        spans.where(F.col("split") != "train").select("k").distinct()
    )
    dup_starts = (
        spans.where(F.col("split") == "train")
        .join(eval_keys, "k", "semi")
        .groupBy("doc_id")
        .agg(F.collect_list(F.col("i0") + 1).alias("starts"))
    )
    base = (
        toks.where(F.col("split") == "train")
        .join(dup_starts, "doc_id", "left")
        .select(
            "doc_id",
            "w",
            F.coalesce("starts", F.array().cast("array<int>")).alias(
                "starts"
            ),
        )
    )
    kept = F.filter(
        F.col("w"),
        lambda t, i: ~F.exists(
            F.col("starts"),
            lambda s: (s <= i + 1) & (i + 1 < s + F.lit(SPAN_K)),
        ),
    )
    return base.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        (F.size("w") - F.size(kept)).cast("bigint").alias("n_cut"),
        F.array_join(kept, " ").alias("text_decontaminated"),
    )


SPAN_DECONTAMINATE_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           CASE WHEN CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 4)
                     AS BIGINT) % 100 < 80 THEN 'train'
                ELSE 'eval' END AS split,
           list_filter(
               string_split_regex(lower(coalesce(text, '')), '\\s+'),
               t -> t <> '') AS w
    FROM documents
),
spans AS (
    SELECT doc_id, split, i,
           CAST('0x' || substr(md5(
                array_to_string(w[i:i+{SPAN_K - 1}], ' ')), 1, 15)
                AS BIGINT) AS k
    FROM toks, LATERAL unnest(generate_series(1, len(w) - {SPAN_K - 1}))
         AS u(i)
    WHERE len(w) >= {SPAN_K}
),
eval_keys AS (
    SELECT DISTINCT k FROM spans WHERE split <> 'train'
),
dupstarts AS (
    SELECT s.doc_id, list(s.i) AS starts
    FROM spans s SEMI JOIN eval_keys e ON s.k = e.k
    WHERE s.split = 'train'
    GROUP BY s.doc_id
),
base AS (
    SELECT t.doc_id, t.w, coalesce(d.starts, []) AS starts
    FROM toks t LEFT JOIN dupstarts d USING (doc_id)
    WHERE t.split = 'train'
),
kept AS (
    SELECT doc_id, len(w) AS n_tokens,
           [w[p] FOR p IN generate_series(1, len(w))
            IF len(list_filter(starts,
                   s -> s <= p AND p < s + {SPAN_K})) = 0] AS kw
    FROM base
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens - len(kw) AS BIGINT) AS n_cut,
       coalesce(array_to_string(kw, ' '), '') AS text_decontaminated
FROM kept
"""


def corpus_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup (VERDICT r7 item 4) — duplication-aware sampling
    WEIGHTS instead of drops: modern pipelines often keep near-dups
    but down-weight them so each duplicate cluster contributes about
    one document's expected training mass (the reweighting
    alternative to hard dedup). Two duplication signals compose on
    the exact ppm grid:

        base_ppm   = 1e6 div component_size   (minhash components —
                     a k-clone cluster totals ~1 doc of mass)
        weight_ppm = (base_ppm · (1e6 - dup_span_ppm)) div 1e6
                     (span-duplication discount: the fraction of the
                     doc's SPAN_K-windows already seen in earlier
                     docs scales its unique-content mass)

    so an isolated, span-clean doc keeps 1e6; a doc inside a 4-clone
    cluster with 40% duplicated spans keeps 150000. Output:
    (doc_id, component_size, dup_span_ppm, softdedup_weight_ppm) —
    full-corpus anchored, and the weight column drops into the same
    salted-bucket acceptance idiom corpus_dsir_sample uses (the
    examples/corpus_curation.py softdedup_sample composition), or
    multiplies into DSIR weights before resampling. This closes the
    dedup→sampling loop the way corpus_dsir_sample closed
    selection→sampling: the ladder's evidence becomes a sampling
    distribution, not just a drop list.

    Plan: two independently-green subtrees — the component labels
    (pointer-jumping tier, plan-barriered) rolled up to per-component
    sizes (|clusters| rows), probed back per clustered doc; the span
    profile (8-byte span-key streams). Both anchor-left-join onto the
    corpus, so docs outside every cluster take size 1 and docs with
    no spans take discount 0. Integer exactness: base ≤ 1e6,
    discount ≤ 1e6, product ≤ 1e12 — bigint-safe with room."""
    from projetbigdata_spark.operators.dedup import (
        dedup_components_prefiltered,
    )

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    # the exact-collapse component tier: row-identical to
    # dedup_components_minhash (same COMPONENTS_MINHASH_SQL oracle)
    # but clone cliques never reach label propagation — the fast path
    # every composition consumes (corpus_curate's idiom)
    comp = dedup_components_prefiltered(spark, sf_dir).localCheckpoint(
        eager=False
    )
    sizes = comp.groupBy("component_id").agg(
        F.count("*").alias("component_size")
    )
    per_doc_size = comp.join(sizes, "component_id").select(
        "doc_id", "component_size"
    )
    prof = span_profile_of(_spread_input(spark, docs)).select(
        "doc_id", F.coalesce("dup_span_ppm", F.lit(0)).alias("dup_span_ppm")
    )
    return (
        docs.select("doc_id")
        .join(per_doc_size, "doc_id", "left")
        .join(prof, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component_size", F.lit(1))
            .cast("bigint")
            .alias("component_size"),
            F.coalesce("dup_span_ppm", F.lit(0))
            .cast("bigint")
            .alias("dup_span_ppm"),
        )
        .withColumn(
            "softdedup_weight_ppm",
            F.expr(
                "((CAST(1000000 AS BIGINT) div component_size)"
                " * (1000000 - dup_span_ppm)) div 1000000"
            ).cast("bigint"),
        )
    )


def _softdedup_weights_sql() -> str:
    from projetbigdata_spark.operators.dedup import COMPONENTS_MINHASH_SQL

    return f"""
WITH comp AS (SELECT * FROM ({COMPONENTS_MINHASH_SQL})),
sizes AS (
    SELECT component_id, count(*) AS component_size
    FROM comp GROUP BY component_id
),
per_doc_size AS (
    SELECT comp.doc_id, sizes.component_size
    FROM comp JOIN sizes USING (component_id)
),
prof AS (
    SELECT doc_id, coalesce(dup_span_ppm, 0) AS dup_span_ppm
    FROM ({SPAN_PROFILE_SQL})
),
j AS (
    SELECT d.doc_id,
           CAST(coalesce(s.component_size, 1) AS BIGINT)
               AS component_size,
           CAST(coalesce(p.dup_span_ppm, 0) AS BIGINT) AS dup_span_ppm
    FROM documents d
    LEFT JOIN per_doc_size s ON d.doc_id = s.doc_id
    LEFT JOIN prof p ON d.doc_id = p.doc_id
)
SELECT doc_id, component_size, dup_span_ppm,
       CAST(((CAST(1000000 AS BIGINT) // component_size)
             * (1000000 - dup_span_ppm)) // 1000000 AS BIGINT)
           AS softdedup_weight_ppm
FROM j
"""


SOURCE_CAP_PPM = 40_000  # registered dial: the fixtures' 20 sources
# sit at a uniform 50_000 ppm share, so 40_000 trips the thinning
# branch on every source (a cap above 50_000 would leave the dial's
# arithmetic driver-unexercised); deployments pass their policy value.
LANG_CAP_PPM = 200_000  # the lang-keyed twin exercises BOTH branches:
# en holds ~43% of the fixture corpus (thinned), the other four langs
# ~14-15% each (kept whole).


def _key_cap_frame(
    docs: DataFrame, key: str, cap_ppm: int, salt: str
) -> DataFrame:
    """Shared core of corpus_source_cap / corpus_lang_cap: cap any
    single value of `key` at ~cap_ppm of the corpus. Per key value:
    ceiling = ceil(cap_ppm · n_total / 1e6) docs (rounds UP to a whole
    document — the cluster-balance convention, so a nonzero cap never
    zeroes a group); accept_ppm = min(1e6, 1e6·ceiling div key_n);
    verdict realized per doc by the salted-bucket idiom (md5(salt ||
    doc_id) % 1e6 < accept_ppm) — deterministic, append-stable,
    decorrelated from the softdedup/DSIR/mixture/clbal samplers by the
    salt. The ceiling is relative to the INPUT corpus size (one pass,
    no fixpoint renormalization against the post-drop total — the same
    declared one-pass posture as corpus_softdedup_weights).

    Scale: one |keys|-row hash-agg, a broadcast 1-row total, an
    eqNullSafe probe-back join against the ≤|keys|-row size frame
    (NULL keys group and join as their own bucket — the r8
    overlap-audit convention), and a per-row verdict projection. No
    corpus-wide sort at any size."""
    sizes = docs.groupBy(key).agg(
        F.count("*").cast("bigint").alias("key_n")
    )
    tot = sizes.agg(F.sum("key_n").cast("bigint").alias("n_total"))
    s = sizes.withColumnRenamed(key, "_k")
    return (
        docs.select("doc_id", key)
        .join(F.broadcast(s), F.col(key).eqNullSafe(F.col("_k")))
        .drop("_k")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            key,
            F.col("key_n").alias(f"{key}_n"),
            F.expr(
                "LEAST(CAST(1000000 AS BIGINT),"
                f" (1000000 * (({cap_ppm} * n_total + 999999)"
                " div 1000000)) div key_n)"
            ).alias("accept_ppm"),
            F.expr(
                f"CAST(conv(substring(md5(concat('{salt}',"
                " CAST(doc_id AS STRING))), 1, 8), 16, 10)"
                " AS BIGINT) % 1000000"
            ).alias("bucket"),
        )
        .withColumn("selected", F.col("bucket") < F.col("accept_ppm"))
    )


def corpus_source_cap(
    spark: SparkSession, sf_dir: str, cap_ppm: int = SOURCE_CAP_PPM
) -> DataFrame:
    """Per-SOURCE share cap — the RefinedWeb-style "no domain exceeds
    X% of the corpus" verdict (VERDICT r8 item 3): corpus_domain_stats
    MEASURES source skew; this enforces it, thinning every
    over-represented source to ~cap_ppm of the corpus by deterministic
    salted-bucket acceptance. The domain-keyed sibling of
    corpus_cluster_balance_sample (which flattens embedding clusters)
    — same accept_ppm arithmetic, re-keyed to documents.source with a
    policy cap instead of the balanced share. Output: (doc_id, source,
    source_n, accept_ppm, bucket, selected) — composes with
    corpus_curate / the samplers like every verdict frame."""
    tune(spark)
    return _key_cap_frame(
        load_table(spark, sf_dir, "documents"), "source", cap_ppm, "srccap"
    )


def corpus_lang_cap(
    spark: SparkSession, sf_dir: str, cap_ppm: int = LANG_CAP_PPM
) -> DataFrame:
    """corpus_source_cap re-keyed to LANGUAGE — the "cap English
    dominance" rebalancing move of multilingual corpus curation. On
    the fixtures this is the twin that exercises both verdict
    branches: en (~43% share) is thinned toward 20%, the other
    languages keep accept_ppm = 1e6."""
    tune(spark)
    return _key_cap_frame(
        load_table(spark, sf_dir, "documents"), "lang", cap_ppm, "langcap"
    )


def _key_cap_sql(key: str, cap_ppm: int, salt: str) -> str:
    return f"""
WITH sizes AS (
    SELECT {key} AS k, CAST(count(*) AS BIGINT) AS key_n
    FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(key_n) AS BIGINT) AS n_total FROM sizes)
SELECT d.doc_id, d.{key} AS {key}, s.key_n AS {key}_n,
       CAST(LEAST(1000000,
                  (1000000 * (({cap_ppm} * tot.n_total + 999999)
                              // 1000000)) // s.key_n)
            AS BIGINT) AS accept_ppm,
       CAST(CAST('0x' || substr(md5('{salt}'
                                    || CAST(d.doc_id AS VARCHAR)), 1, 8)
                 AS BIGINT) % 1000000 AS BIGINT) AS bucket,
       CAST(CAST('0x' || substr(md5('{salt}'
                                    || CAST(d.doc_id AS VARCHAR)), 1, 8)
                 AS BIGINT) % 1000000
            < LEAST(1000000,
                    (1000000 * (({cap_ppm} * tot.n_total + 999999)
                                // 1000000)) // s.key_n)
            AS BOOLEAN) AS selected
FROM documents d
JOIN sizes s ON d.{key} IS NOT DISTINCT FROM s.k, tot
"""


def corpus_softdedup_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_softdedup_weights made EXECUTABLE — the same
    deterministic salted-bucket acceptance corpus_dsir_sample uses:
    a doc is selected iff its 'softdedup'-salted md5 bucket on the
    1e6 grid falls below its weight, so near-dup clusters contribute
    ~one document of expected training mass, span-duplicated docs are
    thinned by their duplicated fraction, and re-runs / corpus
    appends never flip an existing doc's verdict (hash buckets, not
    rand() — the corpus_sample_assign stability contract; the
    'softdedup' salt decorrelates this decision from the DSIR and
    mixture samplers' buckets). The weight is already a probability
    in ppm (≤ 1e6 by construction), so no Σw renormalization pass is
    needed — acceptance is a pure per-row projection on the weights
    frame. Closes the dedup→sampling loop as REGISTERED surface the
    way corpus_dsir_sample closed selection→sampling."""
    return (
        corpus_softdedup_weights(spark, sf_dir)
        .withColumn(
            "bucket",
            F.expr(
                "CAST(conv(substring(md5(concat('softdedup',"
                " CAST(doc_id AS STRING))), 1, 8), 16, 10)"
                " AS BIGINT) % 1000000"
            ),
        )
        .withColumn(
            "selected", F.col("bucket") < F.col("softdedup_weight_ppm")
        )
    )


def _softdedup_sample_sql() -> str:
    return f"""
WITH w AS ({_softdedup_weights_sql()})
SELECT doc_id, component_size, dup_span_ppm, softdedup_weight_ppm,
       CAST(CAST('0x' || substr(md5('softdedup'
                                    || CAST(doc_id AS VARCHAR)), 1, 8)
                 AS BIGINT) % 1000000 AS BIGINT) AS bucket,
       CAST(CAST('0x' || substr(md5('softdedup'
                                    || CAST(doc_id AS VARCHAR)), 1, 8)
                 AS BIGINT) % 1000000 < softdedup_weight_ppm
            AS BOOLEAN) AS selected
FROM w
"""


# --- C4 cleaning rules (r9 second wave) ---

C4_MIN_LINE_WORDS = 5   # a kept line needs >= this many words
C4_MIN_KEPT_LINES = 3   # a kept DOC needs >= this many surviving lines
# The registered rule set is C4's core recipe (Raffel et al. 2020,
# "Exploring the Limits of Transfer Learning..." §2.2), ASCII reading:
# line-level — ends in terminal punctuation ([.!?"]), >= 5 words, no
# 'javascript'; doc-level — no 'lorem ipsum', no '{', >= 3 kept lines.
# (The original also applies a word blocklist and langdetect; the
# blocklist is a deployment asset and language-ID is text_lang_guess's
# job — compose them, don't bake them in.)


def corpus_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning pass — the most-reused line/doc rule recipe in
    LLM corpus construction, as ONE in-row projection: split each doc
    on newlines, keep lines that end in terminal punctuation, carry >=
    C4_MIN_LINE_WORDS words, and don't mention 'javascript'; rebuild
    the doc from survivors; the doc-level verdict additionally demands
    no 'lorem ipsum', no '{', and >= C4_MIN_KEPT_LINES kept lines.
    Output per doc (full-corpus anchored, NULL text degrades to one
    empty line): (doc_id, n_lines, n_kept_lines, kept, text_clean).

    Scale posture: ZERO joins, zero shuffles — every rule is a
    higher-order in-row fold over the line array, so the operator is
    scan-bound at any corpus size (the cheapest class in the repo,
    same as text_redact_pii). That is the actual reason C4-style rule
    filters run FIRST in real pipelines: they cut the corpus before
    anything that shuffles.

    Fixture honesty (the dedup_lines posture): the parquet fixtures
    are single-line, punctuation-free synthetic text, so EVERY fixture
    line fails the terminal-punctuation rule and the registered row is
    an all-dropped frame — still value-hash-checked, but the rules'
    live behavior is pinned on constructed multi-line corpora incl. a
    written-table Spark<->DuckDB parity run
    (tests/test_curation_ops.py)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    lines = F.split(F.coalesce(F.col("text"), F.lit("")), "\n", -1)
    # \r? before $: lines split from CRLF text end in \r, and Java's
    # $ matches BEFORE a trailing \r (line terminator) while RE2's
    # does not — the explicit \r? keeps both engines on the same
    # verdict (the divergence the multiline golden lane caught on the
    # sibling Gopher ellipsis rule)
    keep_line = lambda l: (  # noqa: E731
        l.rlike('[.!?"]\r?$')
        & (
            F.size(F.filter(F.split(l, "\\s+"), lambda w: w != ""))
            >= C4_MIN_LINE_WORDS
        )
        & ~F.lower(l).contains("javascript")
    )
    kept = F.filter(lines, keep_line)
    return docs.select(
        "doc_id",
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept_lines"),
        (
            (F.size(kept) >= C4_MIN_KEPT_LINES)
            & ~F.lower(F.coalesce(F.col("text"), F.lit(""))).contains(
                "lorem ipsum"
            )
            & ~F.coalesce(F.col("text"), F.lit("")).contains("{")
        ).alias("kept"),
        F.array_join(kept, "\n").alias("text_clean"),
    )


C4_CLEAN_SQL = f"""
WITH base AS (
    SELECT doc_id,
           coalesce(text, '') AS t,
           string_split(coalesce(text, ''), chr(10)) AS lines
    FROM documents
),
f AS (
    SELECT doc_id, t, lines,
           list_filter(lines, l ->
               regexp_matches(l, '[.!?"]\\r?$')
               AND len(list_filter(string_split_regex(l, '\\s+'),
                                   w -> w <> '')) >= {C4_MIN_LINE_WORDS}
               AND NOT contains(lower(l), 'javascript')) AS kept_lines
    FROM base
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept_lines) AS BIGINT) AS n_kept_lines,
       (len(kept_lines) >= {C4_MIN_KEPT_LINES}
        AND NOT contains(lower(t), 'lorem ipsum')
        AND NOT contains(t, '{{')) AS kept,
       coalesce(array_to_string(kept_lines, chr(10)), '')
           AS text_clean
FROM f
"""



QUERIES = {
    "corpus_curate": corpus_curate,
    "corpus_softdedup_weights": corpus_softdedup_weights,
    "corpus_softdedup_sample": corpus_softdedup_sample,
    "corpus_curate_calibrated": corpus_curate_calibrated,
    "corpus_domain_stats": corpus_domain_stats,
    "corpus_source_cap": corpus_source_cap,
    "corpus_lang_cap": corpus_lang_cap,
    "corpus_source_divergence": corpus_source_divergence,
    "corpus_quality_quantiles": corpus_quality_quantiles,
    "corpus_quality_quantiles_approx": corpus_quality_quantiles_approx,
    "dedup_component_sizes": dedup_component_sizes,
    "contamination_ngram_overlap": contamination_ngram_overlap,
    "text_unigram_freq_score": text_unigram_freq_score,
    "dedup_span_profile": dedup_span_profile,
    "dedup_span_removal": dedup_span_removal,
    "dedup_lines": dedup_lines,
    "dedup_lines_within": dedup_lines_within,
    "dedup_lines_incremental": dedup_lines_incremental,
    "text_normalize": text_normalize,
    "dedup_exact_normalized": dedup_exact_normalized,
    "dedup_span_removal_incremental": dedup_span_removal_incremental,
    "dedup_span_decontaminate": dedup_span_decontaminate,
    "dedup_keep_canonical": dedup_keep_canonical,
    "text_redact_pii": text_redact_pii,
    "corpus_c4_clean": corpus_c4_clean,
}

ORACLE_SQL = {
    "corpus_curate": _corpus_curate_sql(),
    "corpus_softdedup_weights": _softdedup_weights_sql(),
    "corpus_softdedup_sample": _softdedup_sample_sql(),
    "corpus_curate_calibrated": _corpus_curate_sql("calibrated"),
    "corpus_domain_stats": _domain_stats_sql(),
    "corpus_source_cap": _key_cap_sql("source", SOURCE_CAP_PPM, "srccap"),
    "corpus_lang_cap": _key_cap_sql("lang", LANG_CAP_PPM, "langcap"),
    "corpus_source_divergence": SOURCE_DIVERGENCE_SQL,
    "corpus_quality_quantiles": _quality_quantiles_sql(),
    # the sketch tier's exact-regime oracle IS the exact tier's SQL
    # (measured rational-ceil rank identity — see the docstring)
    "corpus_quality_quantiles_approx": _quality_quantiles_sql(),
    "dedup_component_sizes": _component_sizes_sql(),
    "contamination_ngram_overlap": CONTAMINATION_NGRAM_SQL,
    "text_unigram_freq_score": UNIGRAM_FREQ_SQL,
    "dedup_span_profile": SPAN_PROFILE_SQL,
    "dedup_span_removal": SPAN_REMOVAL_SQL,
    "dedup_lines": DEDUP_LINES_SQL,
    "dedup_lines_within": DEDUP_LINES_WITHIN_SQL,
    "dedup_lines_incremental": DEDUP_LINES_INCR_SQL,
    "text_normalize": _text_normalize_sql(),
    "dedup_exact_normalized": _dedup_exact_normalized_sql(),
    "dedup_span_removal_incremental": SPAN_REMOVAL_INCR_SQL,
    "dedup_span_decontaminate": SPAN_DECONTAMINATE_SQL,
    "dedup_keep_canonical": _keep_canonical_sql(),
    "text_redact_pii": REDACT_SQL,
    "corpus_c4_clean": C4_CLEAN_SQL,
}
