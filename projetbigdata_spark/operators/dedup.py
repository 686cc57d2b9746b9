"""Deduplication operator family over `documents` — exact, shingle
Jaccard, MinHash/LSH, SimHash. Core LLM-pretraining-pipeline ops.

Scale design (the whole point of each variant):

  exact      — one hash-agg on md5(normalized text): shuffle carries
               |distinct texts|, embarrassing at any scale.
  jaccard    — candidate pairs via shingle inverted index with a
               document-frequency cap on shingles (the classic "drop
               ubiquitous shingles" trick): pair count stays near-linear
               instead of quadratic. Exact verify only on candidates.
  minhash    — per-doc signatures + banded buckets: at 100 TB you join
               on (band, bucket), never all-pairs. The signature/bucket
               computation is pure string expressions (portable min-hash:
               lexicographic min of seeded md5s), fully oracle-checked;
               the ml MinHashLSH estimator variant lives in ml/.
  simhash    — 32-bit signature via per-token md5 bit votes; hamming
               neighbors found by bucketing on signature prefixes.

Everything below is built-in expressions — explode / groupBy / join —
no UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projetbigdata_spark.functions.text import tokenize
from projetbigdata_spark.operators.similarity import (
    NEARDUP_SQL as _SIM_NEARDUP_SQL,
)
from projetbigdata_spark.operators.similarity import (
    SEMDEDUP_SQL as _SEMDEDUP_SQL,
)
from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_documents_parallel

# Shingles occurring in more than this many documents are dropped from
# candidate generation (they pair everything with everything). Mirrored
# in the oracle SQL.
SHINGLE_DF_CAP = 100
JACCARD_THRESHOLD = 0.3
MINHASH_SEEDS = 16
# 5 bands x 3 slots (h15 reserved for the estimate only): the banding
# threshold (1/b)^(1/r) ~= 0.58 is aligned with the 0.5 estimate gate —
# 2-slot bands put the threshold at ~0.35, which at ~12M unrelated
# short-doc pairs (J~0.03-0.05) admitted 46k-120k chance candidates;
# 3-slot bands cut that to ~2k while keeping >=49% per-pair candidate
# recall at J=0.5 (88% at J=0.7, ~100% for true replicas).
MINHASH_BANDS = 5
MINHASH_BAND_WIDTH = 3
# Horner fold multiplier for packing a band's slots into one bigint
# bucket (h < P ~ 2^31, h*K + h' < 2^62; re-reduced mod P each step)
MINHASH_BUCKET_K = 1_000_003

# Universal-hash minhash family (the scheme Spark's own MinHashLSH
# uses: h_i(x) = (a_i*x + b_i) mod P over ONE base hash per shingle,
# instead of i full digests per shingle). P = 2^31 - 1 (prime); a_i*x
# < 2^62 so everything stays in exact bigint arithmetic — portable to
# any engine with 64-bit integers. The base hash is the first 15 hex
# digits of md5 (60 bits) reduced mod P.
#
# 16 slots, not 8: the fixture documents are SHORT (~54 tokens), so at
# corpus scale the number of unrelated pairs is enormous relative to
# per-pair agreement odds — with 8 slots, est >= 0.5 means 4 chance
# agreements at J~0.05, whose per-pair probability (~1e-4) times ~12M
# pairs yielded thousands of false edges that chained dedup components
# into 15-round blobs. 8-of-16 agreement pushes the chance-edge count
# to ~zero while true replicas (J~1) still agree on ~all slots. The
# marginal cost is 8 extra integer mins in the same hash-agg — the
# md5 base hash is computed once per shingle regardless.
MINHASH_P = 2_147_483_647
MINHASH_A = (
    1103515245, 1229782938, 1649267441, 1503578229,
    1431655765, 1846930886, 1013904223, 1779033703,
    1597334677, 2038074743, 1865811235, 1291394886,
    1737623855, 2011938745, 1104001825, 1963309425,
)
MINHASH_B = (
    12345, 362436069, 521288629, 88675123,
    5783321, 6615241, 982451653, 1717986918,
    1013904242, 1856948581, 45584421, 1170746341,
    776531419, 99762353, 1958374283, 571402721,
)


def _sh_base_hash() -> "F.Column":
    """Shingle string -> base integer hash in [0, P)."""
    return (
        F.conv(F.expr("substring(md5(sh), 1, 15)"), 16, 10).cast("bigint")
        % MINHASH_P
    )


def _sig_aggs() -> list:
    """The MINHASH_SEEDS per-doc min-hash aggregates over the base
    hash column x."""
    return [
        F.min((F.lit(MINHASH_A[i]) * F.col("x") + F.lit(MINHASH_B[i])) % MINHASH_P)
        .alias(f"h{i}")
        for i in range(MINHASH_SEEDS)
    ]


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word-bigram shingles per document.

    The ngram expression appears exactly ONCE, as the Generate input.
    Referencing it from a second projection (e.g. ``size(shs)`` next to
    ``explode(shs)``) lets CollapseProject hoist it above the Generate,
    re-evaluating the whole tokenize+ngram pipeline per exploded row —
    a measured 25x slowdown. Per-doc counts are re-derived post-explode
    instead (see dedup_jaccard_pairs).

    The repartition spreads the ngram compute across all cores: the
    driver's single-file parquet gives a 1-task scan locally, and at
    100 TB the same explicit repartition bounds per-task explode width.
    """
    docs = load_documents_parallel(spark, sf_dir)
    from projetbigdata_spark.functions.text import ngrams

    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(ngrams(tokenize("text"), 2))).alias("sh"),
    )


_POSTINGS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _hashed_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skinny posting list (doc_id, h): shingles hashed to 8-byte keys.

    Strings never shuffle — xxhash64 right after the explode. Persisted
    (memory-and-disk) because three downstream consumers (per-doc sizes,
    shingle df, the self-join probe) would otherwise each re-run the
    tokenize+ngram scan; at scale, materializing the postings once is
    the standard inverted-index build. Collision risk vs the string-
    keyed oracle is ~n^2/2^65 — negligible at any tested sf.
    """
    # keyed by applicationId, not id(spark): a stopped session's id()
    # can be reused by a new session object at the same address, which
    # would hand back DataFrames bound to the dead SparkContext
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _POSTINGS_CACHE:
        from pyspark import StorageLevel

        # evict entries from other (stopped) applications: their
        # DataFrames are bound to dead contexts and can never be
        # served again, so the cache would otherwise only grow across
        # session restarts in one process (review finding r3)
        for stale in [k for k in _POSTINGS_CACHE if k[0] != key[0]]:
            del _POSTINGS_CACHE[stale]
        _POSTINGS_CACHE[key] = (
            _shingles(spark, sf_dir)
            .select("doc_id", F.xxhash64("sh").alias("h"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    return _POSTINGS_CACHE[key]


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest doc_id —
    the deterministic spelling of dropDuplicates(['text'])."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    return (
        docs.select("doc_id", F.md5(F.lower("text")).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


EXACT_SQL = """
SELECT md5(lower(text)) AS content_md5,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


def suggest_df_cap(
    spark: SparkSession, sf_dir: str, posting_budget: float = 0.5
) -> int:
    """Adaptive df-cap (NEXT r3 item 1): the largest power-of-2 df
    bucket ceiling such that shingles AT OR BELOW it carry at most
    `posting_budget` of the total posting mass — i.e. the cap sits at
    the posting-mass knee of the corpus's df histogram
    (corpus_shingle_stats) instead of an absolute constant. On Zipfian
    natural corpora this keeps the long rare tail (most distinct
    shingles, bounded join fan-out) and drops only the ubiquitous
    head; on the synthetic fixtures — whose tiny vocabulary puts
    nearly all mass in the head — it degrades gracefully to a small
    cap. Driver-side: consumes the ~20-row histogram, returns an int
    for the df_cap parameter below."""
    hist = sorted(
        corpus_shingle_stats(spark, sf_dir).collect(),
        key=lambda r: r.df_bucket_pow2,
    )
    total = sum(r.n_postings for r in hist)
    cum = 0
    # floor at bucket 2 (df <= 3): the index keeps 2 <= df <= cap, so
    # any smaller cap filters the index empty and the dedup silently
    # reports zero pairs — even when the first bucket alone already
    # blows the budget (head-heavy corpora), a minimal usable index
    # beats an empty one (review finding r3)
    cap_bucket = 2
    for r in hist:
        if (cum + r.n_postings) > posting_budget * total:
            break
        cum += r.n_postings
        cap_bucket = max(cap_bucket, r.df_bucket_pow2)
    return (1 << cap_bucket) - 1  # bucket b holds df in [2^(b-1), 2^b - 1]


def dedup_jaccard_pairs(
    spark: SparkSession, sf_dir: str, df_cap: int | str = SHINGLE_DF_CAP
) -> DataFrame:
    """Near-dup pairs by df-CAPPED bigram-shingle Jaccard >= 0.3.

    The emitted `jaccard` is a LOWER BOUND on the true shingle
    Jaccard, not the exact value: the intersection counts only
    shingles with 2 <= df <= cap (the index drops ubiquitous
    shingles), while the union uses full per-doc sizes — a pair whose
    overlap is mostly hot shingles scores low here by design (the
    oracle mirrors the same formula). Consumers needing the EXACT
    full-posting Jaccard use dedup_jaccard_verified, which recomputes
    it on LSH candidates without the cap.

    Plan (one corpus scan via the persisted posting list):
      1. postings (doc_id, h): shingles hashed to 8-byte keys — strings
         never shuffle (see _hashed_shingles);
      2. per-doc sizes and shingle document-frequency are two skinny
         hash-aggs over the same postings; keep 2 <= df <= cap (df=1
         can't pair, df>cap pairs everything with everything);
      3. self-join on h + doc_a < doc_b, count intersections, then join
         the per-doc sizes onto the (small) pair set — AQE broadcasts
         them at low sf, falls back to shuffle join at scale.
    Jaccard stays exact integer arithmetic until one final division ->
    bit-identical across engines. Hash collisions (2^-64-scale) are the
    only divergence risk vs the string-keyed oracle.

    df_cap is the index-selectivity dial: the registered query keeps
    the oracle-mirrored absolute cap; deployments pass df_cap="auto"
    (NEXT r3 item 3) to place the cap at the corpus's posting-mass
    knee via suggest_df_cap — one extra ~20-row histogram agg before
    planning, corpus-adaptive selectivity after (SCALE.md §Dedup) —
    or any explicit int.
    """
    tune(spark)
    if df_cap == "auto":
        df_cap = suggest_df_cap(spark, sf_dir)
    exploded = _hashed_shingles(spark, sf_dir)
    sizes = exploded.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    rare = (
        exploded.groupBy("h")
        .agg(F.count("*").alias("df"))
        # df=1 can't produce a pair; df>cap pairs everything with everything
        .where((F.col("df") >= 2) & (F.col("df") <= df_cap))
        .select("h")
    )
    # materialize the df-capped index PRE-PARTITIONED on h: the self-
    # join's two sides would otherwise each plan their own exchange of
    # the same rows (ReuseExchange can't canonicalize the aliased
    # branches — same lesson as text_tfidf_top, SCALE.md), so the
    # biggest shuffle in the query ran twice. One repartition, zero
    # join-side exchanges.
    indexed = (
        exploded.join(rare, "h").repartition("h").localCheckpoint(eager=False)
    )
    a = indexed.alias("a")
    b = indexed.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    union_sz = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    micros = (F.col("n_inter") * 1_000_000).cast("bigint")
    jac = (micros - micros % union_sz) / union_sz / F.lit(1_000_000.0)
    return (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


JACCARD_SQL = f"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS w
    FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] AS sh
    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
rare AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= {SHINGLE_DF_CAP}),
idx AS (SELECT sh.* FROM sh JOIN rare USING (sh)),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
jacc AS (
    SELECT doc_a, doc_b,
           ((n_inter * 1000000) // (sa.n_sh + sb.n_sh - n_inter))
               / 1000000.0 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, jaccard FROM jacc
WHERE jaccard >= {JACCARD_THRESHOLD}
"""


CONTAINMENT_PPM = 500_000  # keep pairs where either direction >= 0.5


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by df-capped shingle CONTAINMENT — the asymmetric
    complement to dedup_jaccard_pairs: C(a→b) = |A∩B| / |A| catches a
    short document embedded verbatim inside a long one (quote farms,
    boilerplate-wrapped reposts), which symmetric Jaccard dilutes below
    threshold because the union is dominated by the long side. Emits
    one row per unordered pair with BOTH directions in exact ppm; a
    pair survives when either direction clears CONTAINMENT_PPM.

    Like the Jaccard tier, the intersection counts only indexed
    (2 <= df <= cap) shingles while the per-doc sizes are full — so
    each direction is a LOWER BOUND and the oracle mirrors the same
    formula. Plan is dedup_jaccard_pairs' exactly (one persisted
    posting scan, two skinny hash-aggs, pre-partitioned self-join on
    the 8-byte shingle key); only the final arithmetic differs, so the
    scale posture is inherited wholesale."""
    tune(spark)
    exploded = _hashed_shingles(spark, sf_dir)
    sizes = exploded.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    rare = (
        exploded.groupBy("h")
        .agg(F.count("*").alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= SHINGLE_DF_CAP))
        .select("h")
    )
    indexed = (
        exploded.join(rare, "h").repartition("h").localCheckpoint(eager=False)
    )
    a = indexed.alias("a")
    b = indexed.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sz_a = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
    )
    sz_b = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
    )
    cont_a = F.expr("n_inter * CAST(1000000 AS BIGINT) div n_a")
    cont_b = F.expr("n_inter * CAST(1000000 AS BIGINT) div n_b")
    return (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            cont_a.alias("cont_a_ppm"),
            cont_b.alias("cont_b_ppm"),
        )
        .where(
            (F.col("cont_a_ppm") >= CONTAINMENT_PPM)
            | (F.col("cont_b_ppm") >= CONTAINMENT_PPM)
        )
    )


CONTAINMENT_SQL = f"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS w
    FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] AS sh
    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
rare AS (SELECT sh FROM sh GROUP BY sh
         HAVING count(*) >= 2 AND count(*) <= {SHINGLE_DF_CAP}),
idx AS (SELECT sh.* FROM sh JOIN rare USING (sh)),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
cont AS (
    SELECT doc_a, doc_b,
           n_inter * CAST(1000000 AS BIGINT) // sa.n_sh AS cont_a_ppm,
           n_inter * CAST(1000000 AS BIGINT) // sb.n_sh AS cont_b_ppm
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, cont_a_ppm, cont_b_ppm FROM cont
WHERE cont_a_ppm >= {CONTAINMENT_PPM} OR cont_b_ppm >= {CONTAINMENT_PPM}
"""


VERIFIED_THRESHOLD = 0.5


def dedup_jaccard_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-then-verify near-dup pairs: banded MinHash LSH for
    candidate GENERATION, exact full-posting Jaccard for the DECISION.

    This is the tier that survives templated corpora where
    dedup_jaccard_pairs' rare-shingle index goes blind: when every
    shared shingle is hot (df > cap), the df-capped self-join yields no
    pairs at all (measured at sf0.1: 0 exact pairs vs 256 true pairs at
    J >= 0.7), while LSH buckets still collide on signature agreement.
    The verification join touches ONLY candidate pairs (hundreds, not
    the 10M+ brute-force pair space at sf0.1), each expanded to its
    full posting list — no df cap, so the exact Jaccard is over the
    complete shingle sets. Recall is bounded by the LSH s-curve
    (5 bands x 3 rows: ~0.88 at J=0.7, ~0.9998 at J=0.9), precision is
    exact. Integer-exact division as in dedup_jaccard_pairs.
    """
    tune(spark)
    # materialized PRE-PARTITIONED on the join key (same ReuseExchange
    # lesson as dedup_jaccard_pairs): the bucket self-join reads both
    # sides from the checkpoint partitioning, no per-side exchange
    buckets = (
        dedup_minhash_buckets(spark, sf_dir)
        .repartition("band", "bucket")
        .localCheckpoint()
    )
    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    postings = _hashed_shingles(spark, sf_dir)
    sizes = postings.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pa = postings.select(F.col("doc_id").alias("doc_a"), "h")
    pb = postings.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        cand.join(pa, "doc_a")
        .join(pb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    union_sz = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    micros = (F.col("n_inter") * 1_000_000).cast("bigint")
    jac = (micros - micros % union_sz) / union_sz / F.lit(1_000_000.0)
    return (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= VERIFIED_THRESHOLD)
    )


def signatures_of(docs: DataFrame) -> DataFrame:
    """(doc_id, h0..h15) minhash signatures for an arbitrary
    (doc_id, text) frame — the per-doc computation is independent of
    the rest of the corpus, so batch ingest (dedup_incremental) and
    streaming micro-batches (streaming/jobs.incremental_dedup_stream)
    share this exact expression chain."""
    from projetbigdata_spark.functions.text import ngrams

    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(ngrams(tokenize("text"), 2))).alias("sh"),
    )
    return (
        sh.select("doc_id", _sh_base_hash().alias("x"))
        .groupBy("doc_id")
        .agg(*_sig_aggs())
    )


_SIG_CACHE: dict[tuple[str, str], DataFrame] = {}


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h0..h15): per-doc minhash signature. ONE md5 per shingle
    (reduced to a bigint right after the explode — strings never reach
    the shuffle), then 16 affine universal hashes folded into the same
    hash-agg. Replaces the previous 8-digests-per-shingle family:
    measured ~2x cheaper at sf0.1 with identical LSH guarantees.

    Persisted per (applicationId, sf_dir) — the _POSTINGS_CACHE idiom
    (r9): a multi-tier dedup run (buckets → estimate → components →
    cap report) re-derived this exact frame from the raw corpus per
    query; the signature build IS the corpus pass, so materializing it
    once is the `.cache()` S8 posture applied where it pays most
    (measured: the estimate→components→report sf5 sequence drops from
    3 full shingle scans to 1). Callers' localCheckpoints now
    materialize FROM the cache, so registered plan shapes are
    unchanged-or-smaller. 17 skinny bigint columns per doc — ~150 B/doc,
    trivially memory-resident at any tested scale and spillable at
    100 TB via MEMORY_AND_DISK."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SIG_CACHE:
        from pyspark import StorageLevel

        # evict frames bound to stopped applications (they can never
        # be served again — the _POSTINGS_CACHE review finding r3)
        for stale in [k for k in _SIG_CACHE if k[0] != key[0]]:
            del _SIG_CACHE[stale]
        sh = _shingles(spark, sf_dir)
        _SIG_CACHE[key] = (
            sh.select("doc_id", _sh_base_hash().alias("x"))
            .groupBy("doc_id")
            .agg(*_sig_aggs())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    return _SIG_CACHE[key]


def _band_explode(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, bucket): MINHASH_BANDS bands x MINHASH_BAND_WIDTH
    signature slots; the bucket packs the band's slots into one bigint
    via modular Horner fold (v = (v*K + h) % P each step — v*K < 2^51,
    exact in 64-bit)."""
    bands = []
    for b in range(MINHASH_BANDS):
        slots = [b * MINHASH_BAND_WIDTH + j for j in range(MINHASH_BAND_WIDTH)]
        bucket = F.col(f"h{slots[0]}")
        for s in slots[1:]:
            bucket = (bucket * MINHASH_BUCKET_K + F.col(f"h{s}")) % MINHASH_P
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                bucket.alias("bucket"),
            )
        )
    return sigs.select("doc_id", F.explode(F.array(*bands)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def dedup_minhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature, banded into LSH buckets.

    Portable minhash via universal hashing (see _signatures): exact
    bigint arithmetic in both engines. Docs sharing (band, bucket) are
    near-dup candidates (joined in dedup tests; the candidate join
    itself is the standard groupBy-band-bucket at scale).
    """
    tune(spark)
    return _band_explode(_signatures(spark, sf_dir))


_minhash_sig_cols = ",\n           ".join(
    f"min(({MINHASH_A[i]} * x + {MINHASH_B[i]}) % {MINHASH_P}) AS h{i}"
    for i in range(MINHASH_SEEDS)
)
def _sql_bucket(b: int) -> str:
    """Modular Horner fold of band b's slots — textually identical
    arithmetic to _band_explode."""
    slots = [b * MINHASH_BAND_WIDTH + j for j in range(MINHASH_BAND_WIDTH)]
    expr = f"h{slots[0]}"
    for s in slots[1:]:
        expr = f"(({expr}) * {MINHASH_BUCKET_K} + h{s}) % {MINHASH_P}"
    return expr


_minhash_band_rows = "\n    UNION ALL\n".join(
    f"SELECT doc_id, {b} AS band, {_sql_bucket(b)} AS bucket FROM sigs"
    for b in range(MINHASH_BANDS)
)
# shared CTE prefix: tokenize -> distinct bigram shingles -> base hash
_minhash_base_ctes = f"""toks AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS w
    FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] AS sh
    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
),
hx AS (
    SELECT doc_id,
           CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) % {MINHASH_P} AS x
    FROM sh
),
sigs AS (
    SELECT doc_id,
           {_minhash_sig_cols}
    FROM hx GROUP BY doc_id
)"""

MINHASH_SQL = f"""
WITH {_minhash_base_ctes}
{_minhash_band_rows}
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document from per-token md5 bit votes.

    Each distinct token hashes to 8 hex digits (32 bits); bit j votes
    +1/-1 on signature bit j; the sign of the vote sum sets the bit.
    Near-dup candidates at scale: group on the 16-bit prefix
    (hamming-ball bucketing); emitted here per doc with its prefix.

    Computed as ONE hash-agg with 32 vote-sum expressions over the
    integer token hash (bit j of the signature is bit 31-j of h32 —
    the hex string is MSB-first): no 32x row explode, one shuffle
    total, and the 32 sums combine map-side. Previous long-form
    spelling (explode 32 positions -> groupBy(doc,bit) -> groupBy(doc))
    shuffled 32x the rows twice for the same integer result — the
    oracle keeps that spelling, so this plan change is value-checked."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokenize("text"))).alias("token")
    )
    h32 = F.expr(
        "CAST(conv(substring(md5(token), 1, 8), 16, 10) AS BIGINT)"
    )
    hashed = toks.select("doc_id", h32.alias("h32"))
    votes = [
        F.sum(
            F.expr(
                f"CASE WHEN shiftright(h32, {31 - j}) % 2 = 1"
                " THEN 1 ELSE -1 END"
            )
        ).alias(f"v{j}")
        for j in range(32)
    ]
    sig = hashed.groupBy("doc_id").agg(*votes)
    simhash = None
    for j in range(32):
        bit = F.when(
            F.col(f"v{j}") > 0, F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        simhash = bit if simhash is None else simhash + bit
    return sig.select(
        "doc_id",
        simhash.alias("simhash32"),
    ).select(
        "doc_id",
        "simhash32",
        (F.col("simhash32") - F.col("simhash32") % 65536).alias("prefix_bucket"),
    )


SIMHASH_SQL = """
WITH toks AS (
    SELECT DISTINCT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> t <> '')) AS token
    FROM documents
),
hashed AS (
    SELECT doc_id, substr(md5(token), 1, 8) AS h8 FROM toks
),
bits AS (
    SELECT doc_id, bit,
           (strpos('0123456789abcdef',
                   substr(h8, (bit // 4) + 1, 1)) - 1) AS digit
    FROM hashed, LATERAL (SELECT unnest(generate_series(0, 31)) AS bit)
),
votes AS (
    SELECT doc_id, bit,
           CASE WHEN (digit // (CASE bit % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                                WHEN 2 THEN 2 ELSE 1 END)) % 2 = 1
                THEN 1 ELSE -1 END AS vote
    FROM bits
),
persig AS (
    SELECT doc_id, bit, sum(vote) AS v FROM votes GROUP BY 1, 2
),
sig AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
                         ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash32
    FROM persig GROUP BY doc_id
)
SELECT doc_id, simhash32,
       simhash32 - simhash32 % 65536 AS prefix_bucket
FROM sig
"""


def dedup_minhash_estimate(
    spark: SparkSession,
    sf_dir: str,
    bucket_cap: int | str | None = None,
) -> DataFrame:
    """The MinHash decision step: for candidate pairs sharing an LSH
    bucket, estimate Jaccard as the fraction of agreeing signature
    slots. This is the full minhash dedup flow end-to-end — signatures
    -> banded buckets -> candidate join on (band, bucket) -> signature
    agreement — with NO exact re-verification pass, which is precisely
    how you dedup when re-tokenizing candidates is too expensive at
    scale. Estimate resolution is 1/16 (16 seeds).

    bucket_cap is the pair-emission dial (VERDICT r8 item 2, default
    off = registered/oracle semantics): a bucket of size m emits
    m(m-1)/2 candidate pairs, so one degenerate hot bucket — replica
    floods, boilerplate-dominated crawls — is a quadratic wall all by
    itself (the sf10 soak's ~quadratic tail decade). With a cap, each
    (band, bucket) keeps only its `cap` smallest doc_ids before the
    self-join, bounding emission at cap(cap-1)/2 per bucket. Like
    df_cap this BOUNDS RECALL: a pair collides only via buckets where
    both docs survive the cap (other bands still catch it — replicas
    agree in EVERY band, so a true clique needs just one surviving
    window). Pass "auto" for suggest_bucket_cap's tail-quantile
    ceiling; dedup_bucket_cap_report prices the drop before you opt
    in."""
    tune(spark)
    if bucket_cap == "auto":
        bucket_cap = suggest_bucket_cap(spark, sf_dir)
    # one shingle scan for the whole query: the signature aggregate is
    # checkpointed and reused by the candidate side (via bands) and
    # both agreement sides
    sigs = _signatures(spark, sf_dir).localCheckpoint()
    return _estimate_edges(sigs, bucket_cap=bucket_cap)


def _estimate_edges(
    sigs: DataFrame, bucket_cap: int | None = None
) -> DataFrame:
    """Banded-LSH candidate join + signature agreement over an already
    materialized signature frame -> (doc_a, doc_b, jaccard_est). The
    core of dedup_minhash_estimate, reusable on a signature SUBSET
    (dedup_components_prefiltered runs it on exact-group
    representatives only)."""
    # band-exploded buckets pre-partitioned on the join key so the
    # self-join reads both sides from one materialization (no per-side
    # exchange — ReuseExchange can't dedupe the aliased branches)
    banded = _band_explode(sigs).repartition("band", "bucket")
    if bucket_cap is not None:
        # keep-smallest-doc_ids is deterministic and engine-portable
        # (row_number over a total order); the window rides the
        # repartition above — a sort per partition, no extra exchange.
        # Applied BEFORE the checkpoint so the capped frame is what
        # materializes once for both self-join sides.
        w = Window.partitionBy("band", "bucket").orderBy("doc_id")
        banded = (
            banded.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= int(bucket_cap))
            .drop("rn")
        )
    buckets = banded.localCheckpoint(eager=False)
    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(MINHASH_SEEDS)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(MINHASH_SEEDS)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(MINHASH_SEEDS)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (agree / F.lit(float(MINHASH_SEEDS))).alias("jaccard_est"),
        )
    )


_est_agree = " + ".join(
    f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(MINHASH_SEEDS)
)

MINHASH_EST_SQL = f"""
WITH {_minhash_base_ctes},
buckets AS (
    {_minhash_band_rows}
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM buckets x JOIN buckets y
      ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b,
       ({_est_agree}) / {MINHASH_SEEDS}.0 AS jaccard_est
FROM cand
JOIN sigs a ON a.doc_id = doc_a
JOIN sigs b ON b.doc_id = doc_b
"""


def suggest_bucket_cap(
    spark: SparkSession, sf_dir: str, coverage_ppm: int = 999_000
) -> int:
    """Adaptive per-(band,bucket) candidate cap (VERDICT r8 item 2),
    the suggest_df_cap pattern pointed at LSH bucket sizes: the
    smallest power-of-2 ceiling that leaves at least `coverage_ppm` of
    buckets untouched — so only the pathological tail (the hot buckets
    whose m(m-1)/2 emission is the ~quadratic wall) gets truncated,
    and the cap tracks the corpus's own size distribution instead of a
    fixture constant. Driver-side: consumes a count-of-counts
    histogram (<= |distinct sizes| rows, never |buckets|), returns an
    int for the bucket_cap dials. Floor at 2 — cap 1 emits zero pairs
    from every capped bucket."""
    sizes = (
        _band_explode(_signatures(spark, sf_dir))
        .groupBy("band", "bucket")
        .agg(F.count("*").alias("sz"))
    )
    hist = sorted(
        sizes.groupBy("sz").agg(F.count("*").alias("n")).collect(),
        key=lambda r: r.sz,
    )
    total = sum(r.n for r in hist)
    if total == 0:
        return 2  # empty corpus: any floor works, nothing to cap
    cum, knee = 0, 2
    for r in hist:
        cum += r.n
        if cum * 1_000_000 >= coverage_ppm * total:
            knee = max(2, int(r.sz))
            break
    cap = 2
    while cap < knee:
        cap <<= 1
    return cap


# Registered report dial: 2 is the smallest pair-emitting cap, and the
# only value the sf0.01 driver fixture (max bucket size 4) can trip —
# any larger registered default leaves the capped CASE branch dead in
# every driver check (measured: cap=8 first trips at sf0.1). The
# registered value exists to keep BOTH arithmetic branches
# oracle-exercised; deployments price their real cap via
# suggest_bucket_cap / bucket_cap="auto" (power-of-2 tail-quantile
# ceiling), never this constant.
BUCKET_CAP_DEFAULT = 2


def dedup_bucket_cap_report(
    spark: SparkSession,
    sf_dir: str,
    bucket_cap: int | str = BUCKET_CAP_DEFAULT,
) -> DataFrame:
    """Drop-impact telemetry for the bucket_cap dial — per band: how
    many LSH buckets exist, the largest, how many the cap would
    truncate, how many doc-slots truncation removes, and the exact
    candidate-pair emission before/after (sum of m(m-1)/2 vs capped).
    This is the pre-flight a deployment runs BEFORE opting into
    bucket_cap on dedup_minhash_estimate / dedup_components_minhash:
    pairs_uncapped - pairs_capped is precisely the self-join work the
    dial saves, and n_doc_slots_dropped bounds the recall exposure.
    Pure count-of-counts arithmetic on the bucket-size frame — |bands|
    output rows at any corpus size, no pair materialization."""
    tune(spark)
    if bucket_cap == "auto":
        bucket_cap = suggest_bucket_cap(spark, sf_dir)
    cap = int(bucket_cap)
    sizes = (
        _band_explode(_signatures(spark, sf_dir))
        .groupBy("band", "bucket")
        .agg(F.count("*").cast("bigint").alias("sz"))
    )
    return sizes.groupBy("band").agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.max("sz").cast("bigint").alias("max_bucket"),
        F.sum(F.when(F.col("sz") > cap, 1).otherwise(0))
        .cast("bigint")
        .alias("n_buckets_capped"),
        F.sum(F.when(F.col("sz") > cap, F.col("sz") - cap).otherwise(0))
        .cast("bigint")
        .alias("n_doc_slots_dropped"),
        F.sum(F.expr("sz * (sz - 1) div 2"))
        .cast("bigint")
        .alias("pairs_uncapped"),
        F.sum(
            F.expr(
                f"CASE WHEN sz > {cap} THEN {cap * (cap - 1) // 2} "
                "ELSE sz * (sz - 1) div 2 END"
            )
        )
        .cast("bigint")
        .alias("pairs_capped"),
    )


BUCKET_CAP_SQL = f"""
WITH {_minhash_base_ctes},
buckets AS (
    {_minhash_band_rows}
),
bs AS (
    SELECT band, bucket, CAST(count(*) AS BIGINT) AS sz
    FROM buckets GROUP BY band, bucket
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(max(sz) AS BIGINT) AS max_bucket,
       CAST(sum(CASE WHEN sz > {BUCKET_CAP_DEFAULT} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_buckets_capped,
       CAST(sum(CASE WHEN sz > {BUCKET_CAP_DEFAULT}
                     THEN sz - {BUCKET_CAP_DEFAULT} ELSE 0 END)
            AS BIGINT) AS n_doc_slots_dropped,
       CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS pairs_uncapped,
       CAST(sum(CASE WHEN sz > {BUCKET_CAP_DEFAULT}
                     THEN {BUCKET_CAP_DEFAULT * (BUCKET_CAP_DEFAULT - 1) // 2}
                     ELSE sz * (sz - 1) // 2 END)
            AS BIGINT) AS pairs_capped
FROM bs GROUP BY band
"""


INCR_NEW_SOURCE = "src0"  # the batch being ingested; rest = standing corpus
INCR_THRESHOLD = 0.5


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: match an INCOMING batch (source =
    'src0' stands in for today's crawl slice) against the standing
    corpus WITHOUT re-pairing the corpus against itself — the shape a
    production ingest runs daily. Candidates come only from new x old
    bucket collisions (new-batch buckets are a small fraction of the
    corpus's, so the equi-join probe side is tiny); each new doc gets
    its best corpus match by signature agreement and a keep/drop
    verdict at jaccard_est >= 0.5.

    Output: (doc_id, is_dup, best_match, best_est) for EVERY new doc —
    anchored on the document table itself, not the signature frame, so
    a doc too short to produce a bigram shingle (no signature) still
    surfaces with NULL match / is_dup=FALSE instead of vanishing (the
    oracle anchors on documents WHERE source='src0')."""
    tune(spark)
    src = load_documents_parallel(spark, sf_dir).select("doc_id", "source")
    sigs = _signatures(spark, sf_dir).localCheckpoint()
    sigs_src = sigs.join(src, "doc_id")
    new_sigs = sigs_src.where(F.col("source") == INCR_NEW_SOURCE).drop("source")
    old_sigs = sigs_src.where(F.col("source") != INCR_NEW_SOURCE).drop("source")
    anchor = src.where(F.col("source") == INCR_NEW_SOURCE).select("doc_id")
    return incremental_match(new_sigs, old_sigs, anchor=anchor)


def incremental_match(
    new_sigs: DataFrame, old_sigs: DataFrame, anchor: DataFrame | None = None
) -> DataFrame:
    """Core of incremental dedup over two signature frames (doc_id,
    h0..h15): new x old bucket collisions -> signature agreement ->
    best corpus match + verdict per new doc. Shared by the batch
    operator above and the streaming micro-batch job.

    ``anchor`` is the FULL new-side doc population (doc_id column):
    signature frames silently lack docs with <2 tokens (no bigram
    shingles), so anchoring the left join on new_sigs would drop them.
    Callers pass the unfiltered document slice; None falls back to
    new_sigs (signature-complete inputs only)."""
    newb = _band_explode(new_sigs).select(
        F.col("doc_id").alias("new_id"), "band", "bucket"
    )
    oldb = _band_explode(old_sigs).select(
        F.col("doc_id").alias("old_id"), "band", "bucket"
    )
    cand = (
        newb.join(oldb, ["band", "bucket"])
        .select("new_id", "old_id")
        .distinct()
    )
    sa = new_sigs.select(
        F.col("doc_id").alias("new_id"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(MINHASH_SEEDS)],
    )
    sb = old_sigs.select(
        F.col("doc_id").alias("old_id"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(MINHASH_SEEDS)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(MINHASH_SEEDS)
    )
    scored = (
        cand.join(sa, "new_id")
        .join(sb, "old_id")
        .select(
            "new_id",
            "old_id",
            (agree / F.lit(float(MINHASH_SEEDS))).alias("est"),
        )
    )
    # best match per new doc: highest estimate, lowest old_id tiebreak
    best = scored.groupBy("new_id").agg(
        F.max(F.struct(F.col("est"), (-F.col("old_id")).alias("neg"))).alias("m")
    ).select(
        "new_id",
        (-F.col("m.neg")).alias("best_match"),
        F.col("m.est").alias("best_est"),
    )
    news = (
        anchor.select("doc_id") if anchor is not None
        else new_sigs.select("doc_id")
    )
    return news.join(
        best, news.doc_id == best.new_id, "left_outer"
    ).select(
        "doc_id",
        F.coalesce(F.col("best_est") >= INCR_THRESHOLD, F.lit(False)).alias(
            "is_dup"
        ),
        "best_match",
        "best_est",
    )


INCREMENTAL_SQL = f"""
WITH {_minhash_base_ctes},
buckets AS (
    {_minhash_band_rows}
),
srcs AS (SELECT doc_id, source FROM documents),
cand AS (
    SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
    FROM buckets x
    JOIN srcs sx ON sx.doc_id = x.doc_id AND sx.source = '{INCR_NEW_SOURCE}'
    JOIN buckets y ON x.band = y.band AND x.bucket = y.bucket
    JOIN srcs sy ON sy.doc_id = y.doc_id AND sy.source <> '{INCR_NEW_SOURCE}'
),
scored AS (
    SELECT new_id, old_id,
           ({_est_agree}) / {MINHASH_SEEDS}.0 AS est
    FROM cand
    JOIN sigs a ON a.doc_id = new_id
    JOIN sigs b ON b.doc_id = old_id
),
best AS (
    SELECT new_id, old_id AS best_match, est AS best_est
    FROM (SELECT new_id, old_id, est,
                 row_number() OVER (PARTITION BY new_id
                                    ORDER BY est DESC, old_id) AS rn
          FROM scored)
    WHERE rn = 1
)
SELECT d.doc_id,
       coalesce(best_est >= {INCR_THRESHOLD}, FALSE) AS is_dup,
       best_match, best_est
FROM documents d
LEFT JOIN best ON best.new_id = d.doc_id
WHERE d.source = '{INCR_NEW_SOURCE}'
"""


def dedup_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECONTAMINATION: find val/test documents that near-duplicate a
    TRAIN document — the overlap check every LLM eval pipeline runs
    before trusting held-out metrics (a contaminated eval doc inflates
    scores). Splits come from the same deterministic md5 buckets as
    split_assign_documents; the match is the minhash bucket-collision +
    signature-agreement core shared with dedup_incremental — candidates
    are only eval x train collisions, never corpus x corpus.

    Output per val/test doc: (doc_id, split, is_contaminated,
    train_match, best_est). Unmatched eval docs surface with NULL
    match, so the clean set is auditable, not implied — including docs
    too short to carry a minhash signature (anchored on membership,
    not the signature frame, matching the oracle's FROM membership)."""
    from projetbigdata_spark.operators.sampling import split_col

    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    membership = docs.select("doc_id", split_col().alias("split"))
    sigs = _signatures(spark, sf_dir).localCheckpoint()
    sigs_m = sigs.join(membership, "doc_id")
    eval_sigs = sigs_m.where(F.col("split") != "train").drop("split")
    train_sigs = sigs_m.where(F.col("split") == "train").drop("split")
    anchor = membership.where(F.col("split") != "train").select("doc_id")
    matched = incremental_match(eval_sigs, train_sigs, anchor=anchor)
    return matched.join(membership, "doc_id").select(
        "doc_id",
        "split",
        F.col("is_dup").alias("is_contaminated"),
        F.col("best_match").alias("train_match"),
        "best_est",
    )


CONTAMINATION_SQL = f"""
WITH {_minhash_base_ctes},
buckets AS (
    {_minhash_band_rows}
),
membership AS (
    SELECT doc_id,
           CASE WHEN CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 4)
                          AS BIGINT) % 100 < 80 THEN 'train'
                WHEN CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 4)
                          AS BIGINT) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
),
cand AS (
    SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
    FROM buckets x
    JOIN membership mx ON mx.doc_id = x.doc_id AND mx.split <> 'train'
    JOIN buckets y ON x.band = y.band AND x.bucket = y.bucket
    JOIN membership my ON my.doc_id = y.doc_id AND my.split = 'train'
),
scored AS (
    SELECT new_id, old_id,
           ({_est_agree}) / {MINHASH_SEEDS}.0 AS est
    FROM cand
    JOIN sigs a ON a.doc_id = new_id
    JOIN sigs b ON b.doc_id = old_id
),
best AS (
    SELECT new_id, old_id AS train_match, est AS best_est
    FROM (SELECT new_id, old_id, est,
                 row_number() OVER (PARTITION BY new_id
                                    ORDER BY est DESC, old_id) AS rn
          FROM scored)
    WHERE rn = 1
)
SELECT m.doc_id, m.split,
       coalesce(best_est >= {INCR_THRESHOLD}, FALSE) AS is_contaminated,
       train_match, best_est
FROM membership m
LEFT JOIN best ON best.new_id = m.doc_id
WHERE m.split <> 'train'
"""


JACCARD_VERIFIED_SQL = f"""
WITH {_minhash_base_ctes},
buckets AS (
    {_minhash_band_rows}
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM buckets x JOIN buckets y
      ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_inter
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
    GROUP BY 1, 2
),
jacc AS (
    SELECT doc_a, doc_b,
           ((n_inter * 1000000) // (sa.n_sh + sb.n_sh - n_inter))
               / 1000000.0 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, jaccard FROM jacc
WHERE jaccard >= {VERIFIED_THRESHOLD}
"""


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup graph: turn pairwise
    Jaccard edges into dedup GROUPS (every doc labeled with the min
    doc_id reachable through near-dup edges — the id you keep).

    Edges come from dedup_jaccard_verified (LSH candidates + exact
    full-posting Jaccard >= 0.5): exact precision, and unlike the
    df-capped rare-shingle index it still sees template-heavy replicas
    at scale (sf0.1: 0 capped edges vs 254 verified edges).

    The iterative algorithm the reference never had: min-label
    propagation, one join+agg per round, driver loop only for the
    convergence CHECK (one count per round — O(log n) rounds, never
    row data). localCheckpoint breaks lineage so plans don't grow
    exponentially — the standard Spark iteration idiom (same shape as
    GraphX/connected-components on DataFrames).

    Oracle: transitive closure via DuckDB recursive CTE + min over the
    closure — identical labels, declarative spelling.
    """
    tune(spark)
    edges = dedup_jaccard_verified(spark, sf_dir).select("doc_a", "doc_b")
    labels = _min_label_components(edges)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )


def _min_label_components(edges: DataFrame) -> DataFrame:
    """Min-label propagation over undirected (doc_a, doc_b) edges ->
    (node, label). One join+agg per round; driver sees only the
    convergence count. localCheckpoint per round breaks lineage —
    the standard Spark iteration idiom."""
    und = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint()  # materialize once: every round joins this edge
    # list; without the checkpoint the whole upstream edge derivation
    # (e.g. the full minhash flow) re-executes per round (measured
    # 10.6s -> 7.4s at sf0.1; the remainder is per-round fixed cost)
    # fused round 0 (early-exit optimization, VERDICT r1 item 6):
    # with labels=self, round 1's neighbor-min join degenerates to a
    # plain min over the adjacency list — so START from the distance-1
    # ball min (one agg, no join). Star-shaped components (the common
    # dedup-cluster shape) are already converged here, and the loop's
    # first round just confirms 0 changes: 1 join round total instead
    # of 2 (sf0.1 components_minhash ~4.1s -> ~2.4s).
    labels = (
        und.groupBy(F.col("doc_a").alias("node"))
        .agg(F.least(F.col("doc_a"), F.min("doc_b")).alias("label"))
        .localCheckpoint()
    )
    for _ in range(32):  # pointer-jumped: O(log diameter) rounds
        neighbor_min = (
            und.join(labels, und.doc_b == labels.node)
            .groupBy(F.col("doc_a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(neighbor_min, "node", "left_outer").select(
            "node",
            F.col("label").alias("old"),
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("mid"),
        )
        # pointer jump (path doubling): label <- label(label). Every
        # label value is itself a node id, so chasing one extra hop
        # through the label table each round doubles the distance
        # covered — O(log diameter) rounds instead of O(diameter).
        # Reachability is transitive, so mid's label is still a member
        # of node's component: the min-reachable invariant holds.
        jump = stepped.select(F.col("node").alias("jn"), F.col("mid").alias("jl"))
        final = F.least(F.col("mid"), F.coalesce(F.col("jl"), F.col("mid")))
        # chg rides along in the same projection (final < old label),
        # so ONE job per round serves both purposes: the lazy
        # localCheckpoint is materialized by the convergence agg, and the
        # old-vs-new re-join the check used to need is gone.
        new_labels = (
            stepped.join(jump, stepped.mid == jump.jn, "left_outer")
            .select(
                "node",
                final.alias("label"),
                (final < F.col("old")).alias("chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(
            F.sum(F.when(F.col("chg"), 1).otherwise(0))
        ).first()[0]
        labels = new_labels.select("node", "label")
        if not changed:
            break
    return labels


EST_COMPONENT_THRESHOLD = 0.5


def dedup_components_minhash(
    spark: SparkSession,
    sf_dir: str,
    bucket_cap: int | str | None = None,
) -> DataFrame:
    """Dedup groups straight from the MinHash ESTIMATE edges
    (jaccard_est >= 0.5) — the 100 TB composition: signature agreement
    already computed by the banded flow feeds component grouping
    directly, skipping the exact shingle-intersection pass entirely
    (no re-tokenization of candidates, one pipeline end-to-end).

    Same min-label propagation as dedup_components; only the edge
    source differs. Oracle: recursive-CTE transitive closure over the
    identically-filtered estimate edges.

    bucket_cap (default off) passes through to the estimate tier: the
    pair-emission bound for the ~quadratic hot-bucket tail this plain
    tier shows on replica-heavy corpora (sf10 soak, SCALE.md). Capped
    components REFINE the uncapped partition (fewer edges can only
    split components, never merge them — the monotone-in-cap contract
    test pins this); replica cliques still collapse because exact
    copies agree in every band and the cap keeps a clique window per
    bucket. Prefer dedup_components_prefiltered when replicas dominate
    — the cap is for corpora where NEAR-duplicate (not byte-identical)
    boilerplate floods single buckets."""
    tune(spark)
    edges = (
        dedup_minhash_estimate(spark, sf_dir, bucket_cap=bucket_cap)
        .where(F.col("jaccard_est") >= EST_COMPONENT_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    labels = _min_label_components(edges)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )


COMPONENTS_SQL = f"""
WITH RECURSIVE edges AS (
    {JACCARD_VERIFIED_SQL.strip().rstrip()}
),
und AS (
    SELECT doc_a, doc_b FROM edges
    UNION
    SELECT doc_b, doc_a FROM edges
),
reach(a, b) AS (
    SELECT doc_a, doc_b FROM und
    UNION
    SELECT r.a, u.doc_b
    FROM reach r JOIN und u ON r.b = u.doc_a
)
SELECT a AS doc_id, least(a, min(b)) AS component_id
FROM reach
GROUP BY a
"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate DOCUMENTS: the semantic tier of
    the dedup ladder (exact -> MinHash/Jaccard -> SimHash -> edit
    distance -> embedding cosine). Vector pairs above the cosine
    threshold (sim_neardup_pairs; LSH-prunable at scale) joined back to
    document metadata via the 1:1 doc_id = vec_id key — paraphrases
    that share no shingles still collide here. same_lang flags
    cross-language pairs (embedding spaces are multilingual; shingle
    tiers are not)."""
    from projetbigdata_spark.operators.similarity import sim_neardup_pairs

    tune(spark)
    pairs = sim_neardup_pairs(spark, sf_dir)
    docs = load_documents_parallel(spark, sf_dir).select("doc_id", "lang")
    da = docs.select(F.col("doc_id").alias("vec_a"), F.col("lang").alias("lang_a"))
    db = docs.select(F.col("doc_id").alias("vec_b"), F.col("lang").alias("lang_b"))
    # no broadcast hints: docs is the CORPUS side (the r3 review
    # caught the hints pointing at it — forcing a corpus broadcast is
    # exactly the driver-OOM shape at scale); the near-dup pair set is
    # the tiny side, and AQE broadcasts it on its own
    return (
        pairs.join(da, "vec_a")
        .join(db, "vec_b")
        .select(
            F.col("vec_a").alias("doc_a"),
            F.col("vec_b").alias("doc_b"),
            "cosine",
            (F.col("lang_a") == F.col("lang_b")).alias("same_lang"),
        )
    )


# pair source mirrors the LSH-pruned sim_neardup_pairs oracle exactly
# (deterministic banded-LSH candidates + exact cosine on collisions)
EMBED_COSINE_SQL = f"""
WITH pairs AS (
    SELECT vec_a AS doc_a, vec_b AS doc_b, cosine
    FROM ({_SIM_NEARDUP_SQL.strip()})
)
SELECT doc_a, doc_b, cosine,
       (da.lang = db.lang) AS same_lang
FROM pairs
JOIN documents da ON da.doc_id = doc_a
JOIN documents db ON db.doc_id = doc_b
"""


COMPONENTS_MINHASH_SQL = f"""
WITH RECURSIVE edges AS (
    SELECT doc_a, doc_b FROM (
        {MINHASH_EST_SQL.strip()}
    ) WHERE jaccard_est >= {EST_COMPONENT_THRESHOLD}
),
und AS (
    SELECT doc_a, doc_b FROM edges
    UNION
    SELECT doc_b, doc_a FROM edges
),
reach(a, b) AS (
    SELECT doc_a, doc_b FROM und
    UNION
    SELECT r.a, u.doc_b
    FROM reach r JOIN und u ON r.b = u.doc_a
)
SELECT a AS doc_id, least(a, min(b)) AS component_id
FROM reach
GROUP BY a
"""


def dedup_components_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_components_minhash with an exact-duplicate collapse FIRST
    (NEXT r2 item 5 — the replica-heavy-corpus composition): identical
    texts have identical signatures, so an exact-dup group of size k is
    a complete k-clique (est 1.0 in every band) in the estimate graph —
    k(k-1)/2 edges that label propagation then has to carry every
    round. Collapse each group to its min-doc_id representative first
    (one md5 hash-agg), run banded estimate + min-label propagation
    over REPRESENTATIVES only, then fan labels back out.

    Row-identical to dedup_components_minhash by construction (same
    oracle SQL): rep = group min, so min-reachable-over-reps equals
    min-reachable-over-docs; a rep isolated in the rep graph surfaces
    only when its exact group has >= 2 members — exactly the est-1.0
    clique edges the full graph would have produced. Docs too short to
    shingle have no signature on either path and stay absent.

    At crawl-scale corpora where exact replicas dominate (the gen_soak
    fixture: 10x clones -> 45-edge cliques each) the edge set shrinks
    ~k^2-fold; on the near-dup-free sf fixtures it costs one extra
    hash-agg (measured in SCALE.md)."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir).select(
        "doc_id", F.md5("text").alias("text_h")
    )
    sigs = _signatures(spark, sf_dir).localCheckpoint()
    signed = docs.join(sigs.select("doc_id"), "doc_id")
    groups = signed.groupBy("text_h").agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("n_exact")
    )
    rep_map = signed.join(groups, "text_h").select("doc_id", "rep", "n_exact")
    rep_sigs = sigs.join(
        rep_map.where(F.col("doc_id") == F.col("rep")).select("doc_id"),
        "doc_id",
    ).localCheckpoint()
    edges = (
        _estimate_edges(rep_sigs)
        .where(F.col("jaccard_est") >= EST_COMPONENT_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    labels = _min_label_components(edges)
    return (
        rep_map.join(labels, rep_map.rep == labels.node, "left_outer")
        .where(F.col("label").isNotNull() | (F.col("n_exact") >= 2))
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("rep")).alias("component_id"),
        )
    )


def dedup_components_verified_prefiltered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dedup_components (VERIFIED-Jaccard edges) with the exact-clone
    collapse of dedup_components_prefiltered (r4): identical texts
    have identical signatures AND identical full posting sets, so the
    row-identity argument carries over to the verified tier verbatim —
    candidates among representatives see exactly the cross-rep LSH
    collisions the full graph saw, the exact-Jaccard verdict on each
    is unchanged (same posting sets), and an exact-dup clique's
    internal edges are all jaccard 1.0 >= threshold, reproduced by the
    n_exact >= 2 fan-out rule. Same COMPONENTS_SQL oracle as
    dedup_components.

    This is the subtree under dedup_keep_canonical — the full-corpus
    keep/canonical materialization — so at replica-heavy crawl scale
    the collapse pays exactly where the pipeline's final dedup pass
    runs. Verification cost drops with the square of the mean clone
    count (clique edges never reach the posting-expansion join)."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir).select(
        "doc_id", F.md5("text").alias("text_h")
    )
    buckets = dedup_minhash_buckets(spark, sf_dir).localCheckpoint()
    signed = docs.join(buckets.select("doc_id").distinct(), "doc_id")
    groups = signed.groupBy("text_h").agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("n_exact")
    )
    rep_map = signed.join(groups, "text_h").select("doc_id", "rep", "n_exact")
    reps = rep_map.where(F.col("doc_id") == F.col("rep")).select("doc_id")
    rep_buckets = (
        buckets.join(reps, "doc_id")
        .repartition("band", "bucket")
        .localCheckpoint()
    )
    cand = (
        rep_buckets.alias("x")
        .join(
            rep_buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    postings = _hashed_shingles(spark, sf_dir)
    sizes = postings.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pa = postings.select(F.col("doc_id").alias("doc_a"), "h")
    pb = postings.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        cand.join(pa, "doc_a")
        .join(pb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    union_sz = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    micros = (F.col("n_inter") * 1_000_000).cast("bigint")
    jac = (micros - micros % union_sz) / union_sz / F.lit(1_000_000.0)
    edges = (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .where(jac >= VERIFIED_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    labels = _min_label_components(edges)
    return (
        rep_map.join(labels, rep_map.rep == labels.node, "left_outer")
        .where(F.col("label").isNotNull() | (F.col("n_exact") >= 2))
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("rep")).alias("component_id"),
        )
    )


LEVENSHTEIN_CAP = 200


def dedup_levenshtein_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup, edit-distance tier: exact Levenshtein distance on
    MinHash-bucket candidate pairs only (never all-pairs — the O(len^2)
    DP per pair is affordable exactly because LSH pruned the pair set).
    Both engines implement the same classic Levenshtein, so the
    distances are oracle-checkable integers.

    Two cuts keep the DP cheap without changing results:
    - length prefilter: |len_a - len_b| > cap already implies
      dist > cap — a free Catalyst predicate, no DP at all;
    - banded DP: Spark's 3-arg levenshtein(l, r, threshold) walks only
      the Ukkonen band around the diagonal and bails out at the
      threshold (returns -1), dropping per-pair cost from
      O(len_a*len_b) to O(cap*min(len)).
    """
    tune(spark)
    # the bucket table is tiny (8 rows/doc) but expensive to derive
    # (base-hash + 16 mins over all shingles); localCheckpoint materializes
    # it once instead of recomputing per self-join branch
    buckets = dedup_minhash_buckets(spark, sf_dir).localCheckpoint()
    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
        # the pair set is SMALL but each pair costs an O(len_a*len_b)
        # DP — AQE would coalesce it to one partition (bytes-based) and
        # serialize the whole verification onto one core (measured 60s
        # -> ~3s). Explicit width keeps the expensive map parallel.
        .repartition(spark.sparkContext.defaultParallelism)
    )
    docs = load_documents_parallel(spark, sf_dir).select("doc_id", "text")
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .where(
            F.abs(F.length("text_a") - F.length("text_b")) <= LEVENSHTEIN_CAP
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein(
                F.col("text_a"), F.col("text_b"), LEVENSHTEIN_CAP
            ).alias("edit_dist"),
        )
        .where(F.col("edit_dist") >= 0)  # banded DP returns -1 past the cap
    )


LEVENSHTEIN_SQL = f"""
WITH {_minhash_base_ctes},
buckets AS (
    {_minhash_band_rows}
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM buckets x JOIN buckets y
      ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b,
       CAST(levenshtein(a.text, b.text) AS INT) AS edit_dist
FROM cand
JOIN documents a ON a.doc_id = doc_a
JOIN documents b ON b.doc_id = doc_b
WHERE levenshtein(a.text, b.text) <= {LEVENSHTEIN_CAP}
"""


def corpus_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle document-frequency profile: how many distinct shingles
    (and how many posting rows) live in each power-of-2 df bucket —
    the measurement behind SHINGLE_DF_CAP. A healthy cap sits where
    the bucket histogram's posting mass goes flat; a cap below the
    knee blinds the inverted index to template shingles, above it the
    candidate join quadratically explodes. Bucket = bit-length of df
    (floor(log2)+1), computed as length(bin(df)) — exact integers in
    both engines.

    Two hash-aggs over the shingle explode (df per shingle, then the
    ~20-row histogram); at 100 TB this is the same profile a daily
    index build would emit as telemetry."""
    tune(spark)
    df_per_sh = (
        _shingles(spark, sf_dir)
        .groupBy("sh")
        .agg(F.count("*").alias("df"))
    )
    return (
        df_per_sh.select(
            F.length(F.conv(F.col("df"), 10, 2)).cast("int").alias(
                "df_bucket_pow2"
            ),
            "df",
        )
        .groupBy("df_bucket_pow2")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum("df").alias("n_postings"),
        )
        .orderBy("df_bucket_pow2")
    )


SHINGLE_STATS_SQL = """
WITH toks AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS w
    FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] AS sh
    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
),
dfs AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
SELECT CAST(length(bin(df)) AS INT) AS df_bucket_pow2,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(df) AS BIGINT) AS n_postings
FROM dfs
GROUP BY 1
ORDER BY df_bucket_pow2
"""



def dedup_tier_overlap_report(
    spark: SparkSession, sf_dir: str, k: int | str = None
) -> DataFrame:
    """CROSS-TIER dedup audit — what each rung of the ladder uniquely
    catches: the drop sets of the exact tier (md5 keep-first), the
    near-dup tier (minhash components, keep the representative), and
    the semantic tier (SemDeDup, doc_id = vec_id) as a 7-row overlap
    matrix — (tier, tier, drops) on the diagonal, (a, b, overlap) for
    the three pairs, and ('any', 'any', union) — the table a data team
    reads to decide which tiers are worth their cost on THIS corpus
    (if semantic ⊆ minhash here, the embedding pass buys nothing; a
    large semantic-only count is the argument for paying it).

    Plan: three independently-green subtree drop sets (each a skinny
    doc_id frame, plan-barriered — every set feeds its diagonal count,
    two overlap joins, and the union), then seven 1-row aggregates
    unioned; the overlaps join |drops|-sized frames, never the corpus.
    Composition slot-cost note: inherits the semantic tier's Lloyd
    stages — NEXT.md's composition budget rules apply.

    THE k DIAL FOLLOWS THE SEMANTIC TIER'S RULES: the registered row
    pins k=K_CENTROIDS=16 (the static oracle's seed range); any caller
    at real corpus size MUST pass k="auto" (≈√n/2) or an explicit
    dial — k=16 inherited at a 100k-vector corpus puts the inherited
    pair stage at n²/16 (the measured r5 trap; the sf5 soak row below
    is k="auto" for exactly this reason)."""
    tune(spark)
    from projetbigdata_spark.operators.similarity import (
        K_CENTROIDS,
        dedup_semantic,
    )

    if k is None:
        k = K_CENTROIDS

    docs = load_documents_parallel(spark, sf_dir)
    key = docs.select(
        "doc_id", F.md5(F.lower("text")).alias("content_md5")
    )
    # NULL-safe exact tier (ADVICE r7): md5(NULL) IS NULL, and an
    # equi-join on content_md5 would silently exclude NULL-text docs
    # from the drop set while the oracle's window PARTITION BY groups
    # them into one dup group (the repo contract —
    # test_exact_dedup_groups_null_and_empty). A window min over the
    # same key matches both the oracle and dedup_exact's groupBy
    # semantics (groupBy/PARTITION BY both group NULLs), at the same
    # single shuffle on content_md5.
    exact_drops = (
        key.withColumn(
            "keep_id",
            F.min("doc_id").over(Window.partitionBy("content_md5")),
        )
        .where(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    nd_drops = (
        dedup_components_minhash(spark, sf_dir)
        .where(F.col("doc_id") != F.col("component_id"))
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    sem_drops = (
        dedup_semantic(spark, sf_dir, k=k)
        .select(F.col("vec_id").alias("doc_id"))
        .localCheckpoint(eager=False)
    )
    tiers = [
        ("exact", exact_drops),
        ("neardup", nd_drops),
        ("semantic", sem_drops),
    ]
    rows = []
    for name, df in tiers:
        rows.append(
            df.agg(F.count("*").cast("bigint").alias("n_docs")).select(
                F.lit(name).alias("tier_a"),
                F.lit(name).alias("tier_b"),
                "n_docs",
            )
        )
    for i, (na, da) in enumerate(tiers):
        for nb, db in tiers[i + 1 :]:
            rows.append(
                da.join(db, "doc_id")
                .agg(F.count("*").cast("bigint").alias("n_docs"))
                .select(
                    F.lit(na).alias("tier_a"),
                    F.lit(nb).alias("tier_b"),
                    "n_docs",
                )
            )
    union_drops = exact_drops.unionByName(nd_drops).unionByName(sem_drops)
    rows.append(
        union_drops.distinct()
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .select(
            F.lit("any").alias("tier_a"),
            F.lit("any").alias("tier_b"),
            "n_docs",
        )
    )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out



TIER_OVERLAP_SQL = f"""
WITH exd AS (
    SELECT doc_id FROM (
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY md5(lower(text))) AS keep_id
        FROM documents)
    WHERE doc_id <> keep_id
),
ndd AS (
    SELECT doc_id FROM ({COMPONENTS_MINHASH_SQL})
    WHERE doc_id <> component_id
),
smd AS (SELECT vec_id AS doc_id FROM ({_SEMDEDUP_SQL}))
SELECT 'exact' AS tier_a, 'exact' AS tier_b,
       CAST(count(*) AS BIGINT) AS n_docs FROM exd
UNION ALL
SELECT 'neardup', 'neardup', CAST(count(*) AS BIGINT) FROM ndd
UNION ALL
SELECT 'semantic', 'semantic', CAST(count(*) AS BIGINT) FROM smd
UNION ALL
SELECT 'exact', 'neardup', CAST(count(*) AS BIGINT)
FROM exd JOIN ndd USING (doc_id)
UNION ALL
SELECT 'exact', 'semantic', CAST(count(*) AS BIGINT)
FROM exd JOIN smd USING (doc_id)
UNION ALL
SELECT 'neardup', 'semantic', CAST(count(*) AS BIGINT)
FROM ndd JOIN smd USING (doc_id)
UNION ALL
SELECT 'any', 'any', CAST(count(*) AS BIGINT)
FROM (SELECT DISTINCT doc_id FROM (
      SELECT doc_id FROM exd UNION ALL
      SELECT doc_id FROM ndd UNION ALL
      SELECT doc_id FROM smd))
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_tier_overlap_report": dedup_tier_overlap_report,
    "corpus_shingle_stats": corpus_shingle_stats,
    "dedup_components": dedup_components,
    "dedup_components_minhash": dedup_components_minhash,
    "dedup_components_prefiltered": dedup_components_prefiltered,
    "dedup_components_verified_prefiltered": dedup_components_verified_prefiltered,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_levenshtein_candidates": dedup_levenshtein_candidates,
    "dedup_minhash_estimate": dedup_minhash_estimate,
    "dedup_bucket_cap_report": dedup_bucket_cap_report,
    "dedup_jaccard_pairs": dedup_jaccard_pairs,
    "dedup_containment_pairs": dedup_containment_pairs,
    "dedup_jaccard_verified": dedup_jaccard_verified,
    "dedup_minhash_buckets": dedup_minhash_buckets,
    "dedup_simhash": dedup_simhash,
    "dedup_incremental": dedup_incremental,
    "dedup_contamination": dedup_contamination,
}

ORACLE_SQL = {
    "dedup_exact": EXACT_SQL,
    "dedup_tier_overlap_report": TIER_OVERLAP_SQL,
    "corpus_shingle_stats": SHINGLE_STATS_SQL,
    "dedup_components": COMPONENTS_SQL,
    "dedup_components_minhash": COMPONENTS_MINHASH_SQL,
    "dedup_components_prefiltered": COMPONENTS_MINHASH_SQL,
    "dedup_components_verified_prefiltered": COMPONENTS_SQL,
    "dedup_embedding_cosine": EMBED_COSINE_SQL,
    "dedup_levenshtein_candidates": LEVENSHTEIN_SQL,
    "dedup_minhash_estimate": MINHASH_EST_SQL,
    "dedup_bucket_cap_report": BUCKET_CAP_SQL,
    "dedup_jaccard_pairs": JACCARD_SQL,
    "dedup_containment_pairs": CONTAINMENT_SQL,
    "dedup_jaccard_verified": JACCARD_VERIFIED_SQL,
    "dedup_minhash_buckets": MINHASH_SQL,
    "dedup_simhash": SIMHASH_SQL,
    "dedup_incremental": INCREMENTAL_SQL,
    "dedup_contamination": CONTAMINATION_SQL,
}


# --- Bloom-filter ingest membership (r9 second wave) ---

BLOOM_M = 1 << 20  # filter bits — FIXTURE dial. Deployment sizes
# m ≈ -n·ln(p)/ln(2)² for n standing keys at FP rate p (1e10 keys at
# 1% ≈ 12 GB of bits): too big to broadcast whole, which is why the
# filter below is spelled as a DISTINCT (bit) ROW SET — i.e. already
# SHARDED by bit (the partitioned-Bloom deployment form); the probe is
# an equi-join against ≤ min(m, k·n) skinny rows. For small m the
# classic broadcast-bitmap form (bit_or-folded words, in-row probe)
# is a straightforward fold of the same frame.
BLOOM_K = 2  # hash functions, md5 salts 'bf0:'/'bf1:'


def _bloom_bit_exprs(md5_col: str = "content_md5", m: int = BLOOM_M) -> list:
    """The K deterministic bit positions of a content key — exact
    integer md5 arithmetic, mirrored verbatim in the oracles."""
    return [
        F.expr(
            f"CAST(conv(substring(md5(concat('bf{i}:', {md5_col})),"
            f" 1, 15), 16, 10) AS BIGINT) % {m}"
        ).alias("bit")
        for i in range(BLOOM_K)
    ]


def dedup_incremental_bloom(
    spark: SparkSession, sf_dir: str, m: int | None = None
) -> DataFrame:
    """EXACT-membership ingest dedup through a Bloom filter (Bloom
    1970; the Bloom/memory-bounded tier every large-scale ingest
    pipeline puts in front of its exact store): flag each incoming
    batch doc (source = 'src0') whose content hash is POSSIBLY already
    in the standing corpus. The filter is the standing keys' K=2
    md5-derived bit positions, deduplicated — a doc is flagged iff ALL
    its K bits are set. One-sided by construction: NO false negatives
    (every true duplicate is flagged — the contract a drop-verdict can
    be built on), false positives at a rate priced by m and audited by
    dedup_bloom_fp_report.

    Why this beats the exact probe at 100 TB INGEST: dedup_incremental
    and the exact-key join must reach the standing corpus's key set —
    ~n rows shuffled or served per batch. The Bloom frame is ≤ min(m,
    K·n) DISTINCT BIT rows, built once per epoch, independent of key
    width, and cacheable forever (bits only turn ON, so yesterday's
    filter is a valid — slightly conservative — prefilter for today);
    the per-batch cost is one hash pass over the batch + an equi-join
    against the bit set. The row-set spelling IS the partitioned-Bloom
    deployment form (sharded by bit); see BLOOM_M for the
    broadcast-bitmap small-m variant.

    NULL text is unhashable: NULL-key batch docs anchor through with
    possibly_dup = FALSE (the exact tier's NULL-grouping handles
    them); NULL-key standing docs set no bits. Output: (doc_id,
    possibly_dup) for every src0 doc.

    `m` overrides BLOOM_M for collision studies (tests force FPs with
    tiny filters); the registered row keeps the static dial so the
    oracle is static."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir).select(
        "doc_id", "source", F.md5(F.lower("text")).alias("content_md5")
    )
    bit_exprs = _bloom_bit_exprs(m=m if m is not None else BLOOM_M)
    standing = docs.where(
        (F.col("source") != INCR_NEW_SOURCE)
        & F.col("content_md5").isNotNull()
    )
    bits = (
        standing.select(F.explode(F.array(*bit_exprs)).alias("bit"))
        .distinct()
        .withColumn("set", F.lit(1))
    )
    batch = docs.where(F.col("source") == INCR_NEW_SOURCE)
    probe = batch.where(F.col("content_md5").isNotNull()).select(
        "doc_id", F.explode(F.array(*bit_exprs)).alias("bit")
    )
    hits = (
        probe.join(bits, "bit", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("set", F.lit(0))).alias("nhit"))
    )
    anchor = batch.select("doc_id")
    return anchor.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("nhit") == BLOOM_K, F.lit(False)).alias(
            "possibly_dup"
        ),
    )


def bloom_bits_frame(standing_docs: DataFrame, m: int = BLOOM_M) -> DataFrame:
    """The standing corpus's Bloom bit set as a frame — the epoch
    artifact (r11): <= min(m, K·n) DISTINCT (bit, set) rows built once
    per epoch, persistable (save_bloom_bits) and MONOTONE (bits only
    turn on), so a persisted epoch-N filter is a valid — merely
    conservative-in-time — prefilter for every later batch: no false
    negatives against epoch-N keys, ever. `standing_docs` is any
    (text) frame; NULL-text rows set no bits (unhashable, the exact
    tier's NULL grouping owns them)."""
    return (
        standing_docs.select(F.md5(F.lower("text")).alias("content_md5"))
        .where(F.col("content_md5").isNotNull())
        .select(F.explode(F.array(*_bloom_bit_exprs(m=m))).alias("bit"))
        .distinct()
        .withColumn("set", F.lit(1))
    )


def bloom_apply(
    batch_docs: DataFrame, bits: DataFrame, m: int = BLOOM_M
) -> DataFrame:
    """Probe a batch against a frozen bit set — the per-batch half of
    the Bloom ingest tier, shared by the persisted-artifact path and
    pinned equal to the registered dedup_incremental_bloom row
    (test_dials.py). Anchored on the batch: NULL-text docs keep a row
    with possibly_dup = FALSE.

    `m` MUST be the filter size the bit set was BUILT with
    (bloom_bits_frame's m): probing at a different m hashes to the
    wrong positions and silently breaks the no-false-negative
    contract drop verdicts are built on (ADVICE r11). The persisted
    artifact carries its m (save_bloom_bits meta); load_bloom_bits
    returns it precisely so callers can thread it here."""
    keyed = batch_docs.select(
        "doc_id", F.md5(F.lower("text")).alias("content_md5")
    )
    probe = keyed.where(F.col("content_md5").isNotNull()).select(
        "doc_id", F.explode(F.array(*_bloom_bit_exprs(m=m))).alias("bit")
    )
    hits = (
        probe.join(bits, "bit", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("set", F.lit(0))).alias("nhit"))
    )
    return keyed.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("nhit") == BLOOM_K, F.lit(False)).alias(
            "possibly_dup"
        ),
    )


def save_bloom_bits(bits: DataFrame, path: str, m: int = BLOOM_M) -> None:
    """Persist a Bloom bit set as parquet — one skinny (bit, set)
    table PLUS a 1-row meta table recording the filter geometry
    (m, k) the bits were hashed with (ADVICE r11: a bit set built at
    a non-default m used to be silently probed at BLOOM_M positions,
    producing false negatives). `m` must be the value passed to
    bloom_bits_frame when building `bits`. At deployment this is the
    artifact every ingest worker loads at startup instead of
    re-scanning the standing key set (the filter is independent of
    key width and cacheable forever within an epoch; monotonicity
    makes stale reads safe)."""
    bits.write.mode("overwrite").parquet(f"{path}/bits")
    spark = bits.sparkSession
    spark.createDataFrame(
        [(int(m), int(BLOOM_K))], "m BIGINT, k BIGINT"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def load_bloom_bits(spark: SparkSession, path: str) -> tuple[DataFrame, int]:
    """Load a persisted Bloom bit set — returns (bits, m) so the
    probe side can never diverge from the build geometry: thread the
    returned m into bloom_apply (bloom_membership_stream(bits_path=)
    does). Pre-meta artifacts (r11) were always built at BLOOM_M, the
    documented fallback when the meta table is absent."""
    from projetbigdata_spark.operators.epochs import resolve_artifact_path

    path = resolve_artifact_path(spark, path)
    bits = spark.read.parquet(f"{path}/bits")
    try:
        m = int(spark.read.parquet(f"{path}/meta").head()["m"])
    except Exception:  # pre-r12 artifact: no meta table on disk
        m = BLOOM_M
    return bits, m


def _bloom_sql_core(m: int = BLOOM_M) -> str:
    """Filter + probe + verdict as DuckDB CTE text ending in a `bloom`
    relation (doc_id, possibly_dup), shared by the verdict oracle and
    the FP-report oracle."""
    bit = (
        "CAST(CAST('0x' || substr(md5('bf{i}:' || content_md5), 1, 15)"
        f" AS BIGINT) % {m} AS BIGINT)"
    )
    bits_union = " UNION ALL ".join(
        f"SELECT doc_id, source, {bit.format(i=i)} AS bit FROM k"
        f" WHERE content_md5 IS NOT NULL"
        for i in range(BLOOM_K)
    )
    return f"""
WITH k AS (
    SELECT doc_id, source, md5(lower(text)) AS content_md5
    FROM documents
),
kb AS ({bits_union}),
bits AS (
    SELECT DISTINCT bit FROM kb WHERE source <> 'src0'
),
hits AS (
    SELECT p.doc_id,
           sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS nhit
    FROM (SELECT doc_id, bit FROM kb WHERE source = 'src0') p
    LEFT JOIN bits b ON p.bit = b.bit
    GROUP BY p.doc_id
),
bloom AS (
    SELECT d.doc_id,
           coalesce(h.nhit = {BLOOM_K}, FALSE) AS possibly_dup
    FROM (SELECT doc_id FROM documents WHERE source = 'src0') d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
)"""


BLOOM_SQL = _bloom_sql_core() + """
SELECT doc_id, possibly_dup FROM bloom
"""


def dedup_bloom_fp_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom tier's PRICE TAG — one audit row comparing the filter's
    verdicts against exact membership on the same batch: n_batch,
    n_flagged, n_exact_dup (batch keys present verbatim in the standing
    key set; NULL keys never match, mirroring the filter's unhashable
    stance), n_false_pos = flagged-but-not-exact, and fp_ppm — false
    positives per million CLEAN batch docs, the dial a deployment
    compares against its m-sizing target before trusting the filter as
    a drop-verdict prefilter. The no-false-negative law (every exact
    dup is flagged) is pinned in tests and holds by construction at
    ANY m.

    Cost: the bloom verdict frame + one distinct-key semi-join and a
    1-row rollup — the report is strictly cheaper than the filter
    build it audits."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir).select(
        "doc_id", "source", F.md5(F.lower("text")).alias("content_md5")
    )
    standing_keys = (
        docs.where(
            (F.col("source") != INCR_NEW_SOURCE)
            & F.col("content_md5").isNotNull()
        )
        .select("content_md5")
        .distinct()
        .withColumn("present", F.lit(1))
    )
    batch = docs.where(F.col("source") == INCR_NEW_SOURCE)
    exact = batch.join(standing_keys, "content_md5", "left").select(
        "doc_id",
        F.coalesce(F.col("present") == 1, F.lit(False)).alias("exact_dup"),
    )
    joined = dedup_incremental_bloom(spark, sf_dir).join(exact, "doc_id")
    return joined.agg(
        F.count("*").cast("bigint").alias("n_batch"),
        F.sum(F.col("possibly_dup").cast("int"))
        .cast("bigint")
        .alias("n_flagged"),
        F.sum(F.col("exact_dup").cast("int"))
        .cast("bigint")
        .alias("n_exact_dup"),
        F.sum(
            (F.col("possibly_dup") & ~F.col("exact_dup")).cast("int")
        )
        .cast("bigint")
        .alias("n_false_pos"),
        F.expr(
            "CASE WHEN count(*) - sum(CAST(exact_dup AS INT)) = 0"
            " THEN CAST(0 AS BIGINT) ELSE"
            " CAST((sum(CAST(possibly_dup AND NOT exact_dup AS INT))"
            " * CAST(1000000 AS BIGINT))"
            " div (count(*) - sum(CAST(exact_dup AS INT))) AS BIGINT)"
            " END"
        ).alias("fp_ppm"),
    )


BLOOM_FP_SQL = _bloom_sql_core() + """,
sk AS (
    SELECT DISTINCT content_md5
    FROM k WHERE source <> 'src0' AND content_md5 IS NOT NULL
),
ex AS (
    SELECT d.doc_id,
           coalesce(s.content_md5 IS NOT NULL, FALSE) AS exact_dup
    FROM (SELECT doc_id, content_md5 FROM k WHERE source = 'src0') d
    LEFT JOIN sk s ON d.content_md5 = s.content_md5
),
j AS (
    SELECT b.doc_id, b.possibly_dup, e.exact_dup
    FROM bloom b JOIN ex e ON b.doc_id = e.doc_id
)
SELECT CAST(count(*) AS BIGINT) AS n_batch,
       CAST(sum(CAST(possibly_dup AS INT)) AS BIGINT) AS n_flagged,
       CAST(sum(CAST(exact_dup AS INT)) AS BIGINT) AS n_exact_dup,
       CAST(sum(CAST(possibly_dup AND NOT exact_dup AS INT)) AS BIGINT)
           AS n_false_pos,
       CASE WHEN count(*) - sum(CAST(exact_dup AS INT)) = 0
            THEN CAST(0 AS BIGINT)
            ELSE CAST((sum(CAST(possibly_dup AND NOT exact_dup AS INT))
                       * CAST(1000000 AS BIGINT))
                      // (count(*) - sum(CAST(exact_dup AS INT)))
                      AS BIGINT) END AS fp_ppm
FROM j
"""


QUERIES["dedup_incremental_bloom"] = dedup_incremental_bloom
ORACLE_SQL["dedup_incremental_bloom"] = BLOOM_SQL
QUERIES["dedup_bloom_fp_report"] = dedup_bloom_fp_report
ORACLE_SQL["dedup_bloom_fp_report"] = BLOOM_FP_SQL
