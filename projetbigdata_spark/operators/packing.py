"""Training-batch assembly operators: sequence packing and corpus
mixture planning — the last mile between a curated corpus and an LLM
training run.

  docs_pack_greedy — assign every document a (pack_id, pack_offset)
      into fixed token-budget training sequences. Packing is done PER
      SHARD (hash of doc_id), which is how real pipelines do it: the
      global-order cumsum a naive spelling needs would serialize onto
      one reducer, while per-shard packing is embarrassingly parallel
      (shard count scales with the cluster) and each shard's window
      cumsum is one partition of one shuffle. Documents straddle pack
      boundaries (offset + n_tokens may exceed the budget) — that's
      standard concat-then-chunk packing, where sequences are cut from
      the token stream, not from document boundaries.
  corpus_mix_plan — per-language token inventory vs a target mixture:
      natural share, target share, epochs (how many passes over a
      group the target implies at constant total), and the up/down
      sample verdict. One hash-agg over the corpus + broadcast-size
      arithmetic; the plan table is what a weighted sampler consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.functions.text import tokenize
from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_documents_parallel

PACK_BUDGET = 2048  # tokens per training sequence
N_SHARDS = 8
# pack_id = shard * PACK_SHARD_STRIDE + pack_seq. 2^40 seqs/shard of
# headroom (ADVICE r7: the old 1e6 stride collides at ~1e9 packs/shard
# under the 100 TB posture); shard < 2^22 keeps the product in BIGINT.
PACK_SHARD_STRIDE = 1 << 40


def pack_assign(docs: DataFrame) -> DataFrame:
    """Packing core over any (doc_id, text) frame — reused by the
    registered query and the curation composition
    (examples/corpus_curation.py)."""
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id",
        F.size(tokenize("text")).alias("n_tokens"),
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
            f" AS BIGINT) % {N_SHARDS}"
        ).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    return toks.select(
        "doc_id",
        "n_tokens",
        F.col("shard").cast("int").alias("shard"),
        (
            F.col("shard") * F.lit(PACK_SHARD_STRIDE)
            + F.floor((cum - F.col("n_tokens")) / PACK_BUDGET)
        ).cast("bigint").alias("pack_id"),
        ((cum - F.col("n_tokens")) % PACK_BUDGET).cast("int").alias("pack_offset"),
    )


def docs_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, shard, pack_id, pack_offset): concat-order
    packing within md5-hash shards, deterministic order by doc_id
    inside each shard. pack_id is globally unique (shard-prefixed)."""
    tune(spark)
    return pack_assign(load_documents_parallel(spark, sf_dir))


PACK_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           len(list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> '')) AS n_tokens,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
               % {N_SHARDS} AS shard
    FROM documents
),
cums AS (
    SELECT doc_id, n_tokens, shard,
           sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - n_tokens AS prev
    FROM toks
)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, CAST(shard AS INT) AS shard,
       CAST(shard * {PACK_SHARD_STRIDE} + prev // {PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(prev % {PACK_BUDGET} AS INT) AS pack_offset
FROM cums
"""


# target language mixture for corpus_mix_plan — the knob a training
# run sets; fixed here so the plan is deterministic and oracle-checked
MIX_TARGETS = {"en": 0.40, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}


def corpus_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling plan: token inventory -> natural share vs
    target share -> epochs = target_share * total / group_tokens (the
    repeat factor a weighted sampler applies; >1 upsamples, <1
    downsamples). One corpus agg; the mixture table is 5 rows."""
    tune(spark)
    return mix_plan_of(load_documents_parallel(spark, sf_dir))


def mix_plan_of(docs: DataFrame) -> DataFrame:
    """Mixture-plan core over any (text, lang) frame."""
    from pyspark.sql.window import Window

    per_lang = (
        docs.select("lang", F.size(tokenize("text")).alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
        )
    )
    target = F.create_map(
        *[F.lit(x) for kv in MIX_TARGETS.items() for x in kv]
    )[F.col("lang")]
    # global window over the 5-row mixture table — post-agg, trivially
    # small; the corpus itself is touched by exactly one hash-agg
    total = F.sum("tokens").over(Window.partitionBy())
    planned = per_lang.select(
        "lang",
        "n_docs",
        "tokens",
        F.round(F.col("tokens") / total, 6).alias("natural_share"),
        target.alias("target_share"),
        F.round(target * total / F.col("tokens"), 6).alias("epochs"),
    )
    return planned.withColumn(
        "mode",
        F.when(F.col("epochs") > 1.0, F.lit("upsample"))
        .when(F.col("epochs") < 1.0, F.lit("downsample"))
        .otherwise(F.lit("keep")),
    )


_mix_cases = " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in MIX_TARGETS.items()
)

MIX_SQL = f"""
WITH per_lang AS (
    SELECT lang, count(*) AS n_docs,
           CAST(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                    t -> t <> ''))) AS BIGINT) AS tokens
    FROM documents
    GROUP BY lang
),
tot AS (SELECT CAST(sum(tokens) AS DOUBLE) AS total FROM per_lang)
SELECT lang, n_docs, tokens,
       round(tokens / total, 6) AS natural_share,
       CAST(CASE lang {_mix_cases} END AS DOUBLE) AS target_share,
       round((CASE lang {_mix_cases} END) * total / tokens, 6) AS epochs,
       CASE WHEN round((CASE lang {_mix_cases} END) * total / tokens, 6) > 1.0
            THEN 'upsample'
            WHEN round((CASE lang {_mix_cases} END) * total / tokens, 6) < 1.0
            THEN 'downsample'
            ELSE 'keep' END AS mode
FROM per_lang, tot
"""


def corpus_sample_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_mix_plan made EXECUTABLE: a deterministic per-document
    repeat count that realizes the target language mixture. Each doc
    gets n_repeats = floor(epochs) plus one more iff its md5 bucket
    (over a 1e6 grid) falls below the fractional part — so a language
    at epochs 2.3 has every doc appear twice and a reproducible 30%
    slice appear a third time, and the expected token mixture equals
    the target exactly. Hash buckets, not rand(): re-runs, engine
    changes, and corpus appends never flip an existing doc's count —
    the same stability contract as split_assign_documents.

    All arithmetic is integer-exact for the oracle: epochs in micros
    via DECIMAL(38,0) widening (target_micros x total_tokens reaches
    ~1e19 at a 100 TB corpus — past int64, same overflow class as the
    unigram ppb fix), one integral divide per language. Languages
    outside the target mixture get n_repeats 0 (dropped), mirroring
    the mix plan's missing-target semantics.

    Plan: one corpus hash-agg for the 5-row per-language inventory,
    the epochs table joined back on lang (broadcast), everything else
    a codegen'd projection — zero extra shuffles over the inventory
    agg."""
    from pyspark.sql.window import Window

    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    per_doc = docs.select(
        "doc_id",
        "lang",
        F.size(tokenize("text")).alias("n_tokens"),
        # 8 hex digits (not _hash_bucket's 4: 16^4 = 65536 can't
        # resolve a 1e6 grid) -> uniform bucket in [0, 1e6)
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 1000000"
        ).alias("bucket"),
    )
    target_micros = F.create_map(
        *[
            F.lit(x)
            for k, v in MIX_TARGETS.items()
            for x in (k, int(round(v * 1_000_000)))
        ]
    )[F.col("lang")]
    per_lang = (
        per_doc.groupBy("lang")
        .agg(F.sum("n_tokens").cast("bigint").alias("lang_tokens"))
        .withColumn("tm", target_micros)
        .withColumn(
            "total_tokens",
            F.sum("lang_tokens").over(Window.partitionBy()),
        )
        .select(
            "lang",
            # lang_tokens > 0 guard: a language whose every doc is
            # empty would hit an ANSI divide-by-zero (and DuckDB's //0
            # error) — such a language has nothing to sample; 0 repeats
            F.coalesce(
                F.expr(
                    "CASE WHEN lang_tokens > 0 THEN"
                    " CAST((CAST(tm AS DECIMAL(38,0)) * total_tokens)"
                    " div lang_tokens AS BIGINT) END"
                ),
                F.lit(0).cast("bigint"),
            ).alias("epochs_micros"),
        )
    )
    n_repeats = F.expr("epochs_micros div 1000000") + F.when(
        F.col("bucket") < F.col("epochs_micros") % 1_000_000, 1
    ).otherwise(0)
    return per_doc.join(per_lang, "lang").select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "bucket",
        "epochs_micros",
        n_repeats.cast("bigint").alias("n_repeats"),
    )


_micros_cases = " ".join(
    f"WHEN '{k}' THEN {int(round(v * 1_000_000))}"
    for k, v in MIX_TARGETS.items()
)

SAMPLE_ASSIGN_SQL = f"""
WITH per_doc AS (
    SELECT doc_id, lang,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> t <> '')) AS BIGINT) AS n_tokens,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                AS BIGINT) % 1000000 AS bucket
    FROM documents
),
per_lang AS (
    SELECT lang, sum(n_tokens) AS lang_tokens,
           CASE lang {_micros_cases} END AS tm
    FROM per_doc GROUP BY lang
),
tot AS (SELECT sum(lang_tokens) AS total_tokens FROM per_lang),
epochs AS (
    SELECT lang,
           coalesce(CASE WHEN lang_tokens > 0 THEN
                        CAST((tm::HUGEINT * total_tokens) // lang_tokens
                             AS BIGINT) END, 0) AS epochs_micros
    FROM per_lang, tot
)
SELECT d.doc_id, d.lang, d.n_tokens, d.bucket, e.epochs_micros,
       CAST(e.epochs_micros // 1000000
            + CASE WHEN d.bucket < e.epochs_micros % 1000000
                   THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
FROM per_doc d JOIN epochs e USING (lang)
"""


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted language mixture, made executable like
    corpus_sample_assign — but the target shares come from the corpus
    itself instead of a hand-set MIX_TARGETS table: p_lang ∝
    n_lang^(1/T) with T=2, the standard multilingual-LLM recipe
    (mBERT/XLM-R exponent smoothing) that up-weights low-resource
    languages without flattening the mixture. Output: one row per doc
    with its deterministic n_repeats realizing the temperature shares.

    T is pinned at 2 because sqrt is the ONE power function IEEE
    requires to be correctly rounded — both engines produce the
    bit-identical double, so the weights stay oracle-exact; a general
    pow(x, 1/T) is not correctly rounded and could diverge in the
    last ulp right at a floor boundary. The sqrt lands on a 1e3
    integer grid (floor(sqrt(tokens) * 1000)) and everything after is
    integer arithmetic: weight_micros by integral divide over the
    grid sum, epochs via the DECIMAL(38,0)/HUGEINT widening (the
    1e19-at-100TB product, same class as corpus_sample_assign), and
    the per-doc repeat decision on the md5 bucket grid — append-stable
    like split_assign_documents.

    Plan: one corpus hash-agg for the per-language inventory, a
    |langs|-row broadcast join back, codegen projections — zero extra
    shuffles."""
    from pyspark.sql.window import Window

    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    per_doc = docs.select(
        "doc_id",
        "lang",
        F.size(tokenize("text")).alias("n_tokens"),
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 1000000"
        ).alias("bucket"),
    )
    per_lang = (
        per_doc.groupBy("lang")
        .agg(F.sum("n_tokens").cast("bigint").alias("lang_tokens"))
        .withColumn(
            "sqrt_grid",
            F.floor(
                F.sqrt(F.col("lang_tokens").cast("double")) * 1000
            ).cast("bigint"),
        )
        .withColumn(
            "grid_sum",
            F.sum("sqrt_grid").over(Window.partitionBy()),
        )
        .withColumn(
            "total_tokens",
            F.sum("lang_tokens").over(Window.partitionBy()),
        )
        .select(
            "lang",
            F.expr(
                "CASE WHEN grid_sum > 0 THEN"
                " (sqrt_grid * CAST(1000000 AS BIGINT)) div grid_sum"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("weight_micros"),
            "lang_tokens",
            "total_tokens",
        )
        .select(
            "lang",
            "weight_micros",
            F.coalesce(
                F.expr(
                    "CASE WHEN lang_tokens > 0 THEN"
                    " CAST((CAST(weight_micros AS DECIMAL(38,0))"
                    " * total_tokens) div lang_tokens AS BIGINT) END"
                ),
                F.lit(0).cast("bigint"),
            ).alias("epochs_micros"),
        )
    )
    n_repeats = F.expr("epochs_micros div 1000000") + F.when(
        F.col("bucket") < F.col("epochs_micros") % 1_000_000, 1
    ).otherwise(0)
    return per_doc.join(per_lang, "lang").select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "bucket",
        "weight_micros",
        "epochs_micros",
        n_repeats.cast("bigint").alias("n_repeats"),
    )


TEMPERATURE_MIX_SQL = """
WITH per_doc AS (
    SELECT doc_id, lang,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> t <> '')) AS BIGINT) AS n_tokens,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                AS BIGINT) % 1000000 AS bucket
    FROM documents
),
per_lang AS (
    SELECT lang, sum(n_tokens) AS lang_tokens,
           CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE)) * 1000)
                AS BIGINT) AS sqrt_grid
    FROM per_doc GROUP BY lang
),
tot AS (SELECT sum(sqrt_grid) AS grid_sum,
               sum(lang_tokens) AS total_tokens
        FROM per_lang),
weights AS (
    SELECT lang, lang_tokens,
           CASE WHEN grid_sum > 0
                THEN CAST((sqrt_grid * CAST(1000000 AS BIGINT))
                          // grid_sum AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS weight_micros,
           total_tokens
    FROM per_lang, tot
),
epochs AS (
    SELECT lang, weight_micros,
           coalesce(CASE WHEN lang_tokens > 0 THEN
                        CAST((weight_micros::HUGEINT * total_tokens)
                             // lang_tokens AS BIGINT) END,
                    0) AS epochs_micros
    FROM weights
)
SELECT d.doc_id, d.lang, d.n_tokens, d.bucket,
       e.weight_micros, e.epochs_micros,
       CAST(e.epochs_micros // 1000000
            + CASE WHEN d.bucket < e.epochs_micros % 1000000
                   THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
FROM per_doc d JOIN epochs e USING (lang)
"""


QUERIES = {
    "docs_pack_greedy": docs_pack_greedy,
    "corpus_mix_plan": corpus_mix_plan,
    "corpus_sample_assign": corpus_sample_assign,
    "corpus_temperature_mix": corpus_temperature_mix,
}

ORACLE_SQL = {
    "docs_pack_greedy": PACK_SQL,
    "corpus_mix_plan": MIX_SQL,
    "corpus_sample_assign": SAMPLE_ASSIGN_SQL,
    "corpus_temperature_mix": TEMPERATURE_MIX_SQL,
}


def docs_pack_nextfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOC-BOUNDARY-PRESERVING packing — next-fit-decreasing per
    shard: where docs_pack_greedy concatenates the token stream and
    lets sequences cut across documents, this variant never splits a
    document (the packing used when attention must not cross doc
    boundaries and cross-doc contamination of a sequence is
    unacceptable): within each md5 shard, docs are taken in
    (n_tokens DESC, doc_id) order; a doc goes into the current pack
    if it fits the remaining budget, else a new pack opens. An
    oversized doc (> PACK_BUDGET tokens) gets a pack of its own.
    Output: (doc_id, n_tokens, shard, pack_id, pack_fill) — pack_fill
    is the pack's running token count AFTER this doc, so per-pack
    waste audits fall out of max(pack_fill) per pack.

    This is the repo's applyInPandas tier on an inherently SEQUENTIAL
    algorithm: next-fit's state (current pack's remaining budget)
    folds left-to-right and no window/cumsum can express the reset,
    so each shard's fold runs as one Arrow-batched pandas kernel —
    the sanctioned custom-operator path when built-ins genuinely
    can't express the semantics. Parallelism = shards (the same unit
    docs_pack_greedy uses); per-task state is one integer; the
    kernel touches (doc_id, n_tokens) only — wide text never enters
    the pandas boundary. The DuckDB oracle folds the same order with
    a RECURSIVE CTE (one step per doc within a shard), so even the
    sequential algorithm is full-oracle-checked.

    Next-fit (not first-fit/best-fit) is deliberate: FFD/BFD need a
    per-pack free-list that grows with the shard, while next-fit is
    O(1)-state and its decreasing order already bounds waste — the
    standard quality/parallelism trade for distributed packing."""
    import pandas as pd

    tune(spark)
    toks = load_documents_parallel(spark, sf_dir).select(
        "doc_id",
        F.size(tokenize(F.coalesce(F.col("text"), F.lit("")))).alias(
            "n_tokens"
        ),
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
            f" AS BIGINT) % {N_SHARDS}"
        ).cast("int").alias("shard"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        seq, fill = 0, 0
        seqs, fills = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > PACK_BUDGET:
                seq, fill = seq + 1, 0
            fill += n
            seqs.append(seq)
            fills.append(fill)
        pdf["pack_seq"] = seqs
        pdf["pack_fill"] = fills
        return pdf

    out_schema = (
        "doc_id bigint, n_tokens int, shard int,"
        " pack_seq bigint, pack_fill bigint"
    )
    packed = toks.groupBy("shard").applyInPandas(fold, out_schema)
    return packed.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "shard",
        (
            F.col("shard").cast("bigint") * F.lit(PACK_SHARD_STRIDE)
            + F.col("pack_seq")
        )
        .cast("bigint")
        .alias("pack_id"),
        F.col("pack_fill").cast("bigint").alias("pack_fill"),
    )


PACK_NEXTFIT_SQL = f"""
WITH RECURSIVE toks AS (
    SELECT doc_id,
           CAST(len(list_filter(
               string_split_regex(lower(coalesce(text, '')), '\\s+'),
               t -> t <> '')) AS BIGINT) AS n_tokens,
           CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                     AS BIGINT) % {N_SHARDS} AS INT) AS shard
    FROM documents
),
ordered AS (
    SELECT *,
           row_number() OVER (PARTITION BY shard
                              ORDER BY n_tokens DESC, doc_id) AS rn
    FROM toks
),
fold AS (
    SELECT shard, rn, doc_id, n_tokens,
           CAST(0 AS BIGINT) AS pack_seq,
           n_tokens AS pack_fill
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
           CASE WHEN f.pack_fill > 0
                     AND f.pack_fill + d.n_tokens > {PACK_BUDGET}
                THEN f.pack_seq + 1 ELSE f.pack_seq END,
           CASE WHEN f.pack_fill > 0
                     AND f.pack_fill + d.n_tokens > {PACK_BUDGET}
                THEN d.n_tokens ELSE f.pack_fill + d.n_tokens END
    FROM fold f
    JOIN ordered d ON d.shard = f.shard AND d.rn = f.rn + 1
)
SELECT doc_id,
       n_tokens,
       shard,
       CAST(shard * {PACK_SHARD_STRIDE} + pack_seq AS BIGINT) AS pack_id,
       CAST(pack_fill AS BIGINT) AS pack_fill
FROM fold
"""


QUERIES["docs_pack_nextfit"] = docs_pack_nextfit
ORACLE_SQL["docs_pack_nextfit"] = PACK_NEXTFIT_SQL
