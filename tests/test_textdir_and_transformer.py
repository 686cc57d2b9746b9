"""S1/S2 text-directory ingestion + §2.11 custom-Transformer packaging."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_corpus(tmp_path):
    for sub, texts in (
        ("pos", ["great spark movie", "loved the shuffle"]),
        ("neg", ["terrible skew", "worst join ever <br /> bad"]),
    ):
        d = tmp_path / "train" / sub
        d.mkdir(parents=True)
        for i, t in enumerate(texts):
            (d / f"{sub}{i:03d}.txt").write_text(t)
    u = tmp_path / "test"
    u.mkdir()
    (u / "00042.txt").write_text("unknown doc")
    return str(tmp_path / "train"), str(u)


def test_load_labeled_textdir(spark, tmp_path):
    from projetbigdata_spark.sources.textdir import load_labeled_textdir

    train_dir, _ = _write_corpus(tmp_path)
    df = load_labeled_textdir(spark, train_dir)
    assert df.columns == ["review", "label"]
    assert df.count() == 4
    by_label = {r.label: r.n for r in df.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert by_label == {1.0: 2, 0.0: 2}
    pos_reviews = {r.review for r in df.where(F.col("label") == 1.0).collect()}
    assert pos_reviews == {"great spark movie", "loved the shuffle"}


def test_load_unknown_textdir_keys_by_stem(spark, tmp_path):
    from projetbigdata_spark.sources.textdir import load_unknown_textdir

    _, test_dir = _write_corpus(tmp_path)
    df = load_unknown_textdir(spark, test_dir)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].name == "00042"
    assert rows[0].review == "unknown doc"


def test_catalyst_tokenizer_in_pipeline_roundtrip(spark, tmp_path):
    """The custom Transformer slots into a Pipeline, produces the same
    tokens as the raw expression, and survives save/load (the Params
    persistence the reference's pickle path lacked)."""
    from pyspark.ml import Pipeline, PipelineModel

    from projetbigdata_spark.ml.transformers import CatalystTokenizer

    df = spark.createDataFrame(
        [(1, "The Quick  brown fox and the dog",)], "id int, text string"
    )
    tok = CatalystTokenizer(inputCol="text", outputCol="tokens")
    model = Pipeline(stages=[tok]).fit(df)
    out = model.transform(df).first().tokens
    # 'the'/'and' are stopwords; case folded; whitespace runs collapse
    assert out == ["quick", "brown", "fox", "dog"]

    path = str(tmp_path / "tok_pipeline")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    assert reloaded.transform(df).first().tokens == out
    assert reloaded.stages[0].getStopwords() == tok.getStopwords()


def test_textdir_corpus_feeds_ml_pipeline(spark, tmp_path):
    """The reference's actual user journey: point the engine at a raw
    pos/neg directory and train the flagship pipeline on it directly —
    the loader's output schema (review, label) is pipeline-ready."""
    from projetbigdata_spark.ml.pipeline import build_pipeline
    from projetbigdata_spark.sources.textdir import load_labeled_textdir

    train_dir, _ = _write_corpus(tmp_path)
    docs = load_labeled_textdir(spark, train_dir).withColumnRenamed(
        "review", "text"
    )
    model = build_pipeline("lr", num_features=1 << 8).fit(docs)
    scored = model.transform(docs)
    assert scored.count() == 4
    assert scored.where(F.col("prediction").isNull()).count() == 0
