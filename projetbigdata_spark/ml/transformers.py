"""Custom pyspark.ml Transformer packaging (§2.11) — the reference
wraps its NLTK tokenizer in a Transformer subclass with Params
(transformers.py:9-41 `NLTKWordPunctTokenizer(stopwords=...)`) so it
slots into Pipelines. Same packaging idiom, modern API, but the
transform itself stays a Catalyst expression (functions/text.py) —
no Python row path, so the custom Transformer costs nothing at scale.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import HasInputCol, HasOutputCol
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame

from projetbigdata_spark.functions.text import STOPWORDS


class CatalystTokenizer(
    Transformer,
    HasInputCol,
    HasOutputCol,
    DefaultParamsReadable,
    DefaultParamsWritable,
):
    """T2 re-packaged: whitespace tokenizer + stopword filter as a
    Pipeline-compatible Transformer whose transform is pure Catalyst
    (tokenize + filter_stopwords higher-order fns). Params serialize
    via DefaultParams{Readable,Writable} — the persistence the
    reference's pickle approach couldn't deliver (S7)."""

    stopwords = Param(
        Params._dummy(),
        "stopwords",
        "tokens to drop after lowercasing",
        typeConverter=TypeConverters.toListString,
    )

    @keyword_only
    def __init__(self, inputCol="text", outputCol="tokens", stopwords=None):
        super().__init__()
        self._setDefault(stopwords=list(STOPWORDS))
        kwargs = self._input_kwargs
        if kwargs.get("stopwords") is None:
            kwargs.pop("stopwords", None)
        self._set(**kwargs)

    def getStopwords(self) -> list[str]:
        return self.getOrDefault(self.stopwords)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        from projetbigdata_spark.functions.text import tokenize

        sw = F.array(*[F.lit(w) for w in self.getStopwords()])
        toks = tokenize(self.getInputCol())
        filtered = F.filter(toks, lambda t: ~F.array_contains(sw, t))
        return dataset.withColumn(self.getOutputCol(), filtered)
