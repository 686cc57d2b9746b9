"""Raw text-directory ingestion — the reference's actual input format
(S1/S2, loadFilesPartial.py:5-40) as DISTRIBUTED scans.

The reference walks `path/pos` + `path/neg` with os.walk and open(),
pulling every document through driver memory; `loadUknown` keys records
by filename stem. Here the same directory contract is read by
executors: `spark.read.text` with one-record-per-file, labels derived
from the path, ids from the filename — all Catalyst expressions, any
number of files, no driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_labeled_textdir(spark: SparkSession, path: str) -> DataFrame:
    """S1 `loadLabeled(path)`: reads `{path}/pos/*.txt` and
    `{path}/neg/*.txt`, one document per file; label 1.0/0.0 from the
    subdirectory — the reference's np.ones/np.zeros concat
    (loadFilesPartial.py:17-25) as a column expression."""
    raw = spark.read.text(
        [f"{path}/pos", f"{path}/neg"], wholetext=True
    ).select(
        F.col("value").alias("review"),
        F.input_file_name().alias("_file"),
    )
    # match the segment immediately preceding the FILENAME, not a
    # substring of the whole URI — a base path like /srv/pos/imdb
    # would otherwise label every neg document positive
    label = F.when(
        F.col("_file").rlike("/pos/[^/]+$"), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return raw.select("review", label.alias("label"))


def load_unknown_textdir(spark: SparkSession, path: str) -> DataFrame:
    """S2 `loadUknown(path)`: unlabeled docs keyed by filename stem
    (loadFilesPartial.py:30-40 `files[i].split(".")[0]`)."""
    raw = spark.read.text(path, wholetext=True).select(
        F.col("value").alias("review"), F.input_file_name().alias("_file")
    )
    name = F.regexp_extract(F.col("_file"), r"([^/]+?)(?:\.[^./]*)?$", 1)
    return raw.select(name.alias("name"), "review")
