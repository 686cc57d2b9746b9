"""Generate the COMMITTED multi-line golden lane (NEXT.md r10 item 3).

The driver's parquet fixtures are single-line synthetic text, so every
line/paragraph-granularity operator (dedup_lines, corpus_c4_clean,
corpus_gopher_clean, text_gopher_repetition, text_lang_lines) rides
constructed per-test frames for its live behavior. This tool freezes
one shared multi-line corpus as a COMMITTED parquet plus the expected
outputs of all five operators as a committed JSON, giving the suite a
standing regression lane that is independent of fixture regeneration
AND of per-test frame-construction code.

Expected values are produced by running each registered query AND its
DuckDB oracle over the written table; the tool refuses to write the
golden if the engines disagree. Re-run only when an operator's
semantics intentionally change:

    python tools/gen_multiline_golden.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
    "multiline",
)
EXPECTED = os.path.join(
    os.path.dirname(GOLDEN_DIR), "multiline_expected.json"
)

LANE_QUERIES = (
    "dedup_lines",
    "dedup_lines_within",
    "text_normalize",
    "corpus_c4_clean",
    "corpus_gopher_clean",
    "text_gopher_repetition",
    "corpus_gopher_repetition_clean",
    "text_lang_lines",
)

_BANNER = "accept our cookies to continue reading this site."
_NAV = "home | products | about | contact"
_GOOD_BODY = (
    "the quick brown fox jumps over the lazy dog every single morning "
    "and the dog never seems to mind because they have been friends "
    "for many years now, sharing the same yard with patient goodwill.\n"
    "every afternoon the two of them walk along the river bank and "
    "watch the boats drift past the old stone bridge in easy silence.\n"
    "people in the village say that you can set your watch by them."
)


def corpus_rows():
    """Deterministic multi-line corpus: every live path of the five
    lane operators is reachable — cross-doc repeated lines, within-doc
    repeats, empty lines, bullets, ellipses, C4 gates, Gopher passes
    and failures, unicode, NULL/empty text."""
    rows = [
        # 0-2: boilerplate banner + nav repeated across docs (the
        # dedup_lines cut path; doc 0 keeps first occurrences)
        (0, f"{_BANNER}\n{_NAV}\n{_GOOD_BODY}", "en", "web"),
        (1, f"{_BANNER}\n{_NAV}\nfresh words appear on this page.", "en", "web"),
        (2, f"{_NAV}\n{_BANNER}\nanother page body with new text.", "en", "web"),
        # 3: within-doc repeated lines + empty lines (preserved)
        (3, "repeat me.\n\nrepeat me.\nrepeat me.\nunique tail.", "en", "web"),
        # 4: a Gopher-passing doc (>=50 words, required words, clean)
        (4, _GOOD_BODY, "en", "books"),
        # 5: C4 gates — javascript line, lorem ipsum, brace
        (5, "enable javascript to view this page.\nlorem ipsum dolor "
            "sit amet.\nfunction f() { return 1; }\na real sentence "
            "stands alone here.", "en", "web"),
        # 6: bullets + ellipses (Gopher line rules, C4 terminal rule)
        (6, "- first bullet item\n- second bullet item\n* third one\n"
            "trailing thought...\nand another one…", "en", "web"),
        # 7: repeated 5..10-grams (the repetition coverage path)
        (7, ("the cat sat on the mat and then " * 4).strip() + ".",
         "en", "web"),
        # 8: unicode text, non-en marker profile
        (8, "café au lait très bon.\nune deuxième ligne française.\n"
            "café au lait très bon.", "fr", "web"),
        # 9: mixed languages per line (text_lang_lines mixed flag)
        (9, "the cat is on the mat with the dog.\nel gato está en la "
            "alfombra.\nthe dog is by the door of the house.", "en",
         "web"),
        # 10-11: degenerate rows
        (10, None, None, "web"),
        (11, "", "en", "web"),
        # 12: single line, single token
        (12, "solo", "en", "web"),
        # 13: numbers-heavy (Gopher alpha-word rule)
        (13, " ".join(["the", "with"] + ["1234"] * 58), "en", "logs"),
        # 14: symbol-heavy (Gopher symbol rule)
        (14, "the data with hash tags " + "# " * 20 + "ends here.",
         "en", "web"),
        # 15: normalization fodder — curly quotes, em dash, ellipsis,
        # CRLF, NBSP, double spaces (text_normalize's live paths)
        (15, "“Smart” quotes — and spaces…\r\n"
             "second  line  here.", "en", "web"),
        # 16 (r10): the REST of the Zs category + zero-width junk --
        # en/thin/hair/math/ogham spaces fold to ' ', ZWSP and BOM
        # strip, ZWNJ survives (the ADVICE-r9 fold-map extension
        # pinned on the committed lane, not just constructed rows)
        (16, "en\u2002space\u2009thin\u200aand\u205fhair\u1680og"
             "ham\u200bzwsp\ufeff\nkept\u200cjoiner line.", "en",
         "web"),
    ]
    return rows


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("gen-multiline-golden")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(GOLDEN_DIR, ignore_errors=True)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    df = (
        spark.createDataFrame(
            corpus_rows(), "doc_id bigint, text string, lang string, source string"
        )
        .withColumn("n_chars", F.length("text"))
        .coalesce(1)
    )
    df.write.mode("overwrite").parquet(f"{GOLDEN_DIR}/documents.parquet")

    from projetbigdata_spark import registry

    queries, oracles = registry.collect()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{GOLDEN_DIR}/documents.parquet/*.parquet')"
    )
    expected: dict[str, dict[str, dict]] = {}
    for name in LANE_QUERIES:
        sdf = queries[name](spark, GOLDEN_DIR)
        got = {r["doc_id"]: r.asDict() for r in sdf.collect()}
        cur = con.execute(oracles[name])
        cols = [c[0] for c in cur.description]
        want = {r[0]: dict(zip(cols, r, strict=True)) for r in cur.fetchall()}
        assert got == want, (
            f"{name}: Spark/DuckDB disagree on the lane corpus — "
            "refusing to write a golden"
        )
        expected[name] = {
            str(k): {c: v for c, v in row.items() if c != "doc_id"}
            for k, row in sorted(got.items())
        }
        print(f"{name}: {len(got)} rows, parity OK")
    with open(EXPECTED, "w") as f:
        json.dump(expected, f, indent=1, sort_keys=True)
    print(f"wrote {EXPECTED} and {GOLDEN_DIR}/documents.parquet")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
