"""Anchor regression for dedup_incremental / dedup_contamination.

Docs with <2 whitespace tokens produce no bigram shingles, hence no
minhash signature. The Spark operators must still emit a verdict row
for them (is_dup=FALSE, NULL match) because the oracles anchor on the
full document population — previously such docs silently vanished
from the Spark side (ADVICE.md r2, medium). Fixtures here contain an
empty doc and a one-token doc in the new/eval slice.
"""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def short_docs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("short_docs")
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        # new batch (src0): one normal, one near-dup of corpus, one
        # empty, one single-token. doc_ids 1-4 md5-hash into the
        # train split; 5/8/14/18 hash into val/test (so the
        # contamination query has eval docs, incl. unsigned ones).
        (1, "the quick brown fox jumps over the lazy dog tonight", "en", "src0", 50),
        (2, dup, "en", "src0", 56),
        (3, "", "en", "src0", 0),
        (4, "solitary", "en", "src0", 8),
        # standing corpus (src1); 5=val near-dup, 8/14=test unsigned,
        # 18=val normal, 10-12=train
        (5, dup, "en", "src1", 56),
        (8, "solitary", "en", "src1", 8),
        (14, "", "en", "src1", 0),
        (18, "an ordinary evaluation document with plenty of words inside", "en", "src1", 59),
        (10, dup, "en", "src1", 56),
        (11, "completely unrelated corpus text about weather patterns today", "en", "src1", 61),
        (12, "x", "en", "src1", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _compare(spark, sf_dir, fn, sql, id_col="doc_id"):
    got = {r[id_col]: r.asDict() for r in fn(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    cur = con.execute(sql)
    names = [c[0] for c in cur.description]
    want = {r[names.index(id_col)]: dict(zip(names, r)) for r in cur.fetchall()}
    con.close()
    return got, want


def test_incremental_includes_unsigned_docs(spark, short_docs_dir):
    from projetbigdata_spark.operators.dedup import (
        INCREMENTAL_SQL,
        dedup_incremental,
    )

    got, want = _compare(spark, short_docs_dir, dedup_incremental, INCREMENTAL_SQL)
    # all four src0 docs must be present, including the unsigned ones
    assert set(got) == {1, 2, 3, 4}
    assert set(got) == set(want)
    for k in got:
        g, w = got[k], want[k]
        assert g["is_dup"] == w["is_dup"], (k, g, w)
        assert g["best_match"] == w["best_match"], (k, g, w)
    # unsigned docs: explicit non-dup with NULL match
    for k in (3, 4):
        assert got[k]["is_dup"] is False
        assert got[k]["best_match"] is None
    # the near-dup pair is flagged
    assert got[2]["is_dup"] is True and got[2]["best_match"] is not None


def test_contamination_includes_unsigned_docs(spark, short_docs_dir):
    from projetbigdata_spark.operators.dedup import (
        CONTAMINATION_SQL,
        dedup_contamination,
    )

    got, want = _compare(
        spark, short_docs_dir, dedup_contamination, CONTAMINATION_SQL
    )
    assert set(got) == set(want)
    # eval population: 5 (val, near-dup of train), 8/14 (test,
    # unsigned), 18 (val, clean)
    assert set(got) == {5, 8, 14, 18}
    for k in got:
        assert got[k]["is_contaminated"] == want[k]["is_contaminated"], k
        assert got[k]["train_match"] == want[k]["train_match"], k
    for k in (8, 14):
        assert got[k]["is_contaminated"] is False
        assert got[k]["train_match"] is None
    assert got[5]["is_contaminated"] is True


def test_tier_overlap_report_consistency(spark):
    """dedup_tier_overlap_report == set algebra over the three tiers'
    own drop sets (recomputed from the registered queries), and the
    matrix invariants hold: overlap <= min(diagonals), max(diagonal)
    <= union <= sum(diagonals)."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.dedup import (
        dedup_components_minhash,
        dedup_exact,
        dedup_tier_overlap_report,
    )
    from projetbigdata_spark.operators.similarity import (
        K_CENTROIDS,
        dedup_semantic,
    )
    from projetbigdata_spark.sources.catalog import load_table
    from tests.conftest import SF_CHECK

    docs = load_table(spark, SF_CHECK, "documents").select(
        "doc_id", F.md5(F.lower("text")).alias("content_md5")
    )
    exact = {
        r.doc_id
        for r in docs.join(dedup_exact(spark, SF_CHECK), "content_md5")
        .where(F.col("doc_id") != F.col("keep_id"))
        .collect()
    }
    nd = {
        r.doc_id
        for r in dedup_components_minhash(spark, SF_CHECK)
        .where(F.col("doc_id") != F.col("component_id"))
        .collect()
    }
    sem = {
        r.vec_id
        for r in dedup_semantic(spark, SF_CHECK, k=K_CENTROIDS).collect()
    }
    sets = {"exact": exact, "neardup": nd, "semantic": sem}

    got = {
        (r.tier_a, r.tier_b): r.n_docs
        for r in dedup_tier_overlap_report(spark, SF_CHECK).collect()
    }
    assert len(got) == 7
    for t, s in sets.items():
        assert got[(t, t)] == len(s), t
    names = ["exact", "neardup", "semantic"]
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            ov = got[(a, b)]
            assert ov == len(sets[a] & sets[b]), (a, b)
            assert ov <= min(got[(a, a)], got[(b, b)])
    union = got[("any", "any")]
    assert union == len(exact | nd | sem)
    assert max(len(s) for s in sets.values()) <= union
    assert union <= sum(len(s) for s in sets.values())


@pytest.fixture(scope="module")
def bloom_docs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bloom_docs")
    rows = [
        # standing corpus (srcA)
        (100, "alpha beta gamma", "en", "srcA", 16),
        (101, "delta epsilon zeta", "en", "srcA", 18),
        (102, "eta theta iota", "en", "srcA", 14),
        # batch (src0): one exact dup of 100, two clean, one NULL text
        (1, "alpha beta gamma", "en", "src0", 16),
        (2, "kappa lambda mu", "en", "src0", 15),
        (3, "nu xi omicron", "en", "src0", 13),
        (4, None, "en", "src0", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    return str(d)


def _bloom_python(rows, m):
    """Pure-Python replica of the Bloom bit arithmetic."""
    import hashlib

    def md5hex(s):
        return hashlib.md5(s.encode()).hexdigest()

    def bits(text):
        key = md5hex(text.lower())
        return {
            int(md5hex(f"bf{i}:{key}")[:15], 16) % m for i in range(2)
        }

    filt = set()
    for doc_id, text, _l, source, _n in rows:
        if source != "src0" and text is not None:
            filt |= bits(text)
    verdicts = {}
    for doc_id, text, _l, source, _n in rows:
        if source == "src0":
            verdicts[doc_id] = (
                text is not None and bits(text) <= filt
            )
    return verdicts


def test_bloom_matches_python_model_and_laws(spark, bloom_docs_dir):
    """dedup_incremental_bloom == the Python Bloom model at BOTH the
    registered m and a collision-forcing tiny m. Laws: anchored on the
    batch; NULL text never flagged; NO false negatives (the exact dup
    is flagged at any m); tiny filters over-flag (the superset
    direction), never under-flag; the FP report's accounting ties out
    (n_flagged = n_exact_dup + n_false_pos)."""
    from projetbigdata_spark.operators.dedup import (
        BLOOM_M,
        dedup_bloom_fp_report,
        dedup_incremental_bloom,
    )

    rows = [
        (100, "alpha beta gamma", "en", "srcA", 16),
        (101, "delta epsilon zeta", "en", "srcA", 18),
        (102, "eta theta iota", "en", "srcA", 14),
        (1, "alpha beta gamma", "en", "src0", 16),
        (2, "kappa lambda mu", "en", "src0", 15),
        (3, "nu xi omicron", "en", "src0", 13),
        (4, None, "en", "src0", 0),
    ]
    for m in (BLOOM_M, 4):
        want = _bloom_python(rows, m)
        got = {
            r.doc_id: r.possibly_dup
            for r in dedup_incremental_bloom(
                spark, bloom_docs_dir, m=m
            ).collect()
        }
        assert got == want, f"m={m}"
        assert sorted(got) == [1, 2, 3, 4]  # anchored on the batch
        assert got[1] is True  # the exact dup: flagged at ANY m
        assert got[4] is False  # NULL text: unhashable, never flagged
    # tiny m over-flags (3 standing keys x 2 bits in 4 slots saturate
    # the filter) — the superset direction, never the reverse
    tiny = _bloom_python(rows, 4)
    assert sum(tiny.values()) > 1

    rep = dedup_bloom_fp_report(spark, bloom_docs_dir).collect()[0]
    assert rep.n_batch == 4
    assert rep.n_exact_dup == 1
    assert rep.n_flagged == rep.n_exact_dup + rep.n_false_pos


def test_bloom_bits_roundtrip_and_apply_equals_registered(spark, tmp_path):
    """r11 epoch artifacts: the persisted Bloom bit set drives
    bloom_apply to the registered dedup_incremental_bloom verdicts
    exactly (load-then-probe ≡ build-then-probe), and the bit set on
    disk is the skinny distinct-row form (<= K·n rows)."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.dedup import (
        BLOOM_K,
        INCR_NEW_SOURCE,
        bloom_apply,
        bloom_bits_frame,
        load_bloom_bits,
        save_bloom_bits,
    )
    from projetbigdata_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents")
    standing = docs.where(F.col("source") != INCR_NEW_SOURCE)
    batch = docs.where(F.col("source") == INCR_NEW_SOURCE)

    bits = bloom_bits_frame(standing)
    path = str(tmp_path / "bloom")
    save_bloom_bits(bits, path)
    loaded, m = load_bloom_bits(spark, path)

    from projetbigdata_spark.operators.dedup import BLOOM_M

    assert m == BLOOM_M  # default-geometry artifact round-trips its m
    n_bits = loaded.count()
    n_keys = standing.where("text IS NOT NULL").count()
    assert 0 < n_bits <= BLOOM_K * n_keys

    from projetbigdata_spark import registry

    queries, _ = registry.collect()
    want = queries["dedup_incremental_bloom"](spark, sf)
    got = bloom_apply(batch, loaded, m=m)
    assert got.count() == want.count() > 0
    assert got.subtract(want).count() == 0
    assert want.subtract(got).count() == 0


def test_bloom_custom_m_roundtrip_no_false_negatives(spark, tmp_path):
    """ADVICE r11 (medium): a bit set built and persisted at a
    NON-default m must probe at that m after load — the meta table
    carries the geometry, and the no-false-negative contract holds
    (every exact duplicate in the batch is flagged). Before the fix,
    bloom_apply silently hashed at BLOOM_M and could miss true dups."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.dedup import (
        INCR_NEW_SOURCE,
        bloom_apply,
        bloom_bits_frame,
        load_bloom_bits,
        save_bloom_bits,
    )
    from projetbigdata_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents")
    standing = docs.where(F.col("source") != INCR_NEW_SOURCE)
    batch = docs.where(F.col("source") == INCR_NEW_SOURCE)

    m_small = 1 << 10  # collision-study size, very much not BLOOM_M
    path = str(tmp_path / "bloom_small")
    save_bloom_bits(bloom_bits_frame(standing, m=m_small), path, m=m_small)
    loaded, m = load_bloom_bits(spark, path)
    assert m == m_small

    # exact duplicates of standing content present in the batch:
    exact = (
        batch.alias("b")
        .join(
            standing.alias("s"),
            F.md5(F.lower(F.col("b.text")))
            == F.md5(F.lower(F.col("s.text"))),
        )
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )
    verdicts = bloom_apply(batch, loaded, m=m)
    missed = exact.join(
        verdicts.where(~F.col("possibly_dup")), "doc_id"
    ).count()
    assert missed == 0  # one-sided: no false negatives at the built m
    # and the tiny filter actually fires (everything collides toward
    # possibly_dup=True far more often than at BLOOM_M):
    assert verdicts.where("possibly_dup").count() >= exact.count()
