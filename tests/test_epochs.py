"""Epoch manifest layer (r12, VERDICT r11 item 3): the r11 artifact
families gain a manifest written LAST, a latest-valid-epoch reader,
and torn-write rejection; every family loader resolves an epoch root
transparently, so the streaming twins' path arguments take an epoch
root with no signature change.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _standing_batch(spark):
    from projetbigdata_spark.operators.dedup import INCR_NEW_SOURCE
    from projetbigdata_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    return (
        docs.where(F.col("source") != INCR_NEW_SOURCE),
        docs.where(F.col("source") == INCR_NEW_SOURCE),
    )


def test_manifest_roundtrip_and_counts(spark, tmp_path):
    """save_epoch writes the family tables then the manifest LAST;
    the manifest round-trips the epoch id, the build params (as
    strings), and per-table row counts that match the tables on
    disk."""
    from projetbigdata_spark.operators.epochs import (
        epoch_path,
        family_tables,
        read_manifest,
        save_epoch,
    )
    from projetbigdata_spark.operators.selection import (
        ccnet_frozen_policy,
        save_ccnet_policy,
    )

    standing, _ = _standing_batch(spark)
    policy = ccnet_frozen_policy(standing)
    root = str(tmp_path / "policies")
    tables = family_tables("ccnet_policy")
    path = save_epoch(
        spark,
        root,
        7,
        lambda p: save_ccnet_policy(policy, p),
        tables,
        params={"min_count": 1, "salt": "ccnetcap"},
    )
    assert path == epoch_path(root, 7)

    m = read_manifest(spark, path)
    assert m is not None
    assert m["epoch_id"] == 7
    assert m["params"] == {"min_count": "1", "salt": "ccnetcap"}
    assert set(m["tables"]) == set(tables)
    for t, n in m["tables"].items():
        assert spark.read.parquet(f"{path}/{t}").count() == n


def test_latest_valid_epoch_skips_torn(spark, tmp_path):
    """The reader contract: a torn epoch (missing manifest, or a
    manifest listing a table that is gone) is skipped, never loaded;
    the newest COMPLETE epoch wins; with only torn epochs the
    resolver refuses outright."""
    import pytest

    from projetbigdata_spark.operators.epochs import (
        epoch_path,
        family_tables,
        latest_valid_epoch,
        resolve_artifact_path,
        save_epoch,
    )
    from projetbigdata_spark.operators.selection import (
        ccnet_frozen_policy,
        save_ccnet_policy,
    )

    standing, _ = _standing_batch(spark)
    policy = ccnet_frozen_policy(standing)
    root = str(tmp_path / "policies")
    tables = family_tables("ccnet_policy")

    # epoch 1: complete
    save_epoch(spark, root, 1, lambda p: save_ccnet_policy(policy, p), tables)
    # epoch 2: crashed before the manifest (no _MANIFEST on disk)
    save_ccnet_policy(policy, epoch_path(root, 2))
    # epoch 3: manifest present but a listed table was deleted after
    # publication (bad rollback)
    save_epoch(spark, root, 3, lambda p: save_ccnet_policy(policy, p), tables)
    shutil.rmtree(f"{epoch_path(root, 3)}/th")

    assert latest_valid_epoch(spark, root) == epoch_path(root, 1)
    assert resolve_artifact_path(spark, root) == epoch_path(root, 1)

    # epoch 4 lands complete -> newest valid wins
    save_epoch(spark, root, 4, lambda p: save_ccnet_policy(policy, p), tables)
    assert latest_valid_epoch(spark, root) == epoch_path(root, 4)

    # a root with ONLY torn epochs refuses to resolve
    root2 = str(tmp_path / "torn_only")
    save_ccnet_policy(policy, epoch_path(root2, 1))
    with pytest.raises(ValueError, match="torn"):
        resolve_artifact_path(spark, root2)

    # and a direct (non-epoch) artifact path passes through unchanged
    direct = str(tmp_path / "direct")
    save_ccnet_policy(policy, direct)
    assert resolve_artifact_path(spark, direct) == direct


def test_loaders_accept_epoch_root(spark, tmp_path):
    """Every family loader resolves an epoch root to the latest valid
    epoch — pinned here for the policy (apply ≡ direct-path load) and
    the Bloom bits (bits + geometry identical), the two families the
    streaming twins read; the IVF loader shares the same
    resolve_artifact_path line."""
    from projetbigdata_spark.operators.dedup import (
        bloom_bits_frame,
        load_bloom_bits,
        save_bloom_bits,
    )
    from projetbigdata_spark.operators.epochs import family_tables, save_epoch
    from projetbigdata_spark.operators.selection import (
        ccnet_apply_policy,
        ccnet_frozen_policy,
        load_ccnet_policy,
        save_ccnet_policy,
    )

    standing, batch = _standing_batch(spark)

    policy = ccnet_frozen_policy(standing)
    root = str(tmp_path / "policies")
    save_epoch(
        spark,
        root,
        1,
        lambda p: save_ccnet_policy(policy, p),
        family_tables("ccnet_policy"),
    )
    from_root = ccnet_apply_policy(batch, load_ccnet_policy(spark, root))
    built = ccnet_apply_policy(batch, policy)
    assert from_root.count() == built.count() > 0
    assert from_root.subtract(built).count() == 0
    assert built.subtract(from_root).count() == 0

    m_custom = 1 << 12
    broot = str(tmp_path / "bloom")
    bits = bloom_bits_frame(standing, m=m_custom)
    save_epoch(
        spark,
        broot,
        1,
        lambda p: save_bloom_bits(bits, p, m=m_custom),
        family_tables("bloom_bits"),
    )
    loaded, m = load_bloom_bits(spark, broot)
    assert m == m_custom  # the epoch's meta (geometry) resolves too
    assert loaded.subtract(bits).count() == 0
    assert bits.subtract(loaded).count() == 0


def test_bloom_stream_reads_epoch_root(spark, tmp_path):
    """The streaming surface of the done-criterion: the Bloom twin's
    bits_path given an EPOCH ROOT (not a table path) reproduces the
    batch twin — the loader resolves the latest valid epoch under the
    hood, so the twin's signature never changed."""
    from projetbigdata_spark.operators.dedup import (
        bloom_bits_frame,
        dedup_incremental_bloom,
        save_bloom_bits,
    )
    from projetbigdata_spark.operators.epochs import family_tables, save_epoch
    from projetbigdata_spark.streaming.jobs import bloom_membership_stream

    standing, batch = _standing_batch(spark)
    root = str(tmp_path / "bloom_epochs")
    save_epoch(
        spark,
        root,
        1,
        lambda p: save_bloom_bits(bloom_bits_frame(standing), p),
        family_tables("bloom_bits"),
    )

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    batch.select("doc_id", "source", "text").coalesce(1).write.parquet(
        f"{in_dir}/b0.parquet"
    )
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = bloom_membership_stream(stream, SF_SMOKE, out_dir, bits_path=root).start()
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    want = dedup_incremental_bloom(spark, SF_SMOKE)
    cols = ["doc_id", "possibly_dup"]
    assert streamed.count() == want.count()
    assert streamed.select(*cols).subtract(want.select(*cols)).count() == 0
    assert want.select(*cols).subtract(streamed.select(*cols)).count() == 0
