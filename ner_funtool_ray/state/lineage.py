"""Per-partition lineage + resumable output (north rule; SURVEY §4).

Output layout::

    out_dir/
      subj_bucket=<k>/ *.parquet     (one directory per hash bucket)
      _manifest.json                 (atomic: tmp + rename)

The manifest records, per completed partition: row count, weight sum and a
content hash of the partition's sorted rows — a retried/resumed run that
regenerates a partition must produce identical bytes (deterministic stages),
and :func:`verify_manifest` checks exactly that.  ``resumable_write`` skips
buckets whose manifest entry is already present, so a failed run resumes
without recomputing finished partitions.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray.data

MANIFEST = "_manifest.json"


def load_manifest(out_dir: str) -> dict:
    path = os.path.join(out_dir, MANIFEST)
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    return {"partitions": {}, "lineage": {}}


def save_manifest(out_dir: str, manifest: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))  # atomic


def _partition_fingerprint(table: pa.Table) -> dict:
    """Row count + weight sum + order-insensitive content hash of one
    partition (sorted-row sha256 — byte-deterministic)."""
    cols = sorted(c for c in table.column_names if c != "subj_bucket")
    sub = table.select(cols)
    rows = sorted(
        json.dumps(r, sort_keys=True, default=str) for r in sub.to_pylist()
    )
    h = hashlib.sha256("\n".join(rows).encode("utf-8")).hexdigest()
    out = {"rows": table.num_rows, "content_sha256": h}
    if "weight" in table.column_names:
        out["weight_sum"] = int(pc.sum(table["weight"]).as_py() or 0)
    return out


def resumable_write(
    ds: "ray.data.Dataset",
    out_dir: str,
    bucket_col: str = "subj_bucket",
    lineage: dict | None = None,
) -> dict:
    """Write ``ds`` partitioned by ``bucket_col``, skipping buckets already
    recorded in the manifest; returns the updated manifest.

    The skip-filter is pushed into a vectorized map_batches, so resumed runs
    stream the input once and drop finished rows early.
    """
    manifest = load_manifest(out_dir)
    done = set(manifest["partitions"].keys())
    # Crash window: a previous run may have died AFTER write_parquet landed
    # files for a bucket but BEFORE save_manifest recorded it.  Such orphan
    # directories (on disk, absent from the manifest) would otherwise keep
    # their files while the resume writes the same rows again under new
    # uuid names — duplicating the partition and then fingerprinting the
    # corrupt content as "correct".  Delete them so the bucket is rebuilt
    # cleanly from scratch.
    if os.path.isdir(out_dir):
        import shutil

        for name in os.listdir(out_dir):
            if not name.startswith(f"{bucket_col}="):
                continue
            if name.split("=", 1)[1] not in done:
                shutil.rmtree(os.path.join(out_dir, name))
    if done:
        done_arr = pa.array(sorted(int(b) for b in done), type=pa.int64())

        def drop_done(batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(batch[bucket_col], value_set=done_arr))
            return batch.filter(mask)

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=[bucket_col])

    # fingerprint newly-written partitions from the on-disk layout
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith(f"{bucket_col}="):
            continue
        bucket = name.split("=", 1)[1]
        if bucket in manifest["partitions"]:
            continue
        part = pads.dataset(os.path.join(out_dir, name)).to_table()
        manifest["partitions"][bucket] = _partition_fingerprint(part)
    if lineage:
        manifest["lineage"] = lineage
    save_manifest(out_dir, manifest)
    return manifest


def verify_manifest(out_dir: str, bucket_col: str = "subj_bucket") -> bool:
    """Re-fingerprint every on-disk partition against the manifest — the
    resume-equivalence check (byte-identical output after kill+rerun)."""
    manifest = load_manifest(out_dir)
    for bucket, expect in manifest["partitions"].items():
        part_dir = os.path.join(out_dir, f"{bucket_col}={bucket}")
        if not os.path.isdir(part_dir):
            return False
        got = _partition_fingerprint(pads.dataset(part_dir).to_table())
        if got["rows"] != expect["rows"] or got["content_sha256"] != expect[
            "content_sha256"
        ]:
            return False
    return True
