"""End-to-end 100TB-shaped flow at toy scale: replicated corpus → model
tagging → triples → salted subject buckets → resumable partitioned write →
manifest verify → kill-and-resume byte-identical."""

import os
import shutil

from ner_funtool_ray.pipelines.tagging import scaled_model_triples
from ner_funtool_ray.stages.materialize import add_subject_bucket
from ner_funtool_ray.state.lineage import (
    load_manifest,
    resumable_write,
    save_manifest,
    verify_manifest,
)

SF_DIR = "/root/testdata/sf0.001"


def test_full_flow_with_resume(tmp_path):
    out = str(tmp_path / "kg_out")

    def build():
        ds = scaled_model_triples(SF_DIR, replication=2)
        return add_subject_bucket(ds, n_buckets=4)

    m1 = resumable_write(build(), out, lineage={"input": SF_DIR, "stage": "kg"})
    assert set(m1["partitions"]) == {"0", "1", "2", "3"}
    assert verify_manifest(out)
    total = sum(p["rows"] for p in m1["partitions"].values())
    assert total > 0

    # simulate a crash that lost one partition, then resume
    hashes_before = {k: v["content_sha256"] for k, v in m1["partitions"].items()}
    m = load_manifest(out)
    shutil.rmtree(os.path.join(out, "subj_bucket=1"))
    del m["partitions"]["1"]
    save_manifest(out, m)

    m2 = resumable_write(build(), out)
    assert set(m2["partitions"]) == {"0", "1", "2", "3"}
    assert verify_manifest(out)
    hashes_after = {k: v["content_sha256"] for k, v in m2["partitions"].items()}
    assert hashes_before == hashes_after  # resume is byte-identical

    # Crash AFTER files landed but BEFORE the manifest recorded the bucket
    # (the real write_parquet→save_manifest window): the orphan dir must be
    # quarantined and rebuilt, not duplicated alongside new uuid files.
    m = load_manifest(out)
    del m["partitions"]["2"]  # files for bucket 2 stay on disk
    save_manifest(out, m)

    m3 = resumable_write(build(), out)
    assert set(m3["partitions"]) == {"0", "1", "2", "3"}
    assert verify_manifest(out)
    hashes_crash = {k: v["content_sha256"] for k, v in m3["partitions"].items()}
    assert hashes_before == hashes_crash  # no row duplication
    assert m3["partitions"]["2"]["rows"] == m1["partitions"]["2"]["rows"]
