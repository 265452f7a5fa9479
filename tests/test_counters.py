"""Per-stage run counters (state/counters.py).

The counters are a pure observability surface: the counted flagship must
stay byte-identical to the uncounted one, the per-stage row counts must
equal the true dataset sizes, and a manifest-resumed CLI run must record
the resumed skip (ingest counter sees the corpus again, output
partitions are not rewritten).
"""

import json
import os

import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_count_rows_is_identity(ray_session):
    import ray.data

    from ner_funtool_ray.state.counters import count_rows, reset_counters

    reset_counters(run="t_identity")
    ds = ray.data.range(1000).map_batches(
        lambda t: pa.table({"x": t["id"]}), batch_format="pyarrow"
    )
    out = count_rows(ds, "probe", run="t_identity").take_all()
    assert sorted(r["x"] for r in out) == list(range(1000))


def test_counted_flagship_matches_and_counts(ray_session):
    from ner_funtool_ray.pipelines.kg import (
        kg_from_sf_dir,
        kg_from_sf_dir_counted,
        mentions_dataset,
    )
    from ner_funtool_ray.corpus import corpus_from_documents
    from ner_funtool_ray.state.counters import reset_counters, snapshot_stable

    reset_counters(run="t_flagship")
    base = (
        kg_from_sf_dir(SF)
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    counted = (
        kg_from_sf_dir_counted(SF, run="t_flagship")
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, counted)

    counts = snapshot_stable(run="t_flagship")
    assert counts["ingest"]["rows"] == 500  # sf0.001 corpus size
    assert counts["sentences"]["rows"] == 500  # one sentence per doc here
    assert (
        counts["mentions"]["rows"]
        == mentions_dataset(corpus_from_documents(SF)).count()
    )
    assert counts["triples"]["rows"] == len(base)
    assert all(v["batches"] >= 1 for v in counts.values())


def test_cli_counted_run_snapshots_manifest(ray_session, tmp_path):
    from ner_funtool_ray.cli import main
    from ner_funtool_ray.state.counters import reset_counters

    out = str(tmp_path / "kg_out")
    reset_counters()  # default run name used by the CLI pipeline
    rc = main(
        ["--pipeline", "kg-gazetteer-counted", "--input", SF, "--output", out]
    )
    assert rc == 0
    manifest = json.load(open(os.path.join(out, "_manifest.json")))
    counters = manifest["lineage"]["counters"]
    assert counters["ingest"]["rows"] == 500
    assert counters["triples"]["rows"] == sum(
        p["rows"] for p in manifest["partitions"].values()
    )
