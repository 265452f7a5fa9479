"""Storage-checkpointed doc-entity summary: identical triples to the
object-store path, checkpoint reused on re-run (stage-level resume)."""

import glob
import os

from ner_funtool_ray.corpus import corpus_from_documents
from ner_funtool_ray.pipelines.kg import mentions_dataset
from ner_funtool_ray.stages.materialize import all_triples


def _mentions():
    return mentions_dataset(corpus_from_documents("/root/testdata/sf0.001"))


def _sorted(df):
    key = ["subj", "pred", "obj"]
    return df.sort_values(key).reset_index(drop=True)


def test_checkpointed_summary_matches_materialized(tmp_path):
    ckpt = str(tmp_path / "summary")
    via_mem = _sorted(all_triples(_mentions()).to_pandas())
    via_ckpt = _sorted(
        all_triples(_mentions(), checkpoint_dir=ckpt).to_pandas()
    )
    assert via_mem.equals(via_ckpt)
    files = glob.glob(os.path.join(ckpt, "*.parquet"))
    assert files  # checkpoint landed on storage


def test_checkpoint_reused_without_recompute(tmp_path):
    ckpt = str(tmp_path / "summary")
    first = _sorted(all_triples(_mentions(), checkpoint_dir=ckpt).to_pandas())
    mtimes = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(ckpt, "*.parquet"))}
    second = _sorted(all_triples(_mentions(), checkpoint_dir=ckpt).to_pandas())
    assert first.equals(second)
    # checkpoint files untouched on the second run (summary stage skipped)
    for f, t in mtimes.items():
        assert os.path.getmtime(f) == t
