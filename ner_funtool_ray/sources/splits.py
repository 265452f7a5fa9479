"""Dataset splitting + misc writers (SURVEY §2.7 O2, §2.2 K2/K3/K5).

- :func:`train_test_split` — deterministic hash-based split (reference uses
  sklearn ``train_test_split(random_state=43)``, `msra_ner/train2pkl.py:147`;
  a hash split on a stable id keeps rows' assignment independent of
  partitioning/ordering, which sklearn's shuffle is not under
  distribution — documented deviation, deterministic by construction);
- :func:`write_eval_results` — ``key = value`` text file
  (`run_bert_crf.py:812-817`);
- :func:`write_tsv` — per-example TSV rows (`run_bert_crf.py:850-863`);
- :func:`write_entities` — mention strings file (`ner_utils.py:82-100`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ner_funtool_ray.stages.ingest import stable_id64


def train_test_split(
    ds: "ray.data.Dataset",
    test_size: float = 0.2,
    id_col: str | None = None,
    seed: int = 43,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Deterministic split: row → test iff hash(id, seed) % 1000 <
    test_size*1000.  With ``id_col=None`` uses ``ds.split_proportionately``
    (positional split, matching the reference's index-based behavior)."""
    if id_col is None:
        test, train = ds.split_proportionately([test_size])
        return train, test
    cut = int(test_size * 1000)

    def part(batch: pa.Table, want_test: bool) -> pa.Table:
        ids = batch[id_col].to_pylist()
        mask = np.array(
            [stable_id64(str(i), str(seed)) % 1000 < cut for i in ids]
        )
        if not want_test:
            mask = ~mask
        return batch.filter(pa.array(mask))

    train = ds.map_batches(part, fn_kwargs={"want_test": False},
                           batch_format="pyarrow")
    test = ds.map_batches(part, fn_kwargs={"want_test": True},
                          batch_format="pyarrow")
    return train, test


def write_eval_results(path: str, results: dict) -> None:
    """``key = value`` lines, sorted (run_bert_crf.py:812-817 shape)."""
    with open(path, "w", encoding="utf-8") as f:
        for key in sorted(results):
            f.write(f"{key} = {results[key]}\n")


def write_tsv(ds: "ray.data.Dataset", out_dir: str) -> None:
    """Distributed TSV sink (test_results.tsv shape, run_bert_crf.py:850-863):
    tab-delimited like the reference's '\t'.join, one shard per block so a
    256-node run never funnels rows through the driver."""
    def _tab_opts() -> dict:
        # built lazily on the writing worker: pyarrow WriteOptions is not
        # picklable, so it must not cross the object store
        import pyarrow.csv as pacsv

        return {"write_options": pacsv.WriteOptions(delimiter="\t")}

    ds.write_csv(out_dir, arrow_csv_args_fn=_tab_opts)


def write_entities(path: str, mentions: "ray.data.Dataset",
                   type_col: str = "entity_type",
                   surface_col: str = "surface") -> None:
    """'TYPE:surface' strings, one per line (ner_utils.write_entity shape);
    driver-side sink for small mention sets."""
    with open(path, "w", encoding="utf-8") as f:
        for batch in mentions.iter_batches(batch_format="pyarrow"):
            for typ, surf in zip(
                batch[type_col].to_pylist(), batch[surface_col].to_pylist()
            ):
                f.write(f"{typ}:{surf}\n")
