"""User-extension surface (SURVEY §2.10): named stage & pipeline registry.

The reference's extension points are the ``DataProcessor`` subclass registry
keyed by ``--task_name`` (`run_bert_crf.py:205-230, 698-703`) and the
``model_fn_builder`` closure (`run_bert_crf.py:545-655`).  Our equivalents:

- :func:`register_stage` / :func:`stage` — named ``map_batches`` callables
  (functions or actor classes) that users can compose;
- :func:`register_pipeline` / :func:`pipeline` — named end-to-end pipelines
  ``(sf_dir | Dataset) → Dataset``;
- :func:`build` — assemble a pipeline from a config list of stage names,
  the declarative counterpart of the reference's flag-driven model switches
  (``use_lstm`` / ``use_crf`` / ``use_weights_of_loss``).
"""

from __future__ import annotations

from collections.abc import Callable

import ray.data

_STAGES: dict[str, Callable] = {}
_PIPELINES: dict[str, Callable] = {}


def register_stage(name: str, fn: Callable | None = None, **map_batches_kwargs):
    """Register a stage.  Usable as a decorator::

        @register_stage("my-filter", batch_format="pyarrow")
        def my_filter(batch): ...
    """

    def deco(f):
        _STAGES[name] = (f, map_batches_kwargs)
        return f

    return deco(fn) if fn is not None else deco


def stage(name: str):
    if name not in _STAGES:
        raise KeyError(f"unknown stage {name!r}; known: {sorted(_STAGES)}")
    return _STAGES[name]


def apply_stage(ds: "ray.data.Dataset", name: str, **overrides) -> "ray.data.Dataset":
    fn, kwargs = stage(name)
    return ds.map_batches(fn, **{**kwargs, **overrides})


def register_pipeline(name: str, fn: Callable | None = None):
    def deco(f):
        _PIPELINES[name] = f
        return f

    return deco(fn) if fn is not None else deco


def pipeline(name: str) -> Callable:
    if name not in _PIPELINES:
        raise KeyError(f"unknown pipeline {name!r}; known: {sorted(_PIPELINES)}")
    return _PIPELINES[name]


def pipelines() -> dict[str, Callable]:
    return dict(_PIPELINES)


def build(ds: "ray.data.Dataset", stage_names: list[str]) -> "ray.data.Dataset":
    """Compose registered stages in order (config-driven pipeline)."""
    for name in stage_names:
        ds = apply_stage(ds, name)
    return ds


def _register_builtins() -> None:
    """Built-in registrations (import-time side effect kept explicit)."""
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir
    from ner_funtool_ray.pipelines.tagging import model_triples
    from ner_funtool_ray.stages.ingest import _ingest_batch
    from ner_funtool_ray.stages.sentence import _split_batch

    register_stage("ingest", _ingest_batch, batch_format="pyarrow")
    register_stage("sentence-split", _split_batch, batch_format="pyarrow")
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir_counted

    register_pipeline("kg-gazetteer", kg_from_sf_dir)
    register_pipeline("kg-gazetteer-counted", kg_from_sf_dir_counted)
    register_pipeline("kg-model", model_triples)
    register_pipeline(
        "kg-bert", lambda sf_dir: model_triples(sf_dir, model="bert")
    )
    register_pipeline(
        "kg-cascade-bert",
        lambda sf_dir: model_triples(sf_dir, cascade=True, model="bert"),
    )


_register_builtins()
