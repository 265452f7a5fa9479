import pytest
import ray

# --- two-tier suite ---------------------------------------------------------
# `pytest -m quick` = the per-operator correctness sweep (every queries()
# entry vs its DuckDB twin at sf0.001 + rows-only smokes + the driver-contract
# smoke), minus the model-training smokes below that each cost 10-30 s and
# are redundant with the deep-tier gradient/parity suites. Everything else
# (reference-parity fixtures, finite-difference checks, e2e lifecycle) is the
# deep tier; the full suite runs both.
_QUICK_FILE = "test_queries_oracle.py"
_QUICK_EXCLUDED_PARAMS = {
    "kg_deepwalk_report",
    "kg_node2vec_report",
    "ner_train_report",
    "ner_bert_train_report",
    "ner_cascade_train_report",
    "ner_wol_train_report",
    "entity_components",
    "entity_source_hits",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename != _QUICK_FILE:
            continue
        if any(f"[{p}]" in item.name for p in _QUICK_EXCLUDED_PARAMS):
            continue
        item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
