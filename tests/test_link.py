"""Entity linking (P5): exact surfaces link to themselves, misspellings link
above threshold, unrelated surfaces → NIL; broadcast-index stage works in
the Ray pipeline."""

import pyarrow as pa
import pytest
import ray.data

from ner_funtool_ray.stages.link import (
    EntityLinker,
    build_entity_index,
    link_mentions,
    surface_embedding,
)

CATALOG = ["customer", "supplier", "aggregate", "window", "stream"]


def test_surface_embedding_deterministic_and_normalized():
    a = surface_embedding("customer")
    b = surface_embedding("customer")
    assert (a == b).all()
    assert abs((a * a).sum() - 1.0) < 1e-9


def test_exact_surface_links_to_itself():
    linker = EntityLinker(build_entity_index(CATALOG), threshold=0.85)
    ent, score = linker.link_one("customer")
    assert ent == "customer" and score > 0.999


def test_misspelling_links_above_threshold():
    linker = EntityLinker(build_entity_index(CATALOG), threshold=0.5)
    ent, score = linker.link_one("custommer")  # doubled letter
    assert ent == "customer"
    assert 0.5 <= score < 1.0


def test_unrelated_surface_is_nil():
    linker = EntityLinker(build_entity_index(CATALOG), threshold=0.85)
    ent, score = linker.link_one("zzzqqqxxx")
    assert ent == "" and score == 0.0


def test_link_mentions_dataset():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "surface": ["customer", "custommer", "zzzqqqxxx", "window"],
                "row_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            }
        )
    )
    out = (
        link_mentions(ds, CATALOG, threshold=0.5)
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    assert out["linked_entity"].tolist() == ["customer", "customer", "", "window"]
    assert out.loc[0, "link_score"] == pytest.approx(1.0, abs=1e-6)
