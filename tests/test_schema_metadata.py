"""Block schemas must stay metadata-free (and therefore hashable).

pandas-written parquet stamps a ``b'pandas'`` blob into the file schema and
``pa.Table.from_pandas`` re-stamps it onto every table it builds; a pyarrow
schema carrying metadata is UNHASHABLE, which defeats Ray Data's
``set(schemas)`` dedup early-exit inside ``unify_schemas`` on every block
merge (sort/groupby reduce) and logs "Failed to hash the schemas" per reduce
task.  ``read_parquet_auto`` strips it at the read via an explicit schema and
``pa_from_pandas`` strips it at every pandas→Arrow rebuild.
"""

import pandas as pd
import pyarrow as pa

from ner_funtool_ray.sources.io import read_parquet_auto
from ner_funtool_ray.utils import pa_from_pandas

SF = "/root/testdata/sf0.001"


def test_pa_from_pandas_strips_metadata_and_preserves_data():
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    t = pa_from_pandas(df, preserve_index=False)
    assert t.schema.metadata is None
    hash(t.schema)  # would raise TypeError if metadata survived
    assert t.to_pandas().equals(df)


def test_pa_from_pandas_kwargs_pass_through():
    df = pd.DataFrame({"a": [1, 2]}, index=pd.Index([10, 20], name="idx"))
    t = pa_from_pandas(df)  # default preserve_index: real index kept
    assert "idx" in t.column_names
    t2 = pa_from_pandas(df, preserve_index=False)
    assert "idx" not in t2.column_names


def test_read_parquet_auto_blocks_are_metadata_free(ray_session):
    ds = read_parquet_auto(f"{SF}/documents.parquet", columns=["doc_id", "lang"])

    def probe(b: pa.Table) -> pa.Table:
        assert b.schema.metadata is None, b.schema.metadata
        hash(b.schema)
        return b

    out = ds.map_batches(probe, batch_format="pyarrow")
    assert out.count() == 500
    assert out.schema().names == ["doc_id", "lang"]


def test_read_parquet_auto_explicit_schema_wins(ray_session):
    sch = pa.schema([pa.field("doc_id", pa.int64())])
    ds = read_parquet_auto(f"{SF}/documents.parquet", columns=["doc_id"], schema=sch)
    assert ds.count() == 500
