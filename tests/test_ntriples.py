"""N-Triples interchange sink/reader (stages/materialize.py): shard-per-block
writes, IRI escaping, exact roundtrip."""

import glob

import pyarrow as pa
import ray.data

from ner_funtool_ray.stages.materialize import read_ntriples, write_ntriples

SF = "/root/testdata/sf0.001"


def test_ntriples_roundtrip_kg(tmp_path):
    from ner_funtool_ray.pipelines.kg import kg_from_sf_dir

    tr = kg_from_sf_dir(SF).materialize()
    out = str(tmp_path / "nt")
    write_ntriples(tr, out)
    files = glob.glob(out + "/*.nt")
    assert files, "no .nt shards written"
    line = open(files[0], encoding="utf-8").readline()
    assert line.startswith("<urn:graft:") and line.rstrip().endswith(" .")
    back = read_ntriples(out).to_pandas()
    orig = tr.to_pandas()
    key = lambda df: set(zip(df["subj"], df["pred"], df["obj"]))
    assert key(back) == key(orig)
    assert len(back) == len(orig)  # no dup lines, weight column dropped


def test_ntriples_escaping_hostile_terms(tmp_path):
    """Spaces, angle brackets, quotes, CJK and newlines in graph ids must
    survive the IRI percent-encoding roundtrip and never break the
    line-per-triple format."""
    rows = pa.table(
        {
            "subj": ["ent:with space", "ent:<angle>", "ent:中文"],
            "pred": ["rel a b", 'rel"quote', "rel\nnewline"],
            "obj": ["o|pipe", "o\\back", "o`tick^caret"],
            "weight": [1, 2, 3],
        }
    )
    ds = ray.data.from_arrow(rows)
    out = str(tmp_path / "nt")
    write_ntriples(ds, out)
    for f in glob.glob(out + "/*.nt"):
        for line in open(f, encoding="utf-8"):
            line = line.rstrip("\n")
            if not line:
                continue
            # strictly three space-separated IRI terms + terminal dot
            parts = line.split(" ")
            assert len(parts) == 4 and parts[3] == "."
            for t in parts[:3]:
                assert t.startswith("<") and t.endswith(">")
                inner = t[1:-1]
                assert not any(
                    c in inner for c in ' <>"{}|^`\\\n'
                ), f"unescaped char in {t!r}"
    back = read_ntriples(out).to_pandas()
    key = lambda df: set(zip(df["subj"], df["pred"], df["obj"]))
    assert key(back) == key(rows.to_pandas())
