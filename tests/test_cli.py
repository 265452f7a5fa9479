"""Job CLI: list, run-to-manifest, resume skip, verify."""

import json
import os

from ner_funtool_ray.cli import main
from ner_funtool_ray.state.lineage import load_manifest

SF_DIR = "/root/testdata/sf0.001"


def test_cli_list(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out.split()
    assert "kg-gazetteer" in out and "kg-bert" in out


def test_cli_requires_io():
    assert main([]) == 2


def test_cli_run_resume_verify(tmp_path, capsys):
    out_dir = str(tmp_path / "kg")
    rc = main(
        ["--pipeline", "kg-gazetteer", "--input", SF_DIR, "--output", out_dir,
         "--subject-buckets", "4"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["partitions"] == 4 and report["rows"] > 0
    m1 = load_manifest(out_dir)

    # second invocation resumes: manifest unchanged, exit 0
    assert main(
        ["--pipeline", "kg-gazetteer", "--input", SF_DIR, "--output", out_dir,
         "--subject-buckets", "4"]
    ) == 0
    capsys.readouterr()
    m2 = load_manifest(out_dir)
    assert m1["partitions"] == m2["partitions"]

    # verify passes; corrupting a partition makes it fail
    assert main(["--output", out_dir, "--input", SF_DIR, "--verify"]) == 0
    capsys.readouterr()
    part = next(
        d for d in os.listdir(out_dir) if d.startswith("subj_bucket=")
    )
    victim_dir = os.path.join(out_dir, part)
    victim = os.path.join(victim_dir, os.listdir(victim_dir)[0])
    os.remove(victim)
    assert main(["--output", out_dir, "--input", SF_DIR, "--verify"]) == 1
