"""Job entrypoint: ``python -m ner_funtool_ray.cli`` — the ``ray job
submit`` surface of the engine (north rule: pipelines run as submitted Ray
jobs on a fixed-size cluster).

Maps the reference's flag-driven CLIs (`run_bert_crf.py:40-153` tf.flags)
onto the registry (§2.10): pick a registered pipeline by name, point it at
an input corpus directory, and land resumable partitioned parquet with a
per-partition manifest::

    ray job submit -- python -m ner_funtool_ray.cli \
        --pipeline kg-gazetteer --input /data/sf0.1 --output /out/kg \
        --subject-buckets 64

Re-running after a failure resumes: finished buckets are skipped via the
manifest, orphaned partial buckets are quarantined and rebuilt
(state/lineage.py).  The driver owns the Ray session; this module only
calls ``ray.init`` when none exists (guarded, per the session contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ner_funtool_ray.cli",
        description="Run a registered KG pipeline over a corpus directory "
        "and write resumable partitioned parquet.",
    )
    p.add_argument("--pipeline", default="kg-gazetteer",
                   help="registered pipeline name (see --list)")
    p.add_argument("--input", help="corpus directory (documents.parquet inside)")
    p.add_argument("--output", help="output directory for partitioned parquet")
    p.add_argument("--subject-buckets", type=int, default=64,
                   help="hash(subj) output partitions (resume granularity)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus when no cluster is attached")
    p.add_argument("--list", action="store_true",
                   help="list registered pipelines and exit")
    p.add_argument("--verify", action="store_true",
                   help="re-fingerprint the output manifest and exit nonzero "
                        "on mismatch (post-run integrity check)")
    return p


def main(argv: list[str] | None = None) -> int:
    from ner_funtool_ray import registry

    args = build_parser().parse_args(argv)
    if args.list:
        for name in sorted(registry.pipelines()):
            print(name)
        return 0

    import os

    import ray

    if not ray.is_initialized():
        # Attach to the submitting cluster when one is advertised (the
        # ``ray job submit`` path sets RAY_ADDRESS); only fall back to a
        # fresh single-node instance when no cluster exists.  num_cpus is
        # only legal for the local fallback.
        addr = os.environ.get("RAY_ADDRESS", "local")
        if addr == "local":
            ray.init(
                address="local",
                num_cpus=args.num_cpus,
                include_dashboard=False,
                logging_level="ERROR",
            )
        else:
            ray.init(address=addr, logging_level="ERROR")

    if not args.input or not args.output:
        print("--input and --output are required (or use --list)", file=sys.stderr)
        return 2

    from ner_funtool_ray.state.lineage import (
        load_manifest,
        resumable_write,
        verify_manifest,
    )

    if args.verify:
        ok = verify_manifest(args.output)
        m = load_manifest(args.output)
        print(json.dumps({
            "verified": ok,
            "partitions": len(m["partitions"]),
            "rows": sum(p["rows"] for p in m["partitions"].values()),
        }))
        return 0 if ok else 1

    from ner_funtool_ray.stages.materialize import add_subject_bucket

    pipe = registry.pipeline(args.pipeline)
    ds = pipe(args.input)
    ds = add_subject_bucket(ds, n_buckets=args.subject_buckets)
    manifest = resumable_write(
        ds, args.output,
        lineage={"input": args.input, "pipeline": args.pipeline},
    )
    # stage counters (counted pipelines report per-stage row flow; the
    # snapshot lands in the manifest next to the partition fingerprints)
    from ner_funtool_ray.state.counters import snapshot_stable

    counts = snapshot_stable()
    if counts:
        from ner_funtool_ray.state.lineage import save_manifest

        manifest["lineage"]["counters"] = counts
        save_manifest(args.output, manifest)
    print(json.dumps({
        "pipeline": args.pipeline,
        "output": args.output,
        "partitions": len(manifest["partitions"]),
        "rows": sum(p["rows"] for p in manifest["partitions"].values()),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
