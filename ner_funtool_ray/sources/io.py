"""Size-aware parquet reads.

Ray's default read splits every file into ~2×CPU blocks; for small
dimension/document tables that produces dozens of sub-100-row blocks whose
per-block scheduling overhead dominates the pipeline (measured 17s → 0.7s
on a 5k-row aggregate).  ``read_parquet_auto`` sizes ``override_num_blocks``
from parquet row-count metadata: ~rows_per_block rows per block, with a
parallelism floor AND a ``mid_block_cap`` ceiling (default 64 ≈ 2× local
CPUs) for sub-1M-row tables — over-splitting a 600k-row table into 4k-row
blocks made per-task scheduling dominate compute-light scans.  Tables ≥
1M rows defer to Ray's own target-block-size splitting, which scales
block count with the data on a real cluster.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

import ray.data


def _total_rows(paths: list[str]) -> int:
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for f in glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True):
                total += pq.ParquetFile(f).metadata.num_rows
        else:
            total += pq.ParquetFile(p).metadata.num_rows
    return total


def parquet_num_rows(path: str) -> int:
    """Row count from parquet metadata (no data read) — the probe behind
    every size-guarded broadcast/driver-merge plan choice."""
    return _total_rows([path])


def read_parquet_auto(
    paths,
    columns=None,
    rows_per_block: int = 4000,
    min_rows_per_block: int = 500,
    max_blocks: int = 256,
    mid_block_cap: int = 64,
    **kwargs,
) -> "ray.data.Dataset":
    if isinstance(paths, str):
        paths = [paths]
    try:
        rows = _total_rows(paths)
        if rows >= 1_000_000:
            # big tables: Ray's own target-block-size splitting is the
            # scale-correct choice (a fixed block-count override would
            # produce multi-GB blocks at 100 TB) — don't override
            n_blocks = None
        else:
            # small/mid tables: Ray's default over-splits tiny dimension
            # tables (dozens of sub-100-row blocks whose scheduling
            # overhead dominates — measured 17 s → 0.7 s on a 5k-row
            # aggregate) and the rows/rows_per_block formula under-splits
            # mid-size ones (the 5k-row sf0.1 documents table became 2
            # blocks and serialized every downstream stage).  Use a
            # parallelism floor of up to 64 blocks while keeping
            # ≥ min_rows_per_block rows per block (500: small enough to fill a
            # 32-core node on a 5k-row table, big enough that per-block
            # scheduling stays negligible for matmul-shaped stages).
            floor = min(mid_block_cap, rows // min_rows_per_block)
            # cap as well as floor: a 600k-row table would otherwise split
            # into 150 4k-row blocks whose per-task scheduling overhead
            # dominates compute-light scans (measured 2.1 s → 1.7 s on the
            # sf0.1 lineitem read at 32 CPUs; the default cap 64 ≈ 2×
            # local CPUs keeps full parallelism — raise ``mid_block_cap``
            # on a larger cluster).  Tables ≥ 1M rows never reach here —
            # they use Ray's target-block-size splitting, which is what
            # scales on a real cluster.
            n_blocks = max(
                1,
                min(
                    max_blocks,
                    mid_block_cap,
                    max(rows // rows_per_block, floor),
                ),
            )
    except Exception:
        n_blocks = None  # metadata unavailable → Ray default
    if "schema" not in kwargs:
        # pandas-written parquet stamps a b'pandas' blob into the file
        # schema; a schema carrying metadata is UNHASHABLE, which defeats
        # Ray Data's set()-based schema dedup on every downstream block
        # merge (and logs "Failed to hash the schemas" per reduce task).
        # Passing an explicit metadata-free schema strips it at the read.
        try:
            sch = _first_file_schema(paths).remove_metadata()
            if columns is not None:
                import pyarrow as pa

                sch = pa.schema([sch.field(c) for c in columns])
            kwargs["schema"] = sch
        except Exception:
            pass  # unreadable/missing field → let Ray infer as before
    return ray.data.read_parquet(
        paths, columns=columns, override_num_blocks=n_blocks, **kwargs
    )


def _first_file_schema(paths: list[str]):
    for p in paths:
        if os.path.isdir(p):
            for f in sorted(
                glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
            ):
                return pq.read_schema(f)
        else:
            return pq.read_schema(p)
    raise FileNotFoundError(str(paths))
