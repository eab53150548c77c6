"""Parquet read planning helpers.

``split_read`` is the column-pruned ``ray.data.read_parquet`` with
row-count-scaled block splitting: single-row-group files (this sandbox's
synthetic tables; also common for small dimension exports) otherwise
produce ONE block, serializing every downstream ``map_batches`` stage on
one core.  At real scale — many files, many row groups — the default
plan already fans out and the override is a no-op guardrail.

``rows_per_block`` is the knob: ~25k for narrow numeric rows, a few
hundred for heavy text/embedding rows where per-row compute dominates.
"""

from __future__ import annotations

from typing import Optional, Sequence

__all__ = ["split_read"]


def split_read(path: str, columns: Optional[Sequence[str]] = None,
               rows_per_block: int = 25_000, cpus_factor: int = 2):
    import pyarrow.parquet as pq
    import ray
    import ray.data

    meta = pq.read_metadata(path)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n = max(1, min(cpus * cpus_factor, meta.num_rows // rows_per_block))
    kwargs = {"override_num_blocks": n} if n > meta.num_row_groups else {}
    return ray.data.read_parquet(path, columns=columns, **kwargs)
