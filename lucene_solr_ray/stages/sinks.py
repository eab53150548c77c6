"""Sinks: resumable partitioned Parquet output (UpdateStream/CommitStream).

The Solr push-to-collection decorators (``solr/solrj/.../io/stream/
UpdateStream.java``, ``CommitStream.java``) map to Parquet writes; the
scale contract is RESUMABILITY: one output directory per partition key (or
input shard), a completion marker per partition, and rerun-skips — never
one giant file.  ``write_partitioned`` implements that protocol;
``resume_state`` reports which partitions a rerun can skip.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Dict, List, Optional, Sequence

__all__ = ["write_partitioned", "resume_state"]

_DONE = "_DONE.json"


def write_partitioned(
    ds,
    out_dir: str,
    partition_col: str,
    skip_complete: bool = True,
) -> Dict[str, int]:
    """Write one subdirectory per distinct ``partition_col`` value, each
    committed atomically with a ``_DONE.json`` marker (rows + a content
    row-count checksum).  Reruns skip partitions whose marker validates —
    the checkpoint/resume contract of the north rule, at the sink.

    Returns partition → row count for partitions written this run."""
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    # sweep stale .tmp-* leftovers from crashed runs
    for name in os.listdir(out_dir):
        if ".tmp-" in name:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    done = resume_state(out_dir) if skip_complete else {}

    keys = [k for k in (ds.unique(partition_col) or ()) if k is not None]
    written: Dict[str, int] = {}
    for key in keys:
        part = str(key)
        if part in done:
            continue
        pdir = os.path.join(out_dir, f"{partition_col}={part}")
        tmp = pdir + ".tmp-" + uuid.uuid4().hex[:8]

        def _eq(t, key=key):
            import pyarrow.compute as pc

            return t.filter(pc.equal(t.column(partition_col), key))

        # injection-safe vectorized filter (no expr-string interpolation);
        # executed ONCE — row counts come from the written files' metadata
        ds.map_batches(_eq, batch_format="pyarrow").write_parquet(tmp)
        import pyarrow.parquet as pq

        n = sum(
            pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows
            for f in os.listdir(tmp)
            if f.endswith(".parquet")
        )
        with open(os.path.join(tmp, _DONE), "w") as f:
            json.dump({"partition": part, "rows": n}, f)
        if os.path.isdir(pdir):
            # rerun over an invalid/partial partition: replace it
            shutil.rmtree(pdir)
        os.rename(tmp, pdir)
        written[part] = n
    return written


def resume_state(out_dir: str) -> Dict[str, int]:
    """partition value → committed row count (only validated partitions)."""
    out: Dict[str, int] = {}
    if not os.path.isdir(out_dir):
        return out
    for name in os.listdir(out_dir):
        p = os.path.join(out_dir, name, _DONE)
        if "=" in name and os.path.exists(p):
            try:
                with open(p) as f:
                    meta = json.load(f)
                out[meta["partition"]] = int(meta["rows"])
            except (OSError, ValueError, KeyError):
                continue
    return out
