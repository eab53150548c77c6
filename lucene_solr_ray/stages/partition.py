"""Repartitioning / skew helpers — ParallelStream & friends.

Reference: Solr's ``ParallelStream`` re-executes a stream on N workers
hash-partitioned by ``partitionKeys`` (``solr/solrj/.../io/stream/
ParallelStream.java:43-70``) and ``ShuffleStream`` is its export-based
repartition.  Ray Data's ``repartition``/``groupby`` already hash-exchange;
these wrappers make the partitioning intent explicit and add the salted
variant for stop-word-scale hot keys (SURVEY §4 skew row).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["parallel_stream", "shuffle_stream", "salt_hot_keys",
           "salted_groupby_sum"]


def parallel_stream(ds, num_partitions: int):
    """ParallelStream: spread the stream over N partitions (no key —
    round-robin block split)."""
    return ds.repartition(num_partitions)


def shuffle_stream(ds, num_partitions: int):
    """ShuffleStream: full hash redistribution."""
    return ds.repartition(num_partitions, shuffle=True)


def salt_hot_keys(ds, key: str, hot_keys: Sequence, n_salts: int = 16,
                  salt_col: str = "salt"):
    """Add a salt column: hot keys fan out over ``n_salts`` sub-keys
    (deterministic per row via a cheap row hash), cold keys salt 0.

    A following ``groupby([key, salt_col])`` splits each hot key's group
    into ``n_salts`` bounded runs; a second tiny groupby over the partials
    restores exact semantics (pre-aggregate → final combine)."""
    hot = set(hot_keys)

    def _salt(t: pa.Table) -> pa.Table:
        keys = t.column(key).to_pylist()
        h = np.arange(t.num_rows)  # deterministic row-index salt
        salts = np.where(
            np.asarray([k in hot for k in keys]), h % n_salts, 0
        ).astype(np.int32)
        return t.append_column(salt_col, pa.array(salts))

    return ds.map_batches(_salt, batch_format="pyarrow")


def salted_groupby_sum(ds, key: str, value: str, hot_keys: Sequence,
                       n_salts: int = 16):
    """Exact grouped sum with hot-key salting: groupby((key, salt)) partial
    sums, then a tiny groupby(key) final combine — the two-phase shape
    that keeps any single reducer's input bounded."""
    from ray.data.aggregate import Sum

    salted = salt_hot_keys(ds, key, hot_keys, n_salts)
    partial = salted.groupby([key, "salt"]).aggregate(
        Sum(value, alias_name=value)
    )
    return partial.groupby(key).aggregate(Sum(value, alias_name=value))
