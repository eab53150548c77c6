"""Windowed aggregates over an ordered, partitioned event log.

Ray Data is a batch engine (no watermarks); the reference's only
streaming-shaped operators are Solr's ``DaemonStream``/``TopicStream``
(version-ordered pub-sub, no event-time windows) and ``TimeSeriesStream``
(date-range facets).  This module gives the standard window family over a
log *table*, treating it as partitioned by key and sorted by time within
the partition (the documented ordering assumption):

- :func:`tumbling` — fixed buckets; equals ``GROUP BY key, floor(ts/size)``
  (a pure groupby — no per-group python).
- :func:`sliding` — overlapping buckets via explode-to-covering-windows
  (each row lands in ``size/slide`` buckets) then one groupby.
- :func:`session` — gap-based sessions per key:
  ``groupby(key).map_groups`` sorts the group by ts and splits on gaps —
  the gaps-and-islands construction, SQL-expressible via
  ``SUM(CASE WHEN ts - LAG(ts) > gap ...)`` for the oracle.

Partitioning assumption: one key's events fit one group (map_groups);
skewed keys would need the salted two-phase variant (sessionize within
salt, merge boundary sessions) — documented, not needed at these scales.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from lucene_solr_ray.stages.relational import rollup

__all__ = ["tumbling", "sliding", "session"]


def tumbling(ds, ts_col: str, size_s: int,
             aggs: Sequence[Tuple[str, Optional[str], str]],
             keys: Sequence[str] = ()):
    """Fixed windows of ``size_s`` seconds; bucket = epoch-floor."""

    def _bucket(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column(ts_col), pa.int64())  # µs since epoch
        b = pc.multiply(
            pc.divide(ts, 1_000_000 * size_s), 1_000_000 * size_s
        )
        return t.append_column(
            "window_start", pc.cast(b, pa.timestamp("us"))
        )

    return rollup(
        ds.map_batches(_bucket, batch_format="pyarrow"),
        ["window_start", *keys], aggs,
    )


def sliding(ds, ts_col: str, size_s: int, slide_s: int,
            aggs: Sequence[Tuple[str, Optional[str], str]],
            keys: Sequence[str] = ()):
    """Overlapping windows: each event replicated into every window that
    covers it (``size_s / slide_s`` copies), then one groupby."""
    assert size_s % slide_s == 0, "size must be a multiple of slide"
    n_cover = size_s // slide_s

    def _explode(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column(ts_col), pa.int64()).to_numpy()
        slide_us = 1_000_000 * slide_s
        last = (ts // slide_us) * slide_us  # latest window start covering
        idx = np.repeat(np.arange(t.num_rows), n_cover)
        offs = np.tile(np.arange(n_cover, dtype=np.int64), t.num_rows)
        starts = last[idx] - offs * slide_us
        out = t.take(pa.array(idx))
        return out.append_column(
            "window_start",
            pa.array(starts.astype("datetime64[us]")),
        )

    return rollup(
        ds.map_batches(_explode, batch_format="pyarrow"),
        ["window_start", *keys], aggs,
    )


def session(ds, key: str, ts_col: str, gap_s: int):
    """Gap-based sessions per key: a new session starts when the time
    since the previous event of the same key exceeds ``gap_s``.

    Returns one row per session: (key, session_id within key 1-based,
    session_start, session_end, n_events)."""
    gap_us = np.timedelta64(gap_s * 1_000_000, "us")

    def _sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new)
        out = (
            pd.DataFrame({key: g[key].to_numpy(), "session_id": sid, ts_col: ts})
            .groupby("session_id")
            .agg(
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
                n_events=(ts_col, "size"),
            )
            .reset_index()
        )
        out[key] = g[key].iloc[0]
        return out[[key, "session_id", "session_start", "session_end",
                    "n_events"]]

    return ds.groupby(key).map_groups(_sessionize, batch_format="pandas")
