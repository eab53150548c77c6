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

Partitioning assumption (single-phase :func:`session`): one key's events
fit one group (map_groups).  For bot-scale keys pass ``chunk_s`` — the
two-phase variant sessionizes within (key, time-chunk) groups (bounded
by chunk duration × event rate) and then merges boundary sessions per
key, which is EXACT: a session split at a chunk edge rejoins iff the
boundary gap ≤ ``gap_s`` — the session condition itself.  Phase 2 sees
per-key session summaries, compressed by dense activity (the bot case);
a pathological all-sparse key degenerates to one row per event again,
the inherent floor.
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


def session(ds, key: str, ts_col: str, gap_s: int,
            chunk_s: Optional[int] = None):
    """Gap-based sessions per key: a new session starts when the time
    since the previous event of the same key exceeds ``gap_s``.

    Returns one row per session: (key, session_id within key 1-based,
    session_start, session_end, n_events).  ``chunk_s`` (seconds)
    switches to the two-phase shape: local sessions within
    (key, time-chunk), then an exact per-key boundary merge — use it
    when one key's events may not fit one worker."""
    if chunk_s is not None:
        return _session_two_phase(ds, key, ts_col, gap_s, chunk_s)
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


def _session_two_phase(ds, key: str, ts_col: str, gap_s: int,
                       chunk_s: int):
    gap_us = np.timedelta64(gap_s * 1_000_000, "us")

    def _chunk(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column(ts_col), pa.int64())
        return t.append_column(
            "_chunk", pc.divide(ts, 1_000_000 * chunk_s)
        )

    def _local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new)
        out = (
            pd.DataFrame({"_sid": sid, ts_col: ts})
            .groupby("_sid")
            .agg(session_start=(ts_col, "min"),
                 session_end=(ts_col, "max"),
                 n_events=(ts_col, "size"))
            .reset_index(drop=True)
        )
        out[key] = g[key].iloc[0]
        return out[[key, "session_start", "session_end", "n_events"]]

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("session_start", kind="mergesort")
        starts = g["session_start"].to_numpy()
        ends = g["session_end"].to_numpy()
        ns = g["n_events"].to_numpy()
        o_start, o_end, o_n = [], [], []
        cs, ce, cn = starts[0], ends[0], int(ns[0])
        for i in range(1, len(g)):
            if starts[i] - ce <= gap_us:
                ce = max(ce, ends[i])
                cn += int(ns[i])
            else:
                o_start.append(cs); o_end.append(ce); o_n.append(cn)
                cs, ce, cn = starts[i], ends[i], int(ns[i])
        o_start.append(cs); o_end.append(ce); o_n.append(cn)
        return pd.DataFrame({
            key: g[key].iloc[0],
            "session_id": np.arange(1, len(o_start) + 1),
            "session_start": o_start,
            "session_end": o_end,
            "n_events": np.asarray(o_n, dtype=ns.dtype),
        })

    local = (
        ds.map_batches(_chunk, batch_format="pyarrow")
        .groupby([key, "_chunk"])
        .map_groups(_local, batch_format="pandas")
    )
    return local.groupby(key).map_groups(_merge, batch_format="pandas")
