"""The Solr streaming-expression dataflow algebra as Ray Data stages.

One function per decorator-stream of the reference
(``solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/`` — 60
``TupleStream`` classes, SURVEY §2.9); each is a thin, composable
``Dataset → Dataset`` transform with the reference's semantics:

==================  =======================================================
reference stream     here
==================  =======================================================
SelectStream         :func:`select` (projection + rename)
HavingStream         :func:`having` (vectorized predicate)
RollupStream         :func:`rollup` (groupby + Count/Sum/Mean/Min/Max)
StatsStream          :func:`stats` (global aggregate)
SortStream           :func:`sort_stream`
RankStream           :func:`rank_stream` (top-N)
UniqueStream         :func:`unique_stream`
MergeStream          :func:`merge_stream` (union)
IntersectStream      :func:`intersect_stream` (semi-join on key)
ComplementStream     :func:`complement_stream` (anti-join on key)
HashJoinStream       :func:`hash_join` (broadcast small side, no shuffle)
InnerJoinStream      :func:`inner_join` (both-large hash-partitioned join)
CartesianProduct     :func:`cartesian_product` (explode a list column)
FacetStream          :func:`facet_stream` (bucket counts, count-desc order)
TimeSeriesStream     :func:`time_series` (date-bucketed rollup)
SignificantTerms     :func:`significant_terms`
==================  =======================================================

All hot paths are vectorized over Arrow/pandas batches; the only shuffles
are the groupbys/sorts/joins the semantics require.  ``hash_join`` ships
its small side once via ``ray.put`` and probes inside ``map_batches`` —
the broadcast-join pattern for dimension tables (no all-to-all).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "select",
    "having",
    "rollup",
    "stats",
    "sort_stream",
    "rank_stream",
    "unique_stream",
    "reducer_stream",
    "merge_stream",
    "intersect_stream",
    "complement_stream",
    "hash_join",
    "inner_join",
    "cartesian_product",
    "facet_stream",
    "time_series",
    "significant_terms",
    "pivot_facet",
    "collapse_stream",
    "interval_facet",
    "grouped_percentiles",
]


def select(ds, columns: Optional[Sequence[str]] = None,
           rename: Optional[Dict[str, str]] = None):
    """SelectStream: projection and/or ``old as new`` renames."""
    if columns is not None:
        ds = ds.select_columns(list(columns))
    if rename:
        mapping = dict(rename)

        def _rename(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [mapping.get(c, c) for c in t.column_names]
            )

        # map_batches(pyarrow) rather than ds.rename_columns: the built-in
        # assumes Arrow blocks and breaks on pandas blocks from map_groups
        ds = ds.map_batches(_rename, batch_format="pyarrow")
    return ds


def having(ds, predicate: Callable[[pa.Table], "pa.BooleanArray"]):
    """HavingStream: keep rows where the vectorized predicate is true."""
    return ds.map_batches(
        lambda t: t.filter(predicate(t)), batch_format="pyarrow"
    )


_AGG_FACTORY = {
    "count": lambda col, alias: __import__(
        "ray.data.aggregate", fromlist=["Count"]
    ).Count(alias_name=alias),
    "sum": lambda col, alias: __import__(
        "ray.data.aggregate", fromlist=["Sum"]
    ).Sum(col, alias_name=alias),
    "avg": lambda col, alias: __import__(
        "ray.data.aggregate", fromlist=["Mean"]
    ).Mean(col, alias_name=alias),
    "min": lambda col, alias: __import__(
        "ray.data.aggregate", fromlist=["Min"]
    ).Min(col, alias_name=alias),
    "max": lambda col, alias: __import__(
        "ray.data.aggregate", fromlist=["Max"]
    ).Max(col, alias_name=alias),
    "std": lambda col, alias: __import__(
        "ray.data.aggregate", fromlist=["Std"]
    ).Std(col, alias_name=alias),
}


def _make_aggs(aggs: Sequence[Tuple[str, Optional[str], str]]):
    """aggs: (op, column-or-None, alias) — op ∈ count/sum/avg/min/max/std."""
    return [_AGG_FACTORY[op](col, alias) for op, col, alias in aggs]


def rollup(ds, keys: Sequence[str],
           aggs: Sequence[Tuple[str, Optional[str], str]]):
    """RollupStream: grouped metrics (two-phase partial+final combine is
    internal to Ray's aggregate)."""
    return ds.groupby(list(keys)).aggregate(*_make_aggs(aggs))


def stats(ds, aggs: Sequence[Tuple[str, Optional[str], str]]):
    """StatsStream: global (ungrouped) metrics; returns a 1-row dict.

    Row counts go through ``Dataset.count()``: the ungrouped ``Count()``
    aggregate (no ``on``) returns 0 in ray 2.49 when it runs alone over
    mapped/filtered blocks (grouped Count is unaffected)."""
    counts = [(op, col, alias) for op, col, alias in aggs if op == "count"]
    rest = [(op, col, alias) for op, col, alias in aggs if op != "count"]
    out: dict = {}
    if rest:
        if counts:
            ds = ds.materialize()  # consumed twice (aggregate + count)
        out.update(ds.aggregate(*_make_aggs(rest)))
    if counts:
        n = ds.count()
        for _, _, alias in counts:
            out[alias] = n
    return out


def sort_stream(ds, keys: Sequence[str], descending=False):
    return ds.sort(list(keys), descending=descending)


def rank_stream(ds, key: str, n: int, descending: bool = True):
    """RankStream: top-N by key. ``sort().limit()`` — Ray's sort is
    distributed; limit short-circuits block pulls."""
    return ds.sort(key, descending=descending).limit(n)


def unique_stream(ds, key: str | Sequence[str]):
    """UniqueStream: first tuple per distinct key (exact dedup)."""
    keys = [key] if isinstance(key, str) else list(key)
    return ds.groupby(keys).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def reducer_stream(ds, by, sort_keys, sort_desc=None, n: int = 5,
                   group_col: str = "group"):
    """ReducerStream + GroupOperation (``solr/solrj/.../io/stream/
    ReducerStream.java:60``, ``io/ops/GroupOperation.java:44``): one tuple
    per distinct ``by`` group whose fields are the group's top tuple under
    the operation's sort, plus ``group`` = the top-``n`` tuples of the
    group as a list of maps (``Tuple.getMaps()``).

    The reference requires the underlying stream to be sorted by ``by``
    and emits the first-encountered tuple as the head; here the groupby
    co-locates each group and the head is the operation-sort top — a
    deterministic choice the textual form documents (intra-group stream
    order is otherwise unspecified unless the sort covers it).

    Ray shape: ``groupby(by).map_groups`` — one shuffle on the group key;
    each group's top-n selection runs where the group lives.
    """
    by = [by] if isinstance(by, str) else list(by)
    sort_keys = [sort_keys] if isinstance(sort_keys, str) \
        else list(sort_keys)
    if sort_desc is None:
        sort_desc = [False] * len(sort_keys)

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        order = g.sort_values(
            sort_keys, ascending=[not d for d in sort_desc],
            kind="mergesort",
        )
        head = order.iloc[0].to_dict()
        head[group_col] = order.head(n).to_dict("records")
        return pd.DataFrame([[head[c] for c in list(g.columns)
                              + [group_col]]],
                            columns=list(g.columns) + [group_col])

    return ds.groupby(by).map_groups(_reduce, batch_format="pandas")


def merge_stream(a, b):
    """MergeStream: union of two streams (re-sort downstream if needed)."""
    return a.union(b)


#: above this many DISTINCT b-side keys the semi/anti join switches from a
#: broadcast key set to a hash-partitioned shuffle join — a dimension-table
#: key set broadcasts fine, a fact-scale one must not ride ray.put
BROADCAST_KEY_LIMIT = 1_000_000


def _semi_anti(a, b, on: str, keep_matches: bool, broadcast_limit: int):
    import ray
    from ray.data.aggregate import Count

    # distinct b-side keys, computed IN the cluster; only the count comes
    # back to decide broadcast vs shuffle
    distinct_ds = b.select_columns([on]).groupby(on).aggregate(
        Count(alias_name="__b_marker")
    ).materialize()
    if distinct_ds.count() <= broadcast_limit:
        # broadcast path: the key set ships once via the object store and
        # membership tests run as the C-level is_in kernel per batch
        keys = [r[on] for r in distinct_ds.select_columns([on]).take_all()]
        keys_ref = ray.put(pa.array(sorted(keys)))

        def _filter(t: pa.Table) -> pa.Table:
            mask = pc.is_in(t.column(on), value_set=ray.get(keys_ref))
            if not keep_matches:
                mask = pc.invert(mask)
            return t.filter(mask)

        return a.map_batches(_filter, batch_format="pyarrow")
    # shuffle path: hash-partitioned join against the (still-distributed)
    # distinct key set — nothing fact-scale touches the driver
    how = "inner" if keep_matches else "left_outer"
    joined = a.join(distinct_ds, join_type=how, num_partitions=16,
                    on=(on,))
    if keep_matches:
        return joined.drop_columns(["__b_marker"])

    def _only_unmatched(t: pa.Table) -> pa.Table:
        m = pc.is_null(t.column("__b_marker"))
        return t.filter(m).drop(["__b_marker"])

    return joined.map_batches(_only_unmatched, batch_format="pyarrow")


def intersect_stream(a, b, on: str,
                     broadcast_limit: int = BROADCAST_KEY_LIMIT):
    """IntersectStream: rows of ``a`` whose key appears in ``b`` —
    broadcast semi-join for dimension-sized key sets, hash-partitioned
    shuffle join past ``broadcast_limit`` distinct keys."""
    return _semi_anti(a, b, on, keep_matches=True,
                      broadcast_limit=broadcast_limit)


def complement_stream(a, b, on: str,
                      broadcast_limit: int = BROADCAST_KEY_LIMIT):
    """ComplementStream: rows of ``a`` whose key does NOT appear in ``b``
    (anti-join; same broadcast/shuffle split as intersect_stream)."""
    return _semi_anti(a, b, on, keep_matches=False,
                      broadcast_limit=broadcast_limit)


def hash_join(
    ds,
    small: pd.DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    right_on: Optional[str | Sequence[str]] = None,
):
    """HashJoinStream/OuterHashJoinStream: build the hash map from the small
    side ONCE (``ray.put``), probe every batch of the big stream — the
    broadcast join (no shuffle of the big side).

    ``how``: "inner" (HashJoinStream) or "left" (OuterHashJoinStream).
    """
    import ray

    small_ref = ray.put(small)

    # STATELESS tasks, not an actor pool: the build side is an object-store
    # ref — ray.get in a task on the same node is a zero-copy plasma read,
    # so there is nothing for an actor to amortize, and pool startup was
    # measured at ~2s of the 4.4s bench stage (round 4); on a multi-node
    # cluster the ref ships to each node once either way
    def _probe(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(
            ray.get(small_ref), how=how, left_on=on, right_on=right_on or on
        )

    return ds.map_batches(_probe, batch_format="pandas")


#: below this many RIGHT-side rows the join broadcasts (build-small /
#: probe-big, the reference HashJoinStream.java:45-95 shape) instead of
#: shuffling both sides
JOIN_BROADCAST_ROW_LIMIT = 1_000_000

#: target rows per shuffle-join partition — the partition count scales
#: with input size (the `_pair_partitions` pattern, functions/dedup.py)
#: instead of a constant that starves a 100 TB shuffle
_JOIN_PARTITION_ROWS = 500_000


def _join_partitions(rows: int) -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return int(min(4096, max(cpus, rows // _JOIN_PARTITION_ROWS + 1)))


def inner_join(left, right, on: str | Tuple[str, ...],
               right_on: Optional[str | Tuple[str, ...]] = None,
               num_partitions: Optional[int] = None, how: str = "inner",
               broadcast_limit: int = JOIN_BROADCAST_ROW_LIMIT):
    """InnerJoinStream / LeftOuterJoinStream with size-aware dispatch.

    The right side is materialized (it is consumed for its row count
    either way) and counted IN the cluster; a dimension-sized right side
    (≤ ``broadcast_limit`` rows) ships once via ``ray.put`` and probes
    inside ``map_batches`` — no shuffle of the big side, exactly the
    reference ``HashJoinStream.java:45-95`` build-small/probe-big plan.
    Past the limit both sides hash-partition (``Dataset.join``) with the
    partition count scaled to the data (``num_partitions=None`` →
    :func:`_join_partitions`), never a constant."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = on_t
    if right_on is not None:
        r_t = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    right = right.materialize()
    n_right = right.count()
    if n_right <= broadcast_limit:
        small = right.to_pandas()
        pd_how = {"inner": "inner", "left_outer": "left"}.get(how)
        if pd_how is not None:
            out = hash_join(ds=left, small=small, on=list(on_t),
                            how=pd_how, right_on=list(r_t))
            # Dataset.join emits the LEFT key only; drop the duplicate
            # right key columns so both dispatch paths share one schema
            dup = [c for c in r_t if c not in on_t and c in small.columns]
            return out.drop_columns(dup) if dup else out
    if num_partitions is None:
        # size the shuffle off the known right count plus the left's
        # metadata row-count estimate when one is available without
        # executing the pipeline (parquet reads know; transforms don't)
        est_left = 0
        try:
            meta_n = left._plan.meta_count()  # metadata-only, may be None
            est_left = int(meta_n) if meta_n is not None else 0
        except Exception:
            est_left = 0
        num_partitions = _join_partitions(max(n_right, est_left))
    return left.join(
        right, join_type=how, num_partitions=num_partitions, on=on_t,
        right_on=r_t if right_on is not None else None,
    )


def cartesian_product(ds, col: str, out_col: str,
                      split: Callable[[str], List] = None):
    """CartesianProductStream: unnest a multivalued field into N tuples."""
    split = split or (lambda s: s.split(" "))

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[out_col] = batch[col].map(split)
        return batch.explode(out_col, ignore_index=True)

    return ds.map_batches(_explode, batch_format="pandas")


def facet_stream(ds, field: str, limit: Optional[int] = None):
    """FacetStream: bucket counts ordered count desc, value asc (the JSON
    facet API default sort)."""
    from ray.data.aggregate import Count

    out = ds.groupby(field).aggregate(Count(alias_name="count"))
    out = out.sort(["count", field], descending=[True, False])
    return out.limit(limit) if limit else out


def time_series(ds, ts_col: str, unit: str,
                aggs: Sequence[Tuple[str, Optional[str], str]],
                extra_keys: Sequence[str] = ()):
    """TimeSeriesStream: date-range-bucketed metrics (date_trunc + rollup)."""

    def _bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = pc.floor_temporal(t.column(ts_col), unit=unit)
        return t.append_column("bucket", b)

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow")
    return rollup(bucketed, ["bucket", *extra_keys], aggs)


def significant_terms(docs, term_col: str, fg_mask_fn,
                      min_doc_freq: int = 1):
    """SignificantTermsStream: score terms over-represented in a foreground
    subset vs the background (distributed partials: per-batch term counts,
    merged in one small groupby; scored with the same foreground/background
    ratio family the reference uses)."""
    from ray.data.aggregate import Count, Sum

    def _totals(t: pa.Table) -> pa.Table:
        fg = fg_mask_fn(t)
        fgl = fg.to_pylist() if hasattr(fg, "to_pylist") else list(fg)
        return pa.table(
            {"n_fg": pa.array([int(sum(fgl))], pa.int64()),
             "n_bg": pa.array([t.num_rows], pa.int64())}
        )

    # foreground/background doc totals: a tiny separate aggregate — never
    # ride totals through the per-term groupby (terms absent from a batch
    # would silently lose that batch's contribution)
    tot = docs.map_batches(_totals, batch_format="pyarrow").aggregate(
        Sum("n_fg", alias_name="n_fg"), Sum("n_bg", alias_name="n_bg")
    )
    n_fg_total, n_bg_total = int(tot["n_fg"]), int(tot["n_bg"])

    def _partials(t: pa.Table) -> pa.Table:
        # vectorized per-doc DISTINCT term counts (this scans the whole
        # corpus): Arrow split → dictionary_encode → packed-key unique →
        # bincount per code; terms never become Python objects
        from lucene_solr_ray.functions.textstats import (
            _distinct_row_codes,
            _token_lists,
        )

        fg = fg_mask_fn(t)
        fgl = fg.to_numpy(zero_copy_only=False) if hasattr(
            fg, "to_numpy"
        ) else np.asarray(list(fg), dtype=bool)
        flat, row_ids, _ = _token_lists(t.column(term_col))
        if len(flat) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "fg": pa.array([], pa.int64()),
                 "bg": pa.array([], pa.int64())}
            )
        ur, uc, dictionary = _distinct_row_codes(flat, row_ids)
        k = len(dictionary)
        bg_n = np.bincount(uc, minlength=k)
        fg_n = np.bincount(uc[fgl[ur]], minlength=k)
        srt = pc.sort_indices(dictionary).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table(
            {
                "term": dictionary.take(pa.array(srt)),
                "fg": pa.array(fg_n[srt].astype(np.int64)),
                "bg": pa.array(bg_n[srt].astype(np.int64)),
            }
        )

    parts = docs.map_batches(_partials, batch_format="pyarrow")
    merged = parts.groupby("term").aggregate(
        Sum("fg", alias_name="fg"), Sum("bg", alias_name="bg"),
    )

    def _score(t: pa.Table) -> pa.Table:
        fg = t.column("fg").to_numpy().astype(np.float64)
        bg = t.column("bg").to_numpy().astype(np.float64)
        n_fg = float(n_fg_total)
        n_bg = float(n_bg_total)
        score = (fg / n_fg) / np.maximum(bg / n_bg, 1e-12)
        keep = bg >= min_doc_freq
        return pa.table(
            {
                "term": t.column("term").filter(pa.array(keep)),
                "fg": t.column("fg").filter(pa.array(keep)),
                "bg": t.column("bg").filter(pa.array(keep)),
                "score": pa.array(score[keep]),
            }
        )

    return merged.map_batches(_score, batch_format="pyarrow")


def facet_range(ds, col: str, edges: "List[float]",
                labels: "Optional[List[str]]" = None):
    """Range facets (the JSON facet API ``type:range`` / Lucene range
    facets): counts per [edges[i], edges[i+1]) bucket; values outside the
    edges are dropped (``other`` buckets omitted)."""
    import numpy as np
    from ray.data.aggregate import Count

    labels = labels or [
        f"[{edges[i]},{edges[i+1]})" for i in range(len(edges) - 1)
    ]

    def _bucket(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy()
        idx = np.searchsorted(np.asarray(edges, dtype=np.float64), v,
                              side="right") - 1
        ok = (idx >= 0) & (idx < len(edges) - 1)
        lab = pa.array(
            [labels[i] if k else None for i, k in zip(idx, ok)],
            pa.string(),
        )
        return t.append_column("bucket", lab).filter(pa.array(ok))

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="count"))
    )


def pivot_facet(ds, fields: Sequence[str], limit: int = 5):
    """Solr pivot facets (``facet.pivot=f1,f2,...`` — reference
    ``solr/core/src/java/org/apache/solr/handler/component/
    PivotFacetProcessor.java``): nested value/count trees, each level's
    buckets ordered (count desc, value asc) and capped at ``limit``.

    ONE grouped count over the full field tuple feeds every level (no
    per-bucket re-queries — the distributed-merge shape); the driver folds
    the tiny aggregate into the nested structure."""
    from ray.data.aggregate import Count

    flat = ds.groupby(list(fields)).aggregate(
        Count(alias_name="count")
    ).to_pandas()

    def _level(df, depth: int):
        f = fields[depth]
        agg = df.groupby(f, sort=False)["count"].sum().reset_index()
        agg = agg.sort_values(
            ["count", f], ascending=[False, True], kind="mergesort"
        ).head(limit)
        out = []
        for _, row in agg.iterrows():
            node = {"field": f, "value": row[f], "count": int(row["count"])}
            if depth + 1 < len(fields):
                node["pivot"] = _level(
                    df[df[f] == row[f]], depth + 1
                )
            out.append(node)
        return out

    return _level(flat, 0)


def collapse_stream(ds, collapse_field: str, sort_col: str,
                    descending: bool = True):
    """Field collapsing (``CollapsingQParserPlugin``): keep only the BEST
    row per collapse-field value, best = max/min of ``sort_col`` with ties
    to the first row — one groupby, no driver materialization."""

    def _best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_col, ascending=not descending,
                          kind="mergesort")
        return g.head(1)

    return ds.groupby(collapse_field).map_groups(
        _best, batch_format="pandas"
    )


def interval_facet(ds, col: str, intervals: Sequence[Tuple]):
    """Interval facets (``facet.interval`` — reference ``solr/core/src/
    java/org/apache/solr/request/IntervalFacets.java``): counts per
    arbitrary [lo, hi) / (lo, hi] interval spec.  ``intervals`` =
    [(label, lo, hi, lo_incl, hi_incl), ...]; one vectorized pass, one
    tiny groupby."""
    from ray.data.aggregate import Count

    specs = list(intervals)

    def _bucket(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy()
        out_lab = []
        out_n = []
        for label, lo, hi, lo_incl, hi_incl in specs:
            m = np.ones(len(v), dtype=bool)
            if lo is not None:
                m &= (v >= lo) if lo_incl else (v > lo)
            if hi is not None:
                m &= (v <= hi) if hi_incl else (v < hi)
            out_lab.append(label)
            out_n.append(int(m.sum()))
        return pa.table(
            {"interval": pa.array(out_lab, pa.string()),
             "n": pa.array(out_n, pa.int64())}
        )

    from ray.data.aggregate import Sum

    return (
        ds.select_columns([col])
        .map_batches(_bucket, batch_format="pyarrow")
        .groupby("interval")
        .aggregate(Sum("n", alias_name="n"))
    )


def grouped_percentiles(ds, key: str, value: str,
                        qs: Sequence[float]):
    """Grouped exact percentiles (the stats-component percentile over
    facet buckets; linear interpolation matching ``np.percentile``):
    one groupby, values sorted within each (bounded) group."""

    def _pct(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value].to_numpy(dtype=np.float64))
        row = {key: g[key].iloc[0]}
        for q in qs:
            row[f"p{int(q)}"] = float(np.percentile(v, q))
        return pd.DataFrame([row])

    return ds.select_columns([key, value]).groupby(key).map_groups(
        _pct, batch_format="pandas"
    )
