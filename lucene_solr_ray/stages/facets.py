"""Taxonomy (hierarchical) facets + DrillDownQuery / DrillSideways.

Reference:
- ``lucene/facet/src/java/org/apache/lucene/facet/taxonomy/
  FastTaxonomyFacetCounts.java`` — counting a hierarchical dimension
  counts every ANCESTOR path of each document's facet label;
- ``lucene/facet/src/java/org/apache/lucene/facet/DrillDownQuery.java``
  — drill-down = conjunctive filters on dimension values (a path prefix
  for hierarchical dims);
- ``lucene/facet/src/java/org/apache/lucene/facet/DrillSideways.java:69``
  — for each drilled dimension, facet counts are computed with every
  OTHER dimension's filter applied but its own removed (near-miss
  counting), so the UI can show what the other values of a drilled
  dimension would yield.

Ray shape: hierarchical paths are delimited string columns
(``FacetsConfig`` path encoding).  Taxonomy counting is one
``map_batches`` emitting per-batch (path, n) partials — ancestor
expansion via Arrow ``list_slice`` + ``binary_join`` kernels — folded by
one small groupby.  DrillSideways is ONE pass: each batch computes the
per-dimension filter masks once, then for every dimension counts its
values under the AND of the other masks; only (dim, value, n) partial
rows shuffle.  Nothing row-scale reaches the driver.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

__all__ = [
    "taxonomy_counts",
    "drill_down",
    "drill_sideways",
]


def _partial_counts(arr: "pa.Array", out_dim: str):
    """(dim, value, n) partial-count rows for one string array —
    dictionary_encode + bincount, no Python loops."""
    import pyarrow.compute as pc

    if len(arr) == 0:
        return [], [], []
    de = pc.dictionary_encode(arr)
    if isinstance(de, pa.ChunkedArray):
        de = de.combine_chunks()
    codes = de.indices.to_numpy(zero_copy_only=False)
    valid = codes >= 0  # nulls encode as -1 via to_numpy
    n = np.bincount(codes[valid], minlength=len(de.dictionary))
    vals = de.dictionary.to_pylist()
    dims = [out_dim] * len(vals)
    return dims, vals, n.tolist()


def taxonomy_counts(ds, dim_col: str, delimiter: str = "/",
                    max_depth: int = 8):
    """Counts per taxonomy path PREFIX (every ancestor of each row's
    label counts once per row — FastTaxonomyFacetCounts' rollup).
    Returns a Dataset of (path, n), one row per distinct prefix."""
    from ray.data.aggregate import Sum

    def _expand(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t.column(dim_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern(pc.fill_null(col, ""), delimiter)
        depths = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False
        )
        dims_o, vals_o, ns_o = [], [], []
        for k in range(1, min(int(depths.max(initial=0)), max_depth) + 1):
            mask = pa.array(depths >= k)
            pref = pc.binary_join(
                pc.list_slice(parts.filter(mask), 0, k), delimiter
            )
            d, v, n = _partial_counts(pref, "")
            vals_o.extend(v)
            ns_o.extend(n)
        return pa.table(
            {
                "path": pa.array(vals_o, pa.string()),
                "n": pa.array(ns_o, pa.int64()),
            }
        )

    return (
        ds.select_columns([dim_col])
        .map_batches(_expand, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n"))
    )


def _match_mask(t: pa.Table, col: str, value: str, delimiter: str):
    """Rows whose ``col`` equals ``value`` or lies under it as a taxonomy
    path prefix (DrillDownQuery's dimension term semantics)."""
    import pyarrow.compute as pc

    c = t.column(col)
    m = pc.equal(c, pa.scalar(value))
    m2 = pc.starts_with(c, value + delimiter)
    return pc.fill_null(pc.or_(m, m2), False)


def drill_down(ds, filters: Dict[str, str], delimiter: str = "/"):
    """DrillDownQuery: conjunctive dimension filters (path-prefix match
    for hierarchical dims); returns the filtered Dataset."""

    def _filt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = None
        for col, val in filters.items():
            m = _match_mask(t, col, val, delimiter)
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask) if mask is not None else t

    return ds.map_batches(_filt, batch_format="pyarrow")


def drill_sideways(ds, filters: Dict[str, str],
                   facet_cols: Optional[Sequence[str]] = None,
                   delimiter: str = "/"):
    """DrillSideways: one distributed pass producing, for every drilled
    dimension, its facet counts with all OTHER filters applied (its own
    removed), plus the fully-drilled hit count as dim ``__hits__``.

    Returns a Dataset of (dim, value, n)."""
    from ray.data.aggregate import Sum

    cols = list(filters)
    extra = [c for c in (facet_cols or []) if c not in filters]

    def _partials(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        masks = {
            c: _match_mask(t, c, v, delimiter).to_numpy(
                zero_copy_only=False
            )
            for c, v in filters.items()
        }
        all_mask = np.logical_and.reduce(list(masks.values())) if masks \
            else np.ones(t.num_rows, dtype=bool)
        dims_o: List[str] = []
        vals_o: List[str] = []
        ns_o: List[int] = []
        for c in cols:
            others = [masks[o] for o in cols if o != c]
            near = (
                np.logical_and.reduce(others) if others
                else np.ones(t.num_rows, dtype=bool)
            )
            col = t.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            d, v, n = _partial_counts(col.filter(pa.array(near)), c)
            dims_o.extend(d)
            vals_o.extend(v)
            ns_o.extend(n)
        # un-drilled facet dims count under the FULL drill-down set
        for c in extra:
            col = t.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            d, v, n = _partial_counts(col.filter(pa.array(all_mask)), c)
            dims_o.extend(d)
            vals_o.extend(v)
            ns_o.extend(n)
        dims_o.append("__hits__")
        vals_o.append("")
        ns_o.append(int(all_mask.sum()))
        return pa.table(
            {
                "dim": pa.array(dims_o, pa.string()),
                "value": pa.array(vals_o, pa.string()),
                "n": pa.array(ns_o, pa.int64()),
            }
        )

    need = list(dict.fromkeys(cols + extra))
    return (
        ds.select_columns(need)
        .map_batches(_partials, batch_format="pyarrow")
        .groupby(["dim", "value"])
        .aggregate(Sum("n", alias_name="n"))
    )
