"""Solr JSON Facet API façade: nested term/range facets with metrics.

Executes a facet request dict with the reference's JSON semantics
(``solr/core/src/java/org/apache/solr/search/facet/`` — ``FacetField``,
``FacetRange``, metric aggs, nested subfacets; distributed bucket merge in
``FacetFieldMerger``):

    json_facet(parts_ds, {
        "type": "terms", "field": "p_brand", "limit": 5,
        "sort": "count desc",
        "facet": {
            "avg_price": "avg(p_retailprice)",
            "max_size": "max(p_size)",
            "by_size": {"type": "terms", "field": "p_size", "limit": 2},
        },
    })
    → {"buckets": [{"val": ..., "count": ..., "avg_price": ...,
                    "by_size": {"buckets": [...]}} ...]}

Execution strategy: metrics ride ONE grouped aggregate per facet level;
a nested terms subfacet costs one extra groupby on (parent, child) — no
per-bucket queries (the distributed-merge shape, not the single-node
loop).  Supported metrics: count/sum/avg/min/max (``SumAgg`` family);
``sort``: "count desc" (default) or "index asc".
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

__all__ = ["json_facet"]

_METRIC_RE = re.compile(r"^(sum|avg|min|max|count)\((\w*)\)$")


def _parse_metrics(facet_spec: Dict) -> List:
    out = []
    for name, spec in (facet_spec or {}).items():
        if isinstance(spec, str):
            m = _METRIC_RE.match(spec.replace(" ", ""))
            if not m:
                raise ValueError(f"unsupported metric {spec!r}")
            out.append((name, m.group(1), m.group(2) or None))
    return out


def _subfacets(facet_spec: Dict) -> Dict[str, Dict]:
    return {
        name: spec
        for name, spec in (facet_spec or {}).items()
        if isinstance(spec, dict)
    }


def json_facet(ds, request: Dict) -> Dict:
    from lucene_solr_ray.stages.relational import rollup

    if request.get("type", "terms") != "terms":
        raise ValueError("only terms facets implemented (use facet_range "
                         "for ranges)")
    field = request["field"]
    limit = int(request.get("limit", 10))
    sort = request.get("sort", "count desc")
    metrics = _parse_metrics(request.get("facet"))
    subs = _subfacets(request.get("facet"))

    aggs = [("count", None, "count")]
    for name, op, col in metrics:
        if op == "count":
            continue
        aggs.append((op, col, name))
    top = rollup(ds, [field], aggs).to_pandas()

    if sort.startswith("index"):
        top = top.sort_values(field, ascending=True)
    else:
        top = top.sort_values(["count", field], ascending=[False, True])
    top = top.head(limit)

    buckets = []
    kept_vals = set(top[field])
    sub_results: Dict[str, Dict] = {}
    for name, spec in subs.items():
        child = spec["field"]
        climit = int(spec.get("limit", 10))
        nested = rollup(ds, [field, child],
                        [("count", None, "count")]).to_pandas()
        nested = nested[nested[field].isin(kept_vals)]
        nested = nested.sort_values(
            ["count", child], ascending=[False, True]
        )
        sub_results[name] = {
            val: [
                {"val": r[child], "count": int(r["count"])}
                for _, r in g.head(climit).iterrows()
            ]
            for val, g in nested.groupby(field, sort=False)
        }

    for _, row in top.iterrows():
        b = {"val": row[field], "count": int(row["count"])}
        for name, op, _col in metrics:
            if op != "count":
                b[name] = float(row[name])
        for name in subs:
            b[name] = {"buckets": sub_results[name].get(row[field], [])}
        buckets.append(b)
    return {"buckets": buckets}
