"""Graph streaming expressions: gatherNodes + shortestPath.

The reference's graph traversal streams (``solr/solrj/src/java/org/
apache/solr/client/solrj/io/graph/GatherNodesStream.java`` and
``ShortestPathStream.java``): walk an edge relation stored as documents,
one hop per round trip.

Ray shape: each hop is one distributed semi-join of the frontier against
the edge table (the frontier — node ids only — broadcasts; the edge table
streams), so a k-hop walk is k passes over edges with nothing but id sets
and the growing visited map on the driver.  At fact scale the frontier
set is the small side by construction (BFS frontiers), matching
GatherNodesStream's partitioned fetches.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set, Tuple

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["gather_nodes", "shortest_path", "score_nodes"]


def _neighbors(edges, from_col: str, to_col: str,
               frontier: Set) -> pd.DataFrame:
    """Distinct (from, to) edge rows whose source is in the frontier —
    one broadcast semi-join pass over the edge dataset."""
    import ray

    ref = ray.put(pa.array(sorted(frontier)))

    def _hop(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column(from_col), value_set=ray.get(ref))
        return t.filter(mask).select([from_col, to_col])

    out = (
        edges.map_batches(_hop, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    if to_col not in out.columns:  # all-empty blocks lose the schema
        out = pd.DataFrame({from_col: [], to_col: []})
    return out


def gather_nodes(edges, from_col: str, to_col: str,
                 roots: Sequence, hops: int = 1) -> pd.DataFrame:
    """``gatherNodes``: BFS expansion from ``roots`` over the edge
    relation; returns one row per gathered node with the hop level at
    which it was FIRST reached (level 0 = roots) and its ancestor count
    at that level (the stream's collected metadata)."""
    visited: Dict = {r: 0 for r in roots}
    anc_count: Dict = {r: 0 for r in roots}
    frontier: Set = set(roots)
    for level in range(1, hops + 1):
        if not frontier:
            break
        hop = _neighbors(edges, from_col, to_col, frontier)
        nxt: Set = set()
        for to_v, grp in hop.groupby(to_col):
            if to_v not in visited:
                visited[to_v] = level
                anc_count[to_v] = int(grp[from_col].nunique())
                nxt.add(to_v)
        frontier = nxt
    rows = [
        {"node": n, "level": lvl, "ancestors": anc_count[n]}
        for n, lvl in visited.items()
    ]
    return pd.DataFrame(rows).sort_values(
        ["level", "node"]
    ).reset_index(drop=True)


def score_nodes(nodes: pd.DataFrame, docs, field: str,
                node_col: str = "node",
                term_freq_col: str = "ancestors") -> pd.DataFrame:
    """``scoreNodes`` (reference ``solr/solrj/src/java/org/apache/solr/
    client/solrj/io/stream/ScoreNodesStream.java:243``): tf-idf score each
    gathered node against the collection —

        nodeScore = (ln(termFreq) + 1) * (ln((numDocs+1)/(docFreq+1)) + 1)

    with termFreq taken from the node tuples (the stream's ``count(*)`` /
    custom termFreq param) and docFreq/numDocs from one distributed stats
    pass over ``docs`` (the TermsComponent round trip): broadcast the small
    node-id set, partial-count matches per batch, sum the partials.
    Appends ``nodeScore``/``docFreq``/``numDocs`` columns, highest first.
    """
    import ray

    node_vals = nodes[node_col].tolist()
    ref = ray.put(pa.array(sorted(set(node_vals))))

    def _partial(t: pa.Table) -> pa.Table:
        col = t.column(field)
        hit = t.filter(pc.is_in(col, value_set=ray.get(ref)))
        vc = hit.column(field).value_counts()
        # one sentinel row (null node) carries this batch's doc count
        nodes_out = pa.concat_arrays(
            [vc.field("values").combine_chunks() if isinstance(
                vc.field("values"), pa.ChunkedArray) else vc.field("values"),
             pa.array([None], col.type)]
        )
        df_out = pa.concat_arrays(
            [vc.field("counts").cast(pa.int64()),
             pa.array([0], pa.int64())]
        )
        n_out = pa.array([0] * len(vc) + [t.num_rows], pa.int64())
        return pa.table({"node": nodes_out, "df": df_out, "n": n_out})

    parts = docs.map_batches(_partial, batch_format="pyarrow").to_pandas()
    num_docs = int(parts["n"].sum())
    dfs = parts.dropna(subset=["node"]).groupby("node")["df"].sum()

    out = nodes.copy()
    df_arr = out[node_col].map(dfs).fillna(0).astype("int64")
    tf = out[term_freq_col].astype("float64").to_numpy()
    import numpy as np

    score = (np.log(np.maximum(tf, 1e-12)) + 1.0) * (
        np.log((num_docs + 1) / (df_arr.to_numpy() + 1.0)) + 1.0
    )
    out["nodeScore"] = score.astype("float64")
    out["docFreq"] = df_arr
    out["numDocs"] = np.int64(num_docs)
    return out.sort_values(
        ["nodeScore", node_col], ascending=[False, True]
    ).reset_index(drop=True)


def shortest_path(edges, from_col: str, to_col: str,
                  src, dst, max_hops: int = 6) -> Optional[List]:
    """``shortestPath``: BFS from ``src`` until ``dst`` is reached;
    returns one shortest path as a node list (ties broken by smallest
    predecessor at each node, so the result is deterministic), or None."""
    parent: Dict = {src: None}
    frontier: Set = {src}
    for _ in range(max_hops):
        if dst in parent or not frontier:
            break
        hop = _neighbors(edges, from_col, to_col, frontier)
        nxt: Set = set()
        # deterministic parents: smallest from-node wins
        for to_v, grp in hop.groupby(to_col):
            if to_v not in parent:
                parent[to_v] = grp[from_col].min()
                nxt.add(to_v)
        frontier = nxt
    if dst not in parent:
        return None
    path = [dst]
    while parent[path[-1]] is not None:
        path.append(parent[path[-1]])
    return list(reversed(path))
