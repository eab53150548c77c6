"""LatLonShape: tessellated shape indexing + bbox / polygon queries.

The reference's signature spatial feature (this fork's headline):
``lucene/sandbox/src/java/org/apache/lucene/document/LatLonShape.java:56``
(``createIndexableFields`` → ``Tessellator.tessellate`` → per-triangle
fields in a 6-dim BKD tree), queried by
``LatLonShapePolygonQuery.java`` / ``LatLonShapeBoundingBoxQuery.java``
with an INTERSECTS relation test per triangle.

Ray-Data shape: a document's geometry tessellates (ear clipping) into
triangle ROWS of a parquet table — ``(doc_id, ax..cy, min/max lat/lon)``
— globally sorted by the bbox min at build time (the one shuffle), so
parquet row-group statistics prune at query time exactly like the BKD
inner-node ranges: a query reads ONLY row groups whose bbox range
overlaps the query bbox (``lucene/sandbox/.../LatLonShapeQuery.java``'s
relateRangeToQuery role), then verifies candidates with exact vectorized
triangle-vs-shape intersection kernels per batch.  DISTINCT doc ids come
back through a tiny-row groupby.  Coordinates stay float64 (the
reference's int32 lat/lon quantization is a codec detail, not semantics).

Geometry convention: a polygon is a sequence of ``(lat, lon)`` vertices
(unclosed, simple, no holes); internally x = lon, y = lat.  A 1-vertex
geometry indexes as a point (degenerate triangle), 2 vertices as a line
segment — mirroring ``LatLonShape.createIndexableFields`` overloads.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa

__all__ = [
    "tessellate",
    "build_shape_index",
    "shape_bbox_query",
    "shape_polygon_query",
]


# ---------------------------------------------------------------------------
# tessellation (the Tessellator.tessellate role — ear clipping)
# ---------------------------------------------------------------------------

def _orient(ax, ay, bx, by, cx, cy):
    """Cross product (b−a) × (c−a): >0 = c left of a→b (CCW turn)."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def tessellate(vertices: Sequence[Tuple[float, float]]) -> np.ndarray:
    """(T, 6) float64 triangles [ax, ay, bx, by, cx, cy] (x=lon, y=lat)
    from a simple polygon given as (lat, lon) vertices.

    Ear-clipping (O(n²)) — the role of the reference's
    ``lucene/core/src/java/org/apache/lucene/geo/Tessellator.java``;
     1 vertex → a point triangle, 2 → a flat line triangle.  Holes are
    unsupported (raise), matching the subset this engine indexes."""
    pts = [(float(lon), float(lat)) for lat, lon in vertices]
    n = len(pts)
    if n == 0:
        raise ValueError("empty geometry")
    if n == 1:
        x, y = pts[0]
        return np.array([[x, y, x, y, x, y]])
    if n == 2:
        (x1, y1), (x2, y2) = pts
        return np.array([[x1, y1, x2, y2, x2, y2]])
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    area2 = float(
        np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys)
    )
    idxs = list(range(n))
    if area2 < 0:  # normalize to CCW
        idxs.reverse()
    tris: List[List[float]] = []
    guard = 0
    while len(idxs) > 3:
        guard += 1
        if guard > 4 * n * n:
            raise ValueError("tessellation failed (self-intersecting?)")
        clipped = False
        m = len(idxs)
        for k in range(m):
            i0, i1, i2 = idxs[k - 1], idxs[k], idxs[(k + 1) % m]
            ax, ay = pts[i0]
            bx, by = pts[i1]
            cx, cy = pts[i2]
            if _orient(ax, ay, bx, by, cx, cy) <= 0:
                continue  # reflex or degenerate corner — not an ear
            # no other active vertex strictly inside the candidate ear
            ok = True
            for j in idxs:
                if j in (i0, i1, i2):
                    continue
                px, py = pts[j]
                d1 = _orient(ax, ay, bx, by, px, py)
                d2 = _orient(bx, by, cx, cy, px, py)
                d3 = _orient(cx, cy, ax, ay, px, py)
                if d1 >= 0 and d2 >= 0 and d3 >= 0:
                    ok = False
                    break
            if ok:
                tris.append([ax, ay, bx, by, cx, cy])
                del idxs[k]
                clipped = True
                break
        if not clipped:
            raise ValueError("tessellation failed (self-intersecting?)")
    a, b, c = idxs
    tris.append([*pts[a], *pts[b], *pts[c]])
    return np.asarray(tris, dtype=np.float64)


# ---------------------------------------------------------------------------
# vectorized relation kernels (LatLonShapeQuery's queryMatches role)
# ---------------------------------------------------------------------------

def _point_in_poly(px: np.ndarray, py: np.ndarray,
                   poly_x: np.ndarray, poly_y: np.ndarray) -> np.ndarray:
    """Ray-casting point-in-polygon, vectorized over points.

    NOTE: this exact crossing formula is mirrored verbatim by the
    gate's DuckDB oracle SQL — keep the arithmetic order identical."""
    inside = np.zeros(len(px), dtype=bool)
    n = len(poly_x)
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(n):
            x1, y1 = poly_x[i], poly_y[i]
            x2, y2 = poly_x[(i + 1) % n], poly_y[(i + 1) % n]
            cond = (y1 > py) != (y2 > py)
            xcross = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            inside ^= cond & (px < xcross)
    return inside


def _point_in_tri(px, py, ax, ay, bx, by, cx, cy) -> np.ndarray:
    """Boundary-inclusive point-in-triangle (sign method), vectorized.

    The bbox clamp makes DEGENERATE triangles exact: a point triangle
    (a=b=c) has every orient 0 — the sign test alone would claim it
    contains everything; with the clamp it contains only its own point,
    and a flat line triangle contains exactly its segment."""
    d1 = _orient(ax, ay, bx, by, px, py)
    d2 = _orient(bx, by, cx, cy, px, py)
    d3 = _orient(cx, cy, ax, ay, px, py)
    has_neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
    has_pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
    inside = ~(has_neg & has_pos)
    min_x = np.minimum(np.minimum(ax, bx), cx)
    max_x = np.maximum(np.maximum(ax, bx), cx)
    min_y = np.minimum(np.minimum(ay, by), cy)
    max_y = np.maximum(np.maximum(ay, by), cy)
    return (
        inside
        & (px >= min_x) & (px <= max_x) & (py >= min_y) & (py <= max_y)
    )


def _on_segment(ax, ay, bx, by, px, py, d):
    return (
        (d == 0)
        & (np.minimum(ax, bx) <= px) & (px <= np.maximum(ax, bx))
        & (np.minimum(ay, by) <= py) & (py <= np.maximum(ay, by))
    )


def _segs_intersect(p1x, p1y, p2x, p2y, q1x, q1y, q2x, q2y) -> np.ndarray:
    """Segment intersection incl. collinear touch, vectorized."""
    d1 = _orient(q1x, q1y, q2x, q2y, p1x, p1y)
    d2 = _orient(q1x, q1y, q2x, q2y, p2x, p2y)
    d3 = _orient(p1x, p1y, p2x, p2y, q1x, q1y)
    d4 = _orient(p1x, p1y, p2x, p2y, q2x, q2y)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
        ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
    )
    touch = (
        _on_segment(q1x, q1y, q2x, q2y, p1x, p1y, d1)
        | _on_segment(q1x, q1y, q2x, q2y, p2x, p2y, d2)
        | _on_segment(p1x, p1y, p2x, p2y, q1x, q1y, d3)
        | _on_segment(p1x, p1y, p2x, p2y, q2x, q2y, d4)
    )
    return proper | touch


def _tris_intersect_poly(T: np.ndarray, poly_x: np.ndarray,
                         poly_y: np.ndarray) -> np.ndarray:
    """bool[T]: triangle INTERSECTS the simple polygon (shared area,
    boundary touch included).  Three vectorized checks cover all cases:
    a triangle vertex inside the polygon, a polygon vertex inside the
    triangle, or any edge crossing."""
    ax, ay, bx, by, cx, cy = (T[:, i] for i in range(6))
    hit = np.zeros(len(T), dtype=bool)
    # 1) triangle vertex in polygon
    for vx, vy in ((ax, ay), (bx, by), (cx, cy)):
        hit |= _point_in_poly(vx, vy, poly_x, poly_y)
    # 2) polygon vertex in triangle
    for i in range(len(poly_x)):
        hit |= _point_in_tri(
            poly_x[i], poly_y[i], ax, ay, bx, by, cx, cy
        )
    # 3) edge × edge
    tri_edges = (
        (ax, ay, bx, by), (bx, by, cx, cy), (cx, cy, ax, ay)
    )
    n = len(poly_x)
    for e1 in tri_edges:
        for i in range(n):
            x1, y1 = poly_x[i], poly_y[i]
            x2, y2 = poly_x[(i + 1) % n], poly_y[(i + 1) % n]
            hit |= _segs_intersect(*e1, x1, y1, x2, y2)
    return hit


# ---------------------------------------------------------------------------
# index build + queries
# ---------------------------------------------------------------------------

TRIANGLE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("ax", pa.float64()), ("ay", pa.float64()),
        ("bx", pa.float64()), ("by", pa.float64()),
        ("cx", pa.float64()), ("cy", pa.float64()),
        ("min_lat", pa.float64()), ("max_lat", pa.float64()),
        ("min_lon", pa.float64()), ("max_lon", pa.float64()),
    ]
)


def build_shape_index(ds, id_col: str, geom_col: str, out_dir: str) -> str:
    """Tessellate every row's geometry and write the triangle table,
    globally sorted by ``(min_lat, min_lon)`` so row-group stats prune.

    ``geom_col`` is ``list<list<double>>``: per row, [[lat, lon], ...]
    simple-polygon vertices (1 vertex = point, 2 = line)."""

    def _tess(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        geoms = t.column(geom_col).to_pylist()
        out_id: List[int] = []
        rows: List[np.ndarray] = []
        for d, g in zip(ids, geoms):
            T = tessellate([(v[0], v[1]) for v in g])
            out_id.extend([int(d)] * len(T))
            rows.append(T)
        if not rows:
            return TRIANGLE_SCHEMA.empty_table()
        T = np.concatenate(rows)
        xs = T[:, 0::2]
        ys = T[:, 1::2]
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "ax": T[:, 0], "ay": T[:, 1],
                "bx": T[:, 2], "by": T[:, 3],
                "cx": T[:, 4], "cy": T[:, 5],
                "min_lat": ys.min(axis=1), "max_lat": ys.max(axis=1),
                "min_lon": xs.min(axis=1), "max_lon": xs.max(axis=1),
            },
            schema=TRIANGLE_SCHEMA,
        )

    tris = ds.select_columns([id_col, geom_col]).map_batches(
        _tess, batch_format="pyarrow"
    )
    # the ONE build-time shuffle: bbox-sort so query-time parquet
    # row-group stats act as the BKD inner-node ranges
    tris.sort(["min_lat", "min_lon"]).write_parquet(out_dir)
    return out_dir


def _candidates(index_dir: str, min_lat, max_lat, min_lon, max_lon):
    """Pruned triangle read: only row groups whose bbox stats overlap the
    query bbox leave storage (parquet predicate pushdown over the sorted
    table)."""
    import pyarrow.compute as pc
    import ray.data

    flt = (
        (pc.field("min_lat") <= max_lat) & (pc.field("max_lat") >= min_lat)
        & (pc.field("min_lon") <= max_lon) & (pc.field("max_lon") >= min_lon)
    )
    return ray.data.read_parquet(index_dir, filter=flt)


def _distinct_ids(hits):
    from ray.data.aggregate import Count

    return (
        hits.groupby("doc_id")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["doc_id"])
    )


def shape_bbox_query(index_dir: str, min_lat: float, max_lat: float,
                     min_lon: float, max_lon: float):
    """Docs with any triangle intersecting the lat/lon box
    (``LatLonShape.newBoxQuery`` / ``LatLonShapeBoundingBoxQuery``,
    INTERSECTS relation).  Returns a Dataset of distinct doc_id."""
    box_x = np.array([min_lon, max_lon, max_lon, min_lon])
    box_y = np.array([min_lat, min_lat, max_lat, max_lat])

    def _verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        T = np.stack(
            [t.column(c).to_numpy() for c in
             ("ax", "ay", "bx", "by", "cx", "cy")], axis=1
        )
        # box containment is a cheap direct test; fall through to the
        # generic polygon kernel for the crossing cases
        ax, ay = T[:, 0], T[:, 1]
        inside = (
            (ax >= min_lon) & (ax <= max_lon)
            & (ay >= min_lat) & (ay <= max_lat)
        )
        hit = inside | _tris_intersect_poly(T, box_x, box_y)
        return pa.table(
            {"doc_id": t.column("doc_id").filter(pa.array(hit))}
        )

    cand = _candidates(index_dir, min_lat, max_lat, min_lon, max_lon)
    return _distinct_ids(
        cand.map_batches(_verify, batch_format="pyarrow")
    )


def shape_polygon_query(index_dir: str,
                        polygon: Sequence[Tuple[float, float]]):
    """Docs with any triangle intersecting the simple query polygon
    (``LatLonShape.newPolygonQuery`` / ``LatLonShapePolygonQuery``,
    INTERSECTS relation).  Returns a Dataset of distinct doc_id."""
    poly_x = np.array([float(lon) for _, lon in polygon])
    poly_y = np.array([float(lat) for lat, _ in polygon])

    def _verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        T = np.stack(
            [t.column(c).to_numpy() for c in
             ("ax", "ay", "bx", "by", "cx", "cy")], axis=1
        )
        hit = _tris_intersect_poly(T, poly_x, poly_y)
        return pa.table(
            {"doc_id": t.column("doc_id").filter(pa.array(hit))}
        )

    cand = _candidates(
        index_dir, poly_y.min(), poly_y.max(), poly_x.min(), poly_x.max()
    )
    return _distinct_ids(
        cand.map_batches(_verify, batch_format="pyarrow")
    )
