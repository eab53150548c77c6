"""LatLonShape: tessellation + bbox/polygon INTERSECTS queries vs a
brute-force dense-sampling oracle (reference
``lucene/sandbox/.../LatLonShape.java``, ``LatLonShapePolygonQuery.java``,
``LatLonShapeBoundingBoxQuery.java``)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.search.shape import (
    _point_in_poly,
    _point_in_tri,
    _tris_intersect_poly,
    build_shape_index,
    shape_bbox_query,
    shape_polygon_query,
    tessellate,
)


def _tri_area(t):
    ax, ay, bx, by, cx, cy = t
    return abs((bx - ax) * (cy - ay) - (by - ay) * (cx - ax)) / 2.0


def _shoelace(poly):
    xs = np.array([lon for _, lon in poly])
    ys = np.array([lat for lat, _ in poly])
    return abs(np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys)) / 2.0


@pytest.mark.parametrize("poly", [
    [(0, 0), (0, 4), (4, 4), (4, 0)],                               # square
    [(0, 0), (2, 1), (4, 0), (3, 2), (4, 4), (2, 3), (0, 4), (1, 2)],  # concave
    [(0, 0), (1, 5), (2, 0.5), (3, 5), (4, 0)],                     # comb
])
def test_tessellation_preserves_area(poly):
    T = tessellate(poly)
    assert len(T) == len(poly) - 2
    assert sum(_tri_area(t) for t in T) == pytest.approx(_shoelace(poly))


def test_tessellation_degenerates():
    assert tessellate([(1.5, 2.5)]).tolist() == [
        [2.5, 1.5, 2.5, 1.5, 2.5, 1.5]
    ]
    line = tessellate([(0, 0), (1, 2)])
    assert line.shape == (1, 6)
    with pytest.raises(ValueError):
        tessellate([])


def test_point_in_tri_degenerate_triangles():
    # point triangle contains ONLY its own point
    px = np.array([1.0, 2.0])
    py = np.array([1.0, 2.0])
    one = np.ones(2)
    assert _point_in_tri(px, py, one, one, one, one, one, one).tolist() \
        == [True, False]
    # flat line triangle (0,0)-(2,2) contains its midpoint, not offsets
    z = np.zeros(3)
    two = np.full(3, 2.0)
    got = _point_in_tri(
        np.array([1.0, 1.0, 3.0]), np.array([1.0, 0.5, 3.0]),
        z, z, two, two, two, two,
    )
    assert got.tolist() == [True, False, False]


def _brute_intersects(tri, poly, samples=60):
    """Dense barycentric sampling of the triangle + polygon sampling —
    an approximate INTERSECTS oracle for area-overlap cases."""
    ax, ay, bx, by, cx, cy = tri
    poly_x = np.array([lon for _, lon in poly])
    poly_y = np.array([lat for lat, _ in poly])
    us = np.linspace(0, 1, samples)
    pts_x, pts_y = [], []
    for u in us:
        for v in np.linspace(0, 1 - u, max(2, int(samples * (1 - u)))):
            w = 1 - u - v
            pts_x.append(u * ax + v * bx + w * cx)
            pts_y.append(u * ay + v * by + w * cy)
    inside = _point_in_poly(
        np.array(pts_x), np.array(pts_y), poly_x, poly_y
    )
    return bool(inside.any())


def test_tri_poly_intersection_vs_sampling_oracle():
    rng = np.random.default_rng(11)
    poly = [(0, 0), (2, 1), (4, 0), (3, 2), (4, 4), (2, 3), (0, 4), (1, 2)]
    poly_x = np.array([lon for _, lon in poly])
    poly_y = np.array([lat for lat, _ in poly])
    tris = rng.uniform(-2, 6, size=(300, 6))
    got = _tris_intersect_poly(tris, poly_x, poly_y)
    for i in range(len(tris)):
        brute = _brute_intersects(tris[i], poly)
        if brute:
            # sampling says overlap → the exact kernel must agree
            assert got[i], f"tri {i} missed a sampled overlap"
        # (brute=False can be a thin graze the sampler missed — the
        # exact kernel is allowed to find those)


def test_shape_index_queries_end_to_end(ray_session, tmp_path):
    import ray.data

    rng = np.random.default_rng(3)
    n = 400
    ids = np.arange(n, dtype=np.int64)
    lats = rng.uniform(0, 10, n)
    lons = rng.uniform(0, 10, n)
    geoms = []
    for i in range(n):
        if i % 3 == 0:  # point
            geoms.append([[lats[i], lons[i]]])
        elif i % 3 == 1:  # line
            geoms.append([[lats[i], lons[i]],
                          [lats[i] + 0.3, lons[i] + 0.3]])
        else:  # small quad
            geoms.append([
                [lats[i], lons[i]], [lats[i], lons[i] + 0.4],
                [lats[i] + 0.4, lons[i] + 0.4], [lats[i] + 0.4, lons[i]],
            ])
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "geom": pa.array(geoms, pa.list_(pa.list_(pa.float64()))),
    }))
    idx = str(tmp_path / "shapes")
    build_shape_index(ds, "doc_id", "geom", idx)

    # bbox query vs brute bbox-overlap oracle over the raw geometries
    qmin_lat, qmax_lat, qmin_lon, qmax_lon = 2.0, 5.0, 3.0, 7.0
    got = set(
        shape_bbox_query(idx, qmin_lat, qmax_lat, qmin_lon, qmax_lon)
        .to_pandas()["doc_id"]
    )
    want = set()
    for i in range(n):
        g = np.array(geoms[i], dtype=float)
        g_min_lat, g_max_lat = g[:, 0].min(), g[:, 0].max()
        g_min_lon, g_max_lon = g[:, 1].min(), g[:, 1].max()
        # geometries here are convex & axis-small; bbox overlap equals
        # shape-box INTERSECTS for points and axis-aligned quads, and for
        # the diagonal lines (slope 1 inside their own bbox the segment
        # always clips any overlapping axis box through the bbox corners
        # check below)
        if (g_min_lat <= qmax_lat and g_max_lat >= qmin_lat
                and g_min_lon <= qmax_lon and g_max_lon >= qmin_lon):
            if len(g) == 2:
                # exact segment-vs-box check for the line shapes
                from lucene_solr_ray.search.shape import _segs_intersect

                x1, y1 = g[0][1], g[0][0]
                x2, y2 = g[1][1], g[1][0]
                inside = (
                    qmin_lon <= x1 <= qmax_lon
                    and qmin_lat <= y1 <= qmax_lat
                ) or (
                    qmin_lon <= x2 <= qmax_lon
                    and qmin_lat <= y2 <= qmax_lat
                )
                crosses = False
                box_edges = [
                    (qmin_lon, qmin_lat, qmax_lon, qmin_lat),
                    (qmax_lon, qmin_lat, qmax_lon, qmax_lat),
                    (qmax_lon, qmax_lat, qmin_lon, qmax_lat),
                    (qmin_lon, qmax_lat, qmin_lon, qmin_lat),
                ]
                for e in box_edges:
                    if _segs_intersect(
                        np.array([x1]), np.array([y1]),
                        np.array([x2]), np.array([y2]),
                        np.array([e[0]]), np.array([e[1]]),
                        np.array([e[2]]), np.array([e[3]]),
                    )[0]:
                        crosses = True
                        break
                if inside or crosses:
                    want.add(i)
            else:
                want.add(i)
    assert got == want

    # polygon query: triangle query shape, oracle via the verified kernel
    qpoly = [(1.0, 1.0), (8.0, 2.0), (4.0, 9.0)]
    got_p = set(
        shape_polygon_query(idx, qpoly).to_pandas()["doc_id"]
    )
    poly_x = np.array([lon for _, lon in qpoly])
    poly_y = np.array([lat for lat, _ in qpoly])
    want_p = set()
    for i in range(n):
        T = tessellate([(v[0], v[1]) for v in geoms[i]])
        if _tris_intersect_poly(T, poly_x, poly_y).any():
            want_p.add(i)
    assert got_p == want_p
    assert len(got_p) > 10  # non-trivial
