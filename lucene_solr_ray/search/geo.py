"""Geo-spatial search: distance queries + distance sort over lat/lon.

The reference's spatial path (``lucene/core/src/java/org/apache/lucene/
document/LatLonPoint.java`` — ``newDistanceQuery``; ``lucene/spatial/``):
points index into a BKD tree, a distance query prunes by bounding box and
verifies with exact haversine.

Ours: lat/lon ride as stored docmeta columns (built with
``stored_cols=["lat", "lon"]``) plus optional numeric point fields for
segment-level min/max pruning.  ``geo_distance_search`` runs one
distributed pass: per segment a vectorized bounding-box prefilter (the
BKD-cell role) then exact haversine on the survivors; the driver merges
≤ segments × k tiny rows.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

__all__ = ["haversine_m", "geo_distance_search"]

_EARTH_R_M = 6_371_008.8  # mean earth radius, meters


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters (vectorized haversine)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = (np.sin(dp / 2.0) ** 2
         + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2)
    return 2.0 * _EARTH_R_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


class _GeoFn:
    """Per-segment: bbox prefilter on the stored lat/lon columns, exact
    haversine verify, local top-k by (distance asc, doc asc)."""

    def __init__(self, lat: float, lon: float, radius_m: float, k: int,
                 lat_col: str, lon_col: str):
        self.lat = lat
        self.lon = lon
        self.radius = radius_m
        self.k = k
        self.lat_col = lat_col
        self.lon_col = lon_col
        # bounding box (the BKD cell prune): ±radius in degrees, widened
        # for longitude by the cos(lat) shrink (clamped near the poles)
        dlat = np.degrees(radius_m / _EARTH_R_M)
        coslat = max(np.cos(np.radians(lat)), 1e-6)
        dlon = min(np.degrees(radius_m / (_EARTH_R_M * coslat)), 180.0)
        self.bbox = (lat - dlat, lat + dlat, lon - dlon, lon + dlon)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        rows = []
        for seg_dir in batch.column("seg_dir").to_pylist():
            dm = pq.read_table(
                os.path.join(seg_dir, "docmeta.parquet"),
                columns=["doc_id", self.lat_col, self.lon_col],
            )
            lats = dm.column(self.lat_col).to_numpy()
            lons = dm.column(self.lon_col).to_numpy()
            lo_la, hi_la, lo_lo, hi_lo = self.bbox
            m = (lats >= lo_la) & (lats <= hi_la) \
                & (lons >= lo_lo) & (lons <= hi_lo)
            cand = np.nonzero(m)[0]
            if len(cand) == 0:
                continue
            d = haversine_m(self.lat, self.lon, lats[cand], lons[cand])
            ok = d <= self.radius
            cand, d = cand[ok], d[ok]
            if len(cand) == 0:
                continue
            dids = dm.column("doc_id").to_numpy()[cand]
            order = np.lexsort((dids, d))[: self.k]
            for i in order:
                rows.append(
                    {"doc_id": int(dids[i]), "distance_m": float(d[i])}
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("distance_m", pa.float64())]
            ),
        )


def geo_distance_search(
    index,
    lat: float,
    lon: float,
    radius_m: float,
    k: int = 10,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> pa.Table:
    """Top-k docs within ``radius_m`` of (lat, lon), sorted by distance
    (``LatLonPoint.newDistanceQuery`` + distance sort)."""
    import ray.data

    seg_items = [
        {"seg_dir": d, "seg_ord": i} for i, d in enumerate(index.seg_dirs)
    ]
    df = (
        ray.data.from_items(seg_items, override_num_blocks=len(seg_items))
        .map_batches(
            _GeoFn(lat, lon, radius_m, k, lat_col, lon_col),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if df.empty:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64()),
             "distance_m": pa.array([], pa.float64())}
        )
    df = df.sort_values(["distance_m", "doc_id"]).head(k).reset_index(
        drop=True
    )
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "rank": pa.array(np.arange(1, len(df) + 1, dtype=np.int64)),
            "distance_m": pa.array(df["distance_m"].to_numpy(np.float64)),
        }
    )
