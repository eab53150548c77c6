"""SegmentReader — mmap-style in-memory view of one segment's files.

The per-actor hot state of the query path (the analogue of an
``IndexSearcher`` leaf over a ``DirectoryReader``,
``lucene/core/src/java/org/apache/lucene/search/IndexSearcher.java:183-209``):
postings loaded once per actor, term → row dict as the term dictionary
(FST analogue), posting arrays exposed as zero-copy numpy views over the
Arrow list buffers.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.index.postings_codec import decode_postings

__all__ = [
    "SegmentReader",
    "latest_deletes_file",
    "committed_gens",
    "reader_cache_key",
]

_DELETES_RE = __import__("re").compile(r"^deletes-(\d+)\.parquet$")


def latest_deletes_file(seg_dir: str) -> Optional[str]:
    """Highest-generation ``deletes-N.parquet`` in the segment dir, or None.

    The per-segment live-docs sidecar (the ``.liv`` file role, reference
    ``lucene/core/src/java/org/apache/lucene/codecs/lucene50/
    Lucene50LiveDocsFormat.java:30-60``): segments stay immutable; deletes
    ride in a generation-stamped sidecar.  This directory scan is the
    WRITER-side helper (choosing the next generation) and the fallback for
    standalone segment dirs; readers resolve the generation from the
    committed manifest (:func:`committed_gens`) so an uncommitted sidecar
    is never visible — the reference only exposes ``.liv`` files through a
    committed ``SegmentCommitInfo.getDelGen()``."""
    best, best_gen = None, -1
    try:
        names = os.listdir(seg_dir)
    except OSError:
        return None
    for name in names:
        m = _DELETES_RE.match(name)
        if m and int(m.group(1)) > best_gen:
            best_gen = int(m.group(1))
            best = name
    return best


def committed_gens(seg_dir: str) -> Optional[Tuple[int, Dict[str, int]]]:
    """``(del_gen, dv_gens)`` of this segment per the COMMITTED manifest of
    the enclosing index directory, or None if the segment is standalone
    (no manifest, or not listed in it).

    This is the reader-side source of truth for sidecar visibility — the
    ``SegmentCommitInfo.getDelGen()/getDocValuesGen()`` role (reference
    ``lucene/core/src/java/org/apache/lucene/index/SegmentCommitInfo.java``):
    a delete/DV-update sidecar written but not yet committed must not be
    observed, and a crash between sidecar write and commit leaves the
    previous commit point fully intact."""
    from lucene_solr_ray.index.manifest import (
        SEGMENT_PREFIX,
        read_latest_manifest,
    )

    base = os.path.basename(os.path.normpath(seg_dir))
    if not base.startswith(SEGMENT_PREFIX):
        return None
    try:
        seg_id = int(base[len(SEGMENT_PREFIX):])
    except ValueError:
        return None
    manifest = read_latest_manifest(os.path.dirname(os.path.normpath(seg_dir)))
    if manifest is None:
        return None
    for s in manifest["segments"]:
        if int(s["segment_id"]) == seg_id:
            return (
                int(s.get("del_gen", 0)),
                {k: int(v) for k, v in (s.get("dv_gens") or {}).items()},
            )
    return None


def reader_cache_key(seg_dir: str) -> Tuple:
    """Cache key for reader caches that must refresh when the committed
    live-docs / DV-update generation advances (actor-side reader caches).
    Falls back to the newest on-disk sidecar for standalone segments."""
    gens = committed_gens(seg_dir)
    if gens is not None:
        return (seg_dir, gens[0], tuple(sorted(gens[1].items())))
    return (seg_dir, latest_deletes_file(seg_dir))


def _list_views(col: pa.ChunkedArray) -> Tuple[np.ndarray, np.ndarray]:
    """(offsets, values) numpy views of a list<int32> column."""
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], type=arr.type)
    off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = arr.values.to_numpy(zero_copy_only=False)
    return off, vals


class SegmentReader:
    def __init__(self, seg_dir: str, load_positions: bool = False,
                 del_gen: Optional[int] = None,
                 respect_soft_deletes: bool = False) -> None:
        self.seg_dir = seg_dir
        with open(os.path.join(seg_dir, "segment.json")) as f:
            self.meta = json.load(f)
        self.segment_id = int(self.meta["segment_id"])
        self.stats = self.meta["stats"]

        cols = ["term", "df", "ttf", "blocks"]
        pq_schema = pq.read_schema(os.path.join(seg_dir, "postings.parquet"))
        if "positions" in pq_schema.names and not pa.types.is_binary(
            pq_schema.field("positions").type
        ):
            raise ValueError(
                f"segment {seg_dir} uses an outdated on-disk format "
                "(nested-list positions); rebuild the index with the "
                "current engine (FORMAT_VERSION >= 3)"
            )
        self._has_offsets_col = "offsets" in pq_schema.names
        self._has_payloads_col = "payloads" in pq_schema.names
        if load_positions:
            cols.append("positions")
            if self._has_offsets_col:
                cols.append("offsets")
            if self._has_payloads_col:
                cols.append("payloads")
        t = pq.read_table(
            os.path.join(seg_dir, "postings.parquet"), columns=cols
        )
        self._terms: List[str] = t.column("term").to_pylist()
        # Arrow view of the term dictionary (zero extra copy) — pattern
        # expansion runs C kernels over it instead of a Python loop
        self._terms_arrow = t.column("term").combine_chunks()
        self._term_row: Dict[str, int] = {
            term: i for i, term in enumerate(self._terms)
        }
        self._df = t.column("df").to_numpy()
        self._ttf = t.column("ttf").to_numpy()
        blocks = t.column("blocks").combine_chunks()
        if isinstance(blocks, pa.ChunkedArray):
            blocks = blocks.chunk(0) if blocks.num_chunks else pa.array(
                [], type=pa.binary()
            )
        self._blocks = blocks
        self._decoded: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

        self._has_positions = load_positions
        if load_positions:
            poscol = t.column("positions").combine_chunks()
            if isinstance(poscol, pa.ChunkedArray):
                poscol = poscol.chunk(0) if poscol.num_chunks else pa.array(
                    [], type=pa.binary()
                )
            self._pos_blobs = poscol
            if self._has_offsets_col:
                offcol = t.column("offsets").combine_chunks()
                if isinstance(offcol, pa.ChunkedArray):
                    offcol = offcol.chunk(0) if offcol.num_chunks else \
                        pa.array([], type=pa.binary())
                self._off_blobs = offcol
            else:
                self._off_blobs = None
            if self._has_payloads_col:
                paycol = t.column("payloads").combine_chunks()
                if isinstance(paycol, pa.ChunkedArray):
                    paycol = paycol.chunk(0) if paycol.num_chunks else \
                        pa.array([], type=pa.binary())
                self._pay_blobs = paycol
            else:
                self._pay_blobs = None

        dm_schema = pq.read_schema(os.path.join(seg_dir, "docmeta.parquet"))
        extra = [c for c in dm_schema.names if c.startswith("norm__")]
        dm = pq.read_table(
            os.path.join(seg_dir, "docmeta.parquet"),
            columns=["doc_id", "norm", "field_len", *extra],
        )
        self.doc_ids: np.ndarray = dm.column("doc_id").to_numpy()
        self.norms: np.ndarray = dm.column("norm").to_numpy()
        self.field_lens: np.ndarray = dm.column("field_len").to_numpy()
        #: per-extra-field norms (default field stays on the legacy column)
        self.field_norms: Dict[str, np.ndarray] = {
            c[len("norm__"):]: dm.column(c).to_numpy() for c in extra
        }
        self.ndocs = len(self.doc_ids)

        # live docs: deleted ordinals from the COMMITTED sidecar generation
        # (manifest-resolved; an uncommitted sidecar stays invisible, and a
        # crash between sidecar write and commit loses nothing).  Explicit
        # del_gen wins; standalone segment dirs fall back to the dir scan.
        self.dv_gens: Dict[str, int] = {}
        if del_gen is None:
            gens = committed_gens(seg_dir)
            if gens is not None:
                del_gen, self.dv_gens = gens
        if del_gen is not None:
            self.del_file = (
                f"deletes-{int(del_gen)}.parquet" if int(del_gen) > 0
                else None
            )
        else:
            self.del_file = latest_deletes_file(seg_dir)
        if self.del_file:
            self.deleted_ords: np.ndarray = np.sort(
                pq.read_table(os.path.join(seg_dir, self.del_file))
                .column("ord").to_numpy().astype(np.int64)
            )
        else:
            self.deleted_ords = np.empty(0, dtype=np.int64)
        # soft deletes stay VISIBLE unless the caller opts into the
        # SoftDeletesDirectoryReaderWrapper role (reference ``lucene/core/
        # .../index/SoftDeletesDirectoryReaderWrapper.java``: the wrapper
        # folds the soft-deletes field into liveDocs; unwrapped readers
        # still see the docs)
        self.soft_deleted_ords = np.empty(0, dtype=np.int64)
        if respect_soft_deletes:
            from lucene_solr_ray.index.softdeletes import soft_deleted_ords

            so = soft_deleted_ords(seg_dir)
            if len(so):
                self.soft_deleted_ords = so
                self.deleted_ords = np.union1d(self.deleted_ords, so)
        self.has_deletes = len(self.deleted_ords) > 0

    def points(self, field: str):
        """(values float64 sorted asc, ords int32 aligned) of one numeric
        point field, or None if the segment has no values for it.  Lazy:
        points.parquet loads on first use and caches per field (the BKD
        leaf-block read of the 1-D flat-sorted representation)."""
        cached = getattr(self, "_points_cache", None)
        if cached is None:
            cached = self._points_cache = {}
        hit = cached.get(field)
        if hit is not None:
            return hit if hit != () else None
        path = os.path.join(self.seg_dir, "points.parquet")
        if not os.path.exists(path):
            cached[field] = ()
            return None
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        t = pads.dataset(path, format="parquet").to_table(
            filter=pc.field("field") == field
        )
        if t.num_rows == 0:
            cached[field] = ()
            return None
        out = (t.column("value").to_numpy(), t.column("ord").to_numpy())
        cached[field] = out
        return out

    def live_mask(self, ords: np.ndarray) -> np.ndarray:
        """Boolean mask of which ords are LIVE (not tombstoned)."""
        d = self.deleted_ords
        if not self.has_deletes or len(ords) == 0:
            return np.ones(len(ords), dtype=bool)
        idx = np.searchsorted(d, ords)
        idx_c = np.minimum(idx, len(d) - 1)
        return ~((idx < len(d)) & (d[idx_c] == ords))

    @property
    def live_doc_count(self) -> int:
        return self.ndocs - len(self.deleted_ords)

    def norms_for(self, field: "Optional[str]") -> np.ndarray:
        """Norm bytes for a field (None/default → the legacy column)."""
        if not field:
            return self.norms
        arr = self.field_norms.get(field)
        if arr is None:
            # field absent from this segment: all docs norm 0 (no terms)
            arr = np.zeros(self.ndocs, dtype=np.uint8)
        return arr

    # -- term dictionary ---------------------------------------------------
    @property
    def terms(self) -> List[str]:
        return self._terms

    @property
    def terms_arrow(self) -> "pa.Array":
        return self._terms_arrow

    def term_stats(self, term: str) -> Optional[Tuple[int, int]]:
        r = self._term_row.get(term)
        if r is None:
            return None
        return int(self._df[r]), int(self._ttf[r])

    # -- postings ----------------------------------------------------------
    def postings(self, term: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """(ords asc int32, freqs int32) or None — decoded from the block
        codec on first access, cached per term (the hot-block cache of the
        reference's ``LRUQueryCache`` idea, unbounded within an actor)."""
        r = self._term_row.get(term)
        if r is None:
            return None
        hit = self._decoded.get(r)
        if hit is None:
            hit = decode_postings(self._blocks[r].as_py())
            self._decoded[r] = hit
        return hit

    def postings_blob(self, term: str) -> Optional[bytes]:
        """Raw encoded posting blocks (for skip/impact-based traversal)."""
        r = self._term_row.get(term)
        if r is None:
            return None
        return self._blocks[r].as_py()

    def positions(
        self, term: str
    ) -> Optional[Tuple[np.ndarray, Callable[[int], np.ndarray]]]:
        """(ords, posfn) where posfn(i) = positions array of the i-th
        posting entry. Requires load_positions=True."""
        if not self._has_positions:
            raise RuntimeError("reader opened without positions")
        r = self._term_row.get(term)
        if r is None:
            return None
        ords, freqs = self.postings(term)
        vals = np.frombuffer(self._pos_blobs[r].as_py() or b"", dtype="<i4")
        offs = np.concatenate([[0], np.cumsum(freqs, dtype=np.int64)])

        def posfn(i: int) -> np.ndarray:
            return vals[offs[i]: offs[i + 1]]

        return ords, posfn

    def offsets(self, term: str):
        """(ords, offfn) — offfn(i) = (start, end) int32 pairs array of the
        i-th posting entry (requires an offsets-enabled index)."""
        if not self._has_positions or self._off_blobs is None:
            raise RuntimeError("index built without offsets")
        r = self._term_row.get(term)
        if r is None:
            return None
        blob = self._off_blobs[r].as_py()
        if blob is None:
            raise RuntimeError("index built without offsets")
        ords, freqs = self.postings(term)
        vals = np.frombuffer(blob, dtype="<i4").reshape(-1, 2)
        offs = np.concatenate([[0], np.cumsum(freqs, dtype=np.int64)])

        def offfn(i: int) -> np.ndarray:
            return vals[offs[i]: offs[i + 1]]

        return ords, offfn

    def payloads(self, term: str):
        """(ords, payfn) — payfn(i) = float32 payloads of the i-th posting
        entry, aligned with ``positions``; None if the term is absent or
        the segment carries no payloads for it (PayloadAttribute read,
        reference ``index/PostingsEnum.getPayload``)."""
        if not self._has_positions:
            raise RuntimeError("reader opened without positions")
        r = self._term_row.get(term)
        if r is None or self._pay_blobs is None:
            return None
        blob = self._pay_blobs[r].as_py()
        if blob is None:
            return None
        ords, freqs = self.postings(term)
        vals = np.frombuffer(blob, dtype="<f4")
        offs = np.concatenate([[0], np.cumsum(freqs, dtype=np.int64)])

        def payfn(i: int) -> np.ndarray:
            return vals[offs[i]: offs[i + 1]]

        return ords, payfn
