"""Segment construction and reading — the per-partition DWPT analogue.

A *segment* is the immutable unit of the index, mirroring the reference's
per-thread in-RAM segment flushed to codec files
(``lucene/core/src/java/org/apache/lucene/index/DocumentsWriterPerThread.java``,
``index/FreqProxTermsWriter.java:83-126``).  One build task consumes a
contiguous slice of corpus rows and emits:

- ``postings.parquet`` — one row per term, byte-sorted by term (as the
  reference sorts terms before flush, ``FreqProxTermsWriter.java:88-103``):
  ``term, df:int32, ttf:int64, ords:list<int32> (segment-local doc ordinals,
  ascending), freqs:list<int32>, positions:list<list<int32>>`` (positions
  optional, for phrase queries).
- ``docmeta.parquet`` — one row per doc ordinal: ``doc_id:int64,
  norm:uint8, field_len:int32, content_sha256:binary`` (the norm byte per
  ``BM25Similarity.computeNorm``, ``BM25Similarity.java:115-126``).
- a manifest entry with per-segment stats: ``doc_count, sum_total_term_freq,
  sum_doc_freq, term_count`` — the inputs to ``CollectionStatistics``
  (``search/CollectionStatistics.java``; summed over segments at query time
  exactly as ``IndexSearcher.java:780-792`` sums leaves).

Segment-local ordinals keep posting arrays dense int32 regardless of global
doc_id assignment; ``docmeta`` row *i* is ordinal *i* (ords → doc_id is one
``take``).  This mirrors Lucene's segment-local docIDs + ``ctx.docBase``.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from lucene_solr_ray.analysis.analyzer import StandardAnalyzer
from lucene_solr_ray.analysis.smallfloat import int_to_byte4_np

__all__ = ["build_segment_tables", "SegmentData", "POSTINGS_SCHEMA", "DOCMETA_SCHEMA"]

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int32()),
        ("ttf", pa.int64()),
        ("ords", pa.list_(pa.int32())),
        ("freqs", pa.list_(pa.int32())),
        ("positions", pa.list_(pa.list_(pa.int32()))),
    ]
)

DOCMETA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("norm", pa.uint8()),
        ("field_len", pa.int32()),
        ("content_sha256", pa.binary()),
    ]
)


class SegmentData:
    """In-memory segment: the return value of :func:`build_segment_tables`."""

    __slots__ = ("postings", "docmeta", "stats")

    def __init__(self, postings: pa.Table, docmeta: pa.Table, stats: dict):
        self.postings = postings
        self.docmeta = docmeta
        self.stats = stats


def build_segment_tables(
    doc_ids: Sequence[int],
    texts: Sequence[Optional[str]],
    analyzer: Optional[StandardAnalyzer] = None,
    with_positions: bool = True,
) -> SegmentData:
    """Invert a slice of documents into sorted postings + docmeta tables.

    Pure function of its inputs — same rows in, same bytes out, under any
    parallelism (the determinism the resume/checkpoint protocol relies on).
    """
    analyzer = analyzer or StandardAnalyzer()
    n = len(texts)
    assert len(doc_ids) == n

    # per-term accumulators over local ordinals (the TermsHash analogue,
    # reference index/TermsHashPerField.java — ours is a plain dict of
    # growing lists, sorted once at flush)
    post_ords: Dict[str, List[int]] = {}
    post_freqs: Dict[str, List[int]] = {}
    post_positions: Dict[str, List[List[int]]] = {}

    norms_len = np.zeros(n, dtype=np.int64)
    field_lens = np.zeros(n, dtype=np.int32)
    shas: List[bytes] = []

    for ord_, text in enumerate(texts):
        if text is None:
            text = ""
        shas.append(hashlib.sha256(text.encode("utf-8")).digest())
        if with_positions:
            terms, positions, flen = analyzer.analyze_with_positions(text)
            per_doc: Dict[str, List[int]] = {}
            for t, p in zip(terms, positions):
                per_doc.setdefault(t, []).append(p)
            for t, plist in per_doc.items():
                post_ords.setdefault(t, []).append(ord_)
                post_freqs.setdefault(t, []).append(len(plist))
                post_positions.setdefault(t, []).append(plist)
        else:
            tf = analyzer.term_freqs(text)
            flen = sum(tf.values())
            for t, f in tf.items():
                post_ords.setdefault(t, []).append(ord_)
                post_freqs.setdefault(t, []).append(f)
        field_lens[ord_] = flen
        norms_len[ord_] = flen  # numOverlap == 0 for this chain

    terms_sorted = sorted(post_ords)  # byte-sorted term dict order
    df = np.array([len(post_ords[t]) for t in terms_sorted], dtype=np.int32)
    ttf = np.array(
        [sum(post_freqs[t]) for t in terms_sorted], dtype=np.int64
    )
    postings_cols: Dict[str, pa.Array] = {
        "term": pa.array(terms_sorted, type=pa.string()),
        "df": pa.array(df),
        "ttf": pa.array(ttf),
        "ords": pa.array(
            [post_ords[t] for t in terms_sorted], type=pa.list_(pa.int32())
        ),
        "freqs": pa.array(
            [post_freqs[t] for t in terms_sorted], type=pa.list_(pa.int32())
        ),
        "positions": pa.array(
            [post_positions[t] for t in terms_sorted]
            if with_positions
            else [None] * len(terms_sorted),
            type=pa.list_(pa.list_(pa.int32())),
        ),
    }
    postings = pa.table(postings_cols, schema=POSTINGS_SCHEMA)

    docmeta = pa.table(
        {
            "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64)),
            "norm": pa.array(int_to_byte4_np(norms_len)),
            "field_len": pa.array(field_lens),
            "content_sha256": pa.array(shas, type=pa.binary()),
        },
        schema=DOCMETA_SCHEMA,
    )

    stats = {
        "doc_count": int(n),
        "sum_total_term_freq": int(ttf.sum()) if len(ttf) else 0,
        "sum_doc_freq": int(df.sum()) if len(df) else 0,
        "term_count": int(len(terms_sorted)),
    }
    return SegmentData(postings, docmeta, stats)
