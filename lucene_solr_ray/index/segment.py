"""Segment construction and reading — the per-partition DWPT analogue.

A *segment* is the immutable unit of the index, mirroring the reference's
per-thread in-RAM segment flushed to codec files
(``lucene/core/src/java/org/apache/lucene/index/DocumentsWriterPerThread.java``,
``index/FreqProxTermsWriter.java:83-126``).  One build task consumes a
contiguous slice of corpus rows and emits:

- ``postings.parquet`` — one row per term, byte-sorted by term (as the
  reference sorts terms before flush, ``FreqProxTermsWriter.java:88-103``):
  ``term, df:int32, ttf:int64, blocks:binary`` (delta+FOR 128-blocks with
  skip entries + competitive impacts, see ``postings_codec``) and
  ``positions:binary`` (int32 positions in (doc, occurrence) order;
  per-doc boundaries implied by freqs).
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
from lucene_solr_ray.index.postings_codec import (
    encode_postings,
    encode_postings_batch,
)

__all__ = ["build_segment_tables", "SegmentData", "POSTINGS_SCHEMA",
           "DOCMETA_SCHEMA", "FORMAT_VERSION"]

#: bump when the on-disk segment layout changes (cache keys include it)
FORMAT_VERSION = 5

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int32()),
        ("ttf", pa.int64()),
        # delta+FOR block-packed (ords, freqs) + per-block skip entries and
        # competitive impacts — see index/postings_codec.py
        ("blocks", pa.binary()),
        # per-term little-endian int32 positions, concatenated in (doc,
        # occurrence) order; per-doc boundaries are implied by the freqs
        # (freq == #positions), so merge is a plain byte concat
        ("positions", pa.binary()),
        # optional (start,end) char-offset int32 pairs in the same order —
        # DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS (IndexOptions.java:25-48)
        ("offsets", pa.binary()),
        # optional per-occurrence float32 payloads in the same (doc,
        # occurrence) order as positions — the PayloadAttribute blob
        # (``analysis/tokenattributes/PayloadAttribute.java`` with the
        # FloatEncoder layout PayloadScoreQuery decodes)
        ("payloads", pa.binary()),
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
    with_offsets: bool = False,
    with_payloads: bool = False,
) -> SegmentData:
    """Invert a slice of documents into sorted postings + docmeta tables.

    Pure function of its inputs — same rows in, same bytes out, under any
    parallelism (the determinism the resume/checkpoint protocol relies on).
    """
    analyzer = analyzer or StandardAnalyzer()
    if with_offsets and not with_positions:
        raise ValueError(
            "with_offsets requires with_positions (the offsets blob is "
            "indexed by the freq boundaries the positions path defines)"
        )
    if with_payloads and (not with_positions or with_offsets):
        raise ValueError(
            "with_payloads requires with_positions and is exclusive with "
            "with_offsets (one attribute path per chain)"
        )
    if with_payloads and not hasattr(analyzer, "analyze_with_payloads"):
        raise ValueError(
            "with_payloads needs a payload-producing analyzer "
            "(e.g. DelimitedPayloadAnalyzer)"
        )
    n = len(texts)
    assert len(doc_ids) == n

    # vectorized inversion (the TermsHash + sortPostings analogue,
    # reference index/TermsHashPerField.java / FreqProxTermsWriter.java):
    # flatten every (token, doc, position) occurrence into parallel arrays,
    # stable-sort by (term, doc) once, and derive postings/freqs/positions
    # from group boundaries — no per-token dict work in Python.
    shas = [
        hashlib.sha256((t or "").encode("utf-8")).digest() for t in texts
    ]
    all_terms: List[str] = []
    doc_lens = np.zeros(n, dtype=np.int64)
    all_pos_parts: List[List[int]] = []
    all_off_parts: List[List[int]] = []  # interleaved (start, end) per token
    all_pay_parts: List[List[float]] = []  # one float payload per token
    if with_payloads:
        for ord_, text in enumerate(texts):
            if text is None:
                text = ""
            terms, positions, payloads, flen = \
                analyzer.analyze_with_payloads(text)
            all_terms.extend(terms)
            all_pos_parts.append(positions)
            all_pay_parts.append(payloads)
            doc_lens[ord_] = flen
    elif with_offsets:
        for ord_, text in enumerate(texts):
            if text is None:
                text = ""
            terms, positions, starts, ends, flen = \
                analyzer.analyze_with_offsets(text)
            all_off_parts.append(
                [v for se in zip(starts, ends) for v in se]
            )
            all_terms.extend(terms)
            all_pos_parts.append(positions)
            doc_lens[ord_] = flen
    else:
        for ord_, text in enumerate(texts):
            if text is None:
                text = ""
            terms, positions, flen = analyzer.analyze_with_positions(text)
            all_terms.extend(terms)
            all_pos_parts.append(positions)
            doc_lens[ord_] = flen

    # dict-coded terms: only the ~|vocab| unique strings get sorted,
    # not every token occurrence (object-dtype np.unique sorts all)
    code_map: Dict[str, int] = {}
    inv_list: List[int] = []
    for t in all_terms:
        c = code_map.get(t)
        if c is None:
            c = len(code_map)
            code_map[t] = c
        inv_list.append(c)
    vocab = list(code_map)
    vocab_order = sorted(range(len(vocab)), key=vocab.__getitem__)
    rank = np.empty(len(vocab), dtype=np.int64)
    rank[vocab_order] = np.arange(len(vocab), dtype=np.int64)
    uniq_terms = [vocab[i] for i in vocab_order]
    inv = rank[np.asarray(inv_list, dtype=np.int64)]
    n_toks_per_doc = np.array(
        [len(p) for p in all_pos_parts], dtype=np.int64
    )
    all_ords = np.repeat(np.arange(n, dtype=np.int64), n_toks_per_doc)
    all_pos = (
        np.concatenate([np.asarray(p, dtype=np.int64)
                        for p in all_pos_parts if p])
        if with_positions and any(all_pos_parts)
        else np.zeros(len(all_terms), dtype=np.int64)
    )
    n_occurrences = len(all_terms)

    field_lens = doc_lens.astype(np.int32)
    norm_bytes = int_to_byte4_np(doc_lens)

    if n_occurrences:
        key = inv * n + all_ords
        order = np.argsort(key, kind="stable")
        skey = key[order]
        group_keys, group_starts, group_counts = np.unique(
            skey, return_index=True, return_counts=True
        )
        g_term = group_keys // n  # term code per (term, doc) group
        g_ord = (group_keys % n).astype(np.int64)
        g_freq = group_counts.astype(np.int64)
        # per-term row ranges over the (term, doc) groups
        t_codes, t_starts, t_counts = np.unique(
            g_term, return_index=True, return_counts=True
        )
        terms_sorted = [uniq_terms[c] for c in t_codes]
        df = t_counts.astype(np.int32)
        ttf_per_group_cum = np.concatenate([[0], np.cumsum(g_freq)])
        t_ends = t_starts + t_counts
        ttf = ttf_per_group_cum[t_ends] - ttf_per_group_cum[t_starts]
        blobs = encode_postings_batch(
            g_ord, g_freq, norm_bytes, t_starts, t_counts
        )
        offsets_arr = pa.array([None] * len(t_codes), type=pa.binary())
        if with_positions:
            # positions sorted by (term, doc): one '<i4' blob per term
            # spanning its (doc, occurrence)-ordered values
            pos_values = all_pos[order].astype("<i4")
            inner_offsets = np.concatenate([[0], np.cumsum(g_freq)])
            term_val_edges = inner_offsets[
                np.concatenate([[0], np.cumsum(t_counts)])
            ]
            positions_arr = pa.array(
                [
                    pos_values[term_val_edges[i]: term_val_edges[i + 1]]
                    .tobytes()
                    for i in range(len(t_codes))
                ],
                type=pa.binary(),
            )
            if with_offsets and all_off_parts:
                # (start, end) pairs follow the same (term, doc, occurrence)
                # sort; gather pairwise via the occurrence order
                flat = np.concatenate(
                    [np.asarray(p, dtype=np.int64).reshape(-1, 2)
                     for p in all_off_parts if p]
                ) if any(all_off_parts) else np.zeros((0, 2), np.int64)
                pairs = flat[order].astype("<i4")
                offsets_arr = pa.array(
                    [
                        pairs[term_val_edges[i]: term_val_edges[i + 1]]
                        .tobytes()
                        for i in range(len(t_codes))
                    ],
                    type=pa.binary(),
                )
            if with_payloads and all_pay_parts:
                # payloads follow the same (term, doc, occurrence) sort as
                # positions: one '<f4' blob per term
                flat_pay = (
                    np.concatenate(
                        [np.asarray(p, dtype=np.float64)
                         for p in all_pay_parts if p]
                    )
                    if any(all_pay_parts)
                    else np.zeros(0, np.float64)
                )
                pay_values = flat_pay[order].astype("<f4")
                payloads_arr = pa.array(
                    [
                        pay_values[term_val_edges[i]: term_val_edges[i + 1]]
                        .tobytes()
                        for i in range(len(t_codes))
                    ],
                    type=pa.binary(),
                )
            else:
                payloads_arr = pa.array(
                    [None] * len(t_codes), type=pa.binary()
                )
        else:
            positions_arr = pa.array(
                [None] * len(t_codes), type=pa.binary()
            )
            payloads_arr = pa.array(
                [None] * len(t_codes), type=pa.binary()
            )
    else:
        terms_sorted = []
        df = np.empty(0, dtype=np.int32)
        ttf = np.empty(0, dtype=np.int64)
        blobs = []
        positions_arr = pa.array([], type=pa.binary())
        offsets_arr = pa.array([], type=pa.binary())
        payloads_arr = pa.array([], type=pa.binary())

    postings_cols: Dict[str, pa.Array] = {
        "term": pa.array(terms_sorted, type=pa.string()),
        "df": pa.array(df),
        "ttf": pa.array(ttf),
        "blocks": pa.array(blobs, type=pa.binary()),
        "positions": positions_arr,
        "offsets": offsets_arr,
        "payloads": payloads_arr,
    }
    postings = pa.table(postings_cols, schema=POSTINGS_SCHEMA)

    docmeta = pa.table(
        {
            "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64)),
            "norm": pa.array(norm_bytes),
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


#: separator between field name and term in the term dictionary for
#: non-default fields; the default field's terms stay bare (so single-field
#: indexes are byte-identical with or without the multi-field API)
FIELD_SEP = "\x1f"


def field_term(field: Optional[str], term: str) -> str:
    """Term-dictionary key for (field, term); default field = bare term."""
    return term if not field else f"{field}{FIELD_SEP}{term}"


def build_segment_tables_multi(
    doc_ids: Sequence[int],
    field_texts: "Dict[str, Sequence[Optional[str]]]",
    default_field: str,
    analyzer: Optional[StandardAnalyzer] = None,
    with_positions: bool = True,
    with_offsets: bool = False,
    field_analyzers: "Optional[Dict[str, StandardAnalyzer]]" = None,
) -> SegmentData:
    """Multi-field inversion: run the single-field kernel per field, prefix
    non-default fields' terms with ``field\\x1f`` (terms stay byte-sorted:
    the prefix groups each field's dictionary contiguously), and carry one
    norm/len column pair per extra field on docmeta
    (``norm__<f>``, ``field_len__<f>``).

    The reference's per-field structure: ``FieldInfos`` + per-field postings
    and norms (``index/FieldInfos.java``, ``Lucene70NormsConsumer``); our
    docmeta keeps the default field's norm under the legacy column names so
    every single-field consumer is unaffected.

    ``content_sha256`` covers the DEFAULT field's value (the per-row
    invariant column of the corpus contract).
    """
    assert default_field in field_texts
    field_analyzers = field_analyzers or {}
    segs = {
        f: build_segment_tables(
            doc_ids, texts, field_analyzers.get(f, analyzer),
            with_positions, with_offsets,
        )
        for f, texts in field_texts.items()
    }
    base = segs[default_field]

    # combined postings: default field bare + prefixed others, then re-sort
    tables = []
    for f, seg in segs.items():
        t = seg.postings
        if f != default_field:
            terms = [field_term(f, x) for x in t.column("term").to_pylist()]
            t = t.set_column(
                0, "term", pa.array(terms, pa.string())
            )
        tables.append(t)
    postings = pa.concat_tables(tables)
    order = pa.compute.sort_indices(postings.column("term"))
    postings = postings.take(order)

    docmeta = base.docmeta
    stats = dict(base.stats)
    stats["fields"] = {}
    for f, seg in segs.items():
        flens = seg.docmeta.column("field_len").to_numpy()
        stats["fields"][f] = {
            # docCount = docs with ≥1 term for the field
            # (CollectionStatistics.docCount / Terms.getDocCount)
            "doc_count": int((flens > 0).sum()),
            "sum_total_term_freq": seg.stats["sum_total_term_freq"],
        }
        if f != default_field:
            docmeta = docmeta.append_column(
                f"norm__{f}", seg.docmeta.column("norm")
            ).append_column(
                f"field_len__{f}", seg.docmeta.column("field_len")
            )
    stats["term_count"] = postings.num_rows
    stats["sum_doc_freq"] = int(
        np.asarray(postings.column("df").to_numpy()).sum()
    ) if postings.num_rows else 0
    return SegmentData(postings, docmeta, stats)
