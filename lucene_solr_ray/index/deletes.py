"""Deletes and updates: per-segment live-docs tombstones + compaction.

The reference's delete path (``lucene/core/src/java/org/apache/lucene/
index/IndexWriter.java`` ``deleteDocuments(Term/Query)`` /
``updateDocument``; ``codecs/lucene50/Lucene50LiveDocsFormat.java:30-60``):
segments stay immutable, deletions materialize as a generation-stamped
live-docs sidecar next to each segment (ours: ``deletes-<gen>.parquet``
with one sorted ``ord:int32`` column of DELETED segment-local ordinals),
and deleted docs physically disappear only when the segment merges
(``SegmentMerger`` skips non-live docs via ``MergeState.DocMap``).

Semantics preserved exactly:

- deleted docs still count in docFreq / totalTermFreq / avgdl until the
  merge drops them (Lucene's stats are maxDoc-based until reclaim);
- search results exclude tombstoned docs (``LeafReader.getLiveDocs``);
- ``update_documents`` = delete-by-id + add a fresh segment, the
  ``updateDocument`` two-step.

Ray shape: the delete is ONE ``map_batches`` over the segment list — each
task evaluates the delete query against its segment (postings metadata +
the existing evaluator), unions with the segment's current tombstones, and
writes the next-generation sidecar atomically.  The driver then commits a
new manifest generation carrying per-segment ``del_gen``/``del_count``.
At 100 TB the work per task is one query evaluation over one segment — no
shuffle, no driver materialization beyond (segment_id, del_count) rows.
"""

from __future__ import annotations

import os
import uuid
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.index.manifest import (
    commit_manifest,
    read_latest_manifest,
    segment_dir_name,
)

__all__ = [
    "delete_by_query",
    "delete_by_term",
    "delete_doc_ids",
    "add_documents",
    "update_documents",
    "compact_postings_rows",
    "segment_deleted_ords",
]


def _write_deletes_file(seg_dir: str, gen: int, ords: np.ndarray) -> str:
    """Atomically write ``deletes-<gen>.parquet`` (sorted deleted ords)."""
    name = f"deletes-{gen}.parquet"
    tmp = os.path.join(seg_dir, f".{name}.tmp-{uuid.uuid4().hex[:8]}")
    pq.write_table(
        pa.table({"ord": pa.array(np.sort(ords).astype(np.int32))}),
        tmp,
        compression="zstd",
    )
    os.rename(tmp, os.path.join(seg_dir, name))
    return name


def segment_deleted_ords(seg_dir: str) -> np.ndarray:
    """Sorted deleted ordinals from the COMMITTED sidecar generation
    (manifest-resolved, falling back to the newest on-disk sidecar for
    standalone segment dirs); empty if none."""
    from lucene_solr_ray.search.reader import committed_gens, latest_deletes_file

    gens = committed_gens(seg_dir)
    if gens is not None:
        f = f"deletes-{gens[0]}.parquet" if gens[0] > 0 else None
    else:
        f = latest_deletes_file(seg_dir)
    if f is None:
        return np.empty(0, dtype=np.int64)
    return np.sort(
        pq.read_table(os.path.join(seg_dir, f))
        .column("ord").to_numpy().astype(np.int64)
    )


class _DeleteFn:
    """Per-segment delete task: evaluate the query, union tombstones,
    write the next sidecar generation."""

    def __init__(self, query, stats, by_doc_ids: Optional[np.ndarray] = None):
        self.query = query
        self.stats = stats
        self.by_doc_ids = by_doc_ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        from lucene_solr_ray.search.reader import SegmentReader
        from lucene_solr_ray.search.scorer import score_segment

        rows = []
        need_pos = (
            self.by_doc_ids is None and _query_has_phrase(self.query)
        )
        for seg_dir, seg_id, cur_gen in zip(
            batch.column("seg_dir").to_pylist(),
            batch.column("segment_id").to_pylist(),
            batch.column("del_gen").to_pylist(),
        ):
            reader = SegmentReader(seg_dir, load_positions=need_pos)
            if self.by_doc_ids is not None:
                mask = np.isin(reader.doc_ids, self.by_doc_ids)
                hit_ords = np.nonzero(mask)[0].astype(np.int64)
            else:
                # score_segment already excludes current tombstones, so the
                # union below only adds newly-matching live docs
                ords, _ = score_segment(reader, self.query, self.stats)
                hit_ords = ords.astype(np.int64)
            merged = np.union1d(reader.deleted_ords, hit_ords)
            new_count = int(len(merged))
            if new_count > len(reader.deleted_ords):
                gen = int(cur_gen) + 1
                _write_deletes_file(seg_dir, gen, merged)
            else:
                gen = int(cur_gen)
            rows.append(
                {"segment_id": int(seg_id), "del_gen": gen,
                 "del_count": new_count}
            )
        return pa.Table.from_pylist(rows)


def _query_has_phrase(q) -> bool:
    from lucene_solr_ray.search.searcher import _has_phrase

    return _has_phrase(q)


def _apply_delete(index_dir: str, query=None, stats=None,
                  by_doc_ids: Optional[np.ndarray] = None,
                  commit: bool = True):
    """Run the per-segment delete fan-out; commit the next manifest (or,
    with ``commit=False``, return the updated segment-meta list so the
    caller can fold more changes into ONE manifest generation)."""
    import ray.data

    manifest = read_latest_manifest(index_dir)
    if manifest is None:
        raise FileNotFoundError(index_dir)
    segs = {s["segment_id"]: dict(s) for s in manifest["segments"]}
    items = [
        {
            "seg_dir": os.path.join(index_dir, segment_dir_name(sid)),
            "segment_id": sid,
            "del_gen": int(s.get("del_gen", 0)),
        }
        for sid, s in sorted(segs.items())
    ]
    res = (
        ray.data.from_items(items, override_num_blocks=len(items))
        .map_batches(
            _DeleteFn(query, stats, by_doc_ids), batch_format="pyarrow"
        )
        .take_all()
    )
    for r in res:
        s = segs[int(r["segment_id"])]
        s["del_gen"] = int(r["del_gen"])
        s["del_count"] = int(r["del_count"])
    if not commit:
        return list(segs.values())
    return commit_manifest(index_dir, list(segs.values()))


def delete_by_query(index_dir: str, query_str: str, analyzer=None) -> Dict:
    """Delete every doc matching a query string; returns the new manifest
    (``IndexWriter.deleteDocuments(Query)``)."""
    from lucene_solr_ray.search.searcher import Index, _collect_patterns, rewrite_query

    idx = Index(index_dir)
    parser = idx.make_parser(analyzer)
    q = parser.parse(query_str)
    patterns: List = []
    _collect_patterns(q, patterns)
    terms = sorted(set(q.terms()))
    stats, exp = idx.collect_stats(terms, patterns)
    if patterns:
        q = rewrite_query(q, exp)
    return _apply_delete(index_dir, query=q, stats=stats)


def delete_by_term(index_dir: str, term: str,
                   field: Optional[str] = None) -> Dict:
    """``IndexWriter.deleteDocuments(Term)`` — the raw (unanalyzed) term."""
    from lucene_solr_ray.search.query import TermQuery
    from lucene_solr_ray.search.searcher import Index

    idx = Index(index_dir)
    q = TermQuery(term, field=field)
    stats, _ = idx.collect_stats(sorted(set(q.terms())))
    return _apply_delete(index_dir, query=q, stats=stats)


def delete_doc_ids(index_dir: str, doc_ids: Sequence[int]) -> Dict:
    """Delete by GLOBAL doc id (the update path's delete half)."""
    ids = np.asarray(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
    return _apply_delete(index_dir, by_doc_ids=ids)


def add_documents(
    index_dir: str,
    doc_ids: Sequence[int],
    texts: Sequence[Optional[str]],
    analyzer=None,
) -> Dict:
    """Append one fresh segment with the given docs and commit
    (``IndexWriter.addDocument`` flush on an existing index).  New docs are
    searchable after the commit; single-segment because updates arrive in
    driver-sized batches — bulk loads go through ``build_index``."""
    from lucene_solr_ray.analysis.analyzer import StandardAnalyzer
    from lucene_solr_ray.index.manifest import write_segment_dir
    from lucene_solr_ray.index.segment import build_segment_tables

    manifest = read_latest_manifest(index_dir)
    if manifest is None:
        raise FileNotFoundError(index_dir)
    analyzer = analyzer or StandardAnalyzer()
    seg = build_segment_tables(list(doc_ids), list(texts), analyzer)
    new_id = max(s["segment_id"] for s in manifest["segments"]) + 1
    meta = {
        "segment_id": new_id,
        "stats": seg.stats,
        "analyzer": analyzer.spec(),
        "lineage": {"added_docs": len(list(doc_ids))},
    }
    write_segment_dir(index_dir, new_id, seg.postings, seg.docmeta, meta)
    return commit_manifest(
        index_dir, [dict(s) for s in manifest["segments"]] + [meta]
    )


def _postings_col_nonnull(path: str, col: str) -> bool:
    """True if the named postings column carries any non-null blob —
    decided from parquet row-group statistics alone (no data read)."""
    f = pq.ParquetFile(path)
    try:
        ci = f.schema_arrow.names.index(col)
    except ValueError:
        return False
    md = f.metadata
    for rg in range(md.num_row_groups):
        c = md.row_group(rg).column(ci)
        if c.num_values == 0:
            continue
        st = c.statistics
        if st is None or st.null_count is None:
            return True  # no stats recorded: assume present
        if st.null_count < c.num_values:
            return True
    return False


def resolve_update_config(index_dir: str, manifest: Dict, analyzer,
                          fn_name: str = "update_documents"):
    """Shared update/soft-update config resolution: the index's RECORDED
    analyzer (manifest spec) unless one is passed, plus the base index's
    offset/payload posting options (parquet row-group stats, no data
    read).  Returns ``(analyzer, with_offsets, with_payloads)``."""
    from lucene_solr_ray.analysis.analyzer import (
        StandardAnalyzer,
        analyzer_from_spec,
    )

    if analyzer is None:
        spec = manifest.get("analyzer")
        analyzer = analyzer_from_spec(spec) if spec else None
        if analyzer is None:
            if spec and spec.get("kind") == "custom":
                raise ValueError(
                    "index was built with a custom analyzer chain; pass "
                    f"the same analyzer explicitly to {fn_name}"
                )
            analyzer = StandardAnalyzer()
    first_path = os.path.join(
        index_dir, segment_dir_name(manifest["segments"][0]["segment_id"]),
        "postings.parquet",
    )
    with_offsets = _postings_col_nonnull(first_path, "offsets")
    with_payloads = _postings_col_nonnull(first_path, "payloads")
    return analyzer, with_offsets, with_payloads


def update_documents(
    index_dir: str,
    doc_ids: Sequence[int],
    texts: Sequence[Optional[str]],
    analyzer=None,
    stored: Optional[Dict[str, Sequence]] = None,
) -> Dict:
    """``updateDocument``: delete-by-id + re-add committed as ONE manifest
    generation.  Readers resolve sidecar generations from the committed
    manifest (``reader.committed_gens``), so neither the delete sidecars
    nor the replacement segment is visible before the single commit below
    — the intermediate deleted-but-not-readded state cannot be observed,
    and a crash anywhere before the commit leaves the previous commit
    point fully intact (uncommitted sidecars/segments are inert garbage
    the next commit's generations supersede), matching the reference's
    atomic ``IndexWriter.updateDocument``.

    The replacement segment is tokenized with the index's RECORDED
    analyzer (manifest spec) and inherits its payload/offset posting
    options unless an analyzer is passed explicitly — mixed-config
    segments would fail to merge (``IndexWriter`` likewise applies its one
    configured analyzer chain to updates)."""
    from lucene_solr_ray.index.manifest import write_segment_dir
    from lucene_solr_ray.index.segment import build_segment_tables

    ids = np.asarray(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
    manifest = read_latest_manifest(index_dir)
    if manifest is None:
        raise FileNotFoundError(index_dir)
    analyzer, with_offsets, with_payloads = resolve_update_config(
        index_dir, manifest, analyzer, "update_documents"
    )
    # 1) build + write the replacement segment (invisible until commit)
    seg = build_segment_tables(
        list(doc_ids), list(texts), analyzer,
        with_offsets=with_offsets, with_payloads=with_payloads,
    )
    docmeta = seg.docmeta
    if stored:
        # docstore columns ride along docmeta, as in the build path —
        # replacement docs must carry the index's stored fields or
        # column reads across segments would break
        for c, vals in stored.items():
            docmeta = docmeta.append_column(c, pa.array(list(vals)))
    segs = _apply_delete(index_dir, by_doc_ids=ids, commit=False)
    new_id = max(s["segment_id"] for s in segs) + 1
    meta = {
        "segment_id": new_id,
        "stats": seg.stats,
        "analyzer": analyzer.spec(),
        "lineage": {"added_docs": len(list(doc_ids)), "update": True},
    }
    write_segment_dir(index_dir, new_id, seg.postings, docmeta, meta)
    # 2) ONE commit carrying both the del_gen bumps and the new segment
    return commit_manifest(index_dir, segs + [meta])


# ---------------------------------------------------------------------------
# merge-time compaction: physically drop tombstoned docs
# ---------------------------------------------------------------------------


def compact_postings_rows(
    postings: pa.Table,
    deleted: np.ndarray,
    norm_for_field,
) -> pa.Table:
    """Rewrite a postings table with deleted ordinals dropped and survivors
    renumbered densely (new_ord = old_ord − #deleted_below, the
    ``MergeState.DocMap`` function).  ``norm_for_field(field_or_None)`` must
    return the COMPACTED norm byte array (indexed by new ord) so re-encoded
    blocks carry correct competitive impacts.  Terms whose postings empty
    out are dropped, as ``SegmentMerger`` omits terms with no live docs."""
    from lucene_solr_ray.index.postings_codec import decode_postings, encode_postings
    from lucene_solr_ray.index.segment import FIELD_SEP, POSTINGS_SCHEMA

    if len(deleted) == 0:
        return postings
    deleted = np.sort(np.asarray(deleted, dtype=np.int64))
    has_off = "offsets" in postings.schema.names
    has_pay = "payloads" in postings.schema.names
    terms = postings.column("term").to_pylist()
    blocks = postings.column("blocks").to_pylist()
    poss = postings.column("positions").to_pylist()
    offs = (
        postings.column("offsets").to_pylist() if has_off
        else [None] * postings.num_rows
    )
    pays = (
        postings.column("payloads").to_pylist() if has_pay
        else [None] * postings.num_rows
    )
    out = {"term": [], "df": [], "ttf": [], "blocks": [], "positions": [],
           "offsets": [], "payloads": []}
    for term, blob, posblob, offblob, payblob in zip(
        terms, blocks, poss, offs, pays
    ):
        ords, freqs = decode_postings(blob)
        ords64 = ords.astype(np.int64)
        idx = np.searchsorted(deleted, ords64)
        idx_c = np.minimum(idx, len(deleted) - 1)
        live = ~((idx < len(deleted)) & (deleted[idx_c] == ords64))
        if not live.any():
            continue
        kept_ords = ords64[live]
        kept_freqs = freqs[live]
        # dense renumbering: shift each ord down by #deleted before it
        new_ords = kept_ords - np.searchsorted(deleted, kept_ords)
        fld = term.split(FIELD_SEP, 1)[0] if FIELD_SEP in term else None
        norms = norm_for_field(fld)
        out["term"].append(term)
        out["df"].append(int(live.sum()))
        out["ttf"].append(int(kept_freqs.sum()))
        out["blocks"].append(
            encode_postings(new_ords, kept_freqs, norms[new_ords])
        )
        if posblob is not None:
            vals = np.frombuffer(posblob or b"", dtype="<i4")
            keep_vals = np.repeat(live, freqs)
            out["positions"].append(vals[keep_vals].tobytes())
        else:
            out["positions"].append(None)
        if offblob is not None:
            pairs = np.frombuffer(offblob or b"", dtype="<i4").reshape(-1, 2)
            keep_vals = np.repeat(live, freqs)
            out["offsets"].append(pairs[keep_vals].tobytes())
        else:
            out["offsets"].append(None)
        if payblob is not None:
            pvals = np.frombuffer(payblob or b"", dtype="<f4")
            keep_vals = np.repeat(live, freqs)
            out["payloads"].append(pvals[keep_vals].tobytes())
        else:
            out["payloads"].append(None)
    return pa.table(
        {
            "term": pa.array(out["term"], pa.string()),
            "df": pa.array(np.asarray(out["df"], dtype=np.int32)),
            "ttf": pa.array(np.asarray(out["ttf"], dtype=np.int64)),
            "blocks": pa.array(out["blocks"], pa.binary()),
            "positions": pa.array(out["positions"], type=pa.binary()),
            "offsets": pa.array(out["offsets"], type=pa.binary()),
            "payloads": pa.array(out["payloads"], type=pa.binary()),
        },
        schema=POSTINGS_SCHEMA,
    )


def _compacted_norm_lookup(docmeta: pa.Table):
    """norm_for_field over a COMPACTED docmeta table."""
    base = docmeta.column("norm").to_numpy()
    cache: Dict[Optional[str], np.ndarray] = {None: base}

    def norm_for_field(fld: Optional[str]) -> np.ndarray:
        arr = cache.get(fld)
        if arr is None:
            col = f"norm__{fld}"
            if col in docmeta.schema.names:
                arr = docmeta.column(col).to_numpy()
            else:
                arr = np.zeros(docmeta.num_rows, dtype=np.uint8)
            cache[fld] = arr
        return arr

    return norm_for_field


