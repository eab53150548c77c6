"""CheckIndex: integrity validation of a committed index.

The reference's ``index/CheckIndex.java`` walks every segment validating
postings/terms/norms/stored fields cross-consistency.  Ours validates, per
segment (distributed — one task per segment) and globally:

- manifest ↔ segment.json agreement (ids, stats);
- postings decode round-trip: every blob decodes, ords strictly ascending
  within list, df == len(ords), ttf == Σfreqs, ords < doc_count;
- per-block skip entries consistent (base/last match decoded bounds);
- impacts are exact: stored competitive pairs dominate every (freq, norm)
  in their block;
- norms/docmeta row counts match doc_count; sha256 column present;
- global stats = Σ per-segment stats.

Returns a report dict; ``ok`` False lists the violations found.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from lucene_solr_ray.index.manifest import read_latest_manifest, segment_dir_name
from lucene_solr_ray.index.postings_codec import (
    decode_block_skips,
    decode_postings,
)

__all__ = ["check_index", "check_segment"]


def check_segment(seg_dir: str) -> Dict:
    import json

    import pyarrow.parquet as pq

    errors: List[str] = []
    warnings: List[str] = []
    with open(os.path.join(seg_dir, "segment.json")) as f:
        meta = json.load(f)
    stats = meta["stats"]

    dm = pq.read_table(os.path.join(seg_dir, "docmeta.parquet"))
    if dm.num_rows != stats["doc_count"]:
        errors.append(
            f"docmeta rows {dm.num_rows} != doc_count {stats['doc_count']}"
        )
    if "content_sha256" not in dm.schema.names:
        errors.append("docmeta missing content_sha256")

    t = pq.read_table(os.path.join(seg_dir, "postings.parquet"))
    n_docs = dm.num_rows
    sum_df = 0
    sum_ttf = 0
    norms = dm.column("norm").to_numpy()
    prev_term = None
    for term, df, ttf, blob, pos_blob in zip(
        t.column("term").to_pylist(),
        t.column("df").to_pylist(),
        t.column("ttf").to_pylist(),
        t.column("blocks").to_pylist(),
        t.column("positions").to_pylist(),
    ):
        if pos_blob is not None and len(pos_blob) != 4 * ttf:
            errors.append(
                f"{term!r}: positions blob {len(pos_blob)}B != 4*ttf"
            )
        if prev_term is not None and term <= prev_term:
            errors.append(f"terms not strictly sorted at {term!r}")
        prev_term = term
        ords, freqs = decode_postings(blob)
        if len(ords) != df:
            errors.append(f"{term!r}: df {df} != decoded {len(ords)}")
        if len(ords) and (np.diff(ords) <= 0).any():
            errors.append(f"{term!r}: ords not strictly ascending")
        if len(ords) and (ords[-1] >= n_docs or ords[0] < 0):
            errors.append(f"{term!r}: ord out of range")
        if int(freqs.sum()) != ttf:
            errors.append(f"{term!r}: ttf {ttf} != Σfreqs {int(freqs.sum())}")
        # skip + impact consistency
        i = 0
        for base, last, cnt, imp_f, imp_n in decode_block_skips(blob):
            blk_o = ords[i : i + cnt]
            blk_f = freqs[i : i + cnt]
            if blk_o[0] != base or blk_o[-1] != last:
                errors.append(f"{term!r}: skip bounds mismatch")
            # every (freq, norm) in the block must be dominated by an impact
            blk_n = norms[blk_o]
            for f_, n_ in zip(blk_f, blk_n):
                if not ((imp_f >= f_) & (imp_n <= n_)).any():
                    errors.append(
                        f"{term!r}: ({f_},{n_}) not dominated by impacts"
                    )
                    break
            i += cnt
        sum_df += df
        sum_ttf += ttf
    if sum_df != stats["sum_doc_freq"]:
        errors.append(f"sum_doc_freq {stats['sum_doc_freq']} != {sum_df}")
    if sum_ttf != stats["sum_total_term_freq"]:
        errors.append(
            f"sum_total_term_freq {stats['sum_total_term_freq']} != {sum_ttf}"
        )

    # live-docs sidecar (round 2): sorted, unique, in-range tombstones
    from lucene_solr_ray.search.reader import latest_deletes_file

    del_file = latest_deletes_file(seg_dir)
    if del_file is not None:
        dords = pq.read_table(
            os.path.join(seg_dir, del_file)
        ).column("ord").to_numpy()
        if len(dords):
            if (np.diff(dords) <= 0).any():
                errors.append("deletes: ords not strictly ascending")
            if dords[0] < 0 or dords[-1] >= n_docs:
                errors.append("deletes: ord out of range")

    # soft-deletes sidecar (round 4): sorted, in-range.  Overlap with hard
    # tombstones is LEGAL (soft_delete then delete_by_query hard-deletes a
    # soft-deleted doc without purging the soft sidecar; merge.py's
    # _merged_soft_ords setdiffs the overlap) — report it informationally,
    # not as corruption.
    from lucene_solr_ray.index.softdeletes import latest_soft_file

    soft_file = latest_soft_file(seg_dir)
    if soft_file is not None:
        sords = pq.read_table(
            os.path.join(seg_dir, soft_file)
        ).column("ord").to_numpy()
        if len(sords):
            if (np.diff(sords) <= 0).any():
                errors.append("soft-deletes: ords not strictly ascending")
            if sords[0] < 0 or sords[-1] >= n_docs:
                errors.append("soft-deletes: ord out of range")
            if del_file is not None and len(dords) and np.intersect1d(
                sords, dords
            ).size:
                warnings.append(
                    "soft-deletes: overlap with hard tombstones "
                    "(hard wins; soft entry is inert)"
                )

    # index_sort marker (round 4): docmeta rows must actually be in the
    # recorded comparator order
    isort = meta.get("index_sort") or {}
    sort_fields = isort.get("fields") or (
        [{"field": isort["field"], "desc": bool(isort["desc"])}]
        if "field" in isort else []
    )
    if sort_fields and all(
        f["field"] in dm.schema.names for f in sort_fields
    ):
        keys = [dm.column("doc_id").to_numpy()]
        for f in reversed(sort_fields):
            v = dm.column(f["field"]).to_numpy(zero_copy_only=False)
            codes = np.unique(v, return_inverse=True)[1]
            keys.append(-codes if f["desc"] else codes)
        perm = np.lexsort(tuple(keys))
        if not np.array_equal(perm, np.arange(len(perm))):
            errors.append("index_sort: docmeta not in comparator order")

    # numeric points (round 2): per-field values ascending, ords in range
    pts_path = os.path.join(seg_dir, "points.parquet")
    if os.path.exists(pts_path):
        pt = pq.read_table(pts_path)
        fields = pt.column("field").to_pylist()
        vals = pt.column("value").to_numpy()
        pords = pt.column("ord").to_numpy()
        if len(pords) and (
            (pords < 0).any() or (pords >= n_docs).any()
        ):
            errors.append("points: ord out of range")
        start = 0
        for i in range(1, len(fields) + 1):
            if i == len(fields) or fields[i] != fields[start]:
                seg_vals = vals[start:i]
                if len(seg_vals) > 1 and (np.diff(seg_vals) < 0).any():
                    errors.append(
                        f"points: {fields[start]!r} values not sorted"
                    )
                start = i

    return {"segment_id": meta["segment_id"], "ok": not errors,
            "errors": errors[:20], "warnings": warnings[:20],
            "terms": t.num_rows, "docs": n_docs}


def check_index(index_dir: str) -> Dict:
    """Distributed CheckIndex over all live segments + global invariants."""
    import pyarrow as pa
    import ray.data

    manifest = read_latest_manifest(index_dir)
    if manifest is None:
        return {"ok": False, "errors": ["no manifest"]}
    seg_dirs = [
        os.path.join(index_dir, segment_dir_name(s["segment_id"]))
        for s in manifest["segments"]
    ]

    def _check(t: pa.Table) -> pa.Table:
        rows = [check_segment(d) for d in t.column("seg_dir").to_pylist()]
        return pa.Table.from_pylist(
            [
                {"segment_id": r["segment_id"], "ok": r["ok"],
                 "errors": "; ".join(r["errors"]),
                 "warnings": "; ".join(r["warnings"]),
                 "terms": r["terms"], "docs": r["docs"]}
                for r in rows
            ]
        )

    res = (
        ray.data.from_items(
            [{"seg_dir": d} for d in seg_dirs],
            override_num_blocks=max(len(seg_dirs), 1),
        )
        .map_batches(_check, batch_format="pyarrow")
        .take_all()
    )
    errors = [f"seg {r['segment_id']}: {r['errors']}" for r in res if not r["ok"]]
    warnings = [
        f"seg {r['segment_id']}: {r['warnings']}" for r in res if r["warnings"]
    ]
    total_docs = sum(r["docs"] for r in res)
    if total_docs != manifest["doc_count"]:
        errors.append(
            f"manifest doc_count {manifest['doc_count']} != Σ segments {total_docs}"
        )
    return {
        "ok": not errors,
        "segments": len(res),
        "docs": total_docs,
        "errors": errors,
        "warnings": warnings,
    }
