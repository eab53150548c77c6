"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

These are the per-record analysis stages a 100 TB training-data pipeline
runs in front of indexing/dedup (the Solr URP-chain analogue — reference
``solr/core/src/java/org/apache/solr/update/processor/`` field mutators,
e.g. ``RegexReplaceProcessorFactory``, langid contrib
``solr/contrib/langid``).  All are stateless vectorized ``map_batches``
stages; language profiles are compiled once per actor when run as a pool.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

from lucene_solr_ray.analysis.analyzer import ENGLISH_STOP_WORDS

__all__ = [
    "token_counts",
    "quality_scores",
    "fingerprint_md5",
    "winnow_fingerprints",
    "LangIdStage",
    "langid",
]


def _token_lists(col: "pa.ChunkedArray"):
    """(flat_tokens ARROW string array, row_ids np, counts np) of the
    space-split tokens — Arrow ``split_pattern`` (C kernel), empty/null
    rows → 0 tokens.  The flat tokens stay an Arrow array on purpose:
    converting millions of strings to Python objects is the hidden cost
    that makes "vectorized" token code slower than the loop it replaces;
    every downstream kernel (``is_in``/``utf8_length``/
    ``dictionary_encode``) consumes the Arrow array directly."""
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    nonempty = pc.fill_null(
        pc.not_equal(arr, pa.scalar("")), False
    ).to_numpy(zero_copy_only=False)
    toks = pc.split_pattern(pc.fill_null(arr, ""), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    raw_counts = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    counts = np.where(nonempty, raw_counts, 0)
    flat = toks.flatten()
    if not nonempty.all():
        flat = flat.filter(pa.array(np.repeat(nonempty, raw_counts)))
    row_ids = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return flat, row_ids, counts


def _distinct_row_codes(flat: "pa.Array", row_ids: np.ndarray):
    """Distinct (row, token) occurrences: returns (urow, ucode,
    dictionary) where ``dictionary`` is the Arrow unique-token array and
    (urow, ucode) enumerate each row's distinct token codes once.  One
    C-level ``dictionary_encode`` + one ``np.unique`` over packed int64
    keys — no per-row Python sets."""
    import pyarrow.compute as pc

    de = pc.dictionary_encode(flat)
    if isinstance(de, pa.ChunkedArray):
        de = de.combine_chunks()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    k = max(len(de.dictionary), 1)
    keys = np.unique(row_ids * k + codes)
    return keys // k, keys % k, de.dictionary


def token_counts(ds, col: str, id_col: str):
    """(id, n_tokens) with the engine's tokenizer-equivalent counting —
    one Arrow ``split_pattern`` + ``list_value_length`` per batch, no
    Python loop (this runs over the WHOLE corpus in a training
    pipeline)."""
    import pyarrow.compute as pc

    def _count(t: pa.Table) -> pa.Table:
        c = t.column(col)
        nonempty = pc.fill_null(pc.not_equal(c, pa.scalar("")), False)
        n = pc.list_value_length(pc.split_pattern(c, " "))
        n = pc.if_else(nonempty, n, pa.scalar(0, pa.int32()))
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": pc.fill_null(n, 0).cast(pa.int64()),
            }
        )

    return ds.select_columns([id_col, col]).map_batches(
        _count, batch_format="pyarrow"
    )


#: sorted stopword array for the vectorized is_in membership kernel
_STOPS_ARRAY = pa.array(sorted(ENGLISH_STOP_WORDS), pa.string())


def quality_scores(ds, col: str, id_col: str):
    """Cheap quality heuristics per doc: token count, distinct-token count,
    stopword ratio, mean token length (round-6 doubles).

    Fully vectorized: Arrow split + ``is_in``/``utf8_length`` kernels over
    the flattened token stream (kept as an Arrow array — no Python string
    objects), per-row reductions via ``np.bincount``, distinct counts via
    one ``dictionary_encode`` + packed-key ``np.unique`` — byte-identical
    outputs to the per-row reference implementation."""
    import pyarrow.compute as pc

    def _score(t: pa.Table) -> pa.Table:
        nrows = t.num_rows
        flat, row_ids, counts = _token_lists(t.column(col))
        n_tok = counts
        # stopword hits per row
        stop_mask = pc.is_in(flat, value_set=_STOPS_ARRAY).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.bincount(row_ids[stop_mask], minlength=nrows)
        # summed codepoint lengths per row
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        sum_len = np.bincount(row_ids, weights=lens, minlength=nrows)
        # distinct tokens per row
        if len(flat):
            urow, _, _ = _distinct_row_codes(flat, row_ids)
            n_uniq = np.bincount(urow, minlength=nrows)
        else:
            n_uniq = np.zeros(nrows, dtype=np.int64)
        nz = np.maximum(n_tok, 1).astype(np.float64)
        stop_r = np.where(n_tok > 0, np.round(n_stop / nz, 6), 0.0)
        avg_len = np.where(n_tok > 0, np.round(sum_len / nz, 6), 0.0)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": pa.array(n_tok.astype(np.int64)),
                "n_uniq": pa.array(n_uniq.astype(np.int64)),
                "stop_ratio": pa.array(stop_r, pa.float64()),
                "avg_token_len": pa.array(avg_len, pa.float64()),
            }
        )

    return ds.select_columns([id_col, col]).map_batches(
        _score, batch_format="pyarrow"
    )


def fingerprint_md5(ds, col: str, id_col: str):
    """(id, md5-hex) document fingerprint (MD5Signature analogue)."""

    def _fp(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5((v or "").encode("utf-8")).hexdigest()
            for v in t.column(col).to_pylist()
        ]
        return pa.table(
            {id_col: t.column(id_col), "fingerprint": pa.array(fps, pa.string())}
        )

    return ds.select_columns([id_col, col]).map_batches(
        _fp, batch_format="pyarrow"
    )


#: tiny character-trigram profiles per language (top trigrams from public
#: frequency lists; heuristic — confidence comes out as a ratio)
_LANG_PROFILES: Dict[str, List[str]] = {
    "en": ["the", "and", "ing", "ion", "ent", "for", " th", "he ", "er ", "of "],
    "de": ["der", "die", "und", "ein", "sch", "ich", "en ", "ch ", " de", "nde"],
    "fr": ["les", "des", "ent", "ion", "de ", " de", "que", "et ", "la ", "ur "],
    "es": ["de ", " de", "la ", "os ", "ión", "ent", "que", " la", "es ", "ado"],
}


class LangIdStage:
    """Actor-pool language-ID stage: profiles compiled once per actor
    (``__init__``), trigram matching per batch (``__call__``)."""

    def __init__(self, profiles: Dict[str, List[str]] | None = None):
        self.profiles = {
            lang: set(tris)
            for lang, tris in (profiles or _LANG_PROFILES).items()
        }

    def _classify(self, text: str) -> tuple:
        if not text:
            return "und", 0.0
        s = text.lower()
        tris = {s[i : i + 3] for i in range(max(0, len(s) - 2))}
        best, best_hits = "und", 0
        for lang, prof in self.profiles.items():
            hits = len(tris & prof)
            if hits > best_hits:
                best, best_hits = lang, hits
        conf = best_hits / 10.0
        return best, round(conf, 6)

    def __call__(self, t: pa.Table) -> pa.Table:
        langs, confs = [], []
        for v in t.column("text").to_pylist():
            lang, conf = self._classify(v)
            langs.append(lang)
            confs.append(conf)
        return t.append_column(
            "lang_pred", pa.array(langs, pa.string())
        ).append_column("lang_conf", pa.array(confs, pa.float64()))


def langid(ds, concurrency: int = 4):
    """Attach (lang_pred, lang_conf) columns via the actor-pool stage."""
    return ds.map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=concurrency
    )


def winnow_fingerprints(ds, col: str, id_col: str,
                        k: int = 8, w: int = 4):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003): hash every character k-gram, slide a window of ``w`` hashes,
    select the RIGHTMOST minimal hash per window, dedupe by position.

    Guarantees the paper's coverage property (any match of length
    ≥ w+k−1 shares a fingerprint).  Hashes are md5 hex strings so the
    DuckDB oracle reproduces the selection byte-for-byte.  Returns rows
    (id, pos, fp)."""
    import hashlib as _h

    def _winnow(t: pa.Table) -> pa.Table:
        out_id, out_pos, out_fp = [], [], []
        for d, text in zip(t.column(id_col).to_pylist(),
                           t.column(col).to_pylist()):
            s = text or ""
            n = len(s) - k + 1
            if n <= 0:
                continue
            hashes = [
                _h.md5(s[i: i + k].encode("utf-8")).hexdigest()
                for i in range(n)
            ]
            chosen = set()
            for j in range(max(n - w + 1, 1)):
                win = hashes[j: j + w]
                m = min(win)
                # rightmost minimum in the window
                p = j + max(i for i, h in enumerate(win) if h == m)
                chosen.add(p)
            for p in sorted(chosen):
                out_id.append(d)
                out_pos.append(p)
                out_fp.append(hashes[p])
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "pos": pa.array(out_pos, pa.int64()),
                "fp": pa.array(out_fp, pa.string()),
            }
        )

    return ds.select_columns([id_col, col]).map_batches(
        _winnow, batch_format="pyarrow"
    )
