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


def token_counts(ds, col: str, id_col: str):
    """(id, n_tokens) with the engine's tokenizer-equivalent counting."""

    def _count(t: pa.Table) -> pa.Table:
        n = [
            len(v.split()) if v else 0 for v in t.column(col).to_pylist()
        ]
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    return ds.select_columns([id_col, col]).map_batches(
        _count, batch_format="pyarrow"
    )


def quality_scores(ds, col: str, id_col: str):
    """Cheap quality heuristics per doc: token count, distinct-token count,
    stopword ratio, mean token length (round-6 doubles)."""
    stops = frozenset(ENGLISH_STOP_WORDS)

    def _score(t: pa.Table) -> pa.Table:
        n_tok, n_uniq, stop_r, avg_len = [], [], [], []
        for v in t.column(col).to_pylist():
            toks = v.split() if v else []
            n = len(toks)
            n_tok.append(n)
            n_uniq.append(len(set(toks)))
            if n:
                stop_r.append(round(sum(1 for x in toks if x in stops) / n, 6))
                avg_len.append(round(sum(map(len, toks)) / n, 6))
            else:
                stop_r.append(0.0)
                avg_len.append(0.0)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_uniq": pa.array(n_uniq, pa.int64()),
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
