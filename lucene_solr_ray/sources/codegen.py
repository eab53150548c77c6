"""Deterministic synthetic source-code corpus (the north-rule input shape).

Schema per BASELINE.json input_hint: ``(repo:string, path:string,
commit:string, lang:string, content:string)`` — synthesised at small scale
for tests/benchmarks (no external data).  Content characteristics per
FIXTURES.md §1: zipf-sampled identifier vocabulary with stop-word-scale
keywords, camelCase identifiers (lowercase-filter coverage), numbers,
punctuation, occasional >255-char tokens (maxTokenLength split path), empty
files, multi-KB files; token counts zipf so norms span the SmallFloat byte
range including the lossy >39 region.

Everything derives from (seed, doc ordinal) — same inputs, same bytes,
under any parallelism.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["generate_corpus", "corpus_paths", "VOCAB_SIZE"]

VOCAB_SIZE = 5000
_LANGS = ["py", "java", "js", "go", "md"]
_LANG_P = np.array([0.35, 0.25, 0.2, 0.12, 0.08])
_KEYWORDS = [
    "def", "return", "import", "public", "the", "class", "if", "else",
    "for", "while", "self", "this", "void", "int", "string", "new",
]
_PUNCT = ["()", "{}", "[]", "();", "):", " = ", " += ", ".", ", "]


def _build_vocab(rng: np.random.RandomState) -> List[str]:
    syll = ["foo", "bar", "baz", "qux", "data", "index", "node", "tree",
            "hash", "list", "map", "set", "key", "val", "item", "doc",
            "term", "post", "seg", "read", "write", "merge", "sort",
            "scan", "query", "util", "core", "impl", "proc", "calc"]
    vocab = list(_KEYWORDS)
    while len(vocab) < VOCAB_SIZE:
        k = rng.randint(1, 4)
        parts = [syll[rng.randint(len(syll))] for _ in range(k)]
        if rng.rand() < 0.5 and k > 1:  # camelCase
            w = parts[0] + "".join(p.capitalize() for p in parts[1:])
        else:
            w = "_".join(parts)
        w = f"{w}{rng.randint(1000)}" if rng.rand() < 0.15 else w
        vocab.append(w)
    return vocab[:VOCAB_SIZE]


def _doc_content(rng: np.random.RandomState, vocab: List[str],
                 ordinal: int) -> str:
    r = rng.rand()
    if r < 0.01:
        return ""  # empty file
    # zipf-ish doc length: median ~120 tokens, tail to multi-KB
    n = int(min(20 + rng.pareto(1.3) * 80, 8000))
    idx = rng.zipf(1.35, size=n) % len(vocab)
    toks = [vocab[i] for i in idx]
    out = []
    for i, t in enumerate(toks):
        out.append(t)
        pr = rng.rand()
        if pr < 0.25:
            out.append(_PUNCT[rng.randint(len(_PUNCT))])
        elif pr < 0.3:
            out.append(str(rng.randint(10000)))
        if (i + 1) % 12 == 0:
            out.append("\n")
    if rng.rand() < 0.02:  # a >255-char token (maxTokenLength split path)
        out.append("x" * (256 + rng.randint(200)))
    return " ".join(out)


def generate_corpus(
    out_dir: str,
    n_docs: int = 50_000,
    n_files: int = 8,
    seed: int = 42,
    force: bool = False,
) -> List[str]:
    """Write the corpus as ``n_files`` parquet files; returns their paths.
    Cached: if the files exist (and not ``force``), generation is skipped."""
    os.makedirs(out_dir, exist_ok=True)
    paths = corpus_paths(out_dir, n_files)
    marker = os.path.join(out_dir, f".complete-{n_docs}-{n_files}-{seed}")
    if not force and os.path.exists(marker) and all(map(os.path.exists, paths)):
        return paths

    vocab = _build_vocab(np.random.RandomState(seed))
    per = (n_docs + n_files - 1) // n_files
    start = 0
    for fi, path in enumerate(paths):
        end = min(start + per, n_docs)
        rows = {"repo": [], "path": [], "commit": [], "lang": [],
                "content": []}
        for d in range(start, end):
            rng = np.random.RandomState((seed * 1_000_003 + d) % (2**31))
            repo = f"org{d % 7}/repo{(d * 131) % 53}"
            lang = _LANGS[int(rng.choice(len(_LANGS), p=_LANG_P))]
            fpath = f"src/{'abcdefgh'[d % 8]}/file_{d}.{lang}"
            commit = hashlib.sha1(f"{repo}|{fpath}".encode()).hexdigest()
            rows["repo"].append(repo)
            rows["path"].append(fpath)
            rows["commit"].append(commit)
            rows["lang"].append(lang)
            rows["content"].append(_doc_content(rng, vocab, d))
        t = pa.table(
            {k: pa.array(v, pa.string()) for k, v in rows.items()}
        )
        pq.write_table(t, path, compression="zstd",
                       row_group_size=max(1000, per // 4))
        start = end
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def corpus_paths(out_dir: str, n_files: int = 8) -> List[str]:
    return [os.path.join(out_dir, f"corpus_{i:03d}.parquet")
            for i in range(n_files)]
