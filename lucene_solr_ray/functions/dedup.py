"""Deduplication operators for large-scale training-data pipelines.

- :func:`exact_dedup` — content-hash groupby, keep-first (the analogue of
  Solr's ``SignatureUpdateProcessorFactory`` with ``MD5Signature``,
  reference ``solr/core/src/java/org/apache/solr/update/processor/
  SignatureUpdateProcessorFactory.java``; UniqueStream semantics).
- :func:`minhash_lsh_pairs` — shingle → minhash → banded LSH buckets →
  candidate pairs → exact n-gram-Jaccard verification (TextProfileSignature
  is the reference's lossier cousin, ``TextProfileSignature.java:39-117``).
- :func:`simhash_groups` — 64-bit simhash + banded grouping for
  hamming-near duplicates.
- :func:`embedding_near_dups` — cosine-over-threshold pairs on an
  embedding column (brute-force blockwise; see functions/ann.py for top-k).

Scale notes: hashing/minhash run vectorized per batch (stateless tasks);
the only shuffle is the ``groupby`` on hash/band keys, whose cardinality is
~#docs×bands but with tiny rows.  Verification happens inside the banded
groups (skewed giant buckets are capped; see ``max_bucket``).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "exact_dedup",
    "sha256_column",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "simhash_groups",
    "ngram_jaccard",
    "embedding_near_dups",
]


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def sha256_column(ds, col: str, out: str = "content_sha256"):
    def _hash(t: pa.Table) -> pa.Table:
        vals = [
            hashlib.sha256((v or "").encode("utf-8")).hexdigest()
            for v in t.column(col).to_pylist()
        ]
        return t.append_column(out, pa.array(vals, pa.string()))

    return ds.map_batches(_hash, batch_format="pyarrow")


def exact_dedup(ds, col: str, id_col: str):
    """Keep the smallest-id row per distinct content; adds ``n_dups``.

    hash → groupby(hash) → min-id per group (two-phase combine inside
    Ray's aggregate; no row data moves beyond (hash, id))."""
    from ray.data.aggregate import Count, Min

    hashed = sha256_column(ds, col)
    return (
        hashed.select_columns([id_col, "content_sha256"])
        .groupby("content_sha256")
        .aggregate(Min(id_col, alias_name="keep_id"),
                   Count(alias_name="n_dups"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(
        np.uint64
    )
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(
        np.uint64
    )
    return a, b


def _shingles(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = np.uint64(
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                           "big")
        )
    return out


def minhash_signatures(
    texts: List[str], num_perm: int = 64, k: int = 3, seed: int = 42
) -> np.ndarray:
    """(len(texts), num_perm) uint64 minhash matrix, vectorized over perms."""
    a, b = _perm_params(num_perm, seed)
    sigs = np.full((len(texts), num_perm), np.uint64(_MERSENNE), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, text in enumerate(texts):
            sh = _shingles(text or "", k)
            if len(sh) == 0:
                continue
            # (perm, shingle) grid: (a*x + b) mod p, min over shingles
            vals = (sh[None, :] * a[:, None] + b[:, None]) % np.uint64(
                _MERSENNE
            )
            sigs[i] = vals.min(axis=1)
    return sigs


def minhash_lsh_pairs(
    ds,
    col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket: int = 1000,
    seed: int = 42,
):
    """Near-duplicate pairs via banded MinHash-LSH + exact verification.

    Pipeline: per-batch signatures → explode to (band, band_hash, id) rows
    (NO text rides the shuffle — only 3 tiny columns) → groupby(band,
    band_hash) → candidate pairs → distinct → verify n-gram Jaccard with a
    broadcast id→text lookup (``ray.put`` once, read per verify task).
    Returns (id_a, id_b, jaccard) with id_a < id_b.  Buckets larger than
    ``max_bucket`` (degenerate content) are truncated.

    Scale note: the broadcast verify lookup assumes the *candidate* docs'
    texts fit in the object store; at 10^9-doc scale replace it with two
    hash-partitioned fetch joins of the pair list against the corpus
    (same semantics, all-shuffle).
    """
    import ray

    rows_per_band = num_perm // bands

    def _bandify(t: pa.Table) -> pa.Table:
        texts = t.column(col).to_pylist()
        ids = t.column(id_col).to_pylist()
        sigs = minhash_signatures(texts, num_perm, shingle_k, seed)
        band_ids, band_hashes, out_ids = [], [], []
        for i, d in enumerate(ids):
            for bnd in range(bands):
                chunk = sigs[i, bnd * rows_per_band : (bnd + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                band_ids.append(bnd)
                band_hashes.append(h)
                out_ids.append(d)
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
                id_col: pa.array(out_ids, pa.int64()),
            }
        )

    banded = ds.select_columns([id_col, col]).map_batches(
        _bandify, batch_format="pyarrow"
    ).materialize()

    # almost every bucket is a singleton: find the multi-member buckets
    # with a C-path count aggregate (NO per-group python over ~docs×bands
    # groups — that was measured at >10x the cost of everything else),
    # then keep only their rows for pair generation
    from ray.data.aggregate import Count

    sizes = (
        banded.groupby(["band", "band_hash"])
        .aggregate(Count(alias_name="n"))
    )
    hot = sizes.filter(expr="n > 1").to_pandas()
    hot_keys = set(zip(hot["band"], hot["band_hash"]))

    def _only_hot(t: pa.Table) -> pa.Table:
        mask = pa.array(
            [
                (b, h) in hot_keys
                for b, h in zip(
                    t.column("band").to_pylist(),
                    t.column("band_hash").to_pylist(),
                )
            ]
        )
        return t.filter(mask)

    survivors = banded.map_batches(
        _only_hot, batch_format="pyarrow"
    ).to_pandas()

    # pair generation over the (small) surviving buckets, driver-side;
    # dedup across bands with one drop_duplicates
    out_pairs: List[Tuple[int, int]] = []
    for (_b, _h), g in survivors.groupby(["band", "band_hash"], sort=False):
        ids = sorted(set(g[id_col].tolist()))[:max_bucket]
        out_pairs.extend(
            (ids[i], ids[j])
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
        )
    pairs_df = pd.DataFrame(
        out_pairs, columns=["id_a", "id_b"]
    ).drop_duplicates(ignore_index=True)
    import ray.data

    pairs = ray.data.from_pandas(
        pairs_df
        if not pairs_df.empty
        else pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64")}
        )
    )

    texts_df = ds.select_columns([id_col, col]).to_pandas()
    texts_ref = ray.put(dict(zip(texts_df[id_col], texts_df[col])))

    class _Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if batch.empty:
                return pd.DataFrame(
                    {"id_a": pd.Series([], dtype="int64"),
                     "id_b": pd.Series([], dtype="int64"),
                     "jaccard": pd.Series([], dtype="float64")}
                )
            jac = [
                ngram_jaccard(self.texts.get(a, ""), self.texts.get(b, ""),
                              shingle_k)
                for a, b in zip(batch["id_a"], batch["id_b"])
            ]
            batch = batch.assign(jaccard=jac)
            return batch[batch["jaccard"] >= jaccard_threshold]

    return pairs.map_batches(_Verify, batch_format="pandas",
                             concurrency=(1, 8))


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(map(tuple, _ngrams(a, k)))
    sb = set(map(tuple, _ngrams(b, k)))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def _ngrams(text: str, k: int):
    toks = (text or "").split()
    if len(toks) < k:
        return [tuple(toks)] if toks else []
    return [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """Classic 64-bit simhash over whitespace tokens (weight = tf)."""
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    toks = (text or "").split()
    for t in toks:
        h = np.uint64(
            int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
            )
        )
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    return int("".join("1" if x > 0 else "0" for x in acc[::-1]), 2)


def simhash_groups(ds, col: str, id_col: str, band_bits: int = 16):
    """Group ids whose simhash shares any 16-bit band (candidates for
    hamming-distance ≤ 3 near-dup checks)."""

    def _sig(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        sigs = [simhash64(v) for v in t.column(col).to_pylist()]
        bands = 64 // band_bits
        out_band, out_key, out_id, out_sig = [], [], [], []
        for d, s in zip(ids, sigs):
            for bnd in range(bands):
                key = (s >> (bnd * band_bits)) & ((1 << band_bits) - 1)
                out_band.append(bnd)
                out_key.append(key)
                out_id.append(d)
                out_sig.append(s)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "key": pa.array(out_key, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "simhash": pa.array(out_sig, pa.uint64()),
            }
        )

    banded = ds.select_columns([id_col, col]).map_batches(
        _sig, batch_format="pyarrow"
    ).materialize()

    # same hot-bucket shape as minhash_lsh_pairs: count buckets with a
    # C-path aggregate, pair-generate only inside multi-member buckets
    from ray.data.aggregate import Count

    sizes = banded.groupby(["band", "key"]).aggregate(Count(alias_name="n"))
    hot = sizes.filter(expr="n > 1").to_pandas()
    hot_keys = set(zip(hot["band"], hot["key"]))

    def _only_hot(t: pa.Table) -> pa.Table:
        mask = pa.array(
            [
                (b, k) in hot_keys
                for b, k in zip(
                    t.column("band").to_pylist(), t.column("key").to_pylist()
                )
            ]
        )
        return t.filter(mask)

    surv = banded.map_batches(_only_hot, batch_format="pyarrow").to_pandas()
    out = []
    seen = set()
    for (_b, _k), g in surv.groupby(["band", "key"], sort=False):
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        sigs = g["simhash"].tolist()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j] or (ids[i], ids[j]) in seen:
                    continue
                ham = bin(int(sigs[i]) ^ int(sigs[j])).count("1")
                if ham <= 3:
                    seen.add((ids[i], ids[j]))
                    out.append((ids[i], ids[j], ham))
    import ray.data

    df = pd.DataFrame(out, columns=["id_a", "id_b", "hamming"])
    if df.empty:
        df = pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "hamming": pd.Series([], dtype="int64")}
        )
    return ray.data.from_pandas(df.sort_values(["id_a", "id_b"]))


# ---------------------------------------------------------------------------
# embedding cosine near-dups
# ---------------------------------------------------------------------------

def embedding_near_dups(ds, vec_col: str, id_col: str,
                        threshold: float = 0.95,
                        block: int = 2048):
    """All pairs with cosine ≥ threshold.

    Normalizes per batch, then an O(n²/2) blockwise matmul *within* each
    batch plus cross-batch via a broadcast of normalized vectors — suitable
    for ≤~10^5 rows; beyond that use the LSH-bucketed path (functions/ann).
    """
    import ray

    # small-side materialization: normalized matrix broadcast once
    tbl = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = tbl[id_col].to_numpy()
    M = np.asarray(tbl[vec_col].tolist(), dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, M))

    import ray.data

    blocks = [
        {"start": s, "end": min(s + block, len(ids))}
        for s in range(0, len(ids), block)
    ]

    def _pairs(t: pa.Table) -> pa.Table:
        ids_, M_ = ray.get(ref)
        out_a, out_b, out_c = [], [], []
        for s, e in zip(t.column("start").to_pylist(),
                        t.column("end").to_pylist()):
            S = M_[s:e] @ M_.T  # (block, n)
            for r in range(e - s):
                i = s + r
                js = np.nonzero(S[r] >= threshold)[0]
                for j in js:
                    if ids_[i] < ids_[j]:
                        out_a.append(int(ids_[i]))
                        out_b.append(int(ids_[j]))
                        out_c.append(float(S[r, j]))
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    return ray.data.from_items(blocks).map_batches(
        _pairs, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# TextProfileSignature (Solr's fuzzy near-dup signature)
# ---------------------------------------------------------------------------

def text_profile_signature(text: str, quant_rate: float = 0.01,
                           min_token_len: int = 2) -> str:
    """Port of the reference's fuzzy dedup signature
    (``solr/core/src/java/org/apache/solr/update/processor/
    TextProfileSignature.java:39-117``):

    - token freqs over lowercased alnum-filtered tokens of length ≥ 2;
    - QUANT = round(maxFreq · quantRate), floored to 2 when maxFreq > 1
      (else 1);
    - tokens with freq < QUANT dropped, surviving freqs rounded DOWN to a
      multiple of QUANT;
    - profile = "token freq" pairs sorted by (freq desc, token asc),
      newline-joined, md5-hexed.
    """
    import collections

    counts: collections.Counter = collections.Counter()
    for tok in (text or "").lower().split():
        tok = "".join(c for c in tok if c.isalnum())
        if len(tok) >= min_token_len:
            counts[tok] += 1
    if not counts:
        return hashlib.md5(b"").hexdigest()
    max_freq = max(counts.values())
    if max_freq <= 1:
        quant = 1
    else:
        quant = max(round(max_freq * quant_rate), 2)
    items = [
        (tok, (f // quant) * quant)
        for tok, f in counts.items()
        if f >= quant
    ]
    items.sort(key=lambda kv: (-kv[1], kv[0]))
    profile = "\n".join(f"{tok} {f}" for tok, f in items)
    return hashlib.md5(profile.encode("utf-8")).hexdigest()


def text_profile_dedup(ds, col: str, id_col: str,
                       quant_rate: float = 0.01):
    """Near-dup groups by TextProfileSignature: signature column →
    groupby(sig) → (keep_id, n_dups) — SignatureUpdateProcessor chained
    with the dedup groupby."""
    from ray.data.aggregate import Count, Min

    def _sig(t: pa.Table) -> pa.Table:
        sigs = [
            text_profile_signature(v, quant_rate)
            for v in t.column(col).to_pylist()
        ]
        return pa.table(
            {id_col: t.column(id_col), "signature": pa.array(sigs, pa.string())}
        )

    return (
        ds.select_columns([id_col, col])
        .map_batches(_sig, batch_format="pyarrow")
        .groupby("signature")
        .aggregate(Min(id_col, alias_name="keep_id"),
                   Count(alias_name="n_dups"))
    )
