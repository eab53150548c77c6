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
- :func:`ngram_jaccard_pairs` — EXACT word-k-gram Jaccard pairs with a
  stop-gram df cap, one gram-partitioned shuffle (the dedup family's
  exact-similarity entry; minhash is its sketched cousin).
- :func:`embedding_near_dups` — cosine-over-threshold pairs on an
  embedding column (brute-force blockwise; see functions/ann.py for top-k).

Scale notes: hashing/minhash run vectorized per batch (stateless tasks);
the shuffles carry only tiny rows — (band, hash64, id) for bucketing, a
hash-partitioned self-join for pair generation (degenerate buckets over
``max_bucket`` are dropped first), and candidate-pruned fetch joins (or a
bounded candidate-text broadcast) for verification.  Nothing corpus-sized
ever reaches the driver; see BASELINE.md for the 10× driver-RSS evidence.
"""

from __future__ import annotations

import hashlib
import os
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
    "simhash64_batch",
    "simhash_groups",
    "ngram_jaccard",
    "ngram_jaccard_pairs",
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


#: polynomial-rolling-hash multiplier for shingle hashes (odd, high
#: avalanche — the golden-ratio mix constant)
_POLY_MULT = np.uint64(0x9E3779B97F4A7C15)


def _intern_tokens(texts: List[str]):
    """Tokenize a BATCH and hash each DISTINCT token exactly once.

    Returns (tok_hash uint64[N] — per-token 64-bit hashes over the
    concatenated token stream, doc_starts int64[ndocs] — start offset of
    each doc's tokens, doc_lens int64[ndocs]).  This is the batch-level
    interning step that removes the per-occurrence Python ``blake2b`` from
    the hot path: hashing cost scales with |vocab of the batch|, not with
    total token count."""
    per_doc = [(t or "").split() for t in texts]
    doc_lens = np.fromiter(
        (len(p) for p in per_doc), dtype=np.int64, count=len(per_doc)
    )
    doc_starts = np.zeros(len(per_doc), dtype=np.int64)
    if len(per_doc) > 1:
        np.cumsum(doc_lens[:-1], out=doc_starts[1:])
    flat = [t for p in per_doc for t in p]
    if not flat:
        return np.empty(0, dtype=np.uint64), doc_starts, doc_lens
    # hash-based interning (pd.factorize) — np.unique on object strings is
    # sort-based and was the measured hotspot
    inv, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=False)
    uh = _hash_tokens(uniq)
    return uh[inv], doc_starts, doc_lens


def _hash_tokens(uniq) -> np.ndarray:
    """blake2b-64 of each distinct token (one digest per VOCAB entry)."""
    uh = np.empty(len(uniq), dtype=np.uint64)
    b2b = hashlib.blake2b
    for i, tok in enumerate(uniq):
        uh[i] = int.from_bytes(b2b(tok.encode(), digest_size=8).digest(),
                               "big")
    return uh


def _shingle_hashes(tok_hash: np.ndarray, doc_starts: np.ndarray,
                    doc_lens: np.ndarray, k: int):
    """Vectorized k-shingle hashes over the interned token stream.

    A k-term polynomial in ``_POLY_MULT`` over each window of k consecutive
    token hashes, computed as k shifted adds over the WHOLE batch at once
    (no per-doc Python).  Windows crossing a doc boundary are masked out;
    docs shorter than k contribute their single whole-doc polynomial
    (matching the short-text semantics of the previous string-shingle
    kernel).  Returns (hashes uint64[M], sh_starts int64[ndocs],
    sh_counts int64[ndocs]) with each doc's shingles contiguous."""
    n = len(tok_hash)
    ndocs = len(doc_starts)
    sh_counts = np.where(doc_lens >= k, doc_lens - k + 1,
                         np.where(doc_lens > 0, 1, 0))
    sh_starts = np.zeros(ndocs, dtype=np.int64)
    if ndocs > 1:
        np.cumsum(sh_counts[:-1], out=sh_starts[1:])
    total = int(sh_counts.sum())
    out = np.empty(total, dtype=np.uint64)
    if total == 0 or n == 0:
        return out, sh_starts, sh_counts

    with np.errstate(over="ignore"):
        # full-width rolling polynomial over the flat stream
        if n >= k:
            m = n - k + 1
            h = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                h = h * _POLY_MULT + tok_hash[j : j + m]
        else:
            h = np.empty(0, dtype=np.uint64)
        # scatter per-doc windows (vectorized index arithmetic)
        long_docs = np.nonzero(doc_lens >= k)[0]
        if len(long_docs):
            cnt = sh_counts[long_docs]
            # source positions: doc_start + [0..cnt) for each long doc
            src = np.repeat(doc_starts[long_docs], cnt) + (
                np.arange(int(cnt.sum()))
                - np.repeat(np.cumsum(cnt) - cnt, cnt)
            )
            dst = np.repeat(sh_starts[long_docs], cnt) + (
                np.arange(int(cnt.sum()))
                - np.repeat(np.cumsum(cnt) - cnt, cnt)
            )
            out[dst] = h[src]
        # short docs (0 < len < k): one whole-doc polynomial each
        short_docs = np.nonzero((doc_lens > 0) & (doc_lens < k))[0]
        for d in short_docs:
            s, ln = doc_starts[d], doc_lens[d]
            acc = np.uint64(0)
            for j in range(ln):
                acc = acc * _POLY_MULT + tok_hash[s + j]
            out[sh_starts[d]] = acc
    return out, sh_starts, sh_counts


def minhash_signatures(
    texts: List[str], num_perm: int = 64, k: int = 3, seed: int = 42
) -> np.ndarray:
    """(len(texts), num_perm) uint64 minhash matrix — fully vectorized.

    Batch-level token interning (hash distinct tokens once) → polynomial
    rolling-hash shingles over the flat token stream → one (perm, shingle)
    permutation grid per doc-chunk with ``np.minimum.reduceat`` folding the
    per-doc minima.  No per-row Python in the permutation path."""
    a, b = _perm_params(num_perm, seed)
    ndocs = len(texts)
    #: empty-doc sentinel — no shingle can beat it in the min fold
    sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
    sigs = np.full((ndocs, num_perm), sentinel, dtype=np.uint64)
    if ndocs == 0:
        return sigs
    tok_hash, doc_starts, doc_lens = _intern_tokens(texts)
    sh, sh_starts, sh_counts = _shingle_hashes(
        tok_hash, doc_starts, doc_lens, k
    )
    nonempty = np.nonzero(sh_counts > 0)[0]
    if len(nonempty) == 0:
        return sigs
    #: cap on the (num_perm × shingles) grid per chunk (~64 MB at 64 perms)
    chunk_shingles = max(1, (1 << 23) // max(num_perm, 1))
    # ONE reusable grid buffer — fresh large temporaries page-fault on
    # first touch, which measured ~10× the arithmetic; and multiply-shift
    # wraparound (a·x + b in uint64) instead of mod-Mersenne: numpy's
    # uint64 remainder was the kernel's single hottest op
    grid = np.empty(
        (num_perm, min(chunk_shingles, len(sh))), dtype=np.uint64
    )
    with np.errstate(over="ignore"):
        lo = 0
        while lo < len(nonempty):
            # grow the doc chunk until its shingle span exceeds the cap
            hi = lo + 1
            first = nonempty[lo]
            span_start = sh_starts[first]
            while (
                hi < len(nonempty)
                and sh_starts[nonempty[hi]] + sh_counts[nonempty[hi]]
                - span_start <= chunk_shingles
            ):
                hi += 1
            last = nonempty[hi - 1]
            span_end = sh_starts[last] + sh_counts[last]
            seg = sh[span_start:span_end]
            w = len(seg)
            if w > grid.shape[1]:  # single doc larger than the cap
                grid = np.empty((num_perm, w), dtype=np.uint64)
            g = grid[:, :w]
            np.multiply(a[:, None], seg[None, :], out=g)
            g += b[:, None]
            cuts = (sh_starts[nonempty[lo:hi]] - span_start).astype(
                np.int64
            )
            mins = np.minimum.reduceat(g, cuts, axis=1)
            sigs[nonempty[lo:hi]] = mins.T
            lo = hi
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

    Fully distributed — nothing corpus-sized ever touches the driver:

    1. per-batch signatures → explode to (band, band_hash, id) rows (NO
       text rides the shuffle — 3 tiny columns);
    2. candidate pairs by a hash-partitioned SELF-JOIN on the bucket key
       (C-path; buckets larger than ``max_bucket`` — degenerate content —
       are dropped first);
    3. cross-band distinct via a tiny-row ``groupby(id_a, id_b)``;
    4. verification fetches texts through two reduce-side fetch joins of
       the pair list against the candidate-pruned corpus (the corpus side
       shuffles by id, never materializes centrally), then an exact
       n-gram-Jaccard filter per batch.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    rows_per_band = num_perm // bands

    def _bandify(t: pa.Table) -> pa.Table:
        texts = t.column(col).to_pylist()
        ids = t.column(id_col).to_numpy()
        sigs = minhash_signatures(texts, num_perm, shingle_k, seed)
        n = len(ids)
        # band hash VECTORIZED over all docs: a multiply-accumulate mix of
        # the band's minhash values (equal chunks → equal hash; 64-bit
        # collisions are negligible vs blake2b-per-row, which measured as
        # the bandify hotspot)
        mult = np.uint64(0x9E3779B97F4A7C15)
        band_ids = np.repeat(
            np.arange(bands, dtype=np.int64), n
        )
        hashes = np.empty((bands, n), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for bnd in range(bands):
                h = np.full(n, np.uint64(bnd * 2 + 1), dtype=np.uint64)
                for j in range(rows_per_band):
                    h = h * mult + sigs[:, bnd * rows_per_band + j]
                h ^= h >> np.uint64(29)
                h = h * mult
                h ^= h >> np.uint64(32)
                hashes[bnd] = h
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(
                    hashes.reshape(-1).view(np.int64)
                ),
                id_col: pa.array(np.tile(ids, bands)),
            }
        )

    # materialize ONCE: banded is consumed by the size aggregate and both
    # self-join sides — lazily it would recompute the signatures per
    # consumer (tiny rows: bands x (int32, 16B hash, int64) per doc)
    banded = ds.select_columns([id_col, col]).map_batches(
        _bandify, batch_format="pyarrow"
    ).materialize()

    pairs = _bucket_pairs(
        banded, ["band", "band_hash"], id_col, max_bucket
    )
    corpus = ds.select_columns([id_col, col])
    with_texts = _fetch_pair_texts(pairs, corpus, id_col, col)

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"),
                 "id_b": pd.Series([], dtype="int64"),
                 "jaccard": pd.Series([], dtype="float64")}
            )
        jac = [
            ngram_jaccard(a or "", b or "", shingle_k)
            for a, b in zip(batch["_text_a"], batch["_text_b"])
        ]
        batch = batch.assign(jaccard=jac)
        batch = batch[batch["jaccard"] >= jaccard_threshold]
        return batch[["id_a", "id_b", "jaccard"]]

    return with_texts.map_batches(_verify, batch_format="pandas")



#: target banded rows per pair-generation partition — each partition holds
#: every bucket that hashes to it, so this bounds per-task memory at any
#: corpus size (partition count grows with the data)
_PAIR_PARTITION_ROWS = 500_000


def _pair_partitions(rows: int) -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return int(min(4096, max(cpus, rows // _PAIR_PARTITION_ROWS + 1)))


def _bucket_pairs(banded, bucket_cols: List[str], id_col: str,
                  max_bucket: int, carry: Optional[str] = None):
    """Candidate pairs via ONE hash-partition shuffle + vectorized
    in-partition bucket grouping.

    Each banded row goes to partition ``hash(bucket_key) % P`` (so every
    bucket lands wholly in one partition; P scales with the data via
    :func:`_pair_partitions`).  Within a partition rows are lexsorted by
    the bucket key, segment boundaries found vectorized, DEGENERATE buckets
    (> ``max_bucket`` members — pathological content whose Σn² would
    explode) dropped, and each surviving bucket's pairs emitted via
    triangular indices, locally deduped.  A tiny-row global
    ``groupby(id_a, id_b)`` distinct then folds cross-band duplicates.

    Replaces the previous three-shuffle plan (bucket-size groupby-count +
    hash self-join + distinct): measured 7.2s → ~1.5s at sf0.1 / 32 cpus,
    and one fewer all-to-all at 100 TB.  With ``carry``, pairs also emit
    that column's two values as ``(carry)_a`` / ``(carry)_b``.
    """
    from ray.data.aggregate import Count

    nrows = banded.count()
    if nrows == 0:
        schema = {"id_a": pa.array([], pa.int64()),
                  "id_b": pa.array([], pa.int64())}
        if carry:
            schema[f"{carry}_a"] = pa.array([], pa.uint64())
            schema[f"{carry}_b"] = pa.array([], pa.uint64())
        import ray.data

        return ray.data.from_arrow(pa.table(schema))
    nparts = _pair_partitions(nrows)
    mult = np.uint64(0x9E3779B97F4A7C15)

    def _part(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c in bucket_cols:
                h = (h + t.column(c).to_numpy().astype(np.uint64)) * mult
                h ^= h >> np.uint64(31)
        return t.append_column(
            "_part", pa.array((h % np.uint64(nparts)).astype(np.int64))
        )

    def _pairs(t: pa.Table) -> pa.Table:
        keys = [t.column(c).to_numpy() for c in bucket_cols]
        ids = t.column(id_col).to_numpy()
        cvals = t.column(carry).to_numpy() if carry else None
        n = len(ids)
        empty = {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
        }
        if carry:
            empty[f"{carry}_a"] = pa.array([], pa.uint64())
            empty[f"{carry}_b"] = pa.array([], pa.uint64())
        if n < 2:
            return pa.table(empty)
        order = np.lexsort(tuple(reversed(keys)))
        ks = [c[order] for c in keys]
        ids_s = ids[order]
        cv_s = cvals[order] if carry else None
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for c in ks:
            change[1:] |= c[1:] != c[:-1]
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], n)
        out_a: List[np.ndarray] = []
        out_b: List[np.ndarray] = []
        for s, e in zip(starts, ends):
            sz = e - s
            if sz < 2 or sz > max_bucket:
                continue
            ii, jj = np.triu_indices(sz, 1)
            a_, b_ = ids_s[s + ii], ids_s[s + jj]
            lo = np.minimum(a_, b_)
            hi = np.maximum(a_, b_)
            out_a.append(lo)
            out_b.append(hi)
        if not out_a:
            return pa.table(empty)
        a_all = np.concatenate(out_a)
        b_all = np.concatenate(out_b)
        # local dedup (same pair found in several bands of this partition)
        uniq_pairs, first_idx = np.unique(
            np.stack([a_all, b_all], axis=1), axis=0, return_index=True
        )
        cols = {
            "id_a": pa.array(uniq_pairs[:, 0].astype(np.int64)),
            "id_b": pa.array(uniq_pairs[:, 1].astype(np.int64)),
        }
        if carry:
            # id → carry, vectorized (carry is a function of the id)
            uids, uidx = np.unique(ids_s, return_index=True)
            ucarry = cv_s[uidx]
            cols[f"{carry}_a"] = pa.array(
                ucarry[np.searchsorted(uids, uniq_pairs[:, 0])]
            )
            cols[f"{carry}_b"] = pa.array(
                ucarry[np.searchsorted(uids, uniq_pairs[:, 1])]
            )
        return pa.table(cols)

    pairs = (
        banded.map_batches(_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(_pairs, batch_format="pyarrow")
    )
    if carry:
        return pairs
    return (
        pairs.groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="_nbands"))
        .select_columns(["id_a", "id_b"])
    )



def _attach_text(rows, corpus, side: str, carry: List[Tuple[str, object]],
                 out_col: str, id_col: str, col: str):
    """Reduce-side (repartition) join: union the row list with the corpus
    keyed on ``side``/``id_col``, shuffle ONCE on the key, and inside each
    group copy the key's text onto every row — the hash-partitioned fetch
    join, expressed as ``groupby(key).map_groups`` so neither side ever
    materializes centrally."""

    def _prep_rows(t: pa.Table) -> pa.Table:
        cols = {
            "key": t.column(side).cast(pa.int64()),
            "_kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            "_txt": pa.nulls(t.num_rows, pa.string()),
        }
        for c, typ in carry:
            cols[c] = t.column(c).cast(typ)
        return pa.table(cols)

    def _prep_corpus(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "key": t.column(id_col).cast(pa.int64()),
            "_kind": pa.array(np.zeros(n, dtype=np.int8)),
            "_txt": t.column(col).cast(pa.string()),
        }
        for c, typ in carry:
            cols[c] = pa.nulls(n, typ)
        return pa.table(cols)

    out_schema = pa.schema(
        [(side, pa.int64())] + [(c, t) for c, t in carry]
        + [(out_col, pa.string())]
    )

    def _merge(t: pa.Table) -> pa.Table:
        kinds = t.column("_kind").to_numpy(zero_copy_only=False)
        ci = np.nonzero(kinds == 0)[0]
        pi = np.nonzero(kinds == 1)[0]
        if len(ci) == 0 or len(pi) == 0:
            return out_schema.empty_table()
        txt = t.column("_txt")[int(ci[0])].as_py()
        n = len(pi)
        idx = pa.array(pi)
        cols = {side: t.column("key").take(idx)}
        for c, _typ in carry:
            cols[c] = t.column(c).take(idx)
        cols[out_col] = pa.array([txt] * n, pa.string())
        return pa.table(cols, schema=out_schema)

    unioned = rows.map_batches(_prep_rows, batch_format="pyarrow").union(
        corpus.map_batches(_prep_corpus, batch_format="pyarrow")
    )
    return unioned.groupby("key").map_groups(
        _merge, batch_format="pyarrow"
    )


#: candidate sets at or under this size verify via ONE pruned read +
#: broadcast of the CANDIDATE texts (bounded by the pair-output size, the
#: same boundedness argument as the ANN driver merge); larger sets take
#: the two reduce-side fetch joins
CANDIDATE_BROADCAST_LIMIT = 50_000


def _fetch_pair_texts(pairs, corpus, id_col: str, col: str):
    """Attach both sides' text to an (id_a, id_b) pair list.

    The corpus is pruned to CANDIDATE ids first (vectorized isin): the
    driver holds only the candidate id array — 16 bytes per pair, bounded
    by the dedup OUTPUT size, never the corpus.  Small candidate sets then
    broadcast their texts once (two Ray passes total); big ones go through
    two reduce-side fetch joins so no text set ever rides the driver."""
    import ray

    pairs = pairs.materialize()
    pid = pairs.to_pandas()
    cand = np.unique(
        np.concatenate([pid["id_a"].to_numpy(), pid["id_b"].to_numpy()])
    ) if len(pid) else np.empty(0, dtype=np.int64)

    def _prune(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        return t.filter(pa.array(np.isin(ids, cand)))

    pruned = corpus.map_batches(_prune, batch_format="pyarrow")
    if len(cand) <= CANDIDATE_BROADCAST_LIMIT:
        tdf = pruned.to_pandas()  # candidate texts only — bounded
        texts_ref = ray.put(dict(zip(tdf[id_col], tdf[col])))

        def _attach(t: pa.Table) -> pa.Table:
            lookup = ray.get(texts_ref)
            ta = [lookup.get(v) for v in t.column("id_a").to_pylist()]
            tb = [lookup.get(v) for v in t.column("id_b").to_pylist()]
            return t.append_column(
                "_text_a", pa.array(ta, pa.string())
            ).append_column("_text_b", pa.array(tb, pa.string()))

        return pairs.map_batches(_attach, batch_format="pyarrow")

    pruned = pruned.materialize()
    a = _attach_text(
        pairs, pruned, "id_a", [("id_b", pa.int64())], "_text_a",
        id_col, col,
    )
    return _attach_text(
        a, pruned, "id_b",
        [("id_a", pa.int64()), ("_text_a", pa.string())], "_text_b",
        id_col, col,
    )


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

def simhash64_batch(texts: List[str]) -> np.ndarray:
    """uint64[ndocs] of classic 64-bit simhashes (weight = tf) — the
    vectorized kernel: hash each DISTINCT token of the batch once, expand
    unique-token hashes to a ±1 bit matrix, and fold per-doc signed bit
    sums with ``np.add.reduceat``.  Bit-for-bit identical to the scalar
    definition (bit j set iff Σ_tokens (2·bit_j(h)−1) > 0)."""
    ndocs = len(texts)
    out = np.zeros(ndocs, dtype=np.uint64)
    if ndocs == 0:
        return out
    per_doc = [(t or "").split() for t in texts]
    doc_lens = np.fromiter(
        (len(p) for p in per_doc), dtype=np.int64, count=ndocs
    )
    flat = [t for p in per_doc for t in p]
    if not flat:
        return out
    inv, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=False)
    uh = _hash_tokens(uniq)
    shifts = np.arange(64, dtype=np.uint64)
    # ±1 rows per unique token, gathered per occurrence, summed per doc
    sign = (
        ((uh[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
        * 2 - 1
    )
    doc_starts = np.zeros(ndocs, dtype=np.int64)
    if ndocs > 1:
        np.cumsum(doc_lens[:-1], out=doc_starts[1:])
    nonempty = np.nonzero(doc_lens > 0)[0]
    #: chunk the occurrence-expanded sign matrix (~64 MB of int32 rows)
    chunk_toks = 1 << 18
    lo = 0
    while lo < len(nonempty):
        hi = lo + 1
        span_start = doc_starts[nonempty[lo]]
        while (
            hi < len(nonempty)
            and doc_starts[nonempty[hi]] + doc_lens[nonempty[hi]]
            - span_start <= chunk_toks
        ):
            hi += 1
        last = nonempty[hi - 1]
        span_end = doc_starts[last] + doc_lens[last]
        rows = sign[inv[span_start:span_end]]
        cuts = (doc_starts[nonempty[lo:hi]] - span_start).astype(np.int64)
        acc = np.add.reduceat(rows, cuts, axis=0)
        bits = (acc > 0).astype(np.uint64)
        out[nonempty[lo:hi]] = (bits << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        lo = hi
    return out


def simhash64(text: str) -> int:
    """Classic 64-bit simhash over whitespace tokens (weight = tf)."""
    return int(simhash64_batch([text])[0])


def simhash_groups(ds, col: str, id_col: str, band_bits: int = 16):
    """Group ids whose simhash shares any 16-bit band (candidates for
    hamming-distance ≤ 3 near-dup checks)."""

    def _sig(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        sigs = simhash64_batch(t.column(col).to_pylist())
        bands = 64 // band_bits
        n = len(ids)
        # band explode, fully vectorized: (band, key) rows per doc
        band_arr = np.repeat(np.arange(bands, dtype=np.int64), n)
        shifts = (np.arange(bands, dtype=np.uint64) * np.uint64(band_bits))
        mask = np.uint64((1 << band_bits) - 1)
        keys = ((sigs[None, :] >> shifts[:, None]) & mask).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(band_arr),
                "key": pa.array(keys.reshape(-1)),
                id_col: pa.array(np.tile(ids, bands).astype(np.int64)),
                "simhash": pa.array(np.tile(sigs, bands)),
            }
        )

    # materialized once for the same multi-consumer reason as minhash
    banded = ds.select_columns([id_col, col]).map_batches(
        _sig, batch_format="pyarrow"
    ).materialize()

    # distributed pair generation: ONE hash-partition shuffle with the
    # 8-byte signature riding along as the carry column, then a VECTORIZED
    # hamming popcount over each pair batch, distinct via tiny-row groupby.
    # Nothing corpus-sized reaches the driver.
    from ray.data.aggregate import Min

    pairs = _bucket_pairs(
        banded, ["band", "key"], id_col, max_bucket=1000, carry="simhash"
    )

    def _hamming(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        xor = np.bitwise_xor(
            t.column("simhash_a").to_numpy().astype(np.uint64),
            t.column("simhash_b").to_numpy().astype(np.uint64),
        )
        ham = np.unpackbits(xor.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        keep = ham <= 3
        return pa.table(
            {
                "id_a": t.column("id_a").filter(pa.array(keep)),
                "id_b": t.column("id_b").filter(pa.array(keep)),
                "hamming": pa.array(ham[keep]),
            }
        )

    return (
        pairs.map_batches(_hamming, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dups
# ---------------------------------------------------------------------------

def embedding_near_dups(ds, vec_col: str, id_col: str,
                        threshold: float = 0.95,
                        block: int = 8192,
                        scratch_dir: Optional[str] = None):
    """All pairs with cosine ≥ threshold — EXACT, block-pair distributed.

    Shape: normalize per batch and spill fixed-size normalized blocks to
    shared storage (one parquet file per block), then fan out one task per
    block PAIR (i ≤ j): each task reads exactly two blocks, does one
    matmul, and emits over-threshold pairs.  The driver holds only block
    file names; no task ever sees more than 2×``block`` vectors — the same
    plan a 256-node cluster runs against a shared filesystem/object store.

    O(n²/2) FLOPs is inherent to the exact all-pairs semantics; for the
    approximate sub-quadratic path use the LSH-bucketed candidates of
    ``functions/ann.lsh_topk`` and verify those pairs instead.
    """
    import uuid as _uuid

    import ray.data

    scratch = scratch_dir or os.path.join(
        "/tmp", f"lsr_neardup_{_uuid.uuid4().hex[:8]}"
    )
    os.makedirs(scratch, exist_ok=True)

    # stage 1: normalize + re-block to fixed row counts, one file per block
    def _normalize(t: pa.Table) -> pa.Table:
        from lucene_solr_ray.functions.ann import vec_matrix

        M = vec_matrix(t, vec_col)
        if len(M):
            # vec_matrix may return a read-only zero-copy view — not in-place
            M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True),
                               1e-12)
        return pa.table(
            {
                id_col: t.column(id_col),
                "_nvec": pa.array(list(M.astype(np.float32))),
            }
        )

    normalized = ds.select_columns([id_col, vec_col]).map_batches(
        _normalize, batch_format="pyarrow", batch_size=block
    )
    normalized.write_parquet(scratch, min_rows_per_file=block)
    files = sorted(
        os.path.join(scratch, f)
        for f in os.listdir(scratch)
        if f.endswith(".parquet")
    )

    # stage 2: block-PAIR enumeration happens IN the cluster — a Dataset
    # over block indices flat-maps each i to its (i, j≥i) pairs, so the
    # driver never holds a list proportional to blocks² (the round-3
    # review's scale-killer); it holds only the O(blocks) file list,
    # shipped once via ray.put.
    import ray as _ray

    n_files = len(files)
    files_ref = _ray.put(files)

    def _expand(t: pa.Table) -> pa.Table:
        fl = _ray.get(files_ref)
        fa, fb = [], []
        for i in t.column("i").to_pylist():
            fa.extend([fl[i]] * (len(fl) - i))
            fb.extend(fl[i:])
        return pa.table(
            {"fa": pa.array(fa, pa.string()),
             "fb": pa.array(fb, pa.string())}
        )

    n_pairs = n_files * (n_files + 1) // 2

    class _BlockPair:
        """One call = one block pair; caches decoded blocks across calls
        (each file is re-read by ~#blocks tasks — the cache amortizes the
        actor's share)."""

        def __init__(self):
            self._cache: dict = {}

        def _load(self, path: str):
            hit = self._cache.get(path)
            if hit is None:
                import pyarrow.parquet as _pq

                from lucene_solr_ray.functions.ann import vec_matrix

                t = _pq.read_table(path)
                ids = t.column(id_col).to_numpy()
                M = vec_matrix(t, "_nvec")
                hit = (ids, M)
                if len(self._cache) > 8:
                    self._cache.clear()
                self._cache[path] = hit
            return hit

        def __call__(self, t: pa.Table) -> pa.Table:
            out_a, out_b, out_c = [], [], []
            for fa, fb in zip(t.column("fa").to_pylist(),
                              t.column("fb").to_pylist()):
                ids_a, A = self._load(fa)
                ids_b, B = self._load(fb)
                if len(A) == 0 or len(B) == 0:
                    continue
                S = A @ B.T
                ii, jj = np.nonzero(S >= threshold)
                same = fa == fb
                for i, j in zip(ii, jj):
                    x, y = int(ids_a[i]), int(ids_b[j])
                    if same:
                        # diagonal block: both (i,j) and (j,i) appear in S —
                        # keep the ordered half only.
                        if x >= y:
                            continue
                    else:
                        # cross-block: each unordered pair appears exactly
                        # once; ids are NOT guaranteed block-ordered, so
                        # canonicalize instead of filtering.
                        if x == y:
                            continue
                        if x > y:
                            x, y = y, x
                    out_a.append(x)
                    out_b.append(y)
                    out_c.append(float(S[i, j]))
            return pa.table(
                {
                    "id_a": pa.array(out_a, pa.int64()),
                    "id_b": pa.array(out_b, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    # ≤4096 pairs → one pair per task (max parallelism); past that each
    # task works a run of pairs and its block cache amortizes file reads
    n_parts = max(1, min(n_pairs, 4096))
    pairs_ds = (
        ray.data.from_items(
            [{"i": i} for i in range(n_files)],
            override_num_blocks=max(1, n_files),
        )
        .map_batches(_expand, batch_format="pyarrow")
        .repartition(n_parts)
    )
    return pairs_ds.map_batches(
        _BlockPair, batch_size=1, batch_format="pyarrow",
        concurrency=(1, cpus),
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


def ngram_jaccard_pairs(ds, col: str, id_col: str, k: int = 3,
                        threshold: float = 0.5, max_gram_df: int = 64):
    """EXACT word-k-gram Jaccard near-dup pairs, distributed.

    The Jaccard space is the set of distinct word k-grams per doc, with
    a STOP-GRAM cap: grams appearing in more than ``max_gram_df`` docs
    are excluded from the space entirely (from both intersections and
    set sizes — boilerplate grams otherwise make every pair a candidate
    and a single hot gram's pair count is quadratic).  Within the capped
    space the similarity is exact, so a SQL oracle can replay it.

    Shape (one all-to-all): distinct (doc, gram) rows → ONE
    gram-hash-partitioned shuffle; each partition lexsorts its grams,
    drops over-cap segments, and emits both size contributions and
    triangular pair rows; tiny (id_a, id_b) count + size joins (the
    size-aware ``inner_join`` broadcasts the dimension-sized size table)
    finish the job.  Same scale profile as ``minhash_lsh_pairs`` with
    exact instead of sketched similarity — use minhash when the gram
    space itself is too hot to shuffle.
    """
    import ray.data

    from ray.data.aggregate import Count, Sum

    def _grams(t: pa.Table) -> pa.Table:
        ids_out, grams_out = [], []
        for did, txt in zip(
            t.column(id_col).to_pylist(), t.column(col).to_pylist()
        ):
            toks = (txt or "").split()
            if len(toks) < k:
                continue
            seen = {
                " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
            }
            ids_out.extend([did] * len(seen))
            grams_out.extend(sorted(seen))
        return pa.table({
            "doc": pa.array(ids_out, pa.int64()),
            "gram": pa.array(grams_out, pa.string()),
        })

    g = ds.map_batches(_grams, batch_format="pyarrow")
    nrows = g.count()
    if nrows == 0:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }))
    nparts = _pair_partitions(nrows)

    def _part(t: pa.Table) -> pa.Table:
        # deterministic across worker processes (Python's str hash is
        # per-process salted and would tear gram groups apart)
        h = pd.util.hash_array(
            np.asarray(t.column("gram").to_pylist(), dtype=object)
        ).astype(np.uint64)
        return t.append_column(
            "_part", pa.array((h % np.uint64(nparts)).astype(np.int64))
        )

    def _emit(group: pa.Table) -> pa.Table:
        grams = np.asarray(group.column("gram").to_pylist(), dtype=object)
        ids = group.column("doc").to_numpy()
        order = np.argsort(grams, kind="mergesort")
        gs, ids_s = grams[order], ids[order]
        n = len(gs)
        kind, a, b = [], [], []
        i = 0
        while i < n:
            j = i
            while j + 1 < n and gs[j + 1] == gs[i]:
                j += 1
            m = j - i + 1
            if m <= max_gram_df:
                seg = np.sort(ids_s[i:j + 1])
                for x in range(m):          # size contributions
                    kind.append(0)
                    a.append(int(seg[x]))
                    b.append(0)
                for x in range(m):          # triangular pairs
                    for y in range(x + 1, m):
                        kind.append(1)
                        a.append(int(seg[x]))
                        b.append(int(seg[y]))
            i = j + 1
        return pa.table({
            "kind": pa.array(kind, pa.int8()),
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
        })

    parts = g.map_batches(_part, batch_format="pyarrow")
    emitted = parts.groupby("_part").map_groups(
        _emit, batch_format="pyarrow"
    )
    emitted = emitted.materialize()
    sizes = (
        emitted.filter(expr="kind == 0")
        .groupby("a").aggregate(Count(alias_name="n"))
    )
    inter = (
        emitted.filter(expr="kind == 1")
        .groupby(["a", "b"]).aggregate(Count(alias_name="i"))
    )
    from lucene_solr_ray.stages.relational import inner_join

    j1 = inner_join(
        inter.rename_columns({"a": "id_a", "b": "id_b"}),
        sizes.rename_columns({"a": "sid", "n": "n_a"}),
        on="id_a", right_on="sid",
    )
    j2 = inner_join(
        j1,
        sizes.rename_columns({"a": "sid2", "n": "n_b"}),
        on="id_b", right_on="sid2",
    )

    def _jacc(t: pa.Table) -> pa.Table:
        inter_n = t.column("i").to_numpy().astype(np.float64)
        na = t.column("n_a").to_numpy().astype(np.float64)
        nb = t.column("n_b").to_numpy().astype(np.float64)
        jac = inter_n / (na + nb - inter_n)
        out = pa.table({
            "id_a": t.column("id_a"),
            "id_b": t.column("id_b"),
            "jaccard": pa.array(np.round(jac, 6)),
        })
        return out.filter(pa.array(jac >= threshold))

    return j2.map_batches(_jacc, batch_format="pyarrow")
