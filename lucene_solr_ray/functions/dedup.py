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


def _join_partitions() -> int:
    """Hash-join partition count sized to the cluster (each join spins up
    its partition-count of aggregator actors)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(16, cpus // 2))


def _hot_bucket_rows(banded, bucket_cols: List[str], max_bucket: int):
    """Drop DEGENERATE buckets (> max_bucket members — Σn² would explode
    in the self-join).  Only the oversize keys come to the driver: they are
    pathological-content buckets, definitionally rare (empty in practice),
    so the closure stays bounded — the common multi-member buckets never
    leave the cluster.  (A banded ⋈ sizes semi-join was measured ~2×
    slower than the full self-join it was meant to shrink.)"""
    from ray.data.aggregate import Count

    over = (
        banded.groupby(bucket_cols)
        .aggregate(Count(alias_name="_n"))
        .filter(expr=f"_n > {max_bucket}")
        .to_pandas()
    )
    if over.empty:
        return banded
    bad = set(map(tuple, over[bucket_cols].itertuples(index=False)))

    def _keep(t: pa.Table) -> pa.Table:
        keys = zip(*(t.column(c).to_pylist() for c in bucket_cols))
        return t.filter(pa.array([k not in bad for k in keys]))

    # consumed by both self-join sides — materialize the filtered rows
    return banded.map_batches(_keep, batch_format="pyarrow").materialize()


def _bucket_pairs(banded, bucket_cols: List[str], id_col: str,
                  max_bucket: int):
    """Candidate pairs by SELF-JOIN on the bucket key — all C-path: one
    hash-partitioned join (output Σn² over bucket sizes ≈ input size when
    dup buckets are rare), a vectorized ``id_a < id_b`` filter, and a
    tiny-row groupby distinct.  Replaces per-group Python (measured ~10×
    slower at ~#docs×bands groups)."""
    from ray.data.aggregate import Count

    hot_rows = _hot_bucket_rows(banded, bucket_cols, max_bucket)
    left = _rename_arrow(hot_rows, {id_col: "id_a"})
    right = _rename_arrow(hot_rows, {id_col: "id_b"})
    joined = left.join(
        right, join_type="inner", num_partitions=_join_partitions(),
        on=tuple(bucket_cols),
    )

    def _ordered(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.less(t.column("id_a"), t.column("id_b")))
        return t.select(["id_a", "id_b"])

    return (
        joined.map_batches(_ordered, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="_nbands"))
        .select_columns(["id_a", "id_b"])
    )


def _rename_arrow(ds, mapping):
    """rename_columns via a pyarrow map (Dataset.rename_columns breaks on
    pandas-backed blocks in ray 2.49)."""

    def _r(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [mapping.get(c, c) for c in t.schema.names]
        )

    return ds.map_batches(_r, batch_format="pyarrow")


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
                "band": pa.array(out_band, pa.int64()),
                "key": pa.array(out_key, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "simhash": pa.array(out_sig, pa.uint64()),
            }
        )

    # materialized once for the same multi-consumer reason as minhash
    banded = ds.select_columns([id_col, col]).map_batches(
        _sig, batch_format="pyarrow"
    ).materialize()

    # distributed pair generation: self-join on (band, key) — the 8-byte
    # signature rides the shuffle with the id — then a VECTORIZED hamming
    # popcount over the joined batch, distinct via tiny-row groupby.
    # Nothing corpus-sized reaches the driver.
    from ray.data.aggregate import Min

    hot_rows = _hot_bucket_rows(banded, ["band", "key"], 1000)
    left = _rename_arrow(hot_rows, {id_col: "id_a", "simhash": "_sig_a"})
    right = _rename_arrow(hot_rows, {id_col: "id_b", "simhash": "_sig_b"})
    joined = left.join(
        right, join_type="inner", num_partitions=_join_partitions(),
        on=("band", "key"),
    )

    def _hamming(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.less(t.column("id_a"), t.column("id_b")))
        if t.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        xor = np.bitwise_xor(
            t.column("_sig_a").to_numpy().astype(np.uint64),
            t.column("_sig_b").to_numpy().astype(np.uint64),
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
        joined.map_batches(_hamming, batch_format="pyarrow")
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
        M = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        if len(M):
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
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

    items = [
        {"fa": files[i], "fb": files[j]}
        for i in range(len(files))
        for j in range(i, len(files))
    ]

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

                t = _pq.read_table(path)
                ids = t.column(id_col).to_numpy()
                M = np.asarray(t.column("_nvec").to_pylist(),
                               dtype=np.float64)
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

    return ray.data.from_items(
        items, override_num_blocks=max(1, len(items))
    ).map_batches(_BlockPair, batch_size=1, batch_format="pyarrow",
                  concurrency=(1, 8))


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
