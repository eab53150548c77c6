"""Block postings codec: delta + FOR bit-packing with per-block skip data
and competitive impacts.

Reimplements the *semantics* of the reference's postings format with numpy
vector kernels (not a byte-level port):

- postings are split into blocks of ``BLOCK_SIZE`` = 128 entries
  (``lucene/core/src/java/org/apache/lucene/codecs/lucene50/
  Lucene50PostingsFormat.java:398``);
- doc ordinals are delta-encoded (minus 1 — deltas are ≥1) and bit-packed
  with the per-block max bit width; freqs are bit-packed likewise
  (``ForUtil.writeBlock:157-184``), with the ``ALL_VALUES_EQUAL`` special
  case (bpv=0 + single value);
- each block keeps a skip entry: last ordinal (``Lucene50SkipWriter``) and
  the **competitive impacts** — the pareto frontier of (freq, norm) pairs
  (max freq per distinct norm, upper-left hull), the exact content of
  ``CompetitiveImpactAccumulator.java:66-121`` — from which a per-block
  max BM25 score is computable for any (k1, b) at query time
  (``ImpactsDISI`` + ``MaxScoreCache.java:61-124``);
- the tail block (<128 entries) is stored like any other (the reference
  uses VInts there — a serialization detail, not semantics).

Layout: one ``bytes`` blob per posting list; numpy bit-unpacking decodes a
whole list (all blocks) in a handful of vector ops.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

__all__ = [
    "BLOCK_SIZE",
    "encode_postings",
    "decode_postings",
    "decode_block_skips",
    "block_max_scores",
]

BLOCK_SIZE = 128
_MAGIC = 0x4C53  # "LS"


_SHIFTS = [np.arange(b, dtype=np.uint32) for b in range(33)]


def _pack_bits(vals: np.ndarray, bpv: int) -> bytes:
    """LSB-first bit-pack of uint32 values with bpv bits each."""
    if bpv == 0:
        return b""
    bits = (
        (vals[:, None] >> _SHIFTS[bpv]) & 1
    ).astype(np.uint8).reshape(-1)
    return np.packbits(bits, bitorder="little").tobytes()


def _unpack_bits(data: memoryview, n: int, bpv: int) -> np.ndarray:
    if bpv == 0:
        return np.zeros(n, dtype=np.uint32)
    nbits = n * bpv
    raw = np.frombuffer(data[: (nbits + 7) // 8], dtype=np.uint8)
    bits = np.unpackbits(raw, bitorder="little")[:nbits].reshape(n, bpv)
    return (bits.astype(np.uint32) << np.arange(bpv, dtype=np.uint32)).sum(
        axis=1, dtype=np.uint32
    )


def _competitive_pairs(
    freqs: np.ndarray, norms: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Pareto frontier of (freq↑, norm↓): for each distinct norm the max
    freq, then drop pairs dominated by a smaller-norm pair with ≥ freq —
    exactly the set ``CompetitiveImpactAccumulator`` keeps (vectorized)."""
    order = np.lexsort((-freqs, norms))  # norm asc, freq desc
    f, n = freqs[order], norms[order]
    # first row per distinct norm == max freq for that norm
    first = np.ones(len(n), dtype=bool)
    first[1:] = n[1:] != n[:-1]
    f, n = f[first], n[first]
    # keep only strictly-increasing freqs (dominated pairs out)
    cummax = np.maximum.accumulate(f)
    keep = np.ones(len(f), dtype=bool)
    keep[1:] = f[1:] > cummax[:-1]
    return f[keep].astype(np.int32), n[keep].astype(np.uint8)


def encode_postings(
    ords: np.ndarray, freqs: np.ndarray, norms: np.ndarray
) -> bytes:
    """Encode one posting list (ords ascending) + its skip/impact data.

    ``norms`` is the per-posting norm byte (``norms_of_segment[ords]``) —
    needed only to build the impacts; it is NOT stored per posting.
    """
    ords = np.asarray(ords, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    n = len(ords)
    out = [struct.pack("<HI", _MAGIC, n)]
    for s in range(0, n, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, n)
        block_ords = ords[s:e]
        block_freqs = freqs[s:e]
        # deltas beyond the first are ≥ 1 → store delta-1
        dstore = block_ords[1:] - block_ords[:-1] - 1
        fstore = block_freqs - 1  # freqs ≥ 1
        bpv_d = int(dstore.max()).bit_length() if e - s > 1 else 0
        f0 = int(fstore[0])
        bpv_f = 0 if (fstore == f0).all() else int(fstore.max()).bit_length()
        cf, cn = _competitive_pairs(
            block_freqs, np.asarray(norms[s:e], dtype=np.uint8)
        )
        out.append(
            struct.pack(
                "<IHBBIHI",
                int(block_ords[0]),  # block base ord
                e - s,               # entries
                bpv_d,
                bpv_f,
                f0 if bpv_f == 0 else 0,  # ALL_VALUES_EQUAL freq-1
                len(cf),
                int(block_ords[-1]),  # skip: last ord
            )
        )
        out.append(cf.astype("<i4").tobytes())
        out.append(cn.tobytes())
        out.append(_pack_bits(dstore.astype(np.uint32), bpv_d))
        if bpv_f:
            out.append(_pack_bits(fstore.astype(np.uint32), bpv_f))
    return b"".join(out)


def encode_postings_batch(
    g_ord: np.ndarray,
    g_freq: np.ndarray,
    norm_bytes: np.ndarray,
    t_starts: np.ndarray,
    t_counts: np.ndarray,
) -> List[bytes]:
    """Encode MANY terms' posting lists at once, byte-identical to
    :func:`encode_postings` per term.

    The per-term encoder was the measured index-build hotspot (~44% of
    segment build on the code corpus: tens of thousands of tiny posting
    lists, each paying struct/bit-pack/impact Python overhead).  Here every
    SINGLE-BLOCK term (df ≤ BLOCK_SIZE — the overwhelming majority) is
    processed by shared numpy kernels: deltas, bit widths, ALL_VALUES_EQUAL
    detection, competitive impacts (one global lexsort + segmented cummax)
    and bit-packing grouped by bits-per-value; only the final blob
    assembly walks terms in Python.  Multi-block terms (stop-word scale)
    fall back to the scalar encoder.

    Inputs are the inverted-group arrays of ``build_segment_tables``:
    ``g_ord``/``g_freq`` sorted by (term, ord), with term *i* occupying
    rows ``[t_starts[i], t_starts[i] + t_counts[i])``.
    """
    n_terms = len(t_starts)
    out: List[Optional[bytes]] = [None] * n_terms
    df = t_counts.astype(np.int64)
    single = df <= BLOCK_SIZE
    for i in np.nonzero(~single)[0]:
        s, e = t_starts[i], t_starts[i] + t_counts[i]
        out[i] = encode_postings(
            g_ord[s:e], g_freq[s:e], norm_bytes[g_ord[s:e]]
        )
    sidx = np.nonzero(single)[0]
    k = len(sidx)
    if k == 0:
        return out  # type: ignore[return-value]

    rows_mask = np.repeat(single, t_counts)
    sub_ord = g_ord[rows_mask].astype(np.int64)
    sub_freq = g_freq[rows_mask].astype(np.int64)
    sub_norm = norm_bytes[sub_ord]
    s_df = df[sidx]
    sub_tid = np.repeat(np.arange(k, dtype=np.int64), s_df)
    S = np.concatenate([[0], np.cumsum(s_df)])  # term row offsets

    base = sub_ord[S[:-1]]
    last = sub_ord[S[1:] - 1]

    # deltas (minus 1) + per-term max → bpv_d
    d_all = np.empty(len(sub_ord), dtype=np.int64)
    d_all[1:] = sub_ord[1:] - sub_ord[:-1] - 1
    d_all[S[:-1]] = -1  # mask term-boundary positions
    bpv_d = np.zeros(k, dtype=np.int64)
    multi_mask = s_df > 1
    if multi_mask.any():
        # max delta per term over rows (S[i]+1 .. S[i+1])
        mx = np.maximum.reduceat(
            d_all, np.minimum(S[:-1] + 1, len(d_all) - 1)
        )
        mx = np.where(multi_mask, mx, 0)
        pos = mx > 0
        bl = np.zeros(k, dtype=np.int64)
        bl[pos] = np.frexp(mx[pos].astype(np.float64))[1]
        bpv_d = np.where(multi_mask, bl, 0)

    # freqs: ALL_VALUES_EQUAL detection + bpv_f
    fstore = sub_freq - 1
    fmax = np.maximum.reduceat(fstore, S[:-1])
    fmin = np.minimum.reduceat(fstore, S[:-1])
    f0 = fstore[S[:-1]]
    all_eq = fmax == fmin
    bpv_f = np.zeros(k, dtype=np.int64)
    ne = ~all_eq
    if ne.any():
        posf = ne & (fmax > 0)
        blf = np.zeros(k, dtype=np.int64)
        blf[posf] = np.frexp(fmax[posf].astype(np.float64))[1]
        bpv_f = np.where(ne, blf, 0)
    eq_field = np.where(all_eq, f0, 0)

    # competitive impacts: per term, (norm asc, freq desc) order, first per
    # distinct norm, then keep strictly-increasing freqs (segmented cummax)
    order = np.lexsort((-sub_freq, sub_norm, sub_tid))
    o_tid = sub_tid[order]
    o_norm = sub_norm[order]
    o_freq = sub_freq[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (o_tid[1:] != o_tid[:-1]) | (o_norm[1:] != o_norm[:-1])
    f_tid, f_norm, f_freq = o_tid[first], o_norm[first], o_freq[first]
    comb = (f_tid << np.int64(34)) | f_freq
    cm = np.maximum.accumulate(comb)
    keep = np.ones(len(comb), dtype=bool)
    keep[1:] = comb[1:] > cm[:-1]
    i_tid = f_tid[keep]
    imp_f = f_freq[keep].astype("<i4")
    imp_n = f_norm[keep].astype(np.uint8)
    n_imp = np.bincount(i_tid, minlength=k).astype(np.int64)
    imp_off = np.concatenate([[0], np.cumsum(n_imp)])
    imp_f_bytes = imp_f.tobytes()
    imp_n_bytes = imp_n.tobytes()

    # headers: one packed struct row per term (matches "<IHBBIHI")
    hdr_dtype = np.dtype(
        {
            "names": ["base", "cnt", "bpv_d", "bpv_f", "eq", "nimp",
                      "last"],
            "formats": ["<u4", "<u2", "u1", "u1", "<u4", "<u2", "<u4"],
            "offsets": [0, 4, 6, 7, 8, 12, 14],
            "itemsize": 18,
        }
    )
    hdr = np.zeros(k, dtype=hdr_dtype)
    hdr["base"] = base
    hdr["cnt"] = s_df
    hdr["bpv_d"] = bpv_d
    hdr["bpv_f"] = bpv_f
    hdr["eq"] = eq_field
    hdr["nimp"] = n_imp
    hdr["last"] = last
    hdr_bytes = hdr.tobytes()

    # bit-packing grouped by bits-per-value: rows padded to the group max,
    # packbits per row, then sliced to each term's exact byte count (the
    # padding zeros land past the stored bytes, so slices are identical to
    # the scalar _pack_bits output)
    def _pack_group(values_per_term, counts, bpvs):
        packed: List[bytes] = [b""] * len(counts)
        bpv_vals = np.unique(bpvs[counts > 0])
        for b in bpv_vals.tolist():
            if b == 0:
                continue
            grp = np.nonzero((bpvs == b) & (counts > 0))[0]
            cnts = counts[grp]
            P = int(cnts.max())
            matv = np.zeros((len(grp), P), dtype=np.uint32)
            row_idx = np.repeat(np.arange(len(grp)), cnts)
            col_idx = np.concatenate(
                [np.arange(c) for c in cnts.tolist()]
            ) if len(grp) else np.empty(0, np.int64)
            matv[row_idx, col_idx] = np.concatenate(
                [values_per_term(int(g)) for g in grp.tolist()]
            ).astype(np.uint32)
            bits = (
                (matv[:, :, None] >> _SHIFTS[b]) & 1
            ).astype(np.uint8).reshape(len(grp), P * b)
            pb = np.packbits(bits, axis=1, bitorder="little")
            for r, g in enumerate(grp.tolist()):
                nbytes = (int(cnts[r]) * b + 7) // 8
                packed[g] = pb[r, :nbytes].tobytes()
        return packed

    d_counts = (s_df - 1).astype(np.int64)
    d_packed = _pack_group(
        lambda g: d_all[S[g] + 1: S[g + 1]], d_counts, bpv_d
    )
    f_counts = np.where(all_eq, 0, s_df).astype(np.int64)
    f_packed = _pack_group(
        lambda g: fstore[S[g]: S[g + 1]], f_counts, bpv_f
    )

    # final assembly (cheap byte concatenation per term)
    for r in range(k):
        i = int(sidx[r])
        out[i] = b"".join(
            (
                struct.pack("<HI", _MAGIC, int(s_df[r])),
                hdr_bytes[18 * r: 18 * (r + 1)],
                imp_f_bytes[4 * imp_off[r]: 4 * imp_off[r + 1]],
                imp_n_bytes[imp_off[r]: imp_off[r + 1]],
                d_packed[r],
                f_packed[r],
            )
        )
    return out  # type: ignore[return-value]


def _iter_blocks(blob: bytes):
    """Yields (base, cnt, bpv_d, bpv_f, eq_freq, n_imp, last_ord, offsets…)."""
    mv = memoryview(blob)
    magic, n = struct.unpack_from("<HI", mv, 0)
    if magic != _MAGIC:
        raise ValueError("bad postings blob")
    pos = 6
    done = 0
    while done < n:
        base, cnt, bpv_d, bpv_f, eq_freq, n_imp, last_ord = struct.unpack_from(
            "<IHBBIHI", mv, pos
        )
        pos += 18
        imp_f = np.frombuffer(mv, dtype="<i4", count=n_imp, offset=pos)
        pos += 4 * n_imp
        imp_n = np.frombuffer(mv, dtype=np.uint8, count=n_imp, offset=pos)
        pos += n_imp
        d_bytes = ((cnt - 1) * bpv_d + 7) // 8
        f_bytes = (cnt * bpv_f + 7) // 8
        yield (base, cnt, bpv_d, bpv_f, eq_freq, last_ord, imp_f, imp_n,
               mv[pos : pos + d_bytes], mv[pos + d_bytes : pos + d_bytes + f_bytes])
        pos += d_bytes + f_bytes
        done += cnt


def decode_postings(blob: bytes) -> Tuple[np.ndarray, np.ndarray]:
    """Full decode → (ords int32 asc, freqs int32)."""
    ords_parts: List[np.ndarray] = []
    freq_parts: List[np.ndarray] = []
    for (base, cnt, bpv_d, bpv_f, eq_freq, _last, _f, _n, dbuf, fbuf) in \
            _iter_blocks(blob):
        deltas = _unpack_bits(dbuf, cnt - 1, bpv_d) + 1
        ords = np.empty(cnt, dtype=np.int64)
        ords[0] = base
        np.cumsum(deltas, out=ords[1:] if cnt > 1 else np.empty(0, np.int64))
        if cnt > 1:
            ords[1:] += base
        if bpv_f == 0:
            freqs = np.full(cnt, eq_freq + 1, dtype=np.int32)
        else:
            freqs = (_unpack_bits(fbuf, cnt, bpv_f) + 1).astype(np.int32)
        ords_parts.append(ords.astype(np.int32))
        freq_parts.append(freqs)
    if not ords_parts:
        return np.empty(0, np.int32), np.empty(0, np.int32)
    return np.concatenate(ords_parts), np.concatenate(freq_parts)


def decode_block_skips(blob: bytes):
    """Skip metadata only (no posting decode): list of
    (base_ord, last_ord, count, imp_freqs, imp_norms) per block."""
    out = []
    for (base, cnt, _bd, _bf, _eq, last, imp_f, imp_n, _d, _f) in \
            _iter_blocks(blob):
        out.append((base, last, cnt, imp_f, imp_n))
    return out


def block_max_scores(blob: bytes, scorer) -> np.ndarray:
    """Per-block max score for a scorer (MaxScoreCache.computeMaxScore —
    max over the block's competitive (freq, norm) pairs)."""
    skips = decode_block_skips(blob)
    out = np.empty(len(skips), dtype=np.float64)
    for i, (_b, _l, _c, f, n) in enumerate(skips):
        out[i] = float(scorer.max_score_for(f.astype(np.float64), n))
    return out


def concat_postings(parts: List[Tuple[bytes, int]]) -> bytes:
    """Merge posting blobs by ordinal rebasing WITHOUT decode/re-encode.

    Within-block deltas are invariant under a constant ordinal shift, so a
    segment merge only needs each block's header (base, last_ord) patched
    by the segment's new doc base — the FOR payloads, freqs and impacts are
    byte-identical.  ``parts`` = [(blob, ord_offset), ...] in ascending
    doc-range order.  This is the reason merges stay cheap at 5 GB segment
    scale: O(blocks) header patching instead of O(postings) codec work.
    """
    total = 0
    out = [b""]
    for blob, off in parts:
        mv = memoryview(blob)
        magic, n = struct.unpack_from("<HI", mv, 0)
        if magic != _MAGIC:
            raise ValueError("bad postings blob")
        total += n
        pos = 6
        done = 0
        while done < n:
            base, cnt, bpv_d, bpv_f, eq_freq, n_imp, last = \
                struct.unpack_from("<IHBBIHI", mv, pos)
            body_len = (
                4 * n_imp + n_imp
                + ((cnt - 1) * bpv_d + 7) // 8
                + ((cnt * bpv_f + 7) // 8 if bpv_f else 0)
            )
            out.append(
                struct.pack(
                    "<IHBBIHI", base + off, cnt, bpv_d, bpv_f, eq_freq,
                    n_imp, last + off,
                )
            )
            out.append(bytes(mv[pos + 18 : pos + 18 + body_len]))
            pos += 18 + body_len
            done += cnt
    out[0] = struct.pack("<HI", _MAGIC, total)
    return b"".join(out)
