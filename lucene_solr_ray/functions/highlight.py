"""Passage highlighting — the unified-highlighter role, vectorizable.

The reference's highlighter module (``lucene/highlighter/`` — 11,421 LoC:
UnifiedHighlighter/FastVectorHighlighter/Highlighter) selects the best
passages for a query and marks the matched terms.  This engine implements
the passage-scoring core: a sliding token window scored by the summed idf
of the distinct query terms it covers (the UnifiedHighlighter passage
score shape), ties to the earliest window; matched terms wrapped in tags.

Runs as a plain function (driver-side, on the ≤k fetched hits) or inside
``map_batches`` over a results+text dataset (``highlight_batch``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from lucene_solr_ray.analysis.analyzer import StandardAnalyzer

__all__ = ["best_passage", "highlight", "highlight_batch"]


def best_passage(
    text: str,
    term_weights: Dict[str, float],
    window: int = 30,
    analyzer: Optional[StandardAnalyzer] = None,
) -> Tuple[int, int, float]:
    """(token_start, token_end, score) of the best window: max over
    windows of Σ weight(term) per *distinct* covered term."""
    analyzer = analyzer or StandardAnalyzer()
    # UNFILTERED token stream (stopwords kept) so indices line up with
    # tokenize_with_offsets in highlight(); stop terms simply never match
    # the weight dict (the analyzer never emits them as query terms)
    from lucene_solr_ray.analysis.analyzer import lowercase
    from lucene_solr_ray.analysis.tokenizer import tokenize

    toks = [lowercase(t) for t in tokenize(text, analyzer.max_token_length)]
    if not toks:
        return 0, 0, 0.0
    n = len(toks)
    w = min(window, n)
    best = (0, w, -1.0)
    # score windows at each match position (windows between matches tie)
    match_pos = [i for i, t in enumerate(toks) if t in term_weights]
    if not match_pos:
        return 0, w, 0.0
    for start in {max(0, p - w + 1) for p in match_pos} | set(match_pos):
        end = min(start + w, n)
        covered = {toks[i] for i in range(start, end) if toks[i] in term_weights}
        score = sum(term_weights[t] for t in covered)
        if score > best[2] or (score == best[2] and start < best[0]):
            best = (start, end, score)
    return best


def highlight(
    text: str,
    term_weights: Dict[str, float],
    window: int = 30,
    pre: str = "<em>",
    post: str = "</em>",
    analyzer: Optional[StandardAnalyzer] = None,
) -> str:
    """Best passage of ``text`` with matched terms wrapped."""
    analyzer = analyzer or StandardAnalyzer()
    from lucene_solr_ray.analysis.tokenizer import tokenize_with_offsets

    offs = tokenize_with_offsets(text)
    if not offs:
        return ""
    s, e, _ = best_passage(text, term_weights, window, analyzer)
    s = min(s, len(offs) - 1)
    e = min(e, len(offs))
    char_s = offs[s][1]
    char_e = offs[e - 1][2] if e > s else offs[s][2]
    out = []
    pos = char_s
    for tok, ts, te in offs[s:e]:
        from lucene_solr_ray.analysis.analyzer import lowercase

        if lowercase(tok) in term_weights:
            out.append(text[pos:ts])
            out.append(pre + text[ts:te] + post)
            pos = te
    out.append(text[pos:char_e])
    return "".join(out)


def highlight_batch(ds, text_col: str, term_weights: Dict[str, float],
                    out_col: str = "snippet", window: int = 30):
    """map_batches highlighting stage over fetched hits."""
    import pyarrow as pa

    def _hl(t: pa.Table) -> pa.Table:
        snips = [
            highlight(v or "", term_weights, window)
            for v in t.column(text_col).to_pylist()
        ]
        return t.append_column(out_col, pa.array(snips, pa.string()))

    return ds.map_batches(_hl, batch_format="pyarrow")


def highlight_from_index(
    index, doc_id: int, text: str, term_weights: Dict[str, float],
    window: int = 30, pre: str = "<em>", post: str = "</em>",
    readers: "Optional[Dict[str, object]]" = None,
) -> str:
    """Highlight using the INDEXED char offsets (offsets-enabled index,
    DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS) — no re-tokenization of the
    stored text, the FastVectorHighlighter idea (reference
    ``lucene/highlighter/.../vectorhighlight``): fetch each query term's
    (start, end) spans for the doc from its postings, pick the window with
    the max summed weight of distinct covered terms, wrap the spans."""
    from lucene_solr_ray.search.reader import SegmentReader

    spans = []  # (start, end, term)
    # pass a shared ``readers`` dict when highlighting many docs: loading a
    # SegmentReader per call re-reads the segment's whole postings table
    if readers is None:
        readers = {}
    for seg_dir in index.seg_dirs:
        reader = readers.get(seg_dir)
        if reader is None:
            reader = SegmentReader(seg_dir, load_positions=True)
            readers[seg_dir] = reader
        idx = np.searchsorted(reader.doc_ids, doc_id)
        if idx >= reader.ndocs or reader.doc_ids[idx] != doc_id:
            continue
        for term in term_weights:
            hit = reader.offsets(term)
            if hit is None:
                continue
            ords, offfn = hit
            j = np.searchsorted(ords, idx)
            if j < len(ords) and ords[j] == idx:
                for s0, e0 in offfn(int(j)):
                    spans.append((int(s0), int(e0), term))
        break
    if not spans:
        return ""
    spans.sort()
    # best window: char window sized ~window tokens (approx 8 chars/token)
    char_w = window * 8
    best = (0.0, spans[0][0])
    for s0, _e, _t in spans:
        covered = {t for (a, b, t) in spans if s0 <= a and b <= s0 + char_w}
        score = sum(term_weights[t] for t in covered)
        if score > best[0]:
            best = (score, s0)
    w_start = best[1]
    w_end = min(len(text), w_start + char_w)
    out = []
    pos = w_start
    for a, b, _t in spans:
        if a < w_start or b > w_end:
            continue
        out.append(text[pos:a])
        out.append(pre + text[a:b] + post)
        pos = b
    out.append(text[pos:w_end])
    return "".join(out)
