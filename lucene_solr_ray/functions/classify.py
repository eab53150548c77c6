"""KNN text classification over the BM25 index.

The classification-module role (reference ``lucene/classification/`` —
3,065 LoC: ``KNearestNeighborClassifier`` runs a MoreLikeThis query and
majority-votes the top-k neighbors' class field).  Here: MLT term
selection → BM25 top-k → fetch the label column → weighted vote.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["knn_classify", "naive_bayes_classify", "bm25nb_classify"]


def knn_classify(
    index,
    text: str,
    label_table: str,
    label_col: str,
    id_col: str = "doc_id",
    k: int = 10,
    max_query_terms: int = 15,
    weighted: bool = True,
    similarity=None,
) -> Tuple[Optional[str], float]:
    """(predicted label, confidence = winning weight share)."""
    from lucene_solr_ray.search.fetch import fetch_from_corpus

    hits = index.more_like_this(
        text, k=k, max_query_terms=max_query_terms, similarity=similarity
    )
    if hits.num_rows == 0:
        return None, 0.0
    fetched = fetch_from_corpus(hits, label_table, id_col, [label_col])
    votes: defaultdict = defaultdict(float)
    for row in fetched.to_pylist():
        w = float(row["score"]) if weighted else 1.0
        votes[row[label_col]] += w
    total = sum(votes.values()) or 1.0
    best = max(votes.items(), key=lambda kv: (kv[1], kv[0]))
    return best[0], best[1] / total


# ---------------------------------------------------------------------------
# SimpleNaiveBayesClassifier — distributed count collection
# ---------------------------------------------------------------------------

def naive_bayes_classify(ds, text_col: str, class_col: str, inputs):
    """Per-input per-class log scores of the reference's add-1-smoothed
    naive Bayes (``lucene/classification/src/java/org/apache/lucene/
    classification/SimpleNaiveBayesClassifier.java:135-268``):

      logPrior(c)       = ln(docFreq(c)) − ln(docsWithClass)
      logLikelihood(d,c) = Σ_{w ∈ tokens(d)} ln((hits(w,c) + 1) /
                            (avgUniqueTerms · docFreq(c) + docsWithClass))

    with hits(w,c) = docs of class c containing w, avgUniqueTerms =
    sumDocFreq/docCount of the text field (``getTextTermFreqForClass``).
    Tokenization is whitespace split — the repo's SQL-parity convention.

    Ray shape: the input vocabulary broadcasts once (``ray.put``); ONE
    ``map_batches`` pass over the labeled corpus emits vocab-pruned
    (term, class, count) partials plus per-class doc counts and the
    distinct-token scalar partials; a tiny-row ``groupby`` folds them —
    the shuffle is bounded by |input vocab| × |classes|, never corpus
    rows.  The driver then scores each input locally (classes × tokens
    arithmetic on driver-sized tables).

    ``inputs`` is a list of (input_id, text).  Returns a pandas frame
    (input_id, label, log_score) sorted by (input_id, label).
    """
    import ray

    vocab = sorted({w for _, txt in inputs for w in (txt or "").split()})
    vocab_ref = ray.put(frozenset(vocab))

    def _partials(t: pa.Table) -> pa.Table:
        voc = ray.get(vocab_ref)
        texts = t.column(text_col).to_pylist()
        classes = t.column(class_col).to_pylist()
        wc: dict = {}
        class_docs: dict = {}
        sum_distinct = 0
        docs_with_text = 0
        for txt, cls in zip(texts, classes):
            toks = set((txt or "").split())
            if toks:
                sum_distinct += len(toks)
                docs_with_text += 1
            if cls is not None:
                class_docs[cls] = class_docs.get(cls, 0) + 1
                for w in toks & voc:
                    wc[(w, cls)] = wc.get((w, cls), 0) + 1
        # \x00-prefixed sentinel terms carry the non-(term,class) partials
        # through the same groupby; keys stay non-null (Ray's sort-based
        # shuffle cannot order None against strings).
        rows = [
            {"term": w, "cls": c, "n": n} for (w, c), n in wc.items()
        ]
        rows += [
            {"term": "\x00class_docs", "cls": c, "n": n}
            for c, n in class_docs.items()
        ]
        rows.append({"term": "\x00sum_distinct", "cls": "",
                     "n": sum_distinct})
        rows.append({"term": "\x00docs_with_text", "cls": "",
                     "n": docs_with_text})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema([("term", pa.string()), ("cls", pa.string()),
                              ("n", pa.int64())]),
        )

    from ray.data.aggregate import Sum

    folded = (
        ds.select_columns([text_col, class_col])
        .map_batches(_partials, batch_format="pyarrow")
        .groupby(["term", "cls"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    hits = {}
    df_c = {}
    sum_distinct = docs_with_text = 0
    for term, cls, n in zip(folded["term"], folded["cls"], folded["n"]):
        if term == "\x00class_docs":
            df_c[cls] = int(n)
        elif term == "\x00sum_distinct":
            sum_distinct = int(n)
        elif term == "\x00docs_with_text":
            docs_with_text = int(n)
        else:
            hits[(term, cls)] = int(n)
    docs_with_class = sum(df_c.values())
    avg_uniq = sum_distinct / max(docs_with_text, 1)

    out_id, out_cls, out_score = [], [], []
    for input_id, txt in inputs:
        toks = (txt or "").split()
        for cls in sorted(df_c):
            prior = float(np.log(df_c[cls] / docs_with_class))
            den = avg_uniq * df_c[cls] + docs_with_class
            ll = 0.0
            for w in toks:
                ll += float(np.log((hits.get((w, cls), 0) + 1) / den))
            out_id.append(input_id)
            out_cls.append(cls)
            out_score.append(round(prior + ll, 6))
    return pd.DataFrame(
        {"input_id": out_id, "label": out_cls, "log_score": out_score}
    )


# ---------------------------------------------------------------------------
# BM25NBClassifier — scores from the BM25 engine itself
# ---------------------------------------------------------------------------

def bm25nb_classify(index, text: str, class_field: str,
                    class_values, text_field: Optional[str] = None,
                    analyzer=None):
    """The reference ``BM25NBClassifier.java:129-232``: per class c,

      score(c) = ln(topScore(class:c)) +
                 Σ_w ln(topScore(class:c MUST, text:w SHOULD) or 1)

    then softmax-normalized to [0,1] (``normClassificationResults`` —
    exp(x − logsumexp)).  All scores come from the engine's own BM25
    top-1 searches, issued as ONE ``search_parsed`` query batch
    ((1 + |tokens|) × |classes| queries, k=1 each — one distributed
    pass).  Returns [(class, prob)] sorted by prob desc."""
    import math

    from lucene_solr_ray.analysis.analyzer import StandardAnalyzer
    from lucene_solr_ray.search.query import (
        BooleanClause,
        BooleanQuery,
        Occur,
        TermQuery,
    )

    an = analyzer or StandardAnalyzer()
    tokens = an.analyze(text)
    parsed = []
    qmeta = {}
    qid = 0
    for c in class_values:
        cterm = TermQuery(str(c), field=class_field)
        parsed.append((qid, cterm, 1))
        qmeta[qid] = (c, None)
        qid += 1
        for w in tokens:
            q = BooleanQuery(
                (
                    BooleanClause(cterm, Occur.MUST),
                    BooleanClause(
                        TermQuery(w, field=text_field), Occur.SHOULD
                    ),
                )
            )
            parsed.append((qid, q, 1))
            qmeta[qid] = (c, w)
            qid += 1
    t = index.search_parsed(parsed)
    top = {}
    for row in t.to_pylist():
        top[row["qid"]] = float(row["score"])
    raw = []
    for c in class_values:
        score = 0.0
        for q, (cls, w) in qmeta.items():
            if cls != c:
                continue
            s = top.get(q)
            if w is None:
                if s is not None and s > 0:
                    score += math.log(s)
            else:
                score += math.log(s) if (s is not None and s > 0) else 0.0
        raw.append((c, score))
    # softmax via logsumexp, the reference normalization
    smax = max(s for _, s in raw)
    loga = smax + math.log(sum(math.exp(s - smax) for _, s in raw))
    out = [(c, math.exp(s - loga)) for c, s in raw]
    return sorted(out, key=lambda kv: (-kv[1], str(kv[0])))
