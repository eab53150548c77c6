"""Driver-gated training-data pipelines (dedup, text stats, ANN) + oracles.

SQL-expressible ops get a DuckDB oracle; minhash/simhash/LSH/langid are
checked rows-only by the driver and against in-repo oracles in pytest.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from lucene_solr_ray.functions import ann, dedup, textstats

__all__ = ["QUERIES", "ORACLES"]


def _docs(sf_dir: str):
    # heavy text rows: split into ~256-doc blocks so shingle/signature
    # stages parallelize even off single-row-group files
    from lucene_solr_ray.sources.parquet import split_read

    return split_read(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"], rows_per_block=256,
    )


# -- exact dedup ------------------------------------------------------------

def dedup_exact(sf_dir: str) -> pd.DataFrame:
    out = dedup.exact_dedup(_docs(sf_dir), "text", "doc_id").to_pandas()
    out = out[["keep_id", "n_dups"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("keep_id").reset_index(drop=True)


DEDUP_EXACT_SQL = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY text ORDER BY keep_id
"""


# -- token counts / quality --------------------------------------------------

def token_count_docs(sf_dir: str) -> pd.DataFrame:
    out = textstats.token_counts(_docs(sf_dir), "text", "doc_id").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


TOKEN_COUNT_SQL = """
SELECT doc_id,
  CAST(CASE WHEN text = '' THEN 0
            ELSE array_length(string_split(text, ' ')) END AS BIGINT) AS n_tokens
FROM documents ORDER BY doc_id
"""


def quality_docs(sf_dir: str) -> pd.DataFrame:
    out = textstats.quality_scores(_docs(sf_dir), "text", "doc_id").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUALITY_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE text <> ''
),
agg AS (
  SELECT doc_id,
    COUNT(*) AS n_tokens,
    COUNT(DISTINCT term) AS n_uniq,
    SUM(CASE WHEN term IN ('a','an','and','are','as','at','be','but','by',
      'for','if','in','into','is','it','no','not','of','on','or','such',
      'that','the','their','then','there','these','they','this','to','was',
      'will','with') THEN 1 ELSE 0 END) AS n_stop,
    SUM(length(term)) AS sum_len
  FROM tok GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(COALESCE(a.n_uniq, 0) AS BIGINT) AS n_uniq,
  COALESCE(ROUND(a.n_stop / CAST(a.n_tokens AS DOUBLE), 6), 0.0) AS stop_ratio,
  COALESCE(ROUND(a.sum_len / CAST(a.n_tokens AS DOUBLE), 6), 0.0) AS avg_token_len
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id
"""


# -- fingerprints ------------------------------------------------------------

def fingerprint_docs(sf_dir: str) -> pd.DataFrame:
    out = textstats.fingerprint_md5(_docs(sf_dir), "text", "doc_id").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


FINGERPRINT_SQL = """
SELECT doc_id, md5(text) AS fingerprint FROM documents ORDER BY doc_id
"""


# -- ANN: brute-force cosine top-k -------------------------------------------

_ANN_K = 5
_ANN_NQ = 10


def ann_cosine_topk(sf_dir: str) -> pd.DataFrame:
    import ray.data

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qdf = qt.slice(0, _ANN_NQ)
    queries = np.asarray(qdf.column("embedding").to_pylist(), dtype=np.float64)
    qids = np.asarray(qdf.column("vec_id").to_pylist(), dtype=np.int64)

    from lucene_solr_ray.sources.parquet import split_read

    ds = split_read(emb_path, columns=["vec_id", "embedding"],
                    rows_per_block=256)
    out = ann.brute_force_topk(
        ds, queries, qids, "embedding", "vec_id", k=_ANN_K
    )
    out["cosine"] = out["cosine"].round(6)
    return out.reset_index(drop=True)


ANN_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {_ANN_NQ}
),
pairs AS (
  SELECT q.qid, e.vec_id,
    list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS cosine
  FROM q CROSS JOIN embeddings e
),
ranked AS (
  SELECT qid, vec_id, cosine,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk
  FROM pairs
)
SELECT qid, vec_id, ROUND(cosine, 6) AS cosine
FROM ranked WHERE rnk <= {_ANN_K} ORDER BY qid, rnk
"""


def ngram_jaccard_docs(sf_dir: str) -> pd.DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs over doc_id < 300 with the
    stop-gram df cap — the SQL oracle replays the capped gram space and
    the exact similarity (dedup family: the n-gram Jaccard entry)."""
    ds = _docs(sf_dir).filter(expr="doc_id < 300")
    out = dedup.ngram_jaccard_pairs(
        ds, "text", "doc_id", k=3, threshold=0.35, max_gram_df=64
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


NGRAM_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents WHERE doc_id < 300 AND text <> ''
),
g0 AS (
  SELECT doc_id,
         array_to_string(list_slice(t, i + 1, i + 3), ' ') AS gram
  FROM (
    SELECT doc_id, t, unnest(range(len(t) - 2)) AS i
    FROM toks WHERE len(t) >= 3
  )
),
g AS (SELECT DISTINCT doc_id, gram FROM g0),
keep AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= 64),
gk AS (SELECT g.* FROM g JOIN keep USING (gram)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM gk GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM gk a JOIN gk b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
  ROUND(i / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.35
ORDER BY id_a, id_b
"""


# -- rows-only ops (non-SQL-expressible; pytest carries the oracles) ---------

def minhash_pairs(sf_dir: str) -> pd.DataFrame:
    out = dedup.minhash_lsh_pairs(
        _docs(sf_dir), "text", "doc_id", jaccard_threshold=0.5
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def simhash_pairs(sf_dir: str) -> pd.DataFrame:
    out = dedup.simhash_groups(_docs(sf_dir), "text", "doc_id").to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "hamming": pd.Series([], dtype="int64")}
        )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def langid_docs(sf_dir: str) -> pd.DataFrame:
    out = textstats.langid(_docs(sf_dir)).to_pandas()
    return out[["doc_id", "lang_pred", "lang_conf"]].sort_values(
        "doc_id"
    ).reset_index(drop=True)


def embedding_neardups(sf_dir: str) -> pd.DataFrame:
    import ray.data

    from lucene_solr_ray.sources.parquet import split_read

    ds = split_read(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"], rows_per_block=256,
    )
    out = dedup.embedding_near_dups(
        ds, "embedding", "vec_id", threshold=0.5
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
    out["cosine"] = out["cosine"].round(6)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def ann_lsh_topk(sf_dir: str) -> pd.DataFrame:
    import ray.data

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qdf = qt.slice(0, _ANN_NQ)
    queries = np.asarray(qdf.column("embedding").to_pylist(), dtype=np.float64)
    qids = np.asarray(qdf.column("vec_id").to_pylist(), dtype=np.int64)
    from lucene_solr_ray.sources.parquet import split_read

    ds = split_read(emb_path, columns=["vec_id", "embedding"],
                    rows_per_block=256)
    out = ann.lsh_topk(ds, queries, qids, "embedding", "vec_id", k=_ANN_K)
    out["cosine"] = out["cosine"].round(6)
    return out.reset_index(drop=True)


QUERIES = {
    "dedup_exact": dedup_exact,
    "token_count_docs": token_count_docs,
    "quality_docs": quality_docs,
    "fingerprint_docs": fingerprint_docs,
    "ann_cosine_topk": ann_cosine_topk,
    "ngram_jaccard_docs": ngram_jaccard_docs,
    "minhash_pairs": minhash_pairs,
    "simhash_pairs": simhash_pairs,
    "langid_docs": langid_docs,
    "embedding_neardups": embedding_neardups,
    "ann_lsh_topk": ann_lsh_topk,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "token_count_docs": TOKEN_COUNT_SQL,
    "quality_docs": QUALITY_SQL,
    "fingerprint_docs": FINGERPRINT_SQL,
    "ann_cosine_topk": ANN_SQL,
    "ngram_jaccard_docs": NGRAM_JACCARD_SQL,
}


def _langid_sql() -> str:
    """DuckDB oracle for the trigram language-ID heuristic: hits per
    language = number of profile trigrams PRESENT in the lowered text
    (set membership == strpos > 0), winner = max hits with ties to the
    earlier profile, 'und' at zero hits, conf = hits/10."""
    from lucene_solr_ray.functions.textstats import _LANG_PROFILES

    per_lang = []
    for ordi, (lang, tris) in enumerate(_LANG_PROFILES.items()):
        hits = " + ".join(
            "CASE WHEN strpos(lower(text), '{}') > 0 THEN 1 ELSE 0 END"
            .format(t.replace("'", "''")) for t in tris
        )
        per_lang.append(
            f"SELECT doc_id, '{lang}' AS lang, {ordi} AS ord, "
            f"({hits}) AS hits FROM documents"
        )
    union = "\nUNION ALL\n".join(per_lang)
    return f"""
WITH scores AS (
{union}
),
best AS (
  SELECT doc_id, lang, hits,
    ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY hits DESC, ord ASC) AS rn
  FROM scores
)
SELECT doc_id,
  CASE WHEN hits = 0 THEN 'und' ELSE lang END AS lang_pred,
  ROUND(hits / 10.0, 6) AS lang_conf
FROM best WHERE rn = 1 ORDER BY doc_id
"""


ORACLES["langid_docs"] = _langid_sql()


def ann_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF (cluster-partitioned) ANN gate — rows-only (approximate by
    design; pytest asserts recall vs the exact oracle)."""
    import hashlib as _h

    import ray.data

    from lucene_solr_ray.functions.ann import build_ivf_index, ivf_topk

    from lucene_solr_ray.sources.parquet import split_read

    ds = split_read(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"], rows_per_block=256,
    )
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["embedding"])
    Q = np.asarray(t.column("embedding").to_pylist()[:5], dtype=np.float64)
    qids = np.arange(5)
    key = _h.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out_dir = os.path.join("/tmp", f"lsr_ivf_{key}")
    if not os.path.exists(os.path.join(out_dir, "centroids.npy")):
        build_ivf_index(ds, "embedding", "vec_id", out_dir,
                        n_clusters=16, sample_size=2000)
    out = ivf_topk(out_dir, Q, qids, "embedding", "vec_id", k=10,
                   n_probe=8)
    out["cosine"] = out["cosine"].round(6)
    return out.sort_values(["qid", "cosine", "vec_id"],
                           ascending=[True, False, True]
                           ).reset_index(drop=True)


QUERIES["ann_ivf_topk"] = ann_ivf_topk


def winnow_docs(sf_dir: str) -> pd.DataFrame:
    """Winnowing fingerprints gate (k=8 char-grams, window 4) over the
    first 50 documents — SQL-matched: DuckDB reproduces the rightmost-min
    selection with the same md5-hex ordering."""
    from lucene_solr_ray.functions.textstats import winnow_fingerprints

    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    ).filter(expr="doc_id < 50")
    out = winnow_fingerprints(ds, "text", "doc_id").to_pandas()
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True)


WINNOW_SQL = """
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 50
),
grams AS (
  SELECT d.doc_id, g.i AS pos, md5(substr(d.text, g.i + 1, 8)) AS h
  FROM docs d
  CROSS JOIN LATERAL (
    SELECT unnest(range(0, GREATEST(length(d.text) - 8 + 1, 0))) AS i
  ) g
),
nk AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
wins AS (
  -- window j covers positions [j, j+3]; rightmost minimal hash per window
  SELECT g.doc_id, w.j,
    (SELECT p.pos FROM grams p
     WHERE p.doc_id = g.doc_id AND p.pos BETWEEN w.j AND w.j + 3
     ORDER BY p.h ASC, p.pos DESC LIMIT 1) AS sel
  FROM (SELECT DISTINCT doc_id FROM grams) g
  CROSS JOIN LATERAL (
    SELECT unnest(range(0, GREATEST(
      (SELECT n FROM nk WHERE nk.doc_id = g.doc_id) - 4 + 1, 1
    ))) AS j
  ) w
)
SELECT DISTINCT g.doc_id, g.pos, g.h AS fp
FROM wins w JOIN grams g
  ON g.doc_id = w.doc_id AND g.pos = w.sel
ORDER BY g.doc_id, g.pos
"""

QUERIES["winnow_docs"] = winnow_docs
ORACLES["winnow_docs"] = WINNOW_SQL


def features_selection_docs(sf_dir: str) -> pd.DataFrame:
    """FeaturesSelectionStream gate: top-10 Information-Gain terms for the
    label lang=='en' over documents; SQL-matched (IG recomputed in DuckDB
    with the same clipped entropy)."""
    import ray.data

    from lucene_solr_ray.stages.ml import features_selection

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    out = features_selection(ds, "text", "lang", "doc_id", "en", top_n=10)
    out["ig"] = out["ig"].round(6)
    return out.reset_index(drop=True)


FEATURES_SEL_SQL = """
WITH lab AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos, text
  FROM documents
),
s AS (
  SELECT COUNT(*)::DOUBLE AS n, SUM(pos)::DOUBLE AS n_pos FROM lab
),
tok AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM lab WHERE text <> ''
  )
),
cnt AS (
  SELECT t.term,
    SUM(l.pos)::DOUBLE AS tp,
    COUNT(*)::DOUBLE AS tt
  FROM tok t JOIN lab l USING (doc_id)
  GROUP BY t.term
),
ig AS (
  SELECT term,
    (
      -- H(C)
      -( GREATEST(LEAST(s.n_pos / s.n, 1 - 1e-12), 1e-12)
           * log2(GREATEST(LEAST(s.n_pos / s.n, 1 - 1e-12), 1e-12))
         + (1 - GREATEST(LEAST(s.n_pos / s.n, 1 - 1e-12), 1e-12))
           * log2(1 - GREATEST(LEAST(s.n_pos / s.n, 1 - 1e-12), 1e-12)) )
      -- P(t) * H(C|t)
      - (tt / s.n) * (
        -( GREATEST(LEAST(tp / tt, 1 - 1e-12), 1e-12)
             * log2(GREATEST(LEAST(tp / tt, 1 - 1e-12), 1e-12))
           + (1 - GREATEST(LEAST(tp / tt, 1 - 1e-12), 1e-12))
             * log2(1 - GREATEST(LEAST(tp / tt, 1 - 1e-12), 1e-12)) ))
      -- P(~t) * H(C|~t)
      - ((s.n - tt) / s.n) * (
        -( GREATEST(LEAST(
              CASE WHEN s.n - tt > 0
                   THEN (s.n_pos - tp) / GREATEST(s.n - tt, 1)
                   ELSE 0 END, 1 - 1e-12), 1e-12)
             * log2(GREATEST(LEAST(
                 CASE WHEN s.n - tt > 0
                      THEN (s.n_pos - tp) / GREATEST(s.n - tt, 1)
                      ELSE 0 END, 1 - 1e-12), 1e-12))
           + (1 - GREATEST(LEAST(
                 CASE WHEN s.n - tt > 0
                      THEN (s.n_pos - tp) / GREATEST(s.n - tt, 1)
                      ELSE 0 END, 1 - 1e-12), 1e-12))
             * log2(1 - GREATEST(LEAST(
                 CASE WHEN s.n - tt > 0
                      THEN (s.n_pos - tp) / GREATEST(s.n - tt, 1)
                      ELSE 0 END, 1 - 1e-12), 1e-12)) ))
    ) AS ig
  FROM cnt CROSS JOIN s
)
SELECT term, ROUND(ig, 6) AS ig FROM ig
ORDER BY ig DESC, term LIMIT 10
"""

QUERIES["features_selection_docs"] = features_selection_docs
ORACLES["features_selection_docs"] = FEATURES_SEL_SQL


def text_logit_docs(sf_dir: str) -> pd.DataFrame:
    """TextLogitStream gate (rows-only: iterative float accumulation):
    train lang=='en' classifier on documents over the IG-selected
    features; returns (feature, weight round-3)."""
    import ray.data

    from lucene_solr_ray.stages.ml import TextLogit, features_selection

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    feats = list(
        features_selection(ds, "text", "lang", "doc_id", "en",
                           top_n=5).term
    )
    model = TextLogit(feats, lr=1.0, iterations=10)
    model.fit(ds, "text", "lang", "en")
    return pd.DataFrame(
        {"feature": feats + ["__bias__"],
         "weight": np.round(model.weights, 3)}
    )


QUERIES["text_logit_docs"] = text_logit_docs


# -- SimpleNaiveBayes classification (gated + SQL) ---------------------------

#: the gate classifies the first 5 non-empty docs against the full corpus
_NB_INPUTS = 5


def nb_classify_docs(sf_dir: str) -> pd.DataFrame:
    """Per-class log scores of the reference's add-1-smoothed naive Bayes
    (SimpleNaiveBayesClassifier) for the first 5 non-empty documents,
    with `lang` as the class field.  SQL-matched — the prior/likelihood
    sums are exact SQL."""
    import ray.data

    from lucene_solr_ray.functions.classify import naive_bayes_classify

    head = (
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    head = head[head["text"].fillna("") != ""].head(_NB_INPUTS)
    inputs = list(zip(head["doc_id"].astype(int), head["text"]))
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    out = naive_bayes_classify(ds, "text", "lang", inputs)
    out["input_id"] = out["input_id"].astype("int64")
    return out.sort_values(["input_id", "label"]).reset_index(drop=True)


NB_CLASSIFY_SQL = f"""
WITH inputs AS (
  SELECT doc_id, text FROM documents WHERE text <> ''
  ORDER BY doc_id LIMIT {_NB_INPUTS}
),
itok AS (
  SELECT doc_id AS input_id, unnest(string_split(text, ' ')) AS term
  FROM inputs
),
ctok AS (
  SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE text <> ''
),
classes AS (SELECT lang, COUNT(*) AS df_c FROM documents GROUP BY lang),
consts AS (
  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM ctok)
           / (SELECT COUNT(*) FROM documents WHERE text <> '') AS avg_uniq,
         (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs
),
wc AS (SELECT term, lang, COUNT(*) AS hits FROM ctok GROUP BY term, lang)
SELECT i.input_id, c.lang AS label,
  ROUND(
    ln(c.df_c / x.n_docs)
    + SUM(ln((COALESCE(w.hits, 0) + 1)
             / (x.avg_uniq * c.df_c + x.n_docs))),
  6) AS log_score
FROM itok i CROSS JOIN classes c CROSS JOIN consts x
LEFT JOIN wc w ON w.term = i.term AND w.lang = c.lang
GROUP BY i.input_id, c.lang, c.df_c, x.avg_uniq, x.n_docs
ORDER BY input_id, label
"""

QUERIES["nb_classify_docs"] = nb_classify_docs
ORACLES["nb_classify_docs"] = NB_CLASSIFY_SQL


# -- ModelStream + ClassifyStream (gated + SQL) ------------------------------

#: fixed logistic-regression model for the gate — bias-first weights over
#: common corpus terms (a trained TextLogit tuple would drift per-SF; the
#: stream semantics under test are storage + scoring, not training)
_CLS_TERMS = ["sort", "order", "join", "filter", "slow"]
_CLS_WEIGHTS = [-0.5, 0.8, -0.3, 0.6, 0.4, -0.7]  # bias first
_CLS_IDFS = [1.1, 1.3, 0.9, 1.2, 1.5]


def classify_stream_docs(sf_dir: str) -> pd.DataFrame:
    """ModelStream → ClassifyStream composite gate (ClassifyStream.java:
    140-176): persist a model generation, fetch the latest via
    model_stream, score every document with the reference's exact
    tf=1+ln(count), feature=idf·tf, sigmoid probability and
    total/sqrt(termCount) score.  SQL-matched."""
    import tempfile

    import ray.data

    from lucene_solr_ray.stages.model import (classify_stream, load_model,
                                              save_model)

    with tempfile.TemporaryDirectory() as mdir:
        save_model(mdir, "g", _CLS_TERMS, [0.0] * 6, iteration=0)
        save_model(mdir, "g", _CLS_TERMS, _CLS_WEIGHTS, _CLS_IDFS,
                   iteration=3)
        model = load_model(mdir, "g")  # latest generation wins
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    out = classify_stream(ds, model, "text").to_pandas()
    out["probability_d"] = out["probability_d"].round(6)
    out["score_d"] = out["score_d"].round(6)
    return out[["doc_id", "probability_d", "score_d"]].sort_values(
        "doc_id").reset_index(drop=True)


_CLS_MODEL_SQL = " UNION ALL ".join(
    f"SELECT '{t}' AS term, {w} AS w, {i} AS idf"
    for t, w, i in zip(_CLS_TERMS, _CLS_WEIGHTS[1:], _CLS_IDFS)
)

CLASSIFY_STREAM_SQL = f"""
WITH model AS ({_CLS_MODEL_SQL}),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE text <> ''
),
tf AS (
  SELECT doc_id, term, COUNT(*)::DOUBLE AS f FROM tok GROUP BY doc_id, term
),
tc AS (
  SELECT doc_id,
         CASE WHEN text = '' THEN 0
              ELSE array_length(string_split(text, ' ')) END::DOUBLE AS n
  FROM documents
),
totals AS (
  SELECT d.doc_id,
         {_CLS_WEIGHTS[0]} + COALESCE(SUM(
           m.idf * (1.0 + ln(tf.f)) * m.w), 0.0) AS total
  FROM documents d
  LEFT JOIN tf ON tf.doc_id = d.doc_id
  LEFT JOIN model m ON m.term = tf.term
  GROUP BY d.doc_id
)
SELECT t.doc_id,
       ROUND(1.0 / (1.0 + exp(-t.total)), 6) AS probability_d,
       ROUND(t.total / sqrt(GREATEST(tc.n, 1.0)), 6) AS score_d
FROM totals t JOIN tc USING (doc_id)
ORDER BY doc_id
"""

QUERIES["classify_stream_docs"] = classify_stream_docs
ORACLES["classify_stream_docs"] = CLASSIFY_STREAM_SQL


# -- tokenizer factories (round 5) -------------------------------------------

def path_hierarchy_docs(sf_dir: str) -> pd.DataFrame:
    """Tokenizer-factory gate: PathHierarchyTokenizer over a synthesized
    ``source/lang`` path column — every prefix path is a term (reference
    ``analysis/path/PathHierarchyTokenizer.java:33``), counted with one
    token-hash groupby; the oracle replays the two prefix levels with a
    UNION ALL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from lucene_solr_ray.analysis.filters import CustomAnalyzer
    from lucene_solr_ray.analysis.tokenizers import PathHierarchyTokenizer
    from lucene_solr_ray.sources.parquet import split_read
    from ray.data.aggregate import Sum

    ds = split_read(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["source", "lang"], rows_per_block=256,
    )

    class _Explode:
        """Actor-pool stage: the analyzer builds once per actor."""

        def __init__(self):
            self.an = CustomAnalyzer(tokenizer=PathHierarchyTokenizer())

        def __call__(self, t: pa.Table) -> pa.Table:
            paths = pc.binary_join_element_wise(
                t.column("source").cast(pa.string()),
                t.column("lang").cast(pa.string()), "/",
            )
            # per-batch partial counts: only (tok, n) rows shuffle
            counts: dict = {}
            for p in paths.to_pylist():
                for tok in self.an.analyze(p):
                    counts[tok] = counts.get(tok, 0) + 1
            return pa.table({
                "tok": pa.array(list(counts), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            })

    out = (
        ds.map_batches(_Explode, batch_format="pyarrow", concurrency=2)
        .groupby("tok").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values("tok").reset_index(drop=True)


PATH_HIERARCHY_SQL = """
SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT source AS tok FROM documents
  UNION ALL
  SELECT source || '/' || lang FROM documents
) GROUP BY tok ORDER BY tok
"""

QUERIES["path_hierarchy_docs"] = path_hierarchy_docs
ORACLES["path_hierarchy_docs"] = PATH_HIERARCHY_SQL
