"""Two-phase fetch: score with doc_id only, then join winners to stored
fields.

The reference's distributed-query second phase (Solr
``QueryComponent`` ``PURPOSE_GET_FIELDS`` fetching stored fields for the
merged winners only — ``solr/core/.../component/QueryComponent.java:592``;
SolrJ's ``FetchStream`` batch-enrichment decorator), and Lucene's
stored-fields lookup after ``TopDocs``.

Two strategies:

- :func:`fetch_from_corpus` — winners are ≤ queries×k rows: read ONLY the
  row groups of the corpus parquet whose [min,max] doc_id stats overlap the
  winner set (predicate pushdown), then hash-join driver-side.  No full
  corpus scan, no shuffle.
- :func:`fetch_stream` — decorator form: enrich any Dataset by key from a
  parquet side table via the same pushdown + broadcast probe, for bigger
  streams (FetchStream's N-row IN query per batch).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["fetch_from_corpus", "fetch_stream"]


def fetch_from_corpus(
    results: pa.Table,
    corpus_path: str,
    key: str,
    cols: Sequence[str],
    result_key: str = "doc_id",
) -> pa.Table:
    """Join top-k ``results`` with stored columns of the corpus parquet.

    Reads only row groups whose column statistics can contain the winner
    keys (the BKD/stored-fields block pruning analogue)."""
    import pyarrow.dataset as pads

    dataset = pads.dataset(corpus_path, format="parquet")
    keys = results.column(result_key).to_pylist()
    if not keys:
        # keep the REAL column types on the empty path so schemas agree
        # with non-empty results downstream
        for c in cols:
            results = results.append_column(
                c, pa.array([], dataset.schema.field(c).type)
            )
        return results
    side = dataset.to_table(
        columns=[key, *cols], filter=pc.field(key).isin(keys)
    )
    return results.join(side, keys=result_key, right_keys=key,
                        join_type="left outer")


def fetch_stream(
    ds,
    corpus_path: str,
    key: str,
    cols: Sequence[str],
    stream_key: Optional[str] = None,
):
    """FetchStream decorator: per-batch IN-query enrichment of a Dataset.

    Each batch filters the side parquet by its own key set (row-group
    statistics prune the read), then probes — the batch analogue of
    FetchStream's windowed IN queries.  For giant batches per key range,
    swap for a hash-partitioned ``Dataset.join``."""
    stream_key = stream_key or key

    def _fetch(t: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        keys = t.column(stream_key).to_pylist()
        dataset = pads.dataset(corpus_path, format="parquet")
        side = dataset.to_table(
            columns=list(dict.fromkeys([key, *cols])),
            filter=pc.field(key).isin(keys),
        )
        return t.join(side, keys=stream_key, right_keys=key,
                      join_type="left outer")

    return ds.map_batches(_fetch, batch_format="pyarrow")
