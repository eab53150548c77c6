"""Line-oriented corpus sources — the benchmark content-source family.

The reference's feeders (``lucene/benchmark/src/java/org/apache/lucene/
benchmark/byTask/feeds/LineDocSource.java`` — one doc per line, optional
TAB-separated title/date/body; ``EnwikiContentSource``,
``ReutersContentSource``) re-expressed as Ray Data reads:

- :func:`read_line_docs` — ``ray.data.read_text`` + a vectorized parse
  into the corpus schema (doc ids assigned deterministically per the
  engine's docID rule when written through ``to_corpus_parquet``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pyarrow as pa

__all__ = ["read_line_docs", "to_corpus_parquet"]

#: LineDocSource's field separator (``WriteLineDocTask.SEP``)
SEP = "\t"


def read_line_docs(paths: Sequence[str] | str, sep: str = SEP):
    """One document per line; ``title<TAB>date<TAB>body`` lines get all
    three columns, bare lines land in ``body`` (LineDocSource semantics)."""
    import ray.data

    ds = ray.data.read_text(paths)

    def _parse(t: pa.Table) -> pa.Table:
        titles, dates, bodies = [], [], []
        for line in t.column("text").to_pylist():
            parts = (line or "").split(sep, 2)
            if len(parts) == 3:
                titles.append(parts[0])
                dates.append(parts[1])
                bodies.append(parts[2])
            else:
                titles.append("")
                dates.append("")
                bodies.append(line or "")
        return pa.table(
            {
                "title": pa.array(titles, pa.string()),
                "date": pa.array(dates, pa.string()),
                "body": pa.array(bodies, pa.string()),
            }
        )

    return ds.map_batches(_parse, batch_format="pyarrow")


def to_corpus_parquet(ds, out_dir: str, body_col: str = "body") -> List[str]:
    """Persist a line-doc stream as corpus parquet shards ready for
    ``build_index`` (deterministic doc ids come from the build's
    row-position rule over the written files)."""
    ds.write_parquet(out_dir)
    import os

    return sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )


def corpus_from_jsonl(path: str, text_field: str, id_field: str = None):
    """JSON-lines content feed → the engine's corpus schema (doc_id, text)
    (the Solr JSON update-handler ingest shape; ray.data parses JSON
    natively, this wrapper just projects/renames)."""
    import pyarrow as pa
    import ray.data

    ds = ray.data.read_json(path)

    def _project(t: pa.Table) -> pa.Table:
        cols = {"text": t.column(text_field).cast(pa.string())}
        if id_field is not None:
            cols = {"doc_id": t.column(id_field).cast(pa.int64()), **cols}
        return pa.table(cols)

    return ds.map_batches(_project, batch_format="pyarrow")


def corpus_from_csv(path: str, text_field: str, id_field: str = None):
    """CSV content feed → corpus schema (the CSV update handler)."""
    import pyarrow as pa
    import ray.data

    ds = ray.data.read_csv(path)

    def _project(t: pa.Table) -> pa.Table:
        cols = {"text": t.column(text_field).cast(pa.string())}
        if id_field is not None:
            cols = {"doc_id": t.column(id_field).cast(pa.int64()), **cols}
        return pa.table(cols)

    return ds.map_batches(_project, batch_format="pyarrow")
