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

__all__ = ["read_line_docs", "read_trec_docs", "to_corpus_parquet"]

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


def read_trec_docs(paths: Sequence[str] | str):
    """TREC SGML corpus files → Dataset(docno, date, text) — the
    ``TrecContentSource`` role (reference ``lucene/benchmark/.../feeds/
    TrecContentSource.java:65``: scan to ``<DOC>``, capture
    ``<DOCNO>…</DOCNO>``, body until ``</DOC>``; ``TrecDocParser``
    strips the remaining tags).

    Ray shape: one task per FILE (``read_binary_files`` — TREC corpora
    ship as many mid-sized files, the natural split unit), a stateless
    flat-map parse per file; no driver-side content."""
    import re as _re

    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)
    doc_re = _re.compile(rb"<DOC>(.*?)</DOC>", _re.S)
    docno_re = _re.compile(rb"<DOCNO>\s*(.*?)\s*</DOCNO>", _re.S)
    date_re = _re.compile(rb"<DATE>\s*(.*?)\s*</DATE>", _re.S)
    tag_re = _re.compile(rb"<[^>]+>")

    def _parse(t: pa.Table) -> pa.Table:
        docnos, dates, texts, srcs = [], [], [], []
        for path, blob in zip(t.column("path").to_pylist(),
                              t.column("bytes").to_pylist()):
            for m in doc_re.finditer(blob):
                body = m.group(1)
                dn = docno_re.search(body)
                dt = date_re.search(body)
                # remove header fields, then strip remaining SGML tags
                stripped = docno_re.sub(b"", body)
                stripped = date_re.sub(b"", stripped)
                stripped = tag_re.sub(b" ", stripped)
                docnos.append(
                    dn.group(1).decode("utf-8", "replace") if dn else "")
                dates.append(
                    dt.group(1).decode("utf-8", "replace") if dt else "")
                texts.append(
                    " ".join(stripped.decode("utf-8", "replace").split()))
                srcs.append(path)
        return pa.table({
            "docno": pa.array(docnos, pa.string()),
            "date": pa.array(dates, pa.string()),
            "text": pa.array(texts, pa.string()),
            "src_file": pa.array(srcs, pa.string()),
        })

    return ds.map_batches(_parse, batch_format="pyarrow")
