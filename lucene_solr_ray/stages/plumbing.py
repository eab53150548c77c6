"""Plumbing streams — the trivial TupleStream decorators (SURVEY §2.9).

Reference classes in ``solr/solrj/src/java/org/apache/solr/client/solrj/
io/stream/``: LetStream/GetStream (variable binding), CellStream (wrap a
stream as a single tuple), ListStream (run streams sequentially),
TupStream (one literal tuple), EchoStream, NullStream (count-only),
PriorityStream (run A if non-empty else B).  One-liners over Datasets,
here mostly for API-surface completeness.
"""

from __future__ import annotations

from typing import Dict, List, Optional

__all__ = ["Let", "tup_stream", "echo_stream", "null_stream",
           "list_stream", "cell_stream", "priority_stream",
           "executor_stream"]


class Let:
    """LetStream/GetStream: named bindings of Datasets or values."""

    def __init__(self, **bindings):
        self._b: Dict[str, object] = dict(bindings)

    def let(self, name: str, value):
        self._b[name] = value
        return self

    def get(self, name: str):
        return self._b[name]


def tup_stream(**fields):
    """TupStream: a one-tuple Dataset of literals."""
    import ray.data

    return ray.data.from_items([dict(fields)])


def echo_stream(text: str):
    """EchoStream: a single tuple {'echo': text}."""
    return tup_stream(echo=text)


def null_stream(ds):
    """NullStream: consume the stream, emit only the tuple count."""
    return tup_stream(nullCount=ds.count())


def list_stream(*streams):
    """ListStream: concatenate streams in order (union preserving block
    order per input)."""
    out = streams[0]
    for s in streams[1:]:
        out = out.union(s)
    return out


def cell_stream(name: str, ds, limit: Optional[int] = None):
    """CellStream: materialize a (small) stream as ONE tuple holding the
    row list under ``name``."""
    rows = ds.take(limit) if limit else ds.take_all()
    return tup_stream(**{name: rows})


def priority_stream(high, low):
    """PriorityStream: emit ``high`` if it has any tuples, else ``low``."""
    probe = high.limit(1).take(1)
    return high if probe else low


def executor_stream(exprs, compile_fn, expr_col: str = "expr_s",
                    threads: int = 3):
    """ExecutorStream (reference ``solr/solrj/src/java/org/apache/solr/
    client/solrj/io/stream/ExecutorStream.java:48-60``): read tuples whose
    ``expr_s`` field names a streaming expression and execute each in a
    bounded pool, DISCARDING the inner streams' tuples (the reference is a
    fire-and-forget work dispatcher; failures are logged, not raised).

    ``compile_fn(expr) -> callable`` is the StreamFactory role.  The pool
    is a driver-side thread pool, exactly the reference's shape: the
    executor parallelizes ORCHESTRATION, while each compiled expression
    runs its own distributed Ray Data work — nesting Dataset jobs inside
    Ray tasks would deadlock the scheduler, threads don't.  Returns one
    status tuple per expression: {expr_col, ok, error}."""
    import ray.data
    from concurrent.futures import ThreadPoolExecutor

    if hasattr(exprs, "take_all"):  # Dataset of tuples
        rows = exprs.take_all()
        expr_list = [r[expr_col] for r in rows]
    else:
        expr_list = list(exprs)

    def _run(expr: str) -> Dict:
        try:
            compile_fn(expr)()
            return {expr_col: expr, "ok": True, "error": None}
        except Exception as e:  # reference logs and continues
            return {expr_col: expr, "ok": False, "error": str(e)}

    with ThreadPoolExecutor(max_workers=max(1, int(threads))) as pool:
        out = list(pool.map(_run, expr_list))
    return ray.data.from_items(out) if out else ray.data.from_items(
        [{expr_col: None, "ok": True, "error": None}]
    ).limit(0)
