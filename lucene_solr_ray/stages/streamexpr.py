"""Streaming-expression string parser + StreamFactory.

The reference's primary streaming API is TEXTUAL: the ``/stream``
handler parses expressions like::

    rollup(search(orders, q="o_totalprice > 100", fl="o_orderpriority"),
           over="o_orderpriority", count(*), sum(o_totalprice))

through ``StreamFactory`` (``solr/solrj/src/java/org/apache/solr/client/
solrj/io/stream/expr/StreamFactory.java`` + ``StreamExpressionParser``)
into a decorator tree of TupleStreams.  This module is that surface over
the Ray-Data stages: :func:`parse_expr` produces the expression tree and
:class:`StreamFactory` compiles it onto ``stages/relational.py`` /
``stages/evaluators.py`` / ``stages/matheval.py``.

Divergence, documented: ``search(...)``'s ``q`` over a TABLE resolver is
the SQL-predicate subset (the ParallelSQL `WHERE` shape) rather than a
Lucene query string — full-text search expressions route through an
INDEX resolver (``indexes={name: Index}``) where ``q`` is the classic
query-parser string, scored BM25 like the reference's ``search``
decorator over a collection.

Supported decorators: search select rollup stats having top sort unique
merge innerJoin hashJoin leftOuterJoin intersect complement facet
cartesianProduct random let — plus the per-tuple evaluator names inside
``select``/``having`` and metric names (count/sum/min/max/avg) inside
``rollup``/``stats``/``facet``.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Tuple

import pandas as pd
import pyarrow as pa

__all__ = ["parse_expr", "StreamFactory", "StreamExprError"]


class StreamExprError(ValueError):
    pass


# -- parser (StreamExpressionParser role) ------------------------------------

_WORD = re.compile(r"[^\s(),=\"']+")


class _Node:
    """name(positional..., key=value...); values are str | _Node."""

    __slots__ = ("name", "args", "params")

    def __init__(self, name: str):
        self.name = name
        self.args: List = []
        self.params: Dict[str, object] = {}

    def __repr__(self):  # pragma: no cover
        return f"{self.name}({self.args}, {self.params})"


def _lex(s: str, i: int) -> Tuple[str, int]:
    while i < len(s) and s[i].isspace():
        i += 1
    if i >= len(s):
        return "", i
    ch = s[i]
    if ch in "(),=":
        return ch, i + 1
    if ch in "\"'":
        j = i + 1
        out = []
        while j < len(s) and s[j] != ch:
            out.append(s[j])
            j += 1
        if j >= len(s):
            raise StreamExprError(f"unterminated string at {i}")
        return "\x00" + "".join(out), j + 1  # \x00 marks a quoted literal
    m = _WORD.match(s, i)
    if not m:
        raise StreamExprError(f"cannot lex at {s[i:i+20]!r}")
    return m.group(0), m.end()


def _parse(s: str, i: int) -> Tuple[object, int]:
    tok, i = _lex(s, i)
    if tok.startswith("\x00"):
        return tok[1:], i
    save = i
    nxt, j = _lex(s, i)
    if nxt == "(":
        node = _Node(tok)
        # parse args until ')'
        tok2, k = _lex(s, j)
        if tok2 == ")":
            return node, k
        i = j
        while True:
            val, i = _parse(s, i)
            # named param? value must be a bare word followed by '='
            nxt2, j2 = _lex(s, i)
            if nxt2 == "=" and isinstance(val, str):
                pv, i = _parse(s, j2)
                node.params[val] = pv
            else:
                # juxtaposed alias: `add(a, b) as c` / `fieldA as x`
                if nxt2 == "as":
                    alias, i = _lex(s, j2)
                    if isinstance(val, _Node):
                        val.params["as"] = alias
                    else:
                        val = f"{val} as {alias}"
                node.args.append(val)
            nxt3, i = _lex(s, i)
            if nxt3 == ",":
                continue
            if nxt3 == ")":
                return node, i
            raise StreamExprError(f"expected , or ) near offset {i}")
    return tok, save


def parse_expr(s: str):
    node, i = _parse(s, 0)
    tail, _ = _lex(s, i)
    if tail:
        raise StreamExprError(f"trailing input: {tail!r}")
    return node


# -- factory ------------------------------------------------------------------

_METRICS = {"count", "sum", "min", "max", "avg"}


def _metric_spec(node: "_Node") -> Tuple[str, Optional[str], str]:
    fn = node.name
    col = node.args[0] if node.args else None
    if col == "*":
        col = None
    alias = node.params.get("as") or (f"{fn}({col})" if col else "count(*)")
    return (fn, col, alias)


def _split_list(v: str) -> List[str]:
    return [p.strip() for p in str(v).split(",") if p.strip()]


def _sort_keys(spec: str) -> Tuple[List[str], List[bool]]:
    keys, desc = [], []
    for part in _split_list(spec):
        bits = part.split()
        keys.append(bits[0])
        desc.append(len(bits) > 1 and bits[1].lower() == "desc")
    return keys, desc


class StreamFactory:
    """Compile parsed expressions onto the Ray-Data stages.

    ``tables(name)`` returns the backing Dataset for ``search`` over a
    table; ``indexes`` maps names to :class:`Index` objects for BM25
    full-text ``search``.
    """

    def __init__(self, tables: Optional[Callable[[str], object]] = None,
                 indexes: Optional[Dict[str, object]] = None):
        self.tables = tables
        self.indexes = dict(indexes or {})
        self._let_env: Dict[str, object] = {}

    def run(self, expr: str | _Node):
        node = parse_expr(expr) if isinstance(expr, str) else expr
        return self._build(node)

    # -- dispatch -----------------------------------------------------------

    def _build(self, node):
        if not isinstance(node, _Node):
            raise StreamExprError(f"expected a stream, got {node!r}")
        fn = getattr(self, f"_s_{node.name}", None)
        if fn is None:
            raise StreamExprError(f"unknown stream decorator {node.name!r}")
        return fn(node)

    # -- sources ------------------------------------------------------------

    def _s_search(self, node):
        from lucene_solr_ray.stages.sql import (
            _filter_ds,
            _lex as _sql_lex,
            _Parser as _SqlParser,
        )

        name = node.args[0]
        if name in self.indexes:
            import ray.data

            idx = self.indexes[name]
            q = node.params.get("q", "*:*")
            k = int(node.params.get("rows", 10))
            return ray.data.from_arrow(idx.search({0: str(q)}, k=k))
        if self.tables is None:
            raise StreamExprError(f"no table resolver for {name!r}")
        ds = self.tables(name)
        fl = node.params.get("fl")
        if fl:
            ds = ds.select_columns(_split_list(fl))
        q = node.params.get("q")
        if q and str(q) != "*:*":
            pred = _SqlParser(_sql_lex(str(q))).pred()
            ds = _filter_ds(ds, pred)
        srt = node.params.get("sort")
        if srt:
            keys, desc = _sort_keys(srt)
            ds = ds.sort(keys, descending=desc)
        return ds

    # -- decorators ----------------------------------------------------------

    def _s_select(self, node):
        from lucene_solr_ray.stages.evaluators import evaluate
        from lucene_solr_ray.stages.relational import select

        ds = self._build(node.args[0])
        cols, rename, exprs = [], {}, {}
        for item in node.args[1:]:
            if isinstance(item, _Node):
                # evaluator call with `as` param: select(..., add(a,b) as c)
                alias = item.params.pop("as", None)
                if alias is None:
                    raise StreamExprError(
                        "select evaluator items need `as`"
                    )
                exprs[alias] = _node_to_eval_expr(item)
                cols.append(alias)
                continue
            m = re.match(r"^(\S+)\s+as\s+(\S+)$", str(item))
            if m:
                rename[m.group(1)] = m.group(2)
                cols.append(m.group(2))
            else:
                cols.append(str(item))
        if exprs:
            ds = evaluate(ds, exprs)
        if rename:
            ds = select(ds, rename=rename)
        return select(ds, columns=cols)

    def _s_rollup(self, node):
        from lucene_solr_ray.stages.relational import rollup

        ds = self._build(node.args[0])
        over = _split_list(node.params["over"])
        spec = [_metric_spec(a) for a in node.args[1:]]
        return rollup(ds, over, spec)

    def _s_stats(self, node):
        from lucene_solr_ray.stages.relational import stats

        ds = self._build(node.args[0])
        spec = [_metric_spec(a) for a in node.args[1:]]
        row = stats(ds, spec)
        return pd.DataFrame([row])

    def _s_having(self, node):
        from lucene_solr_ray.stages.evaluators import compile_expr
        from lucene_solr_ray.stages.relational import having

        ds = self._build(node.args[0])
        fn = compile_expr(_node_to_eval_expr(node.args[1]))

        def pred(t: pa.Table):
            import numpy as np

            return pa.array(np.asarray(fn(t)).astype(bool))

        return having(ds, pred)

    def _s_top(self, node):
        ds = self._build(node.args[0])
        keys, desc = _sort_keys(node.params["sort"])
        n = int(node.params.get("n", 10))
        return ds.sort(keys, descending=desc).limit(n)

    def _s_sort(self, node):
        ds = self._build(node.args[0])
        keys, desc = _sort_keys(node.params["by"])
        return ds.sort(keys, descending=desc)

    def _s_unique(self, node):
        from lucene_solr_ray.stages.relational import unique_stream

        return unique_stream(self._build(node.args[0]),
                             _split_list(node.params["over"]))

    def _s_merge(self, node):
        from lucene_solr_ray.stages.relational import merge_stream

        out = self._build(node.args[0])
        for sub in node.args[1:]:
            out = merge_stream(out, self._build(sub))
        on = node.params.get("on")
        if on:
            keys, desc = _sort_keys(on)
            out = out.sort(keys, descending=desc)
        return out

    def _join_keys(self, node) -> Tuple[str, str]:
        on = str(node.params["on"])
        if "=" in on:
            lk, rk = on.split("=", 1)
            return lk.strip(), rk.strip()
        return on.strip(), on.strip()

    def _s_innerJoin(self, node):
        from lucene_solr_ray.stages.relational import inner_join

        lk, rk = self._join_keys(node)
        return inner_join(self._build(node.args[0]),
                          self._build(node.args[1]),
                          on=lk, right_on=rk if rk != lk else None)

    def _s_hashJoin(self, node):
        from lucene_solr_ray.stages.relational import hash_join

        lk, rk = self._join_keys(node)
        hashed = node.params.get("hashed", node.args[1]
                                 if len(node.args) > 1 else None)
        small = self._build(hashed).to_pandas()
        return hash_join(self._build(node.args[0]), small, on=[lk],
                         right_on=[rk])

    def _s_leftOuterJoin(self, node):
        from lucene_solr_ray.stages.relational import inner_join

        lk, rk = self._join_keys(node)
        return inner_join(self._build(node.args[0]),
                          self._build(node.args[1]),
                          on=lk, right_on=rk if rk != lk else None,
                          how="left_outer")

    def _s_intersect(self, node):
        from lucene_solr_ray.stages.relational import (
            intersect_stream,
            select,
        )

        lk, rk = self._join_keys(node)
        b = self._build(node.args[1])
        if rk != lk:
            b = select(b, rename={rk: lk})
        return intersect_stream(self._build(node.args[0]), b, on=lk)

    def _s_complement(self, node):
        from lucene_solr_ray.stages.relational import (
            complement_stream,
            select,
        )

        lk, rk = self._join_keys(node)
        b = self._build(node.args[1])
        if rk != lk:
            b = select(b, rename={rk: lk})
        return complement_stream(self._build(node.args[0]), b, on=lk)

    def _s_facet(self, node):
        from lucene_solr_ray.stages.relational import facet_stream

        ds = self._build(node.args[0]) if isinstance(node.args[0], _Node) \
            else self.tables(node.args[0])
        limit = node.params.get("bucketSizeLimit")
        return facet_stream(ds, str(node.params["buckets"]),
                            limit=int(limit) if limit else None)

    def _s_cartesianProduct(self, node):
        from lucene_solr_ray.stages.relational import cartesian_product

        fld = str(node.args[1])
        out_col = str(node.params.get("as", fld + "_value"))
        return cartesian_product(self._build(node.args[0]), fld, out_col)

    def _s_random(self, node):
        name = node.args[0]
        ds = self.tables(name)
        rows = int(node.params.get("rows", 10))
        seed = int(node.params.get("seed", 42))
        return ds.random_shuffle(seed=seed).limit(rows)

    def _s_parallel(self, node):
        """parallel(workers=N, stream, ...): pass-through — EVERY stage
        here already executes distributed (the reference uses parallel()
        to push a serial stream onto worker shards; Ray Data's streaming
        executor is that by construction)."""
        inner = next(a for a in node.args if isinstance(a, _Node))
        return self._build(inner)

    def _s_timeseries(self, node):
        from lucene_solr_ray.stages.relational import time_series

        ds = self._build(node.args[0]) if isinstance(node.args[0], _Node) \
            else self.tables(node.args[0])
        spec = [_metric_spec(a) for a in node.args[1:]]
        return time_series(ds, str(node.params["field"]),
                           str(node.params.get("gap", "day")), spec)

    def _s_fetch(self, node):
        """fetch(table, stream, on="streamKey=tableKey", fl="...")."""
        from lucene_solr_ray.search.fetch import fetch_stream

        table_name = node.args[0]
        ds = self._build(node.args[1])
        on = str(node.params["on"])
        if "=" in on:
            sk, tk = (p.strip() for p in on.split("=", 1))
        else:
            sk = tk = on.strip()
        cols = _split_list(node.params["fl"])
        path = node.params.get("path")
        if path is None:
            raise StreamExprError(
                "fetch() needs path=<parquet path> for the side table"
            )
        return fetch_stream(ds, str(path), tk, cols, stream_key=sk)

    def _s_significantTerms(self, node):
        from lucene_solr_ray.stages.evaluators import compile_expr
        from lucene_solr_ray.stages.relational import significant_terms

        ds = self._build(node.args[0]) if isinstance(node.args[0], _Node) \
            else self.tables(node.args[0])
        fg = compile_expr(_node_to_eval_expr(node.args[1]))

        def fg_mask(t: pa.Table):
            import numpy as np

            return pa.array(np.asarray(fg(t)).astype(bool))

        return significant_terms(
            ds, str(node.params["field"]), fg_mask,
            min_doc_freq=int(node.params.get("minDocFreq", 1)),
        )

    def _s_sql(self, node):
        from lucene_solr_ray.stages.sql import sql_dataset

        stmt = node.params.get("stmt")
        if stmt is None:
            stmt = node.args[0]
        return sql_dataset(str(stmt), self.tables)

    def _s_gatherNodes(self, node):
        """gatherNodes(edgesTable|stream, walk="from->to",
        root="a,b", maxDepthBreadth=n)."""
        from lucene_solr_ray.stages.graph import gather_nodes

        src = node.args[0]
        edges = self._build(src) if isinstance(src, _Node) \
            else self.tables(src)
        walk = str(node.params["walk"])
        fc, tc = (p.strip() for p in walk.split("->", 1))
        roots_raw = _split_list(node.params["root"])
        roots = [int(r) if re.fullmatch(r"-?\d+", r) else r
                 for r in roots_raw]
        hops = int(node.params.get("maxDepthBreadth", 1))
        return gather_nodes(edges, fc, tc, roots, hops=hops)

    def _s_shortestPath(self, node):
        from lucene_solr_ray.stages.graph import shortest_path

        src = node.args[0]
        edges = self._build(src) if isinstance(src, _Node) \
            else self.tables(src)
        walk = str(node.params["edge"])
        fc, tc = (p.strip() for p in walk.split("->", 1))

        def _coerce(v):
            v = str(v)
            return int(v) if re.fullmatch(r"-?\d+", v) else v

        path = shortest_path(
            edges, fc, tc,
            _coerce(node.params["from"]), _coerce(node.params["to"]),
            max_hops=int(node.params.get("maxDepth", 6)),
        )
        return pd.DataFrame({
            "step": range(len(path or [])),
            "node": path or [],
        })

    def _s_topic(self, node):
        """topic(indexName, q="...", checkpoint=path): one checkpointed
        micro-batch pull (TopicStream)."""
        from lucene_solr_ray.stages.streaming import TopicStream

        name = node.args[0]
        idx = self.indexes.get(name)
        index_dir = idx.index_dir if idx is not None else str(name)
        t = TopicStream(
            index_dir, str(node.params["q"]),
            checkpoint_path=node.params.get("checkpoint"),
        )
        got = t.pull(batch_size=int(node.params.get("rows", 1000)))
        import ray.data

        return ray.data.from_arrow(got)

    def _s_daemon(self, node):
        """daemon(stream, runInterval=ms, iterations=n): re-run the inner
        expression on the DaemonStream thread; returns the drained tables
        concatenated after the run-count completes (the batch analogue of
        the reference's queue drain)."""
        import time

        from lucene_solr_ray.stages.streaming import DaemonStream

        inner = node.args[0]
        iters = int(node.params.get("iterations", 1))
        interval = float(node.params.get("runInterval", 100)) / 1000.0

        def fn():
            built = self._build(inner)
            if hasattr(built, "to_arrow_refs"):
                import ray

                return pa.concat_tables(
                    [ray.get(r) for r in built.to_arrow_refs()]
                )
            return pa.Table.from_pandas(built)

        d = DaemonStream(fn, interval_s=interval).start()
        while d.iterations < iters:
            time.sleep(interval / 4 if interval else 0.01)
        d.stop()
        tables = d.drain()
        import ray.data

        return ray.data.from_arrow(pa.concat_tables(tables))

    def _s_update(self, node):
        """update(outDir, stream, partitionBy=col): resumable partitioned
        parquet sink (UpdateStream role — writes instead of returning;
        the result is the per-partition row-count receipt)."""
        from lucene_solr_ray.stages.sinks import write_partitioned

        out_dir = str(node.args[0])
        ds = self._build(node.args[1])
        written = write_partitioned(
            ds, out_dir, str(node.params["partitionBy"])
        )
        return pd.DataFrame(
            sorted(written.items()), columns=["partition", "rows"]
        )

    def _s_let(self, node):
        """let(a=stream|mathExpr, ..., expr): stream bindings materialize
        as pandas (the reference's let() is explicitly in-memory), math
        bindings and the trailing expression run through the math world."""
        from lucene_solr_ray.stages.matheval import let_eval, math_eval

        env: Dict[str, object] = {}
        for k, v in node.params.items():
            if isinstance(v, _Node) and hasattr(self, f"_s_{v.name}"):
                built = self.run(v)  # stream binding → in-memory frame
                env[k] = built.to_pandas() if hasattr(built, "to_pandas") \
                    else built
            else:
                env[k] = math_eval(_node_to_eval_expr(v), env) \
                    if isinstance(v, _Node) else math_eval(str(v), env)
        saved = self._let_env
        self._let_env = {**saved, **env}
        try:
            if node.args:
                last = node.args[-1]
                # a trailing STREAM expression (e.g. get(a), select(get(a)
                # ...)) builds through the factory with the bindings
                # visible; anything else runs through the math world
                if isinstance(last, _Node) and hasattr(
                        self, f"_s_{last.name}"):
                    return self._build(last)
                return math_eval(
                    _node_to_eval_expr(last) if isinstance(last, _Node)
                    else str(last),
                    env,
                )
            return env
        finally:
            self._let_env = saved

    def _s_get(self, node):
        """get(name): re-emit a stream bound by an enclosing let()
        (``GetStream.java:38`` — reads the stream variable from the
        StreamContext ``let`` placed it in)."""
        import ray.data

        name = str(node.args[0])
        v = self._let_env.get(name)
        if v is None:
            raise StreamExprError(f"get({name!r}): no let() binding")
        if isinstance(v, pd.DataFrame):
            return ray.data.from_pandas(v)
        if hasattr(v, "map_batches"):
            return v
        # math-world binding (vector/matrix) → one-tuple stream, the
        # shape let's own trailing-expr return takes
        return ray.data.from_items([{name: v}])

    def _s_calc(self, node):
        """calc(): a single empty tuple (``CalculatorStream.java:37``) —
        the canonical source under select(calc(), add(1, 2) as s)."""
        from lucene_solr_ray.stages.plumbing import tup_stream

        return tup_stream(_calc=1)

    def _s_plot(self, node):
        """plot(x=array(...), y=array(...), type="scatter"): one tuple
        carrying the series + plot type (``PlotStream.java``)."""
        from lucene_solr_ray.stages.matheval import math_eval

        def _series(v):
            if v is None:
                return None
            out = math_eval(
                _node_to_eval_expr(v) if isinstance(v, _Node) else str(v),
                dict(self._let_env),
            )
            return [float(x) for x in out]

        x = _series(node.params.get("x"))
        y = _series(node.params.get("y"))
        if y is None:
            raise StreamExprError("plot() needs y=")
        if x is None:
            x = [float(i) for i in range(len(y))]
        return pd.DataFrame([{
            "plot": str(node.params.get("type", "scatter")),
            "x": x, "y": y,
        }])

    def _s_reduce(self, node):
        """reduce(stream, by="a", group(sort="b desc", n=5)): one tuple
        per group — head fields + `group` = top-n maps
        (``ReducerStream.java:60`` + ``ops/GroupOperation.java:44``)."""
        from lucene_solr_ray.stages.relational import reducer_stream

        ds = self._build(node.args[0])
        op = next((a for a in node.args[1:] if isinstance(a, _Node)
                   and a.name == "group"), None)
        if op is None:
            raise StreamExprError(
                "reduce() requires a group(sort=..., n=...) operation"
            )
        keys, desc = _sort_keys(op.params["sort"])
        return reducer_stream(
            ds, _split_list(node.params["by"]), keys, desc,
            n=int(op.params.get("n", 5)),
        )

    def _s_outerHashJoin(self, node):
        """outerHashJoin(stream, hashed=small, on=...): broadcast LEFT
        join (``OuterHashJoinStream.java``) — unmatched left tuples pass
        through with nulls."""
        from lucene_solr_ray.stages.relational import hash_join

        lk, rk = self._join_keys(node)
        hashed = node.params.get("hashed", node.args[1]
                                 if len(node.args) > 1 else None)
        small = self._build(hashed).to_pandas()
        return hash_join(self._build(node.args[0]), small, on=[lk],
                         how="left", right_on=[rk])

    def _s_shuffle(self, node):
        """shuffle(collection, ...): search's /export twin — same build;
        every stage here already streams the full sorted result set
        (``ShuffleStream.java`` only changes the transport qt)."""
        return self._s_search(node)

    # -- plumbing / orchestration decorators (round 5: the textual forms
    # of the programmatic streams in stages/plumbing.py, model.py,
    # graph.py — reference solr/solrj/.../io/stream/) -----------------------

    def _s_tup(self, node):
        """tup(a=1, b="x"): one-tuple stream of literals/evaluated exprs."""
        from lucene_solr_ray.stages.matheval import math_eval
        from lucene_solr_ray.stages.plumbing import tup_stream

        def _coerce(v):
            if isinstance(v, _Node):
                return math_eval(_node_to_eval_expr(v))
            if isinstance(v, str) and re.fullmatch(r"-?\d+", v):
                return int(v)
            if isinstance(v, str) and re.fullmatch(
                    r"-?\d+\.\d+", v):
                return float(v)
            return v

        fields = {k: _coerce(v) for k, v in node.params.items()}
        return tup_stream(**fields)

    def _s_echo(self, node):
        from lucene_solr_ray.stages.plumbing import echo_stream

        return echo_stream(str(node.args[0]))

    def _s_null(self, node):
        from lucene_solr_ray.stages.plumbing import null_stream

        return null_stream(self._build(node.args[0]))

    def _s_list(self, node):
        from lucene_solr_ray.stages.plumbing import list_stream

        return list_stream(*(self._build(a) for a in node.args))

    # plist executes its operands in parallel — every stage here is
    # already distributed, so the textual form shares list()'s build
    _s_plist = _s_list

    def _s_cell(self, node):
        from lucene_solr_ray.stages.plumbing import cell_stream

        return cell_stream(str(node.args[0]), self._build(node.args[1]))

    def _s_priority(self, node):
        from lucene_solr_ray.stages.plumbing import priority_stream

        return priority_stream(
            self._build(node.args[0]), self._build(node.args[1])
        )

    def _s_executor(self, node):
        """executor(stream, threads=N): run each tuple's expr_s through
        this factory, discarding inner tuples (fire-and-forget
        dispatcher; failures are reported, not raised)."""
        import ray.data

        from lucene_solr_ray.stages.plumbing import executor_stream

        inner = self._build(node.args[0])

        def compile_fn(expr: str):
            def run():
                built = self.run(expr)
                if hasattr(built, "materialize"):
                    built.materialize()
                return built

            return run

        return executor_stream(
            inner, compile_fn,
            threads=int(node.params.get("threads", 3)),
        )

    def _s_eval(self, node):
        """eval(stream): read the FIRST tuple's expr_s and run it as a
        streaming expression (EvalStream)."""
        inner = self._build(node.args[0])
        rows = inner.take(1) if hasattr(inner, "take") else [
            inner.iloc[0].to_dict()
        ]
        if not rows:
            raise StreamExprError("eval(): inner stream is empty")
        return self.run(str(rows[0]["expr_s"]))

    def _s_model(self, node):
        """model(modelDir, modelID): the latest stored model tuple."""
        from lucene_solr_ray.stages.model import load_model

        return load_model(str(node.args[0]), str(node.args[1]))

    def _s_classify(self, node):
        """classify(model(dir, id), stream, field="text")."""
        from lucene_solr_ray.stages.model import classify_stream

        model_node, stream_node = node.args[0], node.args[1]
        model = (
            self._s_model(model_node)
            if isinstance(model_node, _Node)
            and model_node.name == "model"
            else model_node
        )
        ds = self._build(stream_node)
        return classify_stream(ds, model, str(node.params["field"]))

    def _s_scoreNodes(self, node):
        """scoreNodes(gatherNodes(...), collection, field="x",
        termFreq=col)."""
        from lucene_solr_ray.stages.graph import score_nodes

        nodes = self._build(node.args[0])
        if hasattr(nodes, "to_pandas"):
            nodes = nodes.to_pandas()
        docs = self.tables(str(node.args[1]))
        return score_nodes(
            nodes, docs, str(node.params["field"]),
            term_freq_col=str(node.params.get("termFreq", "ancestors")),
        )

    def _s_commit(self, node):
        """commit(stream): pass-through barrier — the update() sink
        commits atomically per partition already, so commit() simply
        drains its inner stream (CommitStream's wrap-the-update role)."""
        return self._build(node.args[0])

    def _s_features(self, node):
        """features(stream, field=, outcome=, positiveLabel=, numTerms=,
        id=): FeaturesSelectionStream — top-N terms by information
        gain."""
        from lucene_solr_ray.stages.ml import features_selection

        ds = self._build(node.args[0])
        return features_selection(
            ds,
            str(node.params["field"]),
            str(node.params["outcome"]),
            str(node.params.get("id", "doc_id")),
            self._coerce_scalar(node.params.get("positiveLabel", 1)),
            top_n=int(node.params.get("numTerms", 10)),
        )

    def _s_train(self, node):
        """train(stream, features(...), field=, outcome=,
        positiveLabel=, maxIterations=): TextLogitStream — returns the
        final model tuple (terms_ss, weights_ds, error)."""
        import ray.data

        from lucene_solr_ray.stages.ml import TextLogit

        ds = self._build(node.args[0])
        feats_node = node.args[1]
        feats = self._build(feats_node) if isinstance(feats_node, _Node) \
            else feats_node
        if hasattr(feats, "to_pandas"):
            feats = feats.to_pandas()
        terms = list(feats["term"]) if hasattr(feats, "__getitem__") \
            else list(feats)
        model = TextLogit(
            terms,
            iterations=int(node.params.get("maxIterations", 20)),
        )
        model.fit(
            ds, str(node.params["field"]), str(node.params["outcome"]),
            self._coerce_scalar(node.params.get("positiveLabel", 1)),
        )
        return ray.data.from_items([{
            "terms_ss": terms,
            "weights_ds": [float(w) for w in model.weights],
            "iteration_i": int(model.iterations),
            "error_d": float(model.history[-1]) if model.history else 0.0,
        }])

    def _s_knnSearch(self, node):
        """knnSearch(indexName, q="text", k=n): MoreLikeThis over an
        index resolver (KnnStream)."""
        import ray.data

        name = node.args[0]
        idx = self.indexes.get(name)
        if idx is None:
            raise StreamExprError(f"knnSearch needs an index: {name!r}")
        t = idx.more_like_this(
            str(node.params["q"]), k=int(node.params.get("k", 10)),
        )
        return ray.data.from_arrow(t)

    @staticmethod
    def _coerce_scalar(v):
        s = str(v)
        if re.fullmatch(r"-?\d+", s):
            return int(s)
        if re.fullmatch(r"-?\d+\.\d+", s):
            return float(s)
        return v


def _node_to_eval_expr(v) -> str:
    """Render a parsed evaluator subtree back to the evaluator-compiler
    string form (`gt(n, 5)` etc.)."""
    if not isinstance(v, _Node):
        return str(v)
    parts = [_node_to_eval_expr(a) for a in v.args]
    parts += [f"{k}={_node_to_eval_expr(x)}" for k, x in v.params.items()]
    return f"{v.name}({', '.join(parts)})"
