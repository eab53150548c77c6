"""Solr SQL front-end: a SQL subset compiled onto the streaming algebra.

The reference ships a Calcite-based SQL layer that rewrites SQL onto
streaming expressions (``solr/core/src/java/org/apache/solr/handler/sql/
SolrRules.java``, ``SQLHandler.java``): SELECT → SelectStream, WHERE →
query/HavingStream, GROUP BY + aggregates → RollupStream (over a
ParallelStream), ORDER BY → SortStream, LIMIT → LimitStream.  This module
does the same compilation onto the Ray-Data stages in
``stages/relational.py``:

    sql_query("SELECT c_mktsegment, COUNT(*) AS n, SUM(o_totalprice) AS s "
              "FROM orders GROUP BY c_mktsegment "
              "HAVING n > 10 ORDER BY s DESC LIMIT 5", resolver)

Grammar subset: SELECT cols/aggs (COUNT(*)/SUM/AVG/MIN/MAX + aliases),
FROM one table, WHERE with =, <>, !=, <, <=, >, >=, AND/OR/NOT/parens and
string/number literals, GROUP BY, HAVING (over output columns), ORDER BY
(multi-key, ASC/DESC), LIMIT.  Everything aggregates/filters inside the
distributed stages; only the final (small) result is ordered driver-side.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Tuple

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["sql_query", "SqlError"]


class SqlError(ValueError):
    pass


_TOKEN = re.compile(
    r"\s*(?:(?P<num>-?\d+(?:\.\d+)?)|(?P<str>'(?:[^']|'')*')"
    r"|(?P<id>[A-Za-z_][A-Za-z_0-9]*|\*)"
    r"|(?P<op><=|>=|<>|!=|=|<|>|\(|\)|,))"
)

_KEYWORDS = {
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "and", "or", "not", "as", "asc", "desc", "count", "sum", "avg", "min",
    "max",
}


def _lex(s: str) -> List[Tuple[str, str]]:
    out: List[Tuple[str, str]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None:
            if s[pos:].strip() == "":
                break
            raise SqlError(f"cannot lex SQL at: {s[pos:]!r}")
        pos = m.end()
        if m.lastgroup == "num":
            out.append(("num", m.group("num")))
        elif m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "id":
            t = m.group("id")
            out.append(
                ("kw", t.lower()) if t.lower() in _KEYWORDS else ("id", t)
            )
        else:
            out.append(("op", m.group("op")))
    return out


class _Parser:
    def __init__(self, toks: List[Tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def take(self, kind=None, val=None):
        k, v = self.peek()
        if (kind and k != kind) or (val and v != val):
            raise SqlError(f"expected {val or kind}, got {v!r}")
        self.i += 1
        return v

    def at_kw(self, *kws):
        k, v = self.peek()
        return k == "kw" and v in kws

    # SELECT list ----------------------------------------------------------
    def select_list(self):
        items = []
        while True:
            items.append(self.select_item())
            if self.peek() == ("op", ","):
                self.take()
                continue
            return items

    def select_item(self):
        k, v = self.peek()
        if k == "kw" and v in ("count", "sum", "avg", "min", "max"):
            self.take()
            self.take("op", "(")
            col = None
            if self.peek() == ("id", "*"):
                self.take()
            else:
                col = self.take("id")
            self.take("op", ")")
            alias = self._alias() or (
                f"{v}_{col}" if col else v
            )
            if v != "count" and col is None:
                raise SqlError(f"{v.upper()} requires a column")
            return ("agg", v, col, alias)
        col = self.take("id")
        alias = self._alias() or col
        return ("col", col, None, alias)

    def _alias(self) -> Optional[str]:
        if self.at_kw("as"):
            self.take()
            return self.take("id")
        k, v = self.peek()
        if k == "id":
            self.take()
            return v
        return None

    # predicates -----------------------------------------------------------
    def pred(self):
        return self._or()

    def _or(self):
        left = self._and()
        while self.at_kw("or"):
            self.take()
            left = ("or", left, self._and())
        return left

    def _and(self):
        left = self._not()
        while self.at_kw("and"):
            self.take()
            left = ("and", left, self._not())
        return left

    def _not(self):
        if self.at_kw("not"):
            self.take()
            return ("not", self._not())
        if self.peek() == ("op", "("):
            self.take()
            p = self._or()
            self.take("op", ")")
            return p
        return self._cmp()

    def _cmp(self):
        col = self.take("id")
        op = self.take("op")
        if op not in ("=", "<>", "!=", "<", "<=", ">", ">="):
            raise SqlError(f"bad comparison operator {op!r}")
        k, v = self.peek()
        if k == "num":
            self.take()
            lit = float(v) if "." in v else int(v)
        elif k == "str":
            self.take()
            lit = v
        else:
            raise SqlError(f"expected literal, got {v!r}")
        return ("cmp", col, op, lit)


def _pred_to_arrow(p, t: pa.Table):
    kind = p[0]
    if kind == "cmp":
        _, col, op, lit = p
        c = t.column(col)
        return {
            "=": pc.equal, "<>": pc.not_equal, "!=": pc.not_equal,
            "<": pc.less, "<=": pc.less_equal, ">": pc.greater,
            ">=": pc.greater_equal,
        }[op](c, pa.scalar(lit))
    if kind == "and":
        return pc.and_(_pred_to_arrow(p[1], t), _pred_to_arrow(p[2], t))
    if kind == "or":
        return pc.or_(_pred_to_arrow(p[1], t), _pred_to_arrow(p[2], t))
    if kind == "not":
        return pc.invert(_pred_to_arrow(p[1], t))
    raise SqlError(f"bad predicate node {p!r}")


def _pred_to_pandas(p, df: pd.DataFrame):
    kind = p[0]
    if kind == "cmp":
        _, col, op, lit = p
        c = df[col]
        return {
            "=": c.eq, "<>": c.ne, "!=": c.ne, "<": c.lt, "<=": c.le,
            ">": c.gt, ">=": c.ge,
        }[op](lit)
    if kind == "and":
        return _pred_to_pandas(p[1], df) & _pred_to_pandas(p[2], df)
    if kind == "or":
        return _pred_to_pandas(p[1], df) | _pred_to_pandas(p[2], df)
    if kind == "not":
        return ~_pred_to_pandas(p[1], df)
    raise SqlError(f"bad predicate node {p!r}")


def sql_query(
    sql: str,
    resolver: Callable[[str], "object"],
) -> pd.DataFrame:
    """Parse + execute one SELECT; ``resolver(table_name)`` returns the
    backing ``ray.data.Dataset``."""
    from lucene_solr_ray.stages.relational import rollup

    p = _Parser(_lex(sql))
    p.take("kw", "select")
    items = p.select_list()
    p.take("kw", "from")
    table = p.take("id")
    where = None
    if p.at_kw("where"):
        p.take()
        where = p.pred()
    group_by: List[str] = []
    if p.at_kw("group"):
        p.take()
        p.take("kw", "by")
        group_by.append(p.take("id"))
        while p.peek() == ("op", ","):
            p.take()
            group_by.append(p.take("id"))
    having = None
    if p.at_kw("having"):
        p.take()
        having = p.pred()
    order: List[Tuple[str, bool]] = []
    if p.at_kw("order"):
        p.take()
        p.take("kw", "by")
        while True:
            c = p.take("id")
            asc = True
            if p.at_kw("asc", "desc"):
                asc = p.take() == "asc"
            order.append((c, asc))
            if p.peek() == ("op", ","):
                p.take()
                continue
            break
    limit = None
    if p.at_kw("limit"):
        p.take()
        limit = int(p.take("num"))
    if p.peek()[0] != "eof":
        raise SqlError(f"trailing tokens: {p.peek()!r}")

    ds = resolver(table)
    if where is not None:
        pred = where

        def _filt(t: pa.Table) -> pa.Table:
            return t.filter(_pred_to_arrow(pred, t))

        ds = ds.map_batches(_filt, batch_format="pyarrow")

    aggs = [it for it in items if it[0] == "agg"]
    plain = [it for it in items if it[0] == "col"]
    if aggs:
        spec = [
            (fn, col, alias) if fn != "count" else ("count", None, alias)
            for _, fn, col, alias in aggs
        ]
        if group_by:
            out = rollup(ds, group_by, spec).to_pandas()
        else:
            from lucene_solr_ray.stages.relational import stats

            row = stats(ds, spec)
            out = pd.DataFrame([{a: row[a] for _, _, a in spec}])
        # project/rename grouped keys per the select list order
        cols = []
        for it in items:
            if it[0] == "col":
                if it[1] not in group_by:
                    raise SqlError(
                        f"column {it[1]!r} not in GROUP BY"
                    )
                if it[3] != it[1]:
                    out = out.rename(columns={it[1]: it[3]})
                cols.append(it[3])
            else:
                cols.append(it[3])
        out = out[cols]
    else:
        cols = [it[1] for it in plain]
        out = ds.select_columns(cols).to_pandas()
        renames = {
            it[1]: it[3] for it in plain if it[3] != it[1]
        }
        if renames:
            out = out.rename(columns=renames)
        out = out[[it[3] for it in plain]]

    if having is not None:
        out = out[_pred_to_pandas(having, out)]
    if order:
        out = out.sort_values(
            [c for c, _ in order], ascending=[a for _, a in order],
            kind="mergesort",
        )
    if limit is not None:
        out = out.head(limit)
    return out.reset_index(drop=True)
