"""Streaming-expression evaluators: Solr's math-expression functions.

The reference ships ~201 ``StreamEvaluator`` classes
(``solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/`` —
``AddEvaluator``, ``MultiplyEvaluator``, ``PowerEvaluator`` …) used inside
``select(...)`` / ``let(...)`` expressions.  This module implements the
common scalar family as ONE vectorized expression compiler: an evaluator
expression string like ``mul(add(a, b), 2)`` parses to an AST and compiles
to arrow/numpy kernels applied per batch — no per-row Python.

    evaluate(ds, {"total": "add(price, mul(tax, price))",
                  "flag":  "if(gt(qty, 10), 1, 0)"})

Implemented evaluators (45): add sub mult div mod pow abs neg sqrt cbrt
log log10 exp ceil floor round sin cos tan asin acos atan sinh cosh tanh
min max eq neq gt gte lt lte and or eor not if val copyof concat upper
lower length analyze.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

__all__ = ["evaluate", "compile_expr", "EvalError"]


class EvalError(ValueError):
    pass


_TOK = re.compile(
    r"\s*(?:(?P<num>-?\d+(?:\.\d+)?)|(?P<str>'(?:[^']|'')*')"
    r"|(?P<name>[A-Za-z_][A-Za-z_0-9]*)|(?P<p>[(),]))"
)


def _lex(s: str):
    out, pos = [], 0
    while pos < len(s):
        m = _TOK.match(s, pos)
        if m is None:
            if s[pos:].strip() == "":
                break
            raise EvalError(f"cannot lex expression at {s[pos:]!r}")
        pos = m.end()
        if m.lastgroup == "num":
            v = m.group("num")
            out.append(("num", float(v) if "." in v else int(v)))
        elif m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        else:
            out.append((m.lastgroup, m.group(m.lastgroup or "p")))
    return out


def _parse(toks, i=0):
    if i >= len(toks):
        raise EvalError("unexpected end of expression")
    kind, val = toks[i]
    if kind == "num" or kind == "str":
        return ("lit", val), i + 1
    if kind != "name":
        raise EvalError(f"unexpected token {val!r}")
    if i + 1 < len(toks) and toks[i + 1] == ("p", "("):
        args = []
        j = i + 2
        if j < len(toks) and toks[j] == ("p", ")"):
            return ("call", val, args), j + 1
        while True:
            node, j = _parse(toks, j)
            args.append(node)
            if j >= len(toks):
                raise EvalError("unterminated call: expected , or )")
            if toks[j] == ("p", ","):
                j += 1
                continue
            if toks[j] == ("p", ")"):
                return ("call", val, args), j + 1
            raise EvalError(f"expected , or ) at {toks[j]!r}")
    return ("col", val), i + 1


def _np(col):
    if isinstance(col, np.ndarray):
        return col
    return np.asarray(col)


_UNARY = {
    "abs": np.abs, "neg": np.negative, "sqrt": np.sqrt,
    "cbrt": np.cbrt, "log": np.log, "log10": np.log10, "exp": np.exp,
    "ceil": np.ceil, "floor": np.floor,
    # RoundEvaluator wraps Math.round: HALF AWAY FROM ZERO, not numpy's
    # banker's rounding
    "round": lambda x: np.sign(x) * np.floor(np.abs(x) + 0.5),
    "sin": np.sin, "cos": np.cos, "tan": np.tan,
    "asin": np.arcsin, "acos": np.arccos, "atan": np.arctan,
    "sinh": np.sinh, "cosh": np.cosh, "tanh": np.tanh,
    "not": np.logical_not,
}

_BINARY = {
    "sub": np.subtract, "div": np.divide, "mod": np.mod,
    "pow": np.power,
    "eq": np.equal, "neq": np.not_equal,
    "gt": np.greater, "gte": np.greater_equal,
    "lt": np.less, "lte": np.less_equal,
    # ExclusiveOrEvaluator
    "eor": np.logical_xor,
}

_VARIADIC = {
    "add": np.add, "mult": np.multiply, "min": np.minimum,
    "max": np.maximum, "and": np.logical_and, "or": np.logical_or,
}


def _run(node, t: pa.Table):
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "col":
        if node[1] not in t.column_names:
            raise EvalError(f"unknown column {node[1]!r}")
        return t.column(node[1]).to_numpy(zero_copy_only=False)
    _, fn, args = node
    a = [_run(x, t) for x in args]
    if fn in _UNARY:
        if len(a) != 1:
            raise EvalError(f"{fn} takes 1 argument")
        return _UNARY[fn](_np(a[0]))
    if fn in _BINARY:
        if len(a) != 2:
            raise EvalError(f"{fn} takes 2 arguments")
        return _BINARY[fn](_np(a[0]), _np(a[1]))
    if fn in _VARIADIC:
        if len(a) < 2:
            raise EvalError(f"{fn} takes >= 2 arguments")
        acc = _np(a[0])
        for x in a[1:]:
            acc = _VARIADIC[fn](acc, _np(x))
        return acc
    if fn == "if":
        if len(a) != 3:
            raise EvalError("if takes 3 arguments")
        return np.where(_np(a[0]).astype(bool), a[1], a[2])
    if fn in ("val", "copyof"):
        if len(a) != 1:
            raise EvalError(f"{fn} takes 1 argument")
        return a[0]
    if fn == "concat":
        parts = [
            np.asarray(x).astype(str) if not np.isscalar(x) else x
            for x in a
        ]
        acc = parts[0]
        for p in parts[1:]:
            acc = np.char.add(
                acc if isinstance(acc, np.ndarray) else str(acc),
                p if isinstance(p, np.ndarray) else str(p),
            )
        return acc
    if fn == "upper":
        return np.char.upper(np.asarray(a[0]).astype(str))
    if fn == "lower":
        return np.char.lower(np.asarray(a[0]).astype(str))
    if fn == "length":
        return np.char.str_len(np.asarray(a[0]).astype(str)).astype(
            np.int64
        )
    if fn in _TEMPORAL:
        # temporal evaluators (io/eval/TemporalEvaluatorYear.java etc.):
        # field of a timestamp column, vectorized via the pandas datetime
        # accessor
        import pandas as pd

        idx = pd.DatetimeIndex(np.asarray(a[0]))
        return _TEMPORAL[fn](idx).to_numpy().astype(np.int64)
    if fn == "analyze":
        # AnalyzeEvaluator: run the indexing analyzer over a text field,
        # return the token list per tuple (analyzer built once per worker)
        global _ANALYZER
        if _ANALYZER is None:
            from lucene_solr_ray.analysis.analyzer import StandardAnalyzer

            _ANALYZER = StandardAnalyzer()
        return [_ANALYZER.analyze(str(v)) for v in np.asarray(a[0])]
    raise EvalError(f"unknown evaluator {fn!r}")


_ANALYZER = None

_TEMPORAL = {
    "year": lambda i: i.year, "month": lambda i: i.month,
    "day": lambda i: i.day, "dayOfYear": lambda i: i.dayofyear,
    "hour": lambda i: i.hour, "minute": lambda i: i.minute,
    "second": lambda i: i.second,
    "week": lambda i: i.isocalendar().week,
    "quarter": lambda i: i.quarter,
    "epoch": lambda i: i.asi8 // 10 ** 6,  # millis, as the reference
}

_KNOWN = (
    set(_UNARY) | set(_BINARY) | set(_VARIADIC) | set(_TEMPORAL)
    | {"if", "val", "copyof", "concat", "upper", "lower", "length",
       "analyze"}
)


def _validate(node):
    if node[0] == "call":
        if node[1] not in _KNOWN:
            raise EvalError(f"unknown evaluator {node[1]!r}")
        for a in node[2]:
            _validate(a)


def compile_expr(expr: str):
    """Parse once (evaluator names validated); returns table → array."""
    toks = _lex(expr)
    node, j = _parse(toks, 0)
    if j != len(toks):
        raise EvalError(f"trailing tokens in {expr!r}")
    _validate(node)

    def run(t: pa.Table):
        out = _run(node, t)
        if np.isscalar(out):
            out = np.full(t.num_rows, out)
        return out

    return run


def evaluate(ds, exprs: Dict[str, str]):
    """SelectStream-with-evaluators: append one column per compiled
    expression (expressions compile ONCE, batches evaluate vectorized)."""
    compiled = [(out, compile_expr(e)) for out, e in exprs.items()]

    def _apply(t: pa.Table) -> pa.Table:
        for out, fn in compiled:
            arr = fn(t)
            col = pa.array(arr)
            if out in t.column_names:
                t = t.set_column(t.schema.get_field_index(out), out, col)
            else:
                t = t.append_column(out, col)
        return t

    return ds.map_batches(_apply, batch_format="pyarrow")
