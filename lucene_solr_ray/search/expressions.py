"""Lucene expressions module: the JavascriptCompiler re-expressed as a
numpy-vectorizing compiler.

Reference: ``lucene/expressions/src/java/org/apache/lucene/expressions/js/
JavascriptCompiler.java`` (ASM bytecode compiler for the grammar in
``Javascript.g4``) and ``javascript_functions.properties`` (the 25 default
functions).  Same surface — arithmetic ``+ - * / %``, bitwise
``& | ^ ~ << >> >>>`` (operands pass through Java's double→long cast),
comparison ``< <= > >= == !=`` and logical ``&& || ! ?:`` yielding
``1.0/0.0``, decimal/hex/octal literals, external variables — but instead
of emitting JVM bytecode the compiler folds the AST into a closure of
numpy kernels, so one ``evaluate(bindings)`` call scores a whole Arrow
batch (the reference evaluates one doc per ``DoubleValues.doubleValue()``
call).

``haversin`` is ``SloppyMath.haversinKilometers`` (SloppyMath.java:76-95)
with exact trig in place of the reference's table-driven cos — its
documented error bound (≤40 cm) subsumes ours (0).

Variables resolve via Bindings (``expressions/SimpleBindings.java``): a
dict of name → scalar or ndarray, with ``VariableContext`` style member
access flattened to plain keys (``doc['price'].value`` ↦ ``doc.price``
stays a single binding name here — callers bind the full spelling).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Union

import numpy as np

__all__ = ["JavascriptCompiler", "compile_expression", "Expression",
           "DEFAULT_FUNCTIONS"]

Num = Union[float, np.ndarray]

_EARTH_KM = 6_371.0087714  # SloppyMath.TO_KILOMETERS
_TO_RAD = np.pi / 180.0


def _haversin(lat1: Num, lon1: Num, lat2: Num, lon2: Num) -> Num:
    x1 = np.multiply(lat1, _TO_RAD)
    x2 = np.multiply(lat2, _TO_RAD)
    h1 = 1.0 - np.cos(x1 - x2)
    h2 = 1.0 - np.cos(np.multiply(np.subtract(lon1, lon2), _TO_RAD))
    h = h1 + np.cos(x1) * np.cos(x2) * h2
    return _EARTH_KM * 2.0 * np.arcsin(np.minimum(1.0, np.sqrt(h * 0.5)))


#: name -> (arity, kernel); the exact set in
#: javascript_functions.properties
DEFAULT_FUNCTIONS: Dict[str, tuple] = {
    "abs": (1, np.abs),
    "acos": (1, np.arccos),
    "acosh": (1, np.arccosh),
    "asin": (1, np.arcsin),
    "asinh": (1, np.arcsinh),
    "atan": (1, np.arctan),
    "atan2": (2, np.arctan2),
    "atanh": (1, np.arctanh),
    "ceil": (1, np.ceil),
    "cos": (1, np.cos),
    "cosh": (1, np.cosh),
    "exp": (1, np.exp),
    "floor": (1, np.floor),
    "haversin": (4, _haversin),
    "ln": (1, np.log),
    "log10": (1, np.log10),
    # MathUtil.log(base, x) = ln(x) / ln(base)
    "logn": (2, lambda base, x: np.log(x) / np.log(base)),
    "max": (2, np.maximum),
    "min": (2, np.minimum),
    "pow": (2, np.power),
    "sin": (1, np.sin),
    "sinh": (1, np.sinh),
    "sqrt": (1, np.sqrt),
    "tan": (1, np.tan),
    "tanh": (1, np.tanh),
}

_LONG_MAX = np.float64(2**63 - 1)
_LONG_MIN = np.float64(-(2**63))


def _to_long(x: Num) -> np.ndarray:
    """Java's double→long cast (JLS 5.1.3): NaN → 0, out-of-range clamps
    to Long.MIN/MAX, else truncate toward zero."""
    a = np.asarray(x, dtype=np.float64)
    t = np.trunc(np.nan_to_num(a, nan=0.0))
    t = np.clip(t, _LONG_MIN, _LONG_MAX)
    # values at the clamp edges exceed exact int64 range after the float
    # round-trip; pin them explicitly
    out = np.where(t >= _LONG_MAX, np.int64(2**63 - 1),
                   np.where(t <= _LONG_MIN, np.int64(-(2**63)),
                            t.astype(np.int64)))
    return out


def _shift_count(x: Num) -> np.ndarray:
    """Java masks shift distances to the low 6 bits for longs."""
    return _to_long(x) & np.int64(0x3F)


def _truthy(x: Num) -> np.ndarray:
    """Javascript.g4 boolean coercion: nonzero (including NaN) is true."""
    return np.not_equal(np.asarray(x, dtype=np.float64), 0.0)


def _bool(x) -> Num:
    return np.where(x, 1.0, 0.0)


# -- lexer -------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<hex>0[xX][0-9a-fA-F]+)
      | (?P<octal>0[0-7]+)
      | (?P<num>(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?)
      | (?P<var>[_$a-zA-Z][_$a-zA-Z0-9]*
           (?:\.[_$a-zA-Z][_$a-zA-Z0-9]*|\[(?:\d+|'[^']*'|"[^"]*")\])*)
      | (?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%&|^~!<>?:(),])
    )""",
    re.VERBOSE,
)


def _lex(src: str) -> List[tuple]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise ValueError(
                f"unexpected character {src[pos:pos+1]!r} at {pos} in "
                f"expression {src!r}"
            )
        pos = m.end()
        if m.group("hex"):
            toks.append(("num", float(int(m.group("hex"), 16))))
        elif m.group("octal"):
            toks.append(("num", float(int(m.group("octal"), 8))))
        elif m.group("num"):
            toks.append(("num", float(m.group("num"))))
        elif m.group("var"):
            toks.append(("var", m.group("var")))
        else:
            toks.append(("op", m.group("op")))
    toks.append(("eof", None))
    return toks


# -- parser (precedence climbing, JS operator table) -------------------------

class _Parser:
    """Javascript.g4 precedence, lowest first: ?: || && | ^ &
    (== !=) (< <= > >=) (<< >> >>>) (+ -) (* / %) unary."""

    def __init__(self, toks: List[tuple], functions: Dict[str, tuple]):
        self.toks = toks
        self.i = 0
        self.functions = functions

    def peek(self):
        return self.toks[self.i]

    def eat(self, kind=None, val=None):
        k, v = self.toks[self.i]
        if (kind and k != kind) or (val is not None and v != val):
            raise ValueError(f"expected {val or kind}, got {v!r}")
        self.i += 1
        return v

    def parse(self):
        node = self.ternary()
        if self.peek()[0] != "eof":
            raise ValueError(f"trailing input at token {self.peek()!r}")
        return node

    def ternary(self):
        cond = self.logical_or()
        if self.peek() == ("op", "?"):
            self.eat("op", "?")
            a = self.ternary()
            self.eat("op", ":")
            b = self.ternary()
            return ("?:", cond, a, b)
        return cond

    def _binop(self, ops, next_level):
        node = next_level()
        while self.peek()[0] == "op" and self.peek()[1] in ops:
            op = self.eat("op")
            node = (op, node, next_level())
        return node

    def logical_or(self):
        return self._binop({"||"}, self.logical_and)

    def logical_and(self):
        return self._binop({"&&"}, self.bit_or)

    def bit_or(self):
        return self._binop({"|"}, self.bit_xor)

    def bit_xor(self):
        return self._binop({"^"}, self.bit_and)

    def bit_and(self):
        return self._binop({"&"}, self.equality)

    def equality(self):
        return self._binop({"==", "!="}, self.relational)

    def relational(self):
        return self._binop({"<", "<=", ">", ">="}, self.shift)

    def shift(self):
        return self._binop({"<<", ">>", ">>>"}, self.additive)

    def additive(self):
        return self._binop({"+", "-"}, self.multiplicative)

    def multiplicative(self):
        return self._binop({"*", "/", "%"}, self.unary)

    def unary(self):
        k, v = self.peek()
        if k == "op" and v in ("-", "+", "!", "~"):
            self.eat("op")
            return ("u" + v, self.unary())
        return self.primary()

    def primary(self):
        k, v = self.peek()
        if k == "num":
            self.eat("num")
            return ("num", v)
        if k == "op" and v == "(":
            self.eat("op", "(")
            node = self.ternary()
            self.eat("op", ")")
            return node
        if k == "var":
            self.eat("var")
            if self.peek() == ("op", "("):
                self.eat("op", "(")
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.ternary())
                    while self.peek() == ("op", ","):
                        self.eat("op", ",")
                        args.append(self.ternary())
                self.eat("op", ")")
                if v not in self.functions:
                    raise ValueError(f"unknown function {v!r}")
                arity = self.functions[v][0]
                if len(args) != arity:
                    raise ValueError(
                        f"function {v!r} expects {arity} args, "
                        f"got {len(args)}"
                    )
                return ("call", v, args)
            return ("var", v)
        raise ValueError(f"unexpected token {v!r}")


# -- evaluation --------------------------------------------------------------

def _eval(node, b: Dict[str, Num], functions: Dict[str, tuple]) -> Num:
    op = node[0]
    if op == "num":
        return node[1]
    if op == "var":
        try:
            return b[node[1]]
        except KeyError:
            raise KeyError(
                f"unbound variable {node[1]!r}; bindings: {sorted(b)}"
            ) from None
    if op == "call":
        fn = functions[node[1]][1]
        return fn(*(_eval(a, b, functions) for a in node[2]))
    if op == "?:":
        c = _truthy(_eval(node[1], b, functions))
        return np.where(c, _eval(node[2], b, functions),
                        _eval(node[3], b, functions)) + 0.0
    x = _eval(node[1], b, functions)
    if op == "u-":
        return np.negative(x)
    if op == "u+":
        return np.positive(x)
    if op == "u!":
        return _bool(~_truthy(x))
    if op == "u~":
        return (~_to_long(x)).astype(np.float64)
    y = _eval(node[2], b, functions)
    if op == "+":
        return np.add(x, y)
    if op == "-":
        return np.subtract(x, y)
    if op == "*":
        return np.multiply(x, y)
    if op == "/":
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.divide(x, y)  # IEEE: x/0 = ±inf, 0/0 = NaN (Java too)
    if op == "%":
        # Java % keeps the dividend's sign; np.fmod matches, np.mod doesn't
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.fmod(x, y)
    if op == "&":
        return (_to_long(x) & _to_long(y)).astype(np.float64)
    if op == "|":
        return (_to_long(x) | _to_long(y)).astype(np.float64)
    if op == "^":
        return (_to_long(x) ^ _to_long(y)).astype(np.float64)
    if op == "<<":
        return (_to_long(x) << _shift_count(y)).astype(np.float64)
    if op == ">>":
        return (_to_long(x) >> _shift_count(y)).astype(np.float64)
    if op == ">>>":
        ux = _to_long(x).astype(np.uint64)
        return (ux >> _shift_count(y).astype(np.uint64)).astype(
            np.int64).astype(np.float64)
    if op == "<":
        return _bool(np.less(x, y))
    if op == "<=":
        return _bool(np.less_equal(x, y))
    if op == ">":
        return _bool(np.greater(x, y))
    if op == ">=":
        return _bool(np.greater_equal(x, y))
    if op == "==":
        return _bool(np.equal(x, y))
    if op == "!=":
        return _bool(np.not_equal(x, y))
    if op == "&&":
        return _bool(_truthy(x) & _truthy(y))
    if op == "||":
        return _bool(_truthy(x) | _truthy(y))
    raise AssertionError(f"unhandled op {op}")


class Expression:
    """A compiled expression — the reference's ``expressions.Expression``
    with ``evaluate(DoubleValues[])`` replaced by a whole-column call."""

    def __init__(self, source: str, ast, variables: List[str],
                 functions: Dict[str, tuple]):
        self.source = source
        self._ast = ast
        self.variables = variables  # in first-appearance order
        self._functions = functions

    def evaluate(self, bindings: Dict[str, Num]) -> np.ndarray:
        """bindings: variable name → scalar or ndarray (column)."""
        out = _eval(self._ast, bindings, self._functions)
        return np.asarray(out, dtype=np.float64)

    def __repr__(self):  # pragma: no cover
        return f"Expression({self.source!r})"


class JavascriptCompiler:
    """JavascriptCompiler.compile(sourceText[, functions]) analogue."""

    @staticmethod
    def compile(source: str,
                functions: Dict[str, tuple] = None) -> Expression:
        functions = dict(DEFAULT_FUNCTIONS, **(functions or {}))
        toks = _lex(source)
        ast = _Parser(toks, functions).parse()
        seen: List[str] = []

        def walk(n):
            if n[0] == "var" and n[1] not in seen:
                seen.append(n[1])
            elif n[0] == "call":
                for a in n[2]:
                    walk(a)
            elif n[0] in ("?:",) or n[0].startswith("u"):
                for a in n[1:]:
                    walk(a)
            elif n[0] not in ("num",):
                for a in n[1:]:
                    if isinstance(a, tuple):
                        walk(a)
        walk(ast)
        return Expression(source, ast, seen, functions)


def compile_expression(source: str, functions=None) -> Expression:
    return JavascriptCompiler.compile(source, functions)
