"""JavascriptCompiler analogue tests (lucene/expressions/js grammar).

Reference semantics: Javascript.g4 precedence table,
JavascriptCompiler.java literal handling (hex/octal push longs, bitwise
ops run through Java's double→long cast), package-info.java operator
inventory, SloppyMath.haversinKilometers.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from lucene_solr_ray.search.expressions import compile_expression


def ev(src, **bindings):
    return compile_expression(src).evaluate(bindings)


def test_literals_and_precedence():
    assert ev("1 + 2 * 3") == 7.0
    assert ev("(1 + 2) * 3") == 9.0
    assert ev("2 * 3 % 4") == 2.0
    assert ev("0x1F") == 31.0
    assert ev("017") == 15.0
    assert ev("1.5e2") == 150.0
    assert ev(".5 + 2.") == 2.5


def test_unary_and_java_modulo_sign():
    assert ev("-3 + 1") == -2.0
    # Java % keeps the dividend's sign: -7 % 3 == -1 (not +2)
    assert ev("-7 % 3") == -1.0
    assert ev("7 % -3") == 1.0
    assert ev("!0") == 1.0
    assert ev("!42") == 0.0
    assert ev("~5") == float(~5)


def test_bitwise_through_java_long_cast():
    assert ev("6 & 3") == 2.0
    assert ev("6 | 3") == 7.0
    assert ev("6 ^ 3") == 5.0
    assert ev("1 << 4") == 16.0
    assert ev("-16 >> 2") == -4.0
    # >>> is the unsigned shift: -1 >>> 60 == 15
    assert ev("0 - 1 >>> 60") == 15.0
    # JLS 5.1.3: NaN → 0, fractions truncate toward zero
    assert ev("(0/0) | 0") == 0.0
    assert ev("x | 0", x=np.array([2.9, -2.9]))[1] == -2.0
    # shift counts mask to 6 bits (Java long shift)
    assert ev("1 << 65") == 2.0


def test_comparison_logical_ternary():
    assert ev("3 < 4") == 1.0
    assert ev("3 >= 4") == 0.0
    assert ev("1 && 2") == 1.0
    assert ev("1 && 0") == 0.0
    assert ev("0 || 0") == 0.0
    assert ev("2 == 2 ? 10 : 20") == 10.0
    # right-associative nesting
    assert ev("0 ? 1 : 0 ? 2 : 3") == 3.0
    # NaN is truthy (!= 0 in Java semantics)
    assert ev("(0/0) ? 5 : 6") == 5.0


def test_functions_match_math_library():
    assert ev("sqrt(9)") == 3.0
    assert ev("ln(exp(2))") == pytest.approx(2.0)
    assert ev("log10(1000)") == pytest.approx(3.0)
    assert ev("logn(2, 8)") == pytest.approx(3.0)
    assert ev("pow(2, 10)") == 1024.0
    assert ev("min(3, max(1, 2))") == 2.0
    assert ev("atan2(1, 1)") == pytest.approx(math.pi / 4)
    assert ev("acosh(1)") == 0.0
    # haversin: London→Paris ≈ 343.5 km (SloppyMath kilometers)
    d = ev("haversin(51.5074, -0.1278, 48.8566, 2.3522)")
    assert 342 < d < 345


def test_vectorized_over_columns():
    x = np.array([1.0, 4.0, 9.0])
    out = ev("sqrt(x) + k", x=x, k=10.0)
    np.testing.assert_allclose(out, [11.0, 12.0, 13.0])


def test_variable_order_and_errors():
    e = compile_expression("a + b * a + doc.price")
    assert e.variables == ["a", "b", "doc.price"]
    with pytest.raises(ValueError):
        compile_expression("1 +")
    with pytest.raises(ValueError):
        compile_expression("nosuchfn(1)")
    with pytest.raises(ValueError):
        compile_expression("max(1)")  # arity
    with pytest.raises(ValueError):
        compile_expression("1 @ 2")
    with pytest.raises(KeyError):
        ev("missing + 1")


def test_expression_score_query(ray_session, tmp_path):
    """ExpressionScoreQuery replaces BM25 scores with the compiled
    expression; _score binds to the inner score."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.query import (ExpressionScoreQuery,
                                              TermQuery)
    from lucene_solr_ray.search.searcher import Index

    corpus = str(tmp_path / "corpus.parquet")
    pq.write_table(
        pa.table({
            "doc_id": list(range(8)),
            "text": ["ray data engine" if i % 2 else "ray core"
                     for i in range(8)],
            "popularity": [float(i * 10) for i in range(8)],
        }),
        corpus,
    )
    idx_dir = str(tmp_path / "idx")
    build_index([corpus], idx_dir, text_col="text", id_col="doc_id",
                stored_cols=["popularity"])
    s = Index(idx_dir)
    base = s.search_parsed([(0, TermQuery("ray"), 8)])
    eq = ExpressionScoreQuery(
        TermQuery("ray"), "sqrt(pop) + _score * 0",
        bindings=(("pop", "popularity"), ("_score", "_score")),
    )
    got = s.search_parsed([(0, eq, 8)])
    assert set(got["doc_id"].to_pylist()) == set(base["doc_id"].to_pylist())
    by = dict(zip(got["doc_id"].to_pylist(), got["score"].to_pylist()))
    for did, sc in by.items():
        assert sc == pytest.approx(math.sqrt(did * 10), rel=1e-6)
    # highest popularity first now
    assert got["doc_id"].to_pylist()[0] == 7


def test_expr_sort_gate_matches_duckdb(ray_session, sf_dir):
    import duckdb

    from lucene_solr_ray.pipelines.relational import (EXPR_SORT_SQL,
                                                      expr_sort_orders)

    got = expr_sort_orders(sf_dir)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    want = con.execute(EXPR_SORT_SQL).df()
    assert len(got) == len(want) == 50
    np.testing.assert_array_equal(got["o_orderkey"], want["o_orderkey"])
    np.testing.assert_allclose(got["expr_score"], want["expr_score"],
                               atol=2e-6)
