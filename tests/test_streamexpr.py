"""Streaming-expression parser + StreamFactory (reference
``StreamExpressionParser.java`` / ``StreamFactory.java``)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from lucene_solr_ray.stages.streamexpr import (
    StreamExprError,
    StreamFactory,
    parse_expr,
)


def test_parser_shapes():
    n = parse_expr('rollup(search(orders, q="a > 1", fl="x,y"), '
                   'over="x", count(*), sum(y) as s)')
    assert n.name == "rollup"
    assert n.params["over"] == "x"
    inner = n.args[0]
    assert inner.name == "search" and inner.args == ["orders"]
    assert inner.params == {"q": "a > 1", "fl": "x,y"}
    metrics = n.args[1:]
    assert [m.name for m in metrics] == ["count", "sum"]
    assert metrics[0].args == ["*"]
    assert metrics[1].params["as"] == "s"
    # juxtaposed field alias
    s = parse_expr("select(x(), fieldA as b, add(c, 1) as d)")
    assert s.args[1] == "fieldA as b"
    assert s.args[2].params["as"] == "d"
    # quoted strings keep commas/parens
    q = parse_expr('search(t, q="a = \'x,y (z)\'")')
    assert q.params["q"] == "a = 'x,y (z)'"
    with pytest.raises(StreamExprError):
        parse_expr("rollup(search(t)")
    with pytest.raises(StreamExprError):
        parse_expr("rollup(a) trailing")


@pytest.fixture()
def factory(ray_session):
    import ray.data

    orders = pd.DataFrame({
        "k": np.arange(40, dtype=np.int64),
        "pri": [f"p{i % 4}" for i in range(40)],
        "price": (np.arange(40, dtype=np.float64) * 13) % 97,
    })
    items = pd.DataFrame({
        "fk": np.arange(40, dtype=np.int64) % 10,
        "qty": np.arange(40, dtype=np.int64),
        "words": ["alpha beta"] * 40,
    })
    tabs = {"orders": orders, "items": items}
    return (
        StreamFactory(tables=lambda n: ray.data.from_pandas(tabs[n])),
        orders,
        items,
    )


def test_pipeline_decorators(factory):
    f, orders, items = factory
    out = f.run('having(rollup(search(orders, q="price > 10", '
                'fl="pri,price"), over="pri", count(*) as n, '
                'avg(price) as ap), gte(n, 1))').to_pandas()
    want = (
        orders[orders.price > 10].groupby("pri")
        .agg(n=("pri", "size"), ap=("price", "mean")).reset_index()
    )
    got = out.sort_values("pri").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["pri", "ap"]], want[["pri", "ap"]], check_dtype=False
    )
    top = f.run('top(search(orders, fl="k,price"), sort="price desc, k asc",'
                ' n=3)').to_pandas()
    wt = orders.sort_values(["price", "k"], ascending=[False, True]).head(3)
    assert top["k"].tolist() == wt["k"].tolist()
    sel = f.run('select(search(orders, fl="k,price"), k as id, '
                'mult(price, 2) as dbl)').to_pandas()
    assert sorted(sel.columns) == ["dbl", "id"]
    np.testing.assert_allclose(
        sel.sort_values("id")["dbl"].to_numpy(),
        orders.sort_values("k")["price"].to_numpy() * 2,
    )
    uniq = f.run('unique(search(orders, fl="pri"), over="pri")').to_pandas()
    assert sorted(uniq["pri"]) == ["p0", "p1", "p2", "p3"]
    joined = f.run('innerJoin(search(items, fl="fk,qty"), '
                   'search(orders, fl="k,pri"), on="fk=k")').to_pandas()
    assert len(joined) == len(items)
    stats = f.run('stats(search(items, fl="qty"), sum(qty), count(*))')
    assert stats.iloc[0]["sum(qty)"] == items.qty.sum()
    cart = f.run('cartesianProduct(search(items, fl="words"), words, '
                 'as="w")').to_pandas()
    assert set(cart["w"]) == {"alpha", "beta"}
    # let: stream → math world
    mean_qty = f.run('let(a=search(items, fl="qty"), v=col(a, qty), '
                     'mean(v))')
    assert float(mean_qty) == float(items.qty.mean())


def test_intersect_complement_merge(factory):
    f, orders, items = factory
    inter = f.run('intersect(search(orders, fl="k"), '
                  'search(items, fl="fk"), on="k=fk")').to_pandas()
    assert sorted(inter["k"].unique()) == list(range(10))
    comp = f.run('complement(search(orders, fl="k"), '
                 'search(items, fl="fk"), on="k=fk")').to_pandas()
    assert sorted(comp["k"]) == list(range(10, 40))
    merged = f.run('merge(search(orders, fl="k"), search(orders, fl="k"), '
                   'on="k asc")').to_pandas()
    assert len(merged) == 80 and merged["k"].is_monotonic_increasing


def test_fulltext_search_decorator(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import Index

    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array(["alpha beta"] * 4 + ["gamma delta"] * 4),
    }), p)
    out = str(tmp_path / "idx")
    build_index(p, out, text_col="text", id_col="doc_id")
    f = StreamFactory(indexes={"docs": Index(out)})
    hits = f.run('search(docs, q="alpha", rows=10)').to_pandas()
    assert sorted(hits["doc_id"]) == [0, 1, 2, 3]


def test_parallel_timeseries_fetch_sql(factory, tmp_path):
    import pyarrow.parquet as pq

    f, orders, items = factory
    # parallel() is a distributed no-op wrapper
    out = f.run('parallel(workers=4, unique(search(orders, fl="pri"), '
                'over="pri"))').to_pandas()
    assert len(out) == 4
    # sql() bridges the SQL front-end
    got = f.run('sql(stmt="SELECT pri, COUNT(*) AS n FROM orders '
                'GROUP BY pri ORDER BY pri")').to_pandas()
    assert got["n"].sum() == 40
    # fetch(): enrich a stream from a side parquet
    side = pd.DataFrame({
        "k2": np.arange(40, dtype=np.int64),
        "extra": [f"e{i}" for i in range(40)],
    })
    p = str(tmp_path / "side.parquet")
    pq.write_table(pa.Table.from_pandas(side, preserve_index=False), p)
    enriched = f.run(
        f'fetch(side, search(orders, fl="k,pri"), on="k=k2", '
        f'fl="extra", path="{p}")'
    ).to_pandas()
    assert "extra" in enriched.columns and len(enriched) == 40
    # significantTerms over a word column
    st = f.run('significantTerms(search(items, fl="fk,words"), '
               'lt(fk, 5), field="words")')
    rows = st.to_pandas() if hasattr(st, "to_pandas") else st
    assert len(rows) >= 1


def test_timeseries_decorator(ray_session):
    import ray.data

    ts = pd.DataFrame({
        "t": pd.to_datetime([
            "2026-01-01 03:00", "2026-01-01 07:00", "2026-01-02 01:00",
        ]),
        "v": [1.0, 2.0, 4.0],
    })
    f2 = StreamFactory(tables=lambda n: ray.data.from_pandas(ts))
    out = f2.run('timeseries(search(ts, fl="t,v"), field="t", gap="day", '
                 'sum(v) as sv)').to_pandas().sort_values("bucket")
    assert out["sv"].tolist() == [3.0, 4.0]


def test_topic_daemon_update_decorators(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import Index

    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "text": pa.array(["alpha beta"] * 12),
    }), p)
    out = str(tmp_path / "idx")
    build_index(p, out, text_col="text", id_col="doc_id")
    f = StreamFactory(indexes={"docs": Index(out)})
    ck = str(tmp_path / "topic.json")
    got1 = f.run(f'topic(docs, q="alpha", rows=5, checkpoint="{ck}")')
    assert len(got1.take_all()) == 5
    got2 = f.run(f'topic(docs, q="alpha", rows=5, checkpoint="{ck}")')
    ids2 = [r["doc_id"] for r in got2.take_all()]
    assert min(ids2) == 5  # checkpoint advanced
    # daemon re-runs an inner expression n times and drains the queue
    d = f.run('daemon(search(docs, q="alpha", rows=2), '
              'runInterval=10, iterations=2)')
    rows = d.take_all()
    assert len(rows) >= 4  # >= 2 iterations x 2 rows
    # update(): resumable partitioned sink
    import ray.data

    tabs = {"t": pd.DataFrame({
        "g": ["a", "a", "b"], "v": [1, 2, 3],
    })}
    f2 = StreamFactory(tables=lambda n: ray.data.from_pandas(tabs[n]))
    sink = str(tmp_path / "sinkdir")
    receipt = f2.run(
        f'update({sink}, search(t, fl="g,v"), partitionBy=g)'
    )
    assert sorted(receipt["partition"]) == ["a", "b"]
    assert receipt["rows"].sum() == 3
    # rerun skips completed partitions
    receipt2 = f2.run(
        f'update({sink}, search(t, fl="g,v"), partitionBy=g)'
    )
    assert len(receipt2) == 0


def test_graph_decorators(ray_session):
    import ray.data

    edges = pd.DataFrame({
        "src": [0, 0, 1, 2, 3],
        "dst": [1, 2, 3, 3, 4],
    })
    f = StreamFactory(tables=lambda n: ray.data.from_pandas(edges))
    gn = f.run('gatherNodes(edges, walk="src->dst", root="0", '
               'maxDepthBreadth=2)')
    gn = gn.to_pandas() if hasattr(gn, "to_pandas") else gn
    levels = dict(zip(gn["node"], gn["level"])) if "node" in gn.columns \
        else dict(zip(gn.iloc[:, 0], gn["level"]))
    assert levels[0] == 0 and levels[1] == 1 and levels[3] == 2
    sp = f.run('shortestPath(edges, edge="src->dst", from=0, to=4)')
    assert sp["node"].tolist() == [0, 1, 3, 4] or \
        sp["node"].tolist() == [0, 2, 3, 4]


def test_plumbing_decorators(factory):
    """Round-5 textual forms: tup/echo/null/list/cell/priority."""
    f, orders, _ = factory
    t = f.run('tup(a=1, b="x", c=add(2, 3))')
    row = t.take_all()[0]
    assert row["a"] == 1 and row["b"] == "x" and float(row["c"]) == 5.0
    e = f.run('echo("hello world")').take_all()
    assert e == [{"echo": "hello world"}]
    n = f.run('null(search(orders, q="*:*"))').take_all()
    assert n[0]["nullCount"] == len(orders)
    ls = f.run('list(tup(a=1), tup(a=2))').take_all()
    assert sorted(r["a"] for r in ls) == [1, 2]
    c = f.run('cell(rows, tup(a=7))').take_all()[0]
    assert c["rows"][0]["a"] == 7
    hi = f.run('priority(tup(a=1), tup(a=2))').take_all()
    assert hi == [{"a": 1}]
    lo = f.run(
        'priority(having(tup(a=1), gt(a, 5)), tup(a=2))'
    ).take_all()
    assert lo == [{"a": 2}]


def test_executor_eval_decorators(factory, ray_session, tmp_path):
    """executor() runs each tuple's expr_s through the factory
    (fire-and-forget, failures isolated); eval() runs the first one and
    RETURNS its stream."""
    f, orders, _ = factory
    stat = f.run(
        'executor(list(tup(expr_s="null(search(orders, q=\'*:*\'))"), '
        'tup(expr_s="bogus(zzz)")), threads=2)'
    ).take_all()
    by = {r["expr_s"]: r for r in stat}
    assert by['null(search(orders, q=\'*:*\'))']["ok"] is True
    assert by["bogus(zzz)"]["ok"] is False
    out = f.run('eval(tup(expr_s="tup(a=9)"))').take_all()
    assert out == [{"a": 9}]


def test_scorenodes_textual(ray_session):
    import ray.data

    from lucene_solr_ray.stages.streamexpr import StreamFactory

    edges = pd.DataFrame({
        "src": [0, 0, 1, 2],
        "dst": [1, 2, 3, 3],
    })
    docs = pd.DataFrame({"part": [1, 2, 3, 3, 3, 9]})
    tabs = {
        "edges": edges,
        "docs": docs,
    }
    f = StreamFactory(tables=lambda n: ray.data.from_pandas(tabs[n]))
    out = f.run(
        'scoreNodes(gatherNodes(edges, walk="src->dst", root="0", '
        'maxDepthBreadth=2), docs, field="part")'
    )
    assert "nodeScore" in out.columns
    # ScoreNodesStream formula: (ln(tf)+1) * (ln((N+1)/(df+1))+1)
    import math

    sc = dict(zip(out["node"], out["nodeScore"]))
    def want(tf, df, n=6):
        return (math.log(tf) + 1) * (math.log((n + 1) / (df + 1)) + 1)
    assert abs(sc[1] - want(1, 1)) < 1e-9
    assert abs(sc[3] - want(2, 3)) < 1e-9


def test_classify_textual(ray_session, tmp_path):
    import ray.data

    from lucene_solr_ray.stages.model import save_model
    from lucene_solr_ray.stages.streamexpr import StreamFactory

    mdir = str(tmp_path / "models")
    save_model(
        mdir, "m1",
        terms=["alpha", "beta"], weights=[0.0, 2.0, -1.0],
        idfs=[1.0, 1.0],
    )
    docs = pd.DataFrame({"text": ["alpha alpha", "beta beta beta"]})
    f = StreamFactory(tables=lambda n: ray.data.from_pandas(docs))
    out = f.run(
        f'classify(model("{mdir}", "m1"), search(docs, q="*:*"), '
        'field="text")'
    )
    rows = (out.to_pandas() if hasattr(out, "to_pandas") else out)
    assert "probability_d" in rows.columns
    assert rows["probability_d"][0] > rows["probability_d"][1]


def test_features_train_knn_textual(ray_session, tmp_path):
    """Round-5 ML textual forms: features()/train() over a labeled
    corpus; knnSearch() over an index resolver."""
    import pyarrow.parquet as pq
    import ray.data

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import Index
    from lucene_solr_ray.stages.streamexpr import StreamFactory

    docs = pd.DataFrame({
        "doc_id": range(20),
        "text": [("spam offer money" if i % 2 else "meeting notes agenda")
                 + f" filler{i}" for i in range(20)],
        "label": [1 if i % 2 else 0 for i in range(20)],
    })
    tabs = {"docs": docs}
    f = StreamFactory(tables=lambda n: ray.data.from_pandas(tabs[n]))
    feats = f.run(
        'features(search(docs, q="*:*"), field="text", outcome="label", '
        'positiveLabel=1, numTerms=3)'
    )
    feats_df = feats.to_pandas() if hasattr(feats, "to_pandas") else feats
    assert set(feats_df["term"]) <= {"spam", "offer", "money", "meeting",
                                     "notes", "agenda"}
    model = f.run(
        'train(search(docs, q="*:*"), '
        'features(search(docs, q="*:*"), field="text", outcome="label", '
        'positiveLabel=1, numTerms=3), '
        'field="text", outcome="label", positiveLabel=1, '
        'maxIterations=30)'
    ).take_all()[0]
    assert len(model["weights_ds"]) == len(model["terms_ss"]) + 1
    # the positive-class terms carry positive weights
    w = dict(zip(model["terms_ss"],
                 model["weights_ds"][:len(model["terms_ss"])]))
    assert all(v > 0 for t, v in w.items()
               if t in {"spam", "offer", "money"})

    # knnSearch over a real index
    p = str(tmp_path / "d.parquet")
    pq.write_table(pa.Table.from_pandas(docs[["doc_id", "text"]]), p)
    out = str(tmp_path / "idx")
    build_index(p, out, text_col="text", id_col="doc_id")
    f2 = StreamFactory(indexes={"idx": Index(out)})
    got = f2.run('knnSearch(idx, q="spam offer money", k=5)').take_all()
    assert len(got) == 5
    assert all(r["doc_id"] % 2 == 1 for r in got)  # spam docs


def test_reduce_get_calc_plot_decorators(factory):
    f, orders, items = factory
    # reduce: one tuple per pri, head = top price, group = top-2 maps
    out = f.run('reduce(search(orders, fl="k,pri,price"), by="pri", '
                'group(sort="price desc", n=2))').to_pandas()
    assert len(out) == 4
    for _, row in out.iterrows():
        grp = orders[orders.pri == row.pri].sort_values(
            "price", ascending=False)
        assert row.price == grp.price.iloc[0]
        assert [g["k"] for g in row.group] == list(grp.k[:2])
    # let + get: bound stream re-emitted, selectable
    got = f.run('let(a=search(orders, fl="k,price"), '
                'select(get(a), k as kk))').to_pandas()
    assert list(got.columns) == ["kk"] and len(got) == 40
    assert f._let_env == {}  # bindings scoped to the let()
    with pytest.raises(StreamExprError):
        f.run("get(a)")
    # calc: single-tuple source for evaluator selects
    c = f.run('select(calc(), add(1, 2) as s)').to_pandas()
    assert list(c.columns) == ["s"] and c.s.tolist() == [3]
    # plot: one tuple with series + default x
    p = f.run('plot(y=array(3, 1, 2), type="scatter")')
    assert p["plot"].tolist() == ["scatter"]
    assert p.x.tolist() == [[0.0, 1.0, 2.0]]
    assert p.y.tolist() == [[3.0, 1.0, 2.0]]


def test_outer_hash_join_shuffle_decorators(factory):
    f, orders, items = factory
    out = f.run('outerHashJoin(search(items, fl="fk,qty"), '
                'hashed=top(search(orders, fl="k,price"), '
                'sort="k asc", n=5), on="fk=k")').to_pandas()
    assert len(out) == 40  # left join keeps every item row
    matched = out[out.fk < 5]
    assert matched.price.notna().all()
    assert out[out.fk >= 5].price.isna().all()
    # shuffle() == search()'s build
    a = f.run('search(orders, fl="k", sort="k desc")').to_pandas()
    b = f.run('shuffle(orders, fl="k", sort="k desc")').to_pandas()
    assert a.equals(b)
