"""Driver-gated relational pipelines (the Solr streaming-expression algebra
over the TPC-H-ish tables) + DuckDB oracle SQL.

Money sums use exact integer arithmetic (cents / 1e-4-dollar units) on BOTH
sides so float summation order can never flake the gate; averages are
ROUND(·, 6) where the residual error is ~1e-13 relative.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from lucene_solr_ray.stages import relational as R

__all__ = ["QUERIES", "ORACLES"]


def _read(sf_dir: str, table: str, columns=None,
          rows_per_block: int = 25_000):
    """Column-pruned parquet read with row-count-scaled block splitting.

    The synthetic tables are single-row-group files, so Ray's default
    read plan emits ONE block and every downstream map_batches runs as a
    single task (measured: the whole innerjoin stage serialized on one
    core).  ``override_num_blocks`` splits the read into ~25k-row blocks
    capped at 2×CPUs — at real scale (many files / many row groups) the
    default plan already fans out and the override is a no-op guardrail."""
    from lucene_solr_ray.sources.parquet import split_read

    return split_read(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns,
        rows_per_block=rows_per_block,
    )


# -- RollupStream over lineitem (TPC-H Q1 shape) ----------------------------

def rollup_lineitem(sf_dir: str) -> pd.DataFrame:
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), cutoff))
        qty = pc.cast(pc.round(t.column("l_quantity")), pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)),
            pa.int64(),
        )
        disc_h = pc.cast(pc.round(pc.multiply(t.column("l_discount"), 100.0)),
                         pa.int64())
        disc_e4 = pc.multiply(cents, pc.subtract(100, disc_h))
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": qty,
                "base_cents": cents,
                "disc_e4": disc_e4,
                "l_quantity": t.column("l_quantity"),
            }
        )

    out = R.rollup(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [
            ("sum", "qty", "sum_qty"),
            ("sum", "base_cents", "sum_base_cents"),
            ("sum", "disc_e4", "sum_disc_e4"),
            ("avg", "l_quantity", "avg_qty"),
            ("count", None, "count_order"),
        ],
    ).to_pandas()
    out["avg_qty"] = out["avg_qty"].round(6)
    for c in ("sum_qty", "sum_base_cents", "sum_disc_e4", "count_order"):
        out[c] = out[c].astype("int64")
    return out


ROLLUP_LINEITEM_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100.0) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
  ROUND(AVG(l_quantity), 6) AS avg_qty,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# -- StatsStream over orders ------------------------------------------------

def stats_orders(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                        pa.int64())
        return t.append_column("cents", cents)

    row = R.stats(
        ds.map_batches(prep, batch_format="pyarrow"),
        [
            ("count", None, "n"),
            ("sum", "cents", "sum_cents"),
            ("avg", "o_totalprice", "avg_price"),
            ("min", "o_totalprice", "min_price"),
            ("max", "o_totalprice", "max_price"),
        ],
    )
    return pd.DataFrame(
        [
            {
                "n": int(row["n"]),
                "sum_cents": int(row["sum_cents"]),
                "avg_price": round(float(row["avg_price"]), 6),
                "min_price": float(row["min_price"]),
                "max_price": float(row["max_price"]),
            }
        ]
    )


STATS_ORDERS_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents,
  ROUND(AVG(o_totalprice), 6) AS avg_price,
  MIN(o_totalprice) AS min_price,
  MAX(o_totalprice) AS max_price
FROM orders
"""


# -- HashJoinStream: broadcast customer into orders -------------------------

def hashjoin_orders_customer(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).to_pandas()

    joined = R.hash_join(orders, customer, on="o_custkey",
                         right_on="c_custkey")

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                        pa.int64())
        return pa.table(
            {"c_mktsegment": t.column("c_mktsegment"), "cents": cents}
        )

    out = R.rollup(
        joined.map_batches(prep, batch_format="pyarrow"),
        ["c_mktsegment"],
        [("count", None, "n_orders"), ("sum", "cents", "sum_cents")],
    ).to_pandas()
    for c in ("n_orders", "sum_cents"):
        out[c] = out[c].astype("int64")
    return out


HASHJOIN_SQL = """
SELECT c_mktsegment,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# -- InnerJoinStream: both-large shuffle join -------------------------------

def innerjoin_revenue(sf_dir: str) -> pd.DataFrame:
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)),
            pa.int64(),
        )
        disc_h = pc.cast(pc.round(pc.multiply(t.column("l_discount"), 100.0)),
                         pa.int64())
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev_e4": pc.multiply(cents, pc.subtract(100, disc_h)),
            }
        )

    li = li.map_batches(prep, batch_format="pyarrow")
    # size-aware dispatch: orders is dimension-sized here, so this takes
    # the broadcast build-small/probe-big path; at fact-scale both sides
    # it hash-partitions with a data-scaled partition count
    joined = R.inner_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                          how="inner")
    # join key names differ: Dataset.join keeps right key col; rename after
    out = R.rollup(
        joined, ["o_orderpriority"],
        [("sum", "rev_e4", "revenue_e4"), ("count", None, "n_items")],
    ).to_pandas()
    for c in ("revenue_e4", "n_items"):
        out[c] = out[c].astype("int64")
    return out


INNERJOIN_SQL = """
SELECT o_orderpriority,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100.0) AS BIGINT))) AS BIGINT) AS revenue_e4,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# -- SelectStream + HavingStream --------------------------------------------

def select_having(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    ds = R.having(ds, lambda t: pc.greater(t.column("o_totalprice"), 400000.0))
    return R.select(
        ds, rename={"o_orderkey": "orderkey", "o_totalprice": "totalprice"}
    )


SELECT_HAVING_SQL = """
SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
FROM orders WHERE o_totalprice > 400000.0
"""


# -- SortStream + RankStream ------------------------------------------------

def rank_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(20)


RANK_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


# -- UniqueStream -----------------------------------------------------------

def unique_priorities(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderpriority"])
    return R.unique_stream(ds, "o_orderpriority").to_pandas()


UNIQUE_SQL = "SELECT DISTINCT o_orderpriority FROM orders"


# -- MergeStream (union) ----------------------------------------------------

def merge_names(sf_dir: str):
    a = R.select(_read(sf_dir, "region", ["r_name"]),
                 rename={"r_name": "name"})
    b = R.select(_read(sf_dir, "nation", ["n_name"]),
                 rename={"n_name": "name"})
    return R.merge_stream(a, b)


MERGE_SQL = """
SELECT r_name AS name FROM region UNION ALL SELECT n_name AS name FROM nation
"""


# -- IntersectStream / ComplementStream -------------------------------------

def intersect_nations(sf_dir: str) -> pd.DataFrame:
    cust = R.unique_stream(
        _read(sf_dir, "customer", ["c_nationkey"]), "c_nationkey"
    )
    supp = _read(sf_dir, "supplier", ["s_nationkey"])
    out = R.intersect_stream(
        R.select(cust, rename={"c_nationkey": "nationkey"}),
        R.select(supp, rename={"s_nationkey": "nationkey"}),
        on="nationkey",
    ).to_pandas()
    return out


INTERSECT_SQL = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)
"""


def complement_nations(sf_dir: str) -> pd.DataFrame:
    """Nations with no high-balance supplier (anti-join)."""
    nat = _read(sf_dir, "nation", ["n_nationkey"])
    supp = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    supp = R.having(supp, lambda t: pc.greater_equal(t.column("s_acctbal"),
                                                     9500.0))
    out = R.complement_stream(
        R.select(nat, rename={"n_nationkey": "nationkey"}),
        R.select(supp, columns=["s_nationkey"],
                 rename={"s_nationkey": "nationkey"}),
        on="nationkey",
    ).to_pandas()
    if out.empty:  # keep the schema even when the complement is empty
        out = pd.DataFrame({"nationkey": pd.Series([], dtype="int64")})
    return out


COMPLEMENT_SQL = """
SELECT n_nationkey AS nationkey FROM nation
WHERE n_nationkey NOT IN
  (SELECT s_nationkey FROM supplier WHERE s_acctbal >= 9500.0)
"""


# -- CartesianProductStream (unnest) ----------------------------------------

def cartesian_part_words(sf_dir: str):
    ds = _read(sf_dir, "part", ["p_partkey", "p_name"])
    out = R.cartesian_product(ds, "p_name", "word")
    return R.select(out, columns=["p_partkey", "word"])


CARTESIAN_SQL = """
SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part
"""


# -- FacetStream ------------------------------------------------------------

def facet_brand(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "part", ["p_brand"])
    out = R.facet_stream(ds, "p_brand").to_pandas()
    out["count"] = out["count"].astype("int64")
    return out


FACET_SQL = """
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS count FROM part GROUP BY p_brand
"""


# -- TimeSeriesStream -------------------------------------------------------

def timeseries_events(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)),
                        pa.int64())
        return t.append_column("cents", cents)

    out = R.time_series(
        ds.map_batches(prep, batch_format="pyarrow"),
        "ts", "day",
        [
            ("count", None, "n"),
            ("sum", "cents", "sum_cents"),
            ("avg", "value", "avg_value"),
        ],
        extra_keys=["event_type"],
    ).to_pandas()
    out["avg_value"] = out["avg_value"].round(6)
    for c in ("n", "sum_cents"):
        out[c] = out[c].astype("int64")
    return out


TIMESERIES_SQL = """
SELECT date_trunc('day', ts) AS bucket, event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents,
  ROUND(AVG(value), 6) AS avg_value
FROM events GROUP BY 1, 2
"""


# -- SignificantTermsStream -------------------------------------------------

def significant_terms_en(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = R.significant_terms(
        docs, "text",
        lambda t: pc.equal(t.column("lang"), "en"),
    ).to_pandas()
    out["score"] = out["score"].round(6)
    for c in ("fg", "bg"):
        out[c] = out[c].astype("int64")
    return out.sort_values("term").reset_index(drop=True)


SIGTERMS_SQL = """
WITH tok AS (
  SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE text <> ''
),
tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_bg,
         CAST(COUNT(*) FILTER (lang = 'en') AS DOUBLE) AS n_fg
  FROM documents
)
SELECT term,
  CAST(COUNT(*) FILTER (lang = 'en') AS BIGINT) AS fg,
  CAST(COUNT(*) AS BIGINT) AS bg,
  ROUND((COUNT(*) FILTER (lang = 'en') / t.n_fg)
        / GREATEST(COUNT(*) / t.n_bg, 1e-12), 6) AS score
FROM tok CROSS JOIN tot t
GROUP BY term, t.n_fg, t.n_bg
ORDER BY term
"""


QUERIES = {
    "rollup_lineitem": rollup_lineitem,
    "stats_orders": stats_orders,
    "hashjoin_orders_customer": hashjoin_orders_customer,
    "innerjoin_revenue": innerjoin_revenue,
    "select_having": select_having,
    "rank_orders": rank_orders,
    "unique_priorities": unique_priorities,
    "merge_names": merge_names,
    "intersect_nations": intersect_nations,
    "complement_nations": complement_nations,
    "cartesian_part_words": cartesian_part_words,
    "facet_brand": facet_brand,
    "timeseries_events": timeseries_events,
    "significant_terms_en": significant_terms_en,
}

ORACLES = {
    "rollup_lineitem": ROLLUP_LINEITEM_SQL,
    "stats_orders": STATS_ORDERS_SQL,
    "hashjoin_orders_customer": HASHJOIN_SQL,
    "innerjoin_revenue": INNERJOIN_SQL,
    "select_having": SELECT_HAVING_SQL,
    "rank_orders": RANK_ORDERS_SQL,
    "unique_priorities": UNIQUE_SQL,
    "merge_names": MERGE_SQL,
    "intersect_nations": INTERSECT_SQL,
    "complement_nations": COMPLEMENT_SQL,
    "cartesian_part_words": CARTESIAN_SQL,
    "facet_brand": FACET_SQL,
    "timeseries_events": TIMESERIES_SQL,
    "significant_terms_en": SIGTERMS_SQL,
}


# -- windowed aggregates over the events log --------------------------------

def session_windows(sf_dir: str) -> pd.DataFrame:
    """Gap-based sessionization (30-min gap) per user — the
    gaps-and-islands construction (stages/windows.session)."""
    from lucene_solr_ray.stages.windows import session

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    out = session(ev, "user_id", "ts", gap_s=1800).to_pandas()
    out["session_id"] = out["session_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["user_id", "session_id"]).reset_index(drop=True)


SESSION_SQL = """
WITH x AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS session_id
  FROM x
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
  MIN(ts) AS session_start, MAX(ts) AS session_end,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def tumbling_hour(sf_dir: str) -> pd.DataFrame:
    from lucene_solr_ray.stages.windows import tumbling

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)),
                        pa.int64())
        return t.append_column("cents", cents)

    out = tumbling(
        ds.map_batches(prep, batch_format="pyarrow"),
        "ts", 3600,
        [("count", None, "n"), ("sum", "cents", "sum_cents")],
        keys=["event_type"],
    ).to_pandas()
    for c in ("n", "sum_cents"):
        out[c] = out[c].astype("int64")
    return out


TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2
"""


def sliding_windows(sf_dir: str) -> pd.DataFrame:
    """Sliding 2h windows, 1h slide (explode-to-covering-windows)."""
    from lucene_solr_ray.stages.windows import sliding

    ds = _read(sf_dir, "events", ["ts", "value"])
    out = sliding(
        ds, "ts", 7200, 3600, [("count", None, "n")]
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("window_start").reset_index(drop=True)


SLIDING_SQL = """
SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT date_trunc('hour', ts) - off * INTERVAL 1 HOUR AS window_start
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS off)
)
GROUP BY window_start ORDER BY window_start
"""


# -- URP chain as a gated pipeline ------------------------------------------

def urp_clean_parts(sf_dir: str) -> pd.DataFrame:
    from lucene_solr_ray.stages import urp

    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_brand"])
    out = urp.chain(ds, [
        urp.regex_replace("p_name", r"\s+", "_"),
        urp.concat_fields("full_name", ["p_brand", "p_name"], sep=":"),
        urp.field_length("p_name", "name_len"),
    ]).to_pandas()
    out = out[["p_partkey", "p_name", "full_name", "name_len"]]
    out["name_len"] = out["name_len"].astype("int64")
    return out.sort_values("p_partkey").reset_index(drop=True)


URP_SQL = """
SELECT p_partkey,
  regexp_replace(p_name, '\\s+', '_', 'g') AS p_name,
  p_brand || ':' || regexp_replace(p_name, '\\s+', '_', 'g') AS full_name,
  CAST(length(regexp_replace(p_name, '\\s+', '_', 'g')) AS BIGINT) AS name_len
FROM part ORDER BY p_partkey
"""


# -- sketch aggregates -------------------------------------------------------

def distinct_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact distributed distinct count + exact quantiles (lower interp)."""
    from lucene_solr_ray.stages.sketches import exact_distinct, quantile

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
    return pd.DataFrame(
        [
            {
                "n_parts": int(exact_distinct(li, "l_partkey")),
                "q50": float(quantile(li, "l_extendedprice", 0.5)),
                "q90": float(quantile(li, "l_extendedprice", 0.9)),
            }
        ]
    )


DISTINCT_Q_SQL = """
WITH r AS (
  SELECT l_extendedprice,
    ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn,
    COUNT(*) OVER () AS n
  FROM lineitem
)
SELECT
  (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM lineitem) AS n_parts,
  (SELECT l_extendedprice FROM r WHERE rn = FLOOR(0.5 * (n - 1)) + 1 LIMIT 1) AS q50,
  (SELECT l_extendedprice FROM r WHERE rn = FLOOR(0.9 * (n - 1)) + 1 LIMIT 1) AS q90
"""


def hll_partkeys(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct estimate — rows-only (approximate by design);
    pytest asserts <5% error vs exact."""
    from lucene_solr_ray.stages.sketches import hll_distinct

    li = _read(sf_dir, "lineitem", ["l_partkey"])
    return pd.DataFrame([{"hll_estimate": float(hll_distinct(li, "l_partkey"))}])


QUERIES.update({
    "session_windows": session_windows,
    "tumbling_hour": tumbling_hour,
    "sliding_windows": sliding_windows,
    "urp_clean_parts": urp_clean_parts,
    "distinct_quantiles": distinct_quantiles,
    "hll_partkeys": hll_partkeys,
})

ORACLES.update({
    "session_windows": SESSION_SQL,
    "tumbling_hour": TUMBLING_SQL,
    "sliding_windows": SLIDING_SQL,
    "urp_clean_parts": URP_SQL,
    "distinct_quantiles": DISTINCT_Q_SQL,
})


# -- EvalStream / scalar evaluators over JSON props --------------------------

def eval_props(sf_dir: str) -> pd.DataFrame:
    """Per-tuple scalar evaluation (the Solr EvalStream / 201-evaluator
    family, SURVEY §2.2): parse the events JSON ``props``, extract ``k``,
    compute derived columns — all inside one vectorized map_batches."""
    import json as _json

    ds = _read(sf_dir, "events", ["event_id", "value", "props"])

    def _eval(t: pa.Table) -> pa.Table:
        ks = []
        for p in t.column("props").to_pylist():
            try:
                ks.append(int(_json.loads(p)["k"]))
            except Exception:
                ks.append(None)
        k_arr = pa.array(ks, pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)),
                        pa.int64())
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "k": k_arr,
                "value_cents": cents,
                "k_plus_cents": pc.add(k_arr, cents),
            }
        )

    out = ds.map_batches(_eval, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


EVAL_PROPS_SQL = """
SELECT event_id,
  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
  CAST(ROUND(value * 100.0) AS BIGINT) AS value_cents,
  CAST(json_extract(props, '$.k') AS BIGINT)
    + CAST(ROUND(value * 100.0) AS BIGINT) AS k_plus_cents
FROM events ORDER BY event_id
"""

QUERIES["eval_props"] = eval_props
ORACLES["eval_props"] = EVAL_PROPS_SQL


# -- range facets ------------------------------------------------------------

def facet_price_ranges(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_totalprice"])
    out = R.facet_range(
        ds, "o_totalprice",
        edges=[0.0, 100_000.0, 200_000.0, 300_000.0, 1e9],
        labels=["lo", "mid", "high", "top"],
    ).to_pandas()
    out["count"] = out["count"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


FACET_RANGE_SQL = """
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS count FROM (
  SELECT CASE
    WHEN o_totalprice >= 0 AND o_totalprice < 100000 THEN 'lo'
    WHEN o_totalprice < 200000 THEN 'mid'
    WHEN o_totalprice < 300000 THEN 'high'
    WHEN o_totalprice < 1e9 THEN 'top'
  END AS bucket FROM orders
) WHERE bucket IS NOT NULL GROUP BY bucket ORDER BY bucket
"""

QUERIES["facet_price_ranges"] = facet_price_ranges
ORACLES["facet_price_ranges"] = FACET_RANGE_SQL


# -- JSON Facet API ----------------------------------------------------------

def json_facet_brands(sf_dir: str) -> pd.DataFrame:
    """Nested JSON facet: top-5 brands by count with avg retail price and
    the top-2 sizes inside each brand — flattened to rows for the gate."""
    from lucene_solr_ray.stages.json_facet import json_facet

    ds = _read(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"])
    res = json_facet(ds, {
        "type": "terms", "field": "p_brand", "limit": 5,
        "sort": "count desc",
        "facet": {
            "avg_price": "avg(p_retailprice)",
            "by_size": {"type": "terms", "field": "p_size", "limit": 2},
        },
    })
    rows = []
    for b in res["buckets"]:
        for sb in b["by_size"]["buckets"]:
            rows.append({
                "p_brand": b["val"],
                "count": int(b["count"]),
                "avg_price": round(float(b["avg_price"]), 6),
                "p_size": int(sb["val"]),
                "size_count": int(sb["count"]),
            })
    return pd.DataFrame(rows).sort_values(
        ["p_brand", "p_size"]).reset_index(drop=True)


JSON_FACET_SQL = """
WITH top_brands AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS count,
         ROUND(AVG(p_retailprice), 6) AS avg_price
  FROM part GROUP BY p_brand
  ORDER BY count DESC, p_brand LIMIT 5
),
sizes AS (
  SELECT p_brand, p_size, CAST(COUNT(*) AS BIGINT) AS size_count,
    ROW_NUMBER() OVER (PARTITION BY p_brand
                       ORDER BY COUNT(*) DESC, p_size) AS rn
  FROM part WHERE p_brand IN (SELECT p_brand FROM top_brands)
  GROUP BY p_brand, p_size
)
SELECT t.p_brand, t.count, t.avg_price,
       CAST(s.p_size AS BIGINT) AS p_size, s.size_count
FROM top_brands t JOIN sizes s USING (p_brand)
WHERE s.rn <= 2 ORDER BY t.p_brand, s.p_size
"""

QUERIES["json_facet_brands"] = json_facet_brands
ORACLES["json_facet_brands"] = JSON_FACET_SQL


# -- Solr SQL front-end ------------------------------------------------------

def sql_orders(sf_dir: str) -> pd.DataFrame:
    """SQL-over-streams gate (reference ``solr/core/.../handler/sql/``):
    the SAME SQL string runs through our parser+streaming algebra and,
    verbatim, through DuckDB as the oracle."""
    from lucene_solr_ray.stages.sql import sql_query

    out = sql_query(
        SQL_ORDERS_TEXT,
        lambda name: _read(sf_dir, name),
    )
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


SQL_ORDERS_TEXT = (
    "SELECT o_orderpriority, COUNT(*) AS n, "
    "MIN(o_totalprice) AS min_p, MAX(o_totalprice) AS max_p "
    "FROM orders WHERE o_totalprice > 50000 "
    "GROUP BY o_orderpriority HAVING n > 10 "
    "ORDER BY o_orderpriority LIMIT 10"
)

SQL_ORDERS_SQL = SQL_ORDERS_TEXT.replace(
    "COUNT(*) AS n", "CAST(COUNT(*) AS BIGINT) AS n"
)

QUERIES["sql_orders"] = sql_orders
ORACLES["sql_orders"] = SQL_ORDERS_SQL


def sql_select_limit(sf_dir: str) -> pd.DataFrame:
    """Plain (un-aggregated) SELECT with ORDER BY + LIMIT: compiles to
    ``Dataset.sort().limit()`` IN the cluster — only the 10-row head ever
    reaches the driver (the round-3 review's full-table ``to_pandas``
    anti-pattern is gone).  Unique ORDER BY tiebreak (o_orderkey) keeps
    the head deterministic on both engines."""
    from lucene_solr_ray.stages.sql import sql_query

    return sql_query(
        SQL_SELECT_LIMIT_TEXT, lambda name: _read(sf_dir, name)
    ).reset_index(drop=True)


SQL_SELECT_LIMIT_TEXT = (
    "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders "
    "WHERE o_totalprice > 100000 AND o_orderpriority <> '1-URGENT' "
    "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"
)

QUERIES["sql_select_limit"] = sql_select_limit
ORACLES["sql_select_limit"] = SQL_SELECT_LIMIT_TEXT


def sql_join_orders(sf_dir: str) -> pd.DataFrame:
    """SQL JOIN gate (reference ``SolrRules.java`` join rules → our
    size-aware ``inner_join`` dispatch): the SAME join SQL runs through
    the streaming compiler and verbatim through DuckDB.  customer is
    dimension-sized → the broadcast build-small/probe-big path; safe
    WHERE conjuncts push below the join to their own side."""
    from lucene_solr_ray.stages.sql import sql_query

    out = sql_query(SQL_JOIN_TEXT, lambda name: _read(sf_dir, name))
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


SQL_JOIN_TEXT = (
    "SELECT c_mktsegment, COUNT(*) AS n, "
    "MIN(o_totalprice) AS min_p, MAX(o_totalprice) AS max_p "
    "FROM orders JOIN customer ON orders.o_custkey = customer.c_custkey "
    "WHERE o_totalprice > 50000 AND c_mktsegment <> 'BUILDING' "
    "GROUP BY c_mktsegment ORDER BY c_mktsegment"
)

SQL_JOIN_SQL = SQL_JOIN_TEXT.replace(
    "COUNT(*) AS n", "CAST(COUNT(*) AS BIGINT) AS n"
)

QUERIES["sql_join_orders"] = sql_join_orders
ORACLES["sql_join_orders"] = SQL_JOIN_SQL


def sql_expr_lineitem(sf_dir: str) -> pd.DataFrame:
    """SQL scalar expressions in SELECT and aggregate arguments
    (the second half of the reference's Calcite projection support,
    ``SolrRules.java`` project rules): arithmetic compiles to one fused
    Arrow map_batches; the SAME SQL text runs verbatim through DuckDB."""
    from lucene_solr_ray.stages.sql import sql_query

    out = sql_query(SQL_EXPR_TEXT, lambda name: _read(sf_dir, name))
    out["n"] = out["n"].astype("int64")
    out["revenue"] = out["revenue"].round(4)
    out["avg_net"] = out["avg_net"].round(4)
    return out.reset_index(drop=True)


SQL_EXPR_TEXT = (
    "SELECT l_returnflag, COUNT(*) AS n, "
    "SUM(l_extendedprice * (1 - l_discount)) AS revenue, "
    "AVG(l_extendedprice * (1 - l_discount) / l_quantity) AS avg_net "
    "FROM lineitem WHERE l_quantity > 5 "
    "GROUP BY l_returnflag ORDER BY l_returnflag"
)

SQL_EXPR_SQL = SQL_EXPR_TEXT.replace(
    "COUNT(*) AS n", "CAST(COUNT(*) AS BIGINT) AS n"
).replace(
    "SUM(l_extendedprice * (1 - l_discount)) AS revenue",
    "ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue",
).replace(
    "AVG(l_extendedprice * (1 - l_discount) / l_quantity) AS avg_net",
    "ROUND(AVG(l_extendedprice * (1 - l_discount) / l_quantity), 4) "
    "AS avg_net",
)

QUERIES["sql_expr_lineitem"] = sql_expr_lineitem
ORACLES["sql_expr_lineitem"] = SQL_EXPR_SQL


# -- taxonomy facets + drill-down/sideways ----------------------------------

def taxonomy_facet_docs(sf_dir: str) -> pd.DataFrame:
    """Hierarchical taxonomy counts (reference
    ``FastTaxonomyFacetCounts.java``): documents labeled with the
    two-level path lang/source; every ancestor prefix counts once per
    doc."""
    import pyarrow.compute as pc

    from lucene_solr_ray.stages.facets import taxonomy_counts

    ds = _read(sf_dir, "documents", ["lang", "source"])

    def _path(t: pa.Table) -> pa.Table:
        p = pc.binary_join_element_wise(
            t.column("lang"), t.column("source"), "/"
        )
        return pa.table({"path": p})

    out = taxonomy_counts(
        ds.map_batches(_path, batch_format="pyarrow"), "path"
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("path").reset_index(drop=True)


TAXONOMY_SQL = """
SELECT lang AS path, CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY lang
UNION ALL
SELECT lang || '/' || source, CAST(COUNT(*) AS BIGINT)
FROM documents GROUP BY lang, source
ORDER BY path
"""

QUERIES["taxonomy_facet_docs"] = taxonomy_facet_docs
ORACLES["taxonomy_facet_docs"] = TAXONOMY_SQL


def drill_sideways_docs(sf_dir: str) -> pd.DataFrame:
    """DrillSideways gate (reference ``DrillSideways.java:69``): drill
    down on l_returnflag='R' AND l_linestatus='F'; each drilled dim's
    facet counts are computed with the OTHER filter applied (near-miss
    counting) in ONE distributed pass; ``__hits__`` carries the fully
    drilled count."""
    from lucene_solr_ray.stages.facets import drill_sideways

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    out = drill_sideways(
        ds, {"l_returnflag": "R", "l_linestatus": "F"}
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["dim", "value"]).reset_index(drop=True)


DRILL_SIDEWAYS_SQL = """
SELECT 'l_returnflag' AS dim, l_returnflag AS value,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem WHERE l_linestatus = 'F' GROUP BY l_returnflag
UNION ALL
SELECT 'l_linestatus', l_linestatus, CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus
UNION ALL
SELECT '__hits__', '', CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'
ORDER BY dim, value
"""

QUERIES["drill_sideways_docs"] = drill_sideways_docs
ORACLES["drill_sideways_docs"] = DRILL_SIDEWAYS_SQL


# -- pivot facets + field collapsing ----------------------------------------

def pivot_priority_segment(sf_dir: str) -> pd.DataFrame:
    """Two-level pivot facet (orderpriority → mktsegment via a customer
    join), flattened for the gate: level-1 value/count + top-3 level-2
    buckets (count desc, value asc)."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.stages.relational import hash_join, pivot_facet

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    customer = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).to_pandas()
    joined = hash_join(orders, customer, on="o_custkey",
                       right_on="c_custkey")
    tree = pivot_facet(joined, ["o_orderpriority", "c_mktsegment"],
                       limit=3)
    rows = []
    for n1 in tree:
        for n2 in n1.get("pivot", []):
            rows.append({
                "o_orderpriority": n1["value"], "n1": n1["count"],
                "c_mktsegment": n2["value"], "n2": n2["count"],
            })
    out = pd.DataFrame(rows).astype({"n1": "int64", "n2": "int64"})
    return out.sort_values(
        ["o_orderpriority", "c_mktsegment"]).reset_index(drop=True)


PIVOT_SQL = """
WITH j AS (
  SELECT o_orderpriority, c_mktsegment
  FROM orders JOIN customer ON o_custkey = c_custkey
),
l1 AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n1
  FROM j GROUP BY o_orderpriority
  ORDER BY n1 DESC, o_orderpriority LIMIT 3
),
l2 AS (
  SELECT j.o_orderpriority, j.c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n2,
         ROW_NUMBER() OVER (
           PARTITION BY j.o_orderpriority
           ORDER BY COUNT(*) DESC, j.c_mktsegment
         ) AS rn
  FROM j WHERE j.o_orderpriority IN (SELECT o_orderpriority FROM l1)
  GROUP BY j.o_orderpriority, j.c_mktsegment
)
SELECT l1.o_orderpriority, l1.n1, l2.c_mktsegment, l2.n2
FROM l1 JOIN l2 USING (o_orderpriority)
WHERE l2.rn <= 3
ORDER BY l1.o_orderpriority, l2.c_mktsegment
"""

QUERIES["pivot_priority_segment"] = pivot_priority_segment
ORACLES["pivot_priority_segment"] = PIVOT_SQL


def collapse_orders(sf_dir: str) -> pd.DataFrame:
    """Field collapsing: the single highest-value order per priority
    (CollapsingQParserPlugin semantics, best by o_totalprice)."""
    from lucene_solr_ray.stages.relational import collapse_stream

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])
    out = collapse_stream(ds, "o_orderpriority", "o_totalprice").to_pandas()
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    return out[["o_orderpriority", "o_orderkey", "o_totalprice"]] \
        .sort_values("o_orderpriority").reset_index(drop=True)


COLLAPSE_SQL = """
SELECT o_orderpriority, CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC) AS rn
  FROM orders
) WHERE rn = 1 ORDER BY o_orderpriority
"""

QUERIES["collapse_orders"] = collapse_orders
ORACLES["collapse_orders"] = COLLAPSE_SQL


# -- graph streams (gatherNodes / shortestPath) ------------------------------

def gather_nodes_orders(sf_dir: str) -> pd.DataFrame:
    """gatherNodes gate: 1-hop expansion over the order→part bipartite
    edge relation (lineitem) from the first 20 orderkeys — per gathered
    part, the number of distinct ancestor orders."""
    from lucene_solr_ray.stages.graph import gather_nodes

    edges = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    roots = list(range(1, 21))
    out = gather_nodes(edges, "l_orderkey", "l_partkey", roots, hops=1)
    out = out[out["level"] == 1]
    out = out.rename(columns={"node": "l_partkey"})
    return out[["l_partkey", "ancestors"]].astype(
        {"l_partkey": "int64", "ancestors": "int64"}
    ).sort_values("l_partkey").reset_index(drop=True)


GATHER_SQL = """
SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ancestors
FROM lineitem
WHERE l_orderkey BETWEEN 1 AND 20
  AND l_partkey NOT BETWEEN 1 AND 20  -- roots stay at level 0
GROUP BY l_partkey ORDER BY l_partkey
"""

QUERIES["gather_nodes_orders"] = gather_nodes_orders
ORACLES["gather_nodes_orders"] = GATHER_SQL


def score_nodes_parts(sf_dir: str) -> pd.DataFrame:
    """scoreNodes composite gate (ScoreNodesStream.java:243 over a
    gatherNodes frontier): 1-hop part expansion from orders 1..20, then
    tf-idf node scoring against the lineitem collection — termFreq is the
    gathered ancestor count, docFreq one distributed value-count pass."""
    from lucene_solr_ray.stages.graph import gather_nodes, score_nodes

    edges = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    roots = list(range(1, 21))
    nodes = gather_nodes(edges, "l_orderkey", "l_partkey", roots, hops=1)
    nodes = nodes[nodes["level"] == 1][["node", "ancestors"]]
    docs = _read(sf_dir, "lineitem", ["l_partkey"])
    out = score_nodes(nodes, docs, "l_partkey",
                      node_col="node", term_freq_col="ancestors")
    out = out.rename(columns={"node": "l_partkey"})
    out["nodeScore"] = out["nodeScore"].round(6)
    return out[["l_partkey", "nodeScore", "docFreq", "numDocs"]].astype(
        {"l_partkey": "int64", "docFreq": "int64", "numDocs": "int64"}
    ).sort_values(["nodeScore", "l_partkey"],
                  ascending=[False, True]).reset_index(drop=True)


SCORE_NODES_SQL = """
WITH nodes AS (
  SELECT l_partkey, COUNT(DISTINCT l_orderkey) AS ancestors
  FROM lineitem
  WHERE l_orderkey BETWEEN 1 AND 20
    AND l_partkey NOT BETWEEN 1 AND 20
  GROUP BY l_partkey
), stats AS (
  SELECT COUNT(*) AS numdocs FROM lineitem
), dfs AS (
  SELECT l_partkey, COUNT(*) AS df FROM lineitem GROUP BY l_partkey
)
SELECT CAST(n.l_partkey AS BIGINT) AS l_partkey,
       ROUND((ln(n.ancestors) + 1.0)
             * (ln((s.numdocs + 1) / (d.df + 1.0)) + 1.0), 6) AS nodeScore,
       CAST(d.df AS BIGINT) AS docFreq,
       CAST(s.numdocs AS BIGINT) AS numDocs
FROM nodes n, stats s, dfs d
WHERE d.l_partkey = n.l_partkey
ORDER BY nodeScore DESC, l_partkey
"""

QUERIES["score_nodes_parts"] = score_nodes_parts
ORACLES["score_nodes_parts"] = SCORE_NODES_SQL


# -- evaluator expressions (SelectStream + 201-evaluator family) -------------

def evaluator_exprs(sf_dir: str) -> pd.DataFrame:
    """Evaluator-expression gate: nested math/conditional/string
    evaluators compiled once and applied vectorized; SQL-matched."""
    from lucene_solr_ray.stages.evaluators import evaluate

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_totalprice", "o_orderpriority"])
    out = evaluate(ds, {
        "price_sq": "round(mult(o_totalprice, o_totalprice))",
        "bucket": "if(gt(o_totalprice, 100000), 1, 0)",
        "scaled": "round(mult(div(add(o_totalprice, 50), 2), 10))",
        "prio_up": "upper(o_orderpriority)",
    }).to_pandas()
    out = out[["o_orderkey", "price_sq", "bucket", "scaled", "prio_up"]]
    for c in ("o_orderkey", "price_sq", "bucket", "scaled"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True).head(2000)


EVAL_EXPR_SQL = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
  CAST(ROUND(o_totalprice * o_totalprice) AS BIGINT) AS price_sq,
  CAST(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END AS BIGINT)
    AS bucket,
  CAST(ROUND(((o_totalprice + 50) / 2) * 10) AS BIGINT) AS scaled,
  upper(o_orderpriority) AS prio_up
FROM orders ORDER BY o_orderkey LIMIT 2000
"""

QUERIES["evaluator_exprs"] = evaluator_exprs
ORACLES["evaluator_exprs"] = EVAL_EXPR_SQL


def interval_facet_orders(sf_dir: str) -> pd.DataFrame:
    """facet.interval gate: overlapping arbitrary intervals over
    o_totalprice (intervals MAY overlap, unlike range facets)."""
    from lucene_solr_ray.stages.relational import interval_facet

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    out = interval_facet(ds, "o_totalprice", [
        ("cheap", None, 50_000.0, False, False),
        ("mid", 50_000.0, 150_000.0, True, False),
        ("broad", 100_000.0, None, True, False),
        ("all", None, None, True, True),
    ]).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("interval").reset_index(drop=True)


INTERVAL_SQL = """
SELECT interval, CAST(n AS BIGINT) AS n FROM (
  SELECT 'cheap' AS interval, COUNT(*) AS n FROM orders
    WHERE o_totalprice < 50000
  UNION ALL
  SELECT 'mid', COUNT(*) FROM orders
    WHERE o_totalprice >= 50000 AND o_totalprice < 150000
  UNION ALL
  SELECT 'broad', COUNT(*) FROM orders WHERE o_totalprice >= 100000
  UNION ALL
  SELECT 'all', COUNT(*) FROM orders
) ORDER BY interval
"""

QUERIES["interval_facet_orders"] = interval_facet_orders
ORACLES["interval_facet_orders"] = INTERVAL_SQL


def grouped_percentiles_orders(sf_dir: str) -> pd.DataFrame:
    """Grouped exact percentiles (linear interpolation == quantile_cont)."""
    from lucene_solr_ray.stages.relational import grouped_percentiles

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    out = grouped_percentiles(
        ds, "o_orderpriority", "o_totalprice", [25, 50, 90]
    ).to_pandas()
    for c in ("p25", "p50", "p90"):
        out[c] = out[c].round(4)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


GROUPED_PCT_SQL = """
SELECT o_orderpriority,
  ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
  ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
  ROUND(quantile_cont(o_totalprice, 0.90), 4) AS p90
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

QUERIES["grouped_percentiles_orders"] = grouped_percentiles_orders
ORACLES["grouped_percentiles_orders"] = GROUPED_PCT_SQL


# -- expressions compiler (JavascriptCompiler over doc values) ---------------

_EXPR_SRC = ("sqrt(price) + ln(okey + 1) * ((okey % 7 < 3) ? 1.5 : 0.5)"
             " + max(ck % 5, 1)")


def expr_sort_orders(sf_dir: str) -> pd.DataFrame:
    """Expressions-module gate (JavascriptCompiler.java → numpy closure):
    compile once on the driver, evaluate per Arrow batch as column math
    (ternary, %, sqrt/ln/max all exercised), distributed top-50 sort.
    SQL-matched."""
    from lucene_solr_ray.search.expressions import compile_expression

    expr = compile_expression(_EXPR_SRC)
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_totalprice", "o_custkey"])

    def _score(t: pa.Table) -> pa.Table:
        vals = expr.evaluate({
            "price": t.column("o_totalprice").to_numpy().astype(np.float64),
            "okey": t.column("o_orderkey").to_numpy().astype(np.float64),
            "ck": t.column("o_custkey").to_numpy().astype(np.float64),
        })
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "expr_score": pa.array(np.round(vals, 6)),
        })

    out = (
        ds.map_batches(_score, batch_format="pyarrow")
        .sort(["expr_score", "o_orderkey"], descending=[True, False])
        .limit(50)
        .to_pandas()
    )
    return out.astype({"o_orderkey": "int64"}).reset_index(drop=True)


EXPR_SORT_SQL = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       ROUND(sqrt(o_totalprice)
             + ln(o_orderkey + 1)
               * (CASE WHEN o_orderkey % 7 < 3 THEN 1.5 ELSE 0.5 END)
             + GREATEST(o_custkey % 5, 1), 6) AS expr_score
FROM orders
ORDER BY expr_score DESC, o_orderkey LIMIT 50
"""

QUERIES["expr_sort_orders"] = expr_sort_orders
ORACLES["expr_sort_orders"] = EXPR_SORT_SQL


# -- Solr math expressions (let/col vector-statistics family) ----------------

def math_stats_lineitem(sf_dir: str) -> pd.DataFrame:
    """Math-expression gate (reference ``solr/solrj/.../io/eval/`` —
    MeanEvaluator, VarianceEvaluator, CorrelationEvaluator, …): a ``let()``
    program pulls two columns with ``col()`` and computes the vector
    statistics driver-side, exactly the reference's math-expression
    execution shape.  Every output is SQL-exact (sample statistics,
    geometric mean via exp∘avg∘ln) and rounded to 6 decimals."""
    from lucene_solr_ray.stages.matheval import let_eval

    t = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"]).to_pandas()
    out = let_eval({
        "li": t,
        "q": "col(li, l_quantity)",
        "d": "col(li, l_discount)",
        "mean_q": "mean(q)",
        "var_q": "var(q)",
        "stdev_q": "stddev(q)",
        "gmean_q": "geometricMean(q)",
        "sum_d": "mult(mean(d), length(d))",
        "corr_qd": "correlation(q, d)",
        "cov_qd": "covariance(q, d)",
        "min_q": "valueAt(asc(q), 0)",
        "max_q": "valueAt(rev(asc(q)), 0)",
    })
    cols = ["mean_q", "var_q", "stdev_q", "gmean_q", "sum_d",
            "corr_qd", "cov_qd", "min_q", "max_q"]
    return pd.DataFrame([{c: round(float(out[c]), 6) for c in cols}])


MATH_STATS_SQL = """
SELECT ROUND(AVG(l_quantity), 6)                 AS mean_q,
       ROUND(VAR_SAMP(l_quantity), 6)            AS var_q,
       ROUND(STDDEV_SAMP(l_quantity), 6)         AS stdev_q,
       ROUND(EXP(AVG(LN(l_quantity))), 6)        AS gmean_q,
       ROUND(AVG(l_discount) * COUNT(*), 6)      AS sum_d,
       ROUND(CORR(l_quantity, l_discount), 6)    AS corr_qd,
       ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS cov_qd,
       ROUND(MIN(l_quantity), 6)                 AS min_q,
       ROUND(MAX(l_quantity), 6)                 AS max_q
FROM lineitem
"""

QUERIES["math_stats_lineitem"] = math_stats_lineitem
ORACLES["math_stats_lineitem"] = MATH_STATS_SQL


def math_tests_lineitem(sf_dir: str) -> pd.DataFrame:
    """Significance-test / distribution evaluator gate (reference
    ``solr/solrj/.../io/eval/`` TTestEvaluator, MadEvaluator,
    EmpiricalDistributionEvaluator + CumulativeProbabilityEvaluator):
    a ``let()`` program compares l_quantity across return flags with the
    Welch t statistic, plus MAD and the empirical CDF at 25 — every
    output replayed exactly in SQL."""
    from lucene_solr_ray.stages.matheval import let_eval

    t = _read(sf_dir, "lineitem",
              ["l_quantity", "l_returnflag"]).to_pandas()
    a = t[t.l_returnflag == "A"]
    r = t[t.l_returnflag == "R"]
    out = let_eval({
        "qa": a["l_quantity"].to_numpy(dtype="float64"),
        "qr": r["l_quantity"].to_numpy(dtype="float64"),
        "qall": t["l_quantity"].to_numpy(dtype="float64"),
        "tt": "ttest(qa, qr)",
        "mad_q": "mad(qall)",
        "ed": "empiricalDistribution(qall)",
        "cdf25": "cumulativeProbability(ed, 25)",
    })
    return pd.DataFrame([{
        "t_stat": round(float(out["tt"]["t-statistic"]), 6),
        "mad_q": round(float(out["mad_q"]), 6),
        "cdf25": round(float(out["cdf25"]), 6),
    }])


MATH_TESTS_SQL = """
WITH g AS (
  SELECT l_returnflag AS f, AVG(l_quantity) AS m,
         VAR_SAMP(l_quantity) AS v, COUNT(*) AS n
  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1
),
w AS (
  SELECT (a.m - r.m) / SQRT(a.v / a.n + r.v / r.n) AS t_stat
  FROM (SELECT * FROM g WHERE f = 'A') a,
       (SELECT * FROM g WHERE f = 'R') r
),
med AS (SELECT MEDIAN(l_quantity) AS md FROM lineitem),
madv AS (
  SELECT MEDIAN(ABS(l_quantity - med.md)) AS mad_q
  FROM lineitem, med
),
cdf AS (
  SELECT SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END)
           / CAST(COUNT(*) AS DOUBLE) AS cdf25
  FROM lineitem
)
SELECT ROUND(w.t_stat, 6) AS t_stat, ROUND(madv.mad_q, 6) AS mad_q,
       ROUND(cdf.cdf25, 6) AS cdf25
FROM w, madv, cdf
"""

QUERIES["math_tests_lineitem"] = math_tests_lineitem
ORACLES["math_tests_lineitem"] = MATH_TESTS_SQL


def temporal_events(sf_dir: str) -> pd.DataFrame:
    """Temporal evaluator gate (reference ``io/eval/TemporalEvaluator*``):
    year/month/day/hour/dayOfYear columns derived per tuple with the
    vectorized evaluator compiler, then a distributed per-(month, hour)
    rollup — DuckDB replays the date parts."""
    from ray.data.aggregate import Count, Sum

    from lucene_solr_ray.stages.evaluators import evaluate

    ds = _read(sf_dir, "events", ["ts", "value"])
    ds = evaluate(ds, {
        "y": "year(ts)", "mo": "month(ts)", "d": "day(ts)",
        "h": "hour(ts)", "doy": "dayOfYear(ts)",
    })

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)),
                        pa.int64())
        return t.append_column("v_c", cents)

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["y", "mo", "h"])
        .aggregate(Count(alias_name="n"), Sum("v_c", alias_name="sum_v_c"),
                   Sum("doy", alias_name="sum_doy"))
        .to_pandas()
    )
    for c in ("n", "sum_v_c", "sum_doy"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["y", "mo", "h"]).reset_index(drop=True)


TEMPORAL_EVENTS_SQL = """
SELECT CAST(EXTRACT(year FROM ts) AS BIGINT) AS y,
       CAST(EXTRACT(month FROM ts) AS BIGINT) AS mo,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_v_c,
       CAST(SUM(EXTRACT(doy FROM ts)) AS BIGINT) AS sum_doy
FROM events GROUP BY 1, 2, 3 ORDER BY y, mo, h
"""

QUERIES["temporal_events"] = temporal_events
ORACLES["temporal_events"] = TEMPORAL_EVENTS_SQL


def stream_expr_rollup(sf_dir: str) -> pd.DataFrame:
    """Streaming-expression STRING gate (reference ``StreamFactory`` +
    ``StreamExpressionParser``, ``solr/solrj/.../io/stream/expr/``): the
    textual API parses and compiles onto the same stages the programmatic
    gates use — having(rollup(search(...)))."""
    from lucene_solr_ray.stages.streamexpr import StreamFactory

    f = StreamFactory(tables=lambda name: _read(sf_dir, name))
    out = f.run(
        'having('
        'rollup('
        'search(lineitem, q="l_quantity > 10", '
        'fl="l_returnflag,l_quantity,l_extendedprice"), '
        'over="l_returnflag", count(*) as n, sum(l_quantity) as sq, '
        'min(l_extendedprice) as mn), '
        'gt(n, 5))'
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    out["sq"] = out["sq"].round(4)
    out["mn"] = out["mn"].round(4)
    return out.sort_values("l_returnflag").reset_index(drop=True)


STREAM_EXPR_SQL = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(l_quantity), 4) AS sq,
       ROUND(MIN(l_extendedprice), 4) AS mn
FROM lineitem WHERE l_quantity > 10
GROUP BY l_returnflag HAVING COUNT(*) > 5
ORDER BY l_returnflag
"""

QUERIES["stream_expr_rollup"] = stream_expr_rollup
ORACLES["stream_expr_rollup"] = STREAM_EXPR_SQL


def sql_two_joins(sf_dir: str) -> pd.DataFrame:
    """SQL multi-join gate (round 5): a left-deep two-join chain
    (orders ⋈ customer ⋈ nation) through the streaming compiler — safe
    WHERE conjuncts push below the joins to their own input; the SAME
    SQL text runs verbatim through DuckDB."""
    from lucene_solr_ray.stages.sql import sql_query

    out = sql_query(SQL_TWO_JOINS_TEXT, lambda name: _read(sf_dir, name))
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


SQL_TWO_JOINS_TEXT = (
    "SELECT n_name, COUNT(*) AS n, "
    "MIN(o_totalprice) AS min_p, MAX(o_totalprice) AS max_p "
    "FROM orders JOIN customer ON orders.o_custkey = customer.c_custkey "
    "JOIN nation ON customer.c_nationkey = nation.n_nationkey "
    "WHERE o_orderpriority = '1-URGENT' "
    "GROUP BY n_name ORDER BY n_name LIMIT 10"
)

SQL_TWO_JOINS_SQL = SQL_TWO_JOINS_TEXT.replace(
    "COUNT(*) AS n", "CAST(COUNT(*) AS BIGINT) AS n"
)

QUERIES["sql_two_joins"] = sql_two_joins
ORACLES["sql_two_joins"] = SQL_TWO_JOINS_SQL


def sql_distinct(sf_dir: str) -> pd.DataFrame:
    """SELECT DISTINCT gate (round 5): UniqueStream over the output
    tuple — per-batch local dedup bounds the shuffle, one grouped
    head(1) makes it global; the SAME SQL text runs through DuckDB."""
    from lucene_solr_ray.stages.sql import sql_query

    out = sql_query(SQL_DISTINCT_TEXT, lambda name: _read(sf_dir, name))
    return out.reset_index(drop=True)


SQL_DISTINCT_TEXT = (
    "SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders "
    "WHERE o_totalprice > 1000 "
    "ORDER BY o_orderpriority, o_orderstatus"
)

QUERIES["sql_distinct"] = sql_distinct
ORACLES["sql_distinct"] = SQL_DISTINCT_TEXT


def stream_expr_plumbing(sf_dir: str) -> pd.DataFrame:
    """Textual plumbing-decorator gate (round 5): list/tup/null/priority
    compose — two null() counters and a priority() branch over the
    orders table, one row each."""
    from lucene_solr_ray.stages.streamexpr import StreamFactory

    f = StreamFactory(tables=lambda name: _read(sf_dir, name))
    out = f.run(
        'list('
        'null(search(orders, q="o_totalprice > 100000")), '
        'null(search(orders, q="o_totalprice <= 100000")))'
    ).to_pandas()
    out["nullCount"] = out["nullCount"].astype("int64")
    return out.sort_values("nullCount").reset_index(drop=True)


STREAM_EXPR_PLUMBING_SQL = """
SELECT CAST(COUNT(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT)
       AS nullCount
FROM orders
UNION ALL
SELECT CAST(COUNT(*) FILTER (WHERE o_totalprice <= 100000) AS BIGINT)
       AS nullCount
FROM orders
ORDER BY nullCount
"""

QUERIES["stream_expr_plumbing"] = stream_expr_plumbing
ORACLES["stream_expr_plumbing"] = STREAM_EXPR_PLUMBING_SQL


def sql_in_subquery(sf_dir: str) -> pd.DataFrame:
    """IN (SELECT ...) gate (round 5): the subquery compiles through the
    same engine and its single column becomes a broadcast semi-join
    build side; the SAME SQL text runs verbatim through DuckDB."""
    from lucene_solr_ray.stages.sql import sql_query

    out = sql_query(SQL_IN_SUB_TEXT, lambda name: _read(sf_dir, name))
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


SQL_IN_SUB_TEXT = (
    "SELECT o_orderpriority, COUNT(*) AS n, MAX(o_totalprice) AS max_p "
    "FROM orders WHERE o_custkey IN "
    "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') "
    "AND o_orderstatus IN ('F', 'O') "
    "GROUP BY o_orderpriority ORDER BY o_orderpriority"
)

SQL_IN_SUB_SQL = SQL_IN_SUB_TEXT.replace(
    "COUNT(*) AS n", "CAST(COUNT(*) AS BIGINT) AS n"
)

QUERIES["sql_in_subquery"] = sql_in_subquery
ORACLES["sql_in_subquery"] = SQL_IN_SUB_SQL


def stream_expr_reduce(sf_dir: str) -> pd.DataFrame:
    """ReducerStream textual gate (round 5): reduce(search(orders),
    by=priority, group(sort="totalprice desc, orderkey asc", n=3)) —
    one tuple per priority whose head fields are the group's top order
    (reference ``ReducerStream.java:60`` + ``ops/GroupOperation.java:44``);
    the oracle replays the argmax with a window function and the group
    size with LEAST(count, n)."""
    from lucene_solr_ray.stages.streamexpr import StreamFactory

    f = StreamFactory(tables=lambda name: _read(sf_dir, name))
    out = f.run(
        'reduce(search(orders, '
        'fl="o_orderkey,o_orderpriority,o_totalprice"), '
        'by="o_orderpriority", '
        'group(sort="o_totalprice desc, o_orderkey asc", n=3))'
    ).to_pandas()
    out["group_n"] = out["group"].map(len).astype("int64")
    out = out.drop(columns=["group"]).rename(columns={
        "o_orderpriority": "pri", "o_orderkey": "top_key",
        "o_totalprice": "top_price",
    })
    out["top_key"] = out["top_key"].astype("int64")
    out["top_price"] = out["top_price"].round(4)
    return out.sort_values("pri").reset_index(drop=True)


STREAM_EXPR_REDUCE_SQL = """
WITH ranked AS (
  SELECT o_orderpriority AS pri, o_orderkey AS top_key,
         o_totalprice AS top_price,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
  FROM orders)
SELECT pri, CAST(top_key AS BIGINT) AS top_key,
       ROUND(top_price, 4) AS top_price,
       CAST(LEAST(cnt, 3) AS BIGINT) AS group_n
FROM ranked WHERE rn = 1 ORDER BY pri
"""

QUERIES["stream_expr_reduce"] = stream_expr_reduce
ORACLES["stream_expr_reduce"] = STREAM_EXPR_REDUCE_SQL


def sql_like_between(sf_dir: str) -> pd.DataFrame:
    """SQL predicate-breadth gate (round 5 batch 2): BETWEEN + LIKE +
    NOT LIKE + IS NOT NULL through the streaming compiler; the SAME SQL
    text runs verbatim through DuckDB."""
    from lucene_solr_ray.stages.sql import sql_query

    out = sql_query(SQL_LIKE_BETWEEN_TEXT, lambda name: _read(sf_dir, name))
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["o_totalprice"] = out["o_totalprice"].round(4)
    return out.reset_index(drop=True)


SQL_LIKE_BETWEEN_TEXT = (
    "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders "
    "WHERE o_totalprice BETWEEN 50000.0 AND 60000.0 "
    "AND o_orderpriority LIKE '%-%' "
    "AND o_orderpriority NOT LIKE '%URGENT%' "
    "AND o_orderstatus IS NOT NULL "
    "ORDER BY o_orderkey LIMIT 25"
)

SQL_LIKE_BETWEEN_SQL = SQL_LIKE_BETWEEN_TEXT.replace(
    "o_orderkey, o_orderpriority, o_totalprice",
    "CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderpriority, "
    "ROUND(o_totalprice, 4) AS o_totalprice"
)

QUERIES["sql_like_between"] = sql_like_between
ORACLES["sql_like_between"] = SQL_LIKE_BETWEEN_SQL


def sql_count_distinct(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT) gate (round 5 batch 2): grouped distinct counts
    compile to a (keys, col) dedup shuffle + per-key count, joined to the
    regular rollup — exact at any scale, never a driver-side set."""
    from lucene_solr_ray.stages.sql import sql_query

    out = sql_query(SQL_COUNT_DISTINCT_TEXT,
                    lambda name: _read(sf_dir, name))
    for c in ("nc", "n"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


SQL_COUNT_DISTINCT_TEXT = (
    "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS nc, "
    "COUNT(*) AS n FROM orders GROUP BY o_orderpriority "
    "ORDER BY o_orderpriority"
)

SQL_COUNT_DISTINCT_SQL = SQL_COUNT_DISTINCT_TEXT.replace(
    "COUNT(DISTINCT o_custkey) AS nc",
    "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nc"
).replace("COUNT(*) AS n", "CAST(COUNT(*) AS BIGINT) AS n")

QUERIES["sql_count_distinct"] = sql_count_distinct
ORACLES["sql_count_distinct"] = SQL_COUNT_DISTINCT_SQL
