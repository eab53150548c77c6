"""Skew demo: salted vs plain groupby on a 50%-hot-key corpus.

Round-1 TODO #7: demonstrate `salted_groupby_sum` at bench scale and
record the reducer-size distribution before/after.  The hot key holds
half of all rows — the stop-word-scale shape where one reducer would
otherwise receive 50% of the shuffle.

Run: PYTHONPATH=/root/repo python tools/salting_bench.py [n_rows]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa


def main() -> None:
    import ray
    import ray.data

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    # 50% of rows carry the hot key; the rest spread over 10k cold keys
    rng = np.random.default_rng(7)
    hot_mask = rng.random(n) < 0.5
    keys = np.where(
        hot_mask, "the", np.char.add("k", (rng.integers(0, 10_000, n))
                                     .astype(str))
    )
    vals = rng.integers(0, 100, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"term": pa.array(keys.tolist(), pa.string()),
                  "v": pa.array(vals)})
    ).repartition(64).materialize()

    from ray.data.aggregate import Count, Sum

    from lucene_solr_ray.stages.partition import salted_groupby_sum

    # plain groupby: one reducer group receives every hot row
    t0 = time.time()
    plain = ds.groupby("term").aggregate(
        Sum("v", alias_name="v")
    ).materialize()
    t_plain = time.time() - t0
    sizes = ds.groupby("term").aggregate(
        Count(alias_name="sz")
    ).to_pandas()
    max_plain = int(sizes["sz"].max())

    # salted: the hot key fans out over 16 sub-groups
    t0 = time.time()
    salted = salted_groupby_sum(ds, "term", "v", hot_keys=["the"],
                                n_salts=16).materialize()
    t_salted = time.time() - t0
    from lucene_solr_ray.stages.partition import salt_hot_keys

    ssizes = salt_hot_keys(ds, "term", ["the"], 16).groupby(
        ["term", "salt"]
    ).aggregate(Count(alias_name="sz")).to_pandas()
    max_salted = int(ssizes["sz"].max())

    # exactness: identical sums
    a = plain.to_pandas().sort_values("term").reset_index(drop=True)
    b = salted.to_pandas().sort_values("term").reset_index(drop=True)
    assert a.equals(b), "salted result diverges from plain groupby"

    import json

    print(json.dumps({
        "rows": n,
        "hot_share": 0.5,
        "max_reducer_rows_plain": max_plain,
        "max_reducer_rows_salted": max_salted,
        "reduction_factor": round(max_plain / max_salted, 2),
        "sec_plain": round(t_plain, 3),
        "sec_salted": round(t_salted, 3),
        "exact": True,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
