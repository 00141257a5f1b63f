"""Semantics tests for the TPC-H-shaped join queries (Q3/Q4/Q13/Q17/Q18
analogues) on tiny synthetic star slices — each proves the join edge case
the shape exists for (zero-order customers kept, EXISTS counted once,
exact below-average predicate, HAVING threshold, global top-k tie-break).

The driver gate additionally hash-compares each against its DuckDB oracle
on the real sf tables.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from subgraph_isomorphism_pregel_ray.pipelines.relational import (
    customer_order_histogram,
    large_volume_orders,
    order_priority_semi,
    shipping_priority_topk,
    small_qty_revenue,
)


def _write(tmp_path, name, cols):
    pq.write_table(pa.table(cols), tmp_path / f"{name}.parquet")


def test_order_priority_semi_counts_each_order_once(ray_session, tmp_path):
    # order 1 has TWO qualifying lineitems -> still counted once (EXISTS,
    # not join-multiplied); order 3 has none -> excluded
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "2-HIGH"]),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_quantity": pa.array([50.0, 49.0, 48.0, 47.0]),
        },
    )
    got = order_priority_semi(str(tmp_path)).to_pandas().set_index("o_orderpriority")
    assert got.loc["1-URGENT", "n_orders"] == 2
    assert "2-HIGH" not in got.index


def test_customer_order_histogram_keeps_zero_order_customers(ray_session, tmp_path):
    # customers 1,2 place 2 and 1 orders; customers 3,4 place none ->
    # histogram bucket n_orders=0 must report 2 customers (LEFT join)
    _write(
        tmp_path,
        "customer",
        {"c_custkey": pa.array([1, 2, 3, 4], pa.int64())},
    )
    _write(
        tmp_path,
        "orders",
        {"o_custkey": pa.array([1, 1, 2, 99], pa.int64())},
    )
    got = (
        customer_order_histogram(str(tmp_path))
        .to_pandas()
        .set_index("n_orders")["n_custs"]
        .to_dict()
    )
    # orders from custkey 99 (no customer row) are dropped, not invented
    assert got == {0: 2, 1: 1, 2: 1}


def test_small_qty_revenue_exact_boundary(ray_session, tmp_path):
    # part 10: quantities 10,40 -> avg 25, 0.2*avg = 5; qty 10 is NOT < 5.
    # part 20: quantities 1,99 -> 0.2*avg = 10; qty 1 qualifies (price 700
    # dollars -> 700/7 = 100.0 yearly-averaged). Boundary case part 30:
    # qty 2,18 -> 0.2*avg = 2 exactly; 2 < 2 is false -> excluded (strict
    # inequality, exact ints).
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([10, 10, 20, 20, 30, 30], pa.int64()),
            "l_quantity": pa.array([10.0, 40.0, 1.0, 99.0, 2.0, 18.0]),
            "l_extendedprice": pa.array([5.0, 5.0, 700.0, 5.0, 900.0, 5.0]),
        },
    )
    got = small_qty_revenue(str(tmp_path))
    assert float(got["avg_yearly"].iloc[0]) == 100.0


def test_large_volume_orders_having_threshold(ray_session, tmp_path):
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([7, 8], pa.int64()),
            "o_totalprice": pa.array([100.5, 200.25]),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_quantity": pa.array([6.0, 5.0, 10.0]),
        },
    )
    got = large_volume_orders(str(tmp_path), min_qty_sum=10.0).to_pandas()
    assert sorted(got["o_orderkey"]) == [1]  # 11 > 10; order 2 == 10 excluded
    row = got.iloc[0]
    assert row["o_custkey"] == 7 and row["total_qty"] == 11.0
    assert row["o_totalprice"] == 100.5


def test_shipping_priority_topk_filters_and_tiebreak(ray_session, tmp_path):
    # orders 1,2 placed before the cutoff (3 after -> excluded); only
    # lineitems shipped AFTER the cutoff count; equal revenues tie-break
    # by orderkey ascending
    cut = np.datetime64("2000-01-01", "us")
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_orderdate": pa.array(
                np.array(["1999-06-01", "1999-07-01", "2000-02-01"], "datetime64[us]")
            ),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_extendedprice": pa.array([100.0, 50.0, 150.0, 999.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
            "l_shipdate": pa.array(
                np.array(
                    ["2000-03-01", "1999-12-31", "2000-03-01", "2000-03-01"],
                    "datetime64[us]",
                )
            ),
        },
    )
    got = (
        shipping_priority_topk(str(tmp_path), cutoff="2000-01-01", k=10)
        .to_pandas()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    # order 1: only the post-cutoff lineitem counts -> 100; order 2 -> 150
    assert list(got["o_orderkey"]) == [2, 1]
    assert list(got["revenue"]) == [150.0, 100.0]
    assert list(got["rnk"]) == [1, 2]
    assert list(got["o_orderdate"]) == ["1999-07-01", "1999-06-01"]


def test_waiting_suppliers_sole_returner(ray_session, tmp_path):
    # order 1: suppliers 5 (R) and 6 (N) -> supplier 5 waits.
    # order 2: suppliers 5 (R) and 6 (R) -> two returners, nobody waits.
    # order 3: supplier 5 (R) alone -> single-supplier order, excluded.
    # duplicate lineitems for (1,5) must not double-count.
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "l_suppkey": pa.array([5, 5, 6, 5, 6, 5], pa.int64()),
            "l_returnflag": pa.array(["R", "N", "N", "R", "R", "R"]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import waiting_suppliers

    got = waiting_suppliers(str(tmp_path)).to_pandas()
    assert got.set_index("l_suppkey")["numwait"].to_dict() == {5: 1}


def test_sales_opportunity_exact_avg_and_antijoin(ray_session, tmp_path):
    # positive balances: 100, 200, 300 -> avg 200. Customer 2 (200) is NOT
    # above average (strict); customer 3 (300) is, but has a RECENT order;
    # customer 4 (300, nation 9) has only a stale order -> qualifies.
    # Negative balance ignored in the average and never above it.
    _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "c_nationkey": pa.array([7, 7, 8, 9, 9], pa.int64()),
            "c_acctbal": pa.array([100.0, 200.0, 300.0, 300.0, -50.0]),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_custkey": pa.array([3, 4], pa.int64()),
            "o_orderdate": pa.array(
                np.array(["2000-07-01", "1999-01-01"], "datetime64[us]")
            ),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import sales_opportunity

    got = sales_opportunity(str(tmp_path)).to_pandas()
    assert got.set_index("c_nationkey")[["numcust", "totacctbal"]].to_dict("index") == {
        9: {"numcust": 1, "totacctbal": 300.0}
    }


def test_events_cumsum_per_user_reset(ray_session, tmp_path):
    ts = np.array(
        ["2024-01-01T00:00:00", "2024-01-01T00:01:00", "2024-01-01T00:02:00",
         "2024-01-01T00:00:30"],
        "datetime64[us]",
    )
    _write(
        tmp_path,
        "events",
        {
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "value": pa.array([1.25, 2.50, 0.25, 9.0]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_cumsum

    got = events_cumsum(str(tmp_path)).to_pandas().set_index("event_id")["cum_value"]
    assert got.to_dict() == {0: 1.25, 1: 3.75, 2: 4.0, 3: 9.0}


def test_succ_reciprocity_counts_mutual_edges(ray_session, tmp_path):
    # order 1 walks 10->11->10 (edges 10->11, 11->10: reciprocal pair);
    # order 2 walks 12->13 (one-way). 3 directed edges, 2 reciprocal.
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "l_linenumber": pa.array([1, 2, 3, 1, 2], pa.int32()),
            "l_partkey": pa.array([10, 11, 10, 12, 13], pa.int64()),
            "l_quantity": pa.array([1.0, 1.0, 1.0, 1.0, 1.0]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import succ_reciprocity

    got = succ_reciprocity(str(tmp_path))
    assert int(got["n_edges"].iloc[0]) == 3
    assert int(got["n_recip"].iloc[0]) == 2
    assert abs(float(got["reciprocity"].iloc[0]) - 0.666667) < 1e-9


def test_revenue_rollup_levels_consistent(ray_session):
    # rollup over the real sf0.001 slice: nation rows sum to their region
    # row, region rows sum to the grand total ('ALL','ALL')
    from subgraph_isomorphism_pregel_ray.pipelines.relational import revenue_rollup

    df = revenue_rollup("/root/testdata/sf0.001").to_pandas()
    total = df[(df.r_name == "ALL") & (df.n_name == "ALL")]["revenue"].iloc[0]
    regions = df[(df.r_name != "ALL") & (df.n_name == "ALL")]
    nations = df[df.n_name != "ALL"]
    assert abs(regions["revenue"].sum() - total) < 1e-6
    assert abs(nations["revenue"].sum() - total) < 1e-6
    for r, grp in nations.groupby("r_name"):
        assert abs(
            grp["revenue"].sum()
            - regions[regions.r_name == r]["revenue"].iloc[0]
        ) < 1e-6


def test_user_event_pivot_counts(ray_session, tmp_path):
    ts = np.array(["2024-01-01"] * 4, "datetime64[us]")
    _write(
        tmp_path,
        "events",
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "event_type": pa.array(["click", "click", "purchase", "view"]),
            "value": pa.array([1.5, 2.5, 10.0, 0.25]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import user_event_pivot

    got = user_event_pivot(str(tmp_path)).to_pandas().set_index("user_id")
    assert got.loc[1, "n_click"] == 2 and got.loc[1, "n_purchase"] == 1
    assert got.loc[1, "n_view"] == 0 and got.loc[1, "total_value"] == 14.0
    assert got.loc[2, "n_view"] == 1 and got.loc[2, "total_value"] == 0.25


def test_component_size_histogram_multi(ray_session):
    # 2 triangles + 1 edge + the histogram machine: {3: 2, 2: 1}
    import ray.data as rd
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        component_size_histogram,
    )

    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (20, 21)]
    sym = edges + [(b, a) for a, b in edges]
    eds = rd.from_items([{"src": a, "dst": b} for a, b in sym])
    got = component_size_histogram(eds, num_parts=3)
    assert got.set_index("csize")["n_components"].to_dict() == {3: 2, 2: 1}


def test_events_ntile_sql_sizing(ray_session, tmp_path):
    # user 1 has 6 events -> NTILE(4) tiles of sizes 2,2,1,1;
    # user 2 has 2 events (< k) -> tiles 1 and 2
    ts = np.array([f"2024-01-01T00:0{i}:00" for i in range(6)] + 
                  ["2024-01-02T00:00:00", "2024-01-02T00:01:00"], "datetime64[us]")
    _write(
        tmp_path,
        "events",
        {
            "event_id": pa.array(list(range(8)), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array([1] * 6 + [2, 2], pa.int64()),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_ntile

    got = events_ntile(str(tmp_path), k=4).to_pandas().set_index("event_id")["tile"]
    assert got.to_dict() == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 4, 6: 1, 7: 2}


def test_user_first_last_partial_fold(ray_session, tmp_path):
    # order within user decided by (ts, event_id): user 1 ties on ts at the
    # end -> last = higher event_id; values carried untouched
    ts = np.array(
        ["2024-01-01T00:01:00", "2024-01-01T00:00:00",
         "2024-01-01T00:02:00", "2024-01-01T00:02:00", "2024-01-05T00:00:00"],
        "datetime64[us]",
    )
    _write(
        tmp_path,
        "events",
        {
            "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "value": pa.array([10.5, 20.25, 30.0, 40.75, 5.0]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import user_first_last

    got = user_first_last(str(tmp_path)).to_pandas().set_index("user_id")
    assert got.loc[1, "first_value"] == 20.25  # earliest ts
    assert got.loc[1, "last_value"] == 40.75  # ts tie -> larger event_id
    assert got.loc[1, "n_events"] == 4
    assert got.loc[2, "first_value"] == 5.0 and got.loc[2, "last_value"] == 5.0


def test_tpch_shapes_on_empty_tables(ray_session, tmp_path):
    """Every TPC-H-shaped join op streams zero-row inputs cleanly (empty
    or all-zero outputs, no shape errors in the bucket kernels)."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    for t in ("lineitem", "orders", "customer", "part", "supplier",
              "nation", "region", "events", "documents"):
        pq.write_table(
            pq.read_schema(f"{sf}/{t}.parquet").empty_table(),
            tmp_path / f"{t}.parquet",
        )
    from subgraph_isomorphism_pregel_ray.pipelines.bpe import bpe_train
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        customer_order_histogram,
        events_cumsum,
        events_ntile,
        large_volume_orders,
        order_priority_semi,
        sales_opportunity,
        shipping_priority_topk,
        small_qty_revenue,
        succ_reciprocity,
        user_event_pivot,
        user_first_last,
        waiting_suppliers,
    )

    d = str(tmp_path)
    for name, out in {
        "order_priority_semi": order_priority_semi(d),
        "customer_order_histogram": customer_order_histogram(d),
        "large_volume_orders": large_volume_orders(d),
        "shipping_priority_topk": shipping_priority_topk(d),
        "waiting_suppliers": waiting_suppliers(d),
        "sales_opportunity": sales_opportunity(d),
        "events_cumsum": events_cumsum(d),
        "events_ntile": events_ntile(d),
        "user_event_pivot": user_event_pivot(d),
        "user_first_last": user_first_last(d),
    }.items():
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert len(df) == 0, name
    assert float(small_qty_revenue(d)["avg_yearly"].iloc[0]) == 0.0
    rec = succ_reciprocity(d)
    assert int(rec["n_edges"].iloc[0]) == 0
    assert float(rec["reciprocity"].iloc[0]) == 0.0
    import ray.data as rd
    docs = rd.read_parquet(str(tmp_path / "documents.parquet"),
                           columns=["doc_id", "text"])
    assert len(bpe_train(docs, n_merges=4)) == 0


def test_parts_skyline_brute_force(ray_session, tmp_path):
    # randomized instance vs O(n^2) dominance check; duplicates of a
    # frontier point must all survive
    rng = np.random.default_rng(7)
    n = 120
    price = np.round(rng.uniform(1, 50, n), 2)
    size = rng.integers(1, 12, n).astype(np.int32)
    price[10], size[10] = price[3], size[3]  # exact duplicate pair
    _write(
        tmp_path,
        "part",
        {
            "p_partkey": pa.array(range(n), pa.int64()),
            "p_retailprice": pa.array(price),
            "p_size": pa.array(size, pa.int32()),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import parts_skyline

    got = set(parts_skyline(str(tmp_path)).to_pandas()["p_partkey"])
    want = {
        int(i)
        for i in range(n)
        if not any(
            price[j] <= price[i]
            and size[j] <= size[i]
            and (price[j] < price[i] or size[j] < size[i])
            for j in range(n)
        )
    }
    assert got == want and len(want) > 1


def test_events_props_stats_skips_missing_k(ray_session, tmp_path):
    _write(
        tmp_path,
        "events",
        {
            "event_type": pa.array(["a", "a", "a", "b"]),
            "props": pa.array(['{"k": 3}', '{"k": -1}', '{"other": 9}', '{"k": 10}']),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_props_stats

    got = events_props_stats(str(tmp_path)).to_pandas().set_index("event_type")
    assert got.loc["a", "n"] == 2 and got.loc["a", "sum_k"] == 2
    assert got.loc["a", "avg_k"] == 1.0
    assert got.loc["b", "sum_k"] == 10


def test_name_near_pairs_blocking_recall(ray_session, tmp_path):
    # substitution, deletion, insertion all found; distance-2 not
    names = ["abcd", "abxd", "abd", "xabcd", "qqqq", "abcd"]
    _write(tmp_path, "part", {"p_name": pa.array(names, pa.string())})
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import (
        _ed_le1,
        name_near_pairs,
    )

    got = {
        tuple(r)
        for r in name_near_pairs(
            __import__("ray").data.read_parquet(str(tmp_path / "part.parquet"))
        )
        .to_pandas()[["name_a", "name_b"]]
        .itertuples(index=False)
    }
    uniq = sorted(set(names))
    want = {
        (a, b)
        for i, a in enumerate(uniq)
        for b in uniq[i + 1:]
        if _ed_le1(a, b)
    }
    assert ("abcd", "abxd") in want and ("abcd", "xabcd") in want
    assert got == want


def test_succ_inout_correlation_hand_case(ray_session, tmp_path):
    # chain walks: 1->2->3 and 3->1 (two orders). Distinct edges:
    # 1->2, 2->3, 3->1. Every vertex has in=out=1 -> all (x,y) identical
    # -> zero variance -> r reported as 0.0 by the den<=0 convention.
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "l_linenumber": pa.array([1, 2, 3, 1, 2], pa.int32()),
            "l_partkey": pa.array([1, 2, 3, 3, 1], pa.int64()),
            "l_quantity": pa.array([1.0] * 5),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        succ_inout_correlation,
    )

    got = succ_inout_correlation(str(tmp_path))
    assert int(got["n_vertices"].iloc[0]) == 3
    assert float(got["r"].iloc[0]) == 0.0


def test_succ_inout_correlation_positive(ray_session, tmp_path):
    # hub vertex 1: out-edges to 2,3,4 and in-edges from 2,3,4 (via
    # separate orders); leaves have (1,1); hub has (3,3) -> r = 1.0
    rows = []
    for o, (a, b) in enumerate(
        [(1, 2), (1, 3), (1, 4), (2, 1), (3, 1), (4, 1)], start=1
    ):
        rows.append((o, 1, a))
        rows.append((o, 2, b))
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_linenumber": pa.array([r[1] for r in rows], pa.int32()),
            "l_partkey": pa.array([r[2] for r in rows], pa.int64()),
            "l_quantity": pa.array([1.0] * len(rows)),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        succ_inout_correlation,
    )

    got = succ_inout_correlation(str(tmp_path))
    assert int(got["n_vertices"].iloc[0]) == 4
    assert float(got["r"].iloc[0]) == 1.0


def test_basket_jaccard_prefix_filter_complete(ray_session, tmp_path):
    # randomized baskets vs O(n^2) brute force: the prefix filter must
    # not lose any qualifying pair (completeness), and no extras appear
    rng = np.random.default_rng(11)
    rows_o, rows_p = [], []
    baskets = {}
    for o in range(40):
        parts = sorted(rng.choice(30, size=rng.integers(1, 7), replace=False))
        baskets[o] = set(int(x) for x in parts)
        for p in parts:
            rows_o.append(o)
            rows_p.append(int(p))
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array(rows_o, pa.int64()),
            "l_partkey": pa.array(rows_p, pa.int64()),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import basket_jaccard_pairs

    got = {
        (int(r.o1), int(r.o2))
        for r in basket_jaccard_pairs(str(tmp_path), threshold_pct=50)
        .to_pandas()
        .itertuples()
    }
    want = set()
    for a in baskets:
        for b in baskets:
            if a < b:
                i = len(baskets[a] & baskets[b])
                u = len(baskets[a] | baskets[b])
                if u and 100 * i >= 50 * u:
                    want.add((a, b))
    assert got == want and len(want) > 0


def test_bloom_functions_no_false_negatives(ray_session):
    from subgraph_isomorphism_pregel_ray.functions.bloom import (
        bloom_build,
        bloom_partial,
        bloom_probe,
    )

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 10**9, 5000).astype(np.int64)
    others = rng.integers(10**9, 2 * 10**9, 20000).astype(np.int64)
    w = bloom_build([bloom_partial(keys[:2500], 1 << 20),
                     bloom_partial(keys[2500:], 1 << 20)])
    assert bloom_probe(w, keys).all()  # zero false negatives, always
    fp = bloom_probe(w, others).mean()
    assert fp < 0.05  # ~2-3% at 1M bits / 5k keys


def test_bloom_filtered_revenue_matches_plain_join(ray_session):
    import duckdb

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        bloom_filtered_revenue,
    )

    sf = "/root/testdata/sf0.001"
    got = bloom_filtered_revenue(sf)
    want = duckdb.sql(
        "SELECT coalesce(sum(CAST(round(l_extendedprice*100) AS BIGINT) * "
        "(100 - CAST(round(l_discount*100) AS BIGINT))), 0) / 10000.0 AS r, "
        "count(*) AS n FROM "
        f"read_parquet('{sf}/lineitem.parquet') li "
        f"JOIN read_parquet('{sf}/orders.parquet') o ON o_orderkey = l_orderkey "
        "WHERE o_orderpriority = '1-URGENT'"
    ).fetchone()
    assert float(got["revenue"].iloc[0]) == float(want[0])
    assert int(got["n_rows"].iloc[0]) == int(want[1])


def test_orders_active_backlog_hand_case(ray_session, tmp_path):
    # orders on day 0, 0, 2 with window 3: deltas +2@0, +1@2, -2@3, -1@5
    # curve: day0=2, day2=3, day3=1, day5=0
    _write(
        tmp_path,
        "orders",
        {
            "o_orderdate": pa.array(
                np.array(["2024-01-01", "2024-01-01", "2024-01-03"],
                         "datetime64[us]")
            ),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        orders_active_backlog,
    )

    got = (
        orders_active_backlog(str(tmp_path), window_days=3)
        .to_pandas()
        .set_index("day")["n_active"]
        .to_dict()
    )
    assert got == {
        "2024-01-01": 2, "2024-01-03": 3, "2024-01-04": 1, "2024-01-06": 0,
    }


def test_nation_trade_volume_excludes_same_nation(ray_session, tmp_path):
    # cust 1 (nation 0) buys from supp 10 (nation 1) -> counted; cust 2
    # (nation 1) buys from supp 10 (nation 1) -> SAME nation, excluded
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_suppkey": pa.array([10, 11, 10], pa.int64()),
            "l_extendedprice": pa.array([100.0, 200.0, 400.0]),
            "l_discount": pa.array([0.0, 0.1, 0.0]),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([1, 2], pa.int64()),
        },
    )
    _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array([1, 2], pa.int64()),
            "c_nationkey": pa.array([0, 1], pa.int64()),
        },
    )
    _write(
        tmp_path,
        "supplier",
        {
            "s_suppkey": pa.array([10, 11], pa.int64()),
            "s_nationkey": pa.array([1, 0], pa.int64()),
        },
    )
    _write(
        tmp_path,
        "nation",
        {
            "n_nationkey": pa.array([0, 1], pa.int64()),
            "n_name": pa.array(["ALPHA", "BETA"]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        nation_trade_volume,
    )

    got = nation_trade_volume(str(tmp_path), num_buckets=4).to_pandas()
    got = got.set_index(["cust_nation", "supp_nation"])["revenue"]
    # cust ALPHA x supp BETA: 100 (order 1, supp 10); ALPHA x ALPHA excluded
    # (supp 11 discount 10% -> 180 would be same-pair? no: supp 11 nation 0
    # == cust 1 nation 0 -> excluded); BETA x BETA (order 2) excluded
    assert len(got) == 1
    assert got.loc[("ALPHA", "BETA")] == 100.0


def test_returned_customer_topk_rank_and_tiebreak(ray_session, tmp_path):
    # cust 1 and 2 tie on returned revenue -> custkey asc breaks the tie;
    # cust 3's non-returned revenue is ignored
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 2, 3, 3], pa.int64()),
            "l_extendedprice": pa.array([50.0, 50.0, 999.0, 10.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
            "l_returnflag": pa.array(["R", "R", "N", "R"]),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([2, 1, 3], pa.int64()),
        },
    )
    _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_name": pa.array(["c1", "c2", "c3"]),
            "c_nationkey": pa.array([0, 0, 0], pa.int64()),
        },
    )
    _write(
        tmp_path,
        "nation",
        {
            "n_nationkey": pa.array([0], pa.int64()),
            "n_name": pa.array(["ALPHA"]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        returned_customer_topk,
    )

    got = returned_customer_topk(str(tmp_path), k=2, num_buckets=4).to_pandas()
    assert list(got["c_custkey"]) == [1, 2]  # tie at 50.0 -> key asc
    assert list(got["rnk"]) == [1, 2]
    assert list(got["revenue"]) == [50.0, 50.0]


def test_disjunctive_revenue_branch_boundaries(ray_session, tmp_path):
    # rows: in branch 1 (Brand#12/size 5/qty 11), boundary-out (qty 12),
    # in branch 3 (Brand#15/size 15/qty 20), wrong brand -> out
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_quantity": pa.array([11.0, 12.0, 20.0, 25.0]),
            "l_extendedprice": pa.array([10.0, 100.0, 1000.0, 10000.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        },
    )
    _write(
        tmp_path,
        "part",
        {
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_brand": pa.array(["Brand#12", "Brand#15", "Brand#11"]),
            "p_size": pa.array([5, 15, 1], pa.int32()),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        disjunctive_revenue,
    )

    got = disjunctive_revenue(str(tmp_path), num_buckets=4).to_pandas()
    assert got["revenue"].iloc[0] == 1010.0  # 10 (branch1) + 1000 (branch3)


def test_product_type_profit_semi_filter_and_year(ray_session, tmp_path):
    # part 1 matches 'red', part 2 doesn't; orders span two years ->
    # (nation, year) cells only from matching parts
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 1, 2], pa.int64()),
            "l_suppkey": pa.array([10, 11, 10], pa.int64()),
            "l_orderkey": pa.array([1, 2, 1], pa.int64()),
            "l_extendedprice": pa.array([100.0, 200.0, 999.0]),
            "l_discount": pa.array([0.0, 0.5, 0.0]),
        },
    )
    _write(
        tmp_path,
        "part",
        {
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_name": pa.array(["red widget", "blue bolt"]),
        },
    )
    _write(
        tmp_path,
        "supplier",
        {
            "s_suppkey": pa.array([10, 11], pa.int64()),
            "s_nationkey": pa.array([0, 1], pa.int64()),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_orderdate": pa.array(
                np.array(["1995-03-01", "1996-07-01"], "datetime64[us]")
            ),
        },
    )
    _write(
        tmp_path,
        "nation",
        {
            "n_nationkey": pa.array([0, 1], pa.int64()),
            "n_name": pa.array(["ALPHA", "BETA"]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        product_type_profit,
    )

    got = product_type_profit(str(tmp_path), num_buckets=4).to_pandas()
    got = got.set_index(["n_name", "o_year"])["sum_profit"].sort_index()
    assert len(got) == 2
    assert got.loc[("ALPHA", 1995)] == 100.0   # part 2's 999 excluded
    assert got.loc[("BETA", 1996)] == 100.0    # 200 at 50% discount


def test_late_shipment_rate_threshold_and_rate(ray_session, tmp_path):
    # order 1 (URGENT): one line 61 days late (>60 -> late), one exactly
    # 60 days (not late); order 2 (LOW): one line early -> rate 0
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_shipdate": pa.array(
                np.array(
                    ["1995-03-03", "1995-03-02", "1996-01-01"], "datetime64[us]"
                )
            ),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_orderpriority": pa.array(["1-URGENT", "5-LOW"]),
            "o_orderdate": pa.array(
                np.array(["1995-01-01", "1996-02-01"], "datetime64[us]")
            ),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        late_shipment_rate,
    )

    got = (
        late_shipment_rate(str(tmp_path), num_buckets=4)
        .to_pandas()
        .set_index("o_orderpriority")
        .sort_index()
    )
    assert got.loc["1-URGENT", "n_late"] == 1
    assert got.loc["1-URGENT", "n_lines"] == 2
    assert got.loc["1-URGENT", "late_rate"] == 0.5
    assert got.loc["5-LOW", "n_late"] == 0
    assert got.loc["5-LOW", "late_rate"] == 0.0


def test_nation_market_share_region_filter_and_share(ray_session, tmp_path):
    # customer 1 in-region (ASIA), customer 2 out-of-region -> order 2's
    # revenue excluded entirely; supplier 10 in target nation, 11 not
    _write(
        tmp_path,
        "region",
        {
            "r_regionkey": pa.array([0, 1], pa.int32()),
            "r_name": pa.array(["ASIA", "EUROPE"]),
        },
    )
    _write(
        tmp_path,
        "nation",
        {
            "n_nationkey": pa.array([0, 1, 2], pa.int32()),
            "n_name": pa.array(["NATION_2", "NATION_B", "NATION_C"]),
            "n_regionkey": pa.array([0, 0, 1], pa.int32()),
        },
    )
    _write(
        tmp_path,
        "supplier",
        {
            "s_suppkey": pa.array([10, 11], pa.int64()),
            "s_nationkey": pa.array([0, 1], pa.int32()),
        },
    )
    _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array([1, 2], pa.int64()),
            "c_nationkey": pa.array([1, 2], pa.int32()),  # 1 in ASIA, 2 not
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([1, 2], pa.int64()),
            "o_orderdate": pa.array(
                np.array(["1995-06-01", "1995-07-01"], "datetime64[us]")
            ),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_suppkey": pa.array([10, 11, 10], pa.int64()),
            "l_extendedprice": pa.array([100.0, 300.0, 999.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        nation_market_share,
    )

    got = nation_market_share(
        str(tmp_path), region="ASIA", nation="NATION_2", num_buckets=4
    ).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["o_year"] == 1995
    assert row["target_units"] == 100 * 100 * 100      # 100.00 at 0% disc
    assert row["total_units"] == (100 + 300) * 100 * 100
    assert row["mkt_share"] == 0.25


def test_top_supplier_revenue_window_and_ties(ray_session, tmp_path):
    # suppliers 1 and 2 tie at 500.00 inside the window; supplier 3's big
    # line ships outside the window -> excluded; ties both returned
    _write(
        tmp_path,
        "lineitem",
        {
            "l_suppkey": pa.array([1, 2, 2, 3], pa.int64()),
            "l_shipdate": pa.array(
                np.array(
                    ["1995-02-01", "1995-02-02", "1995-03-31", "1995-04-01"],
                    "datetime64[us]",
                )
            ),
            "l_extendedprice": pa.array([500.0, 300.0, 200.0, 9999.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        },
    )
    _write(
        tmp_path,
        "supplier",
        {
            "s_suppkey": pa.array([1, 2, 3], pa.int64()),
            "s_name": pa.array(["S1", "S2", "S3"]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        top_supplier_revenue,
    )

    got = top_supplier_revenue(str(tmp_path)).to_pandas()
    assert list(got["s_suppkey"]) == [1, 2]
    assert list(got["s_name"]) == ["S1", "S2"]
    assert list(got["total_revenue"]) == [500.0, 500.0]


def test_supplier_variety_distinct_and_anti_join(ray_session, tmp_path):
    # part 1 (BrandA, size 5): suppliers 1, 2, and excluded 3 -> cnt 2
    # (supplier 1 appears twice, deduped); part 2 (BrandA, size 5) adds
    # supplier 4 to the SAME group -> cnt 3 total
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "l_suppkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
        },
    )
    _write(
        tmp_path,
        "part",
        {
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_brand": pa.array(["BrandA", "BrandA"]),
            "p_size": pa.array([5, 5], pa.int32()),
        },
    )
    _write(
        tmp_path,
        "supplier",
        {
            "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
            "s_acctbal": pa.array([10.0, 20.0, -5.0, 30.0]),  # 3 excluded
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        supplier_variety,
    )

    got = supplier_variety(str(tmp_path), num_buckets=4).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["p_brand"] == "BrandA"
    assert got.iloc[0]["p_size"] == 5
    assert got.iloc[0]["supplier_cnt"] == 3  # suppliers 1, 2, 4


def test_min_cost_supplier_argmin_and_tiebreak(ray_session, tmp_path):
    # part 1: supplier 2 cheapest (unit 2.0 < 5.0); part 2: suppliers 5
    # and 3 tie at unit 1.0 -> smaller suppkey 3 wins
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
            "l_suppkey": pa.array([1, 2, 5, 3], pa.int64()),
            "l_extendedprice": pa.array([10.0, 4.0, 3.0, 3.0]),
            "l_quantity": pa.array([2.0, 2.0, 3.0, 3.0]),
        },
    )
    _write(
        tmp_path,
        "supplier",
        {
            "s_suppkey": pa.array([1, 2, 3, 5], pa.int64()),
            "s_name": pa.array(["S1", "S2", "S3", "S5"]),
            "s_nationkey": pa.array([0, 1, 0, 1], pa.int32()),
        },
    )
    _write(
        tmp_path,
        "nation",
        {
            "n_nationkey": pa.array([0, 1], pa.int32()),
            "n_name": pa.array(["ALPHA", "BETA"]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        min_cost_supplier,
    )

    got = min_cost_supplier(str(tmp_path), num_buckets=4).to_pandas()
    got = got.set_index("p_partkey")
    assert got.loc[1, "s_suppkey"] == 2
    assert got.loc[1, "unit_price"] == 2.0
    assert got.loc[1, "n_name"] == "BETA"
    assert got.loc[2, "s_suppkey"] == 3   # tie at 1.0 -> min suppkey
    assert got.loc[2, "unit_price"] == 1.0


def test_important_parts_value_threshold(ray_session, tmp_path):
    # values: part1=100, part2=100, part3=400 -> avg 200, 1.5x avg = 300;
    # only part3 qualifies
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 2, 3, 3], pa.int64()),
            "l_extendedprice": pa.array([100.0, 100.0, 150.0, 250.0]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        important_parts_value,
    )

    got = important_parts_value(str(tmp_path)).to_pandas()
    assert list(got["p_partkey"]) == [3]
    assert list(got["value"]) == [400.0]


def test_bulk_suppliers_name_filter_and_having(ray_session, tmp_path):
    # supplier 1 ships part 1 ('bolt', matches 'ol') qty 50+40=90 > 80 ->
    # bulk; supplier 2 ships matching part at qty 80 (NOT > 80) and a
    # non-matching part in bulk -> excluded
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 1, 1, 2], pa.int64()),
            "l_suppkey": pa.array([1, 1, 2, 2], pa.int64()),
            "l_quantity": pa.array([50.0, 40.0, 80.0, 99.0]),
        },
    )
    _write(
        tmp_path,
        "part",
        {
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_name": pa.array(["blue bolt", "red widget"]),
        },
    )
    _write(
        tmp_path,
        "supplier",
        {
            "s_suppkey": pa.array([1, 2], pa.int64()),
            "s_name": pa.array(["S1", "S2"]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import bulk_suppliers

    got = bulk_suppliers(str(tmp_path)).to_pandas()
    assert list(got["s_suppkey"]) == [1]
    assert list(got["n_bulk_parts"]) == [1]


def test_succ_triad_motifs_cycle_and_transitive(ray_session, tmp_path):
    # successor edges (one per 2-line order): 1->2, 2->3, 3->1, 1->3
    # => one cyclic triangle {1,2,3} and one transitive triple (1->2->3, 1->3)
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2, 2, 3, 3, 4, 4], pa.int64()),
            "l_linenumber": pa.array([1, 2, 1, 2, 1, 2, 1, 2], pa.int32()),
            "l_partkey": pa.array([1, 2, 2, 3, 3, 1, 1, 3], pa.int64()),
            "l_quantity": pa.array([1.0] * 8),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        succ_triad_motifs,
    )

    got = succ_triad_motifs(str(tmp_path), num_buckets=4).to_pandas()
    assert got.iloc[0]["n_cyclic"] == 1
    assert got.iloc[0]["n_transitive"] == 1


def test_basket_lift_counts_and_formula(ray_session, tmp_path):
    # 4 orders: {1,2} twice, {1} once, {2} once -> n_12=2, n_1=3, n_2=3,
    # N=4 -> lift = 2*4/(3*3) = 8/9; duplicate lines must not inflate
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 1, 2, 2, 3, 4], pa.int64()),
            "l_partkey": pa.array([1, 2, 2, 1, 2, 1, 2], pa.int64()),
        },
    )
    _write(
        tmp_path,
        "orders",
        {"o_orderkey": pa.array([1, 2, 3, 4], pa.int64())},
    )
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.relational import basket_lift

    got = basket_lift(str(tmp_path), num_buckets=4).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert (row["part_a"], row["part_b"], row["n_both"]) == (1, 2, 2)
    assert row["lift"] == round_half_away(np.array([2 * 4.0 / (3.0 * 3.0)]), 6)[0]


def test_degree_gini_uniform_and_skewed(ray_session, tmp_path):
    # star basket {1,2,3,4} in one order -> K4 clique -> all degrees 3 ->
    # perfectly equal -> Gini 0
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 1, 1], pa.int64()),
            "l_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import degree_gini

    got = degree_gini(str(tmp_path), num_buckets=4).to_pandas()
    assert got.iloc[0]["n_vertices"] == 4
    assert got.iloc[0]["sum_degree"] == 12
    assert got.iloc[0]["gini"] == 0.0


def test_avg_neighbor_degree_path_graph(ray_session, tmp_path):
    # path 1-2-3 (orders {1,2} and {2,3}): degrees d1=d3=1, d2=2
    # knn(1): S_1+S_3 = 2+2 = 4, cnt 2 -> 4/(1*2) = 2.0
    # knn(2): S_2 = 1+1 = 2, cnt 1 -> 2/(2*1) = 1.0
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
            "l_partkey": pa.array([1, 2, 2, 3], pa.int64()),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        avg_neighbor_degree,
    )

    got = avg_neighbor_degree(str(tmp_path)).to_pandas().set_index("degree")
    assert got.loc[1, "n_vertices"] == 2
    assert got.loc[1, "avg_nbr_degree"] == 2.0
    assert got.loc[2, "n_vertices"] == 1
    assert got.loc[2, "avg_nbr_degree"] == 1.0


def test_revenue_autocorr_alternating_series(ray_session, tmp_path):
    # daily cents alternate 100, 200, 100, 200 on consecutive days ->
    # perfect negative lag-1 correlation (r = -1); day 10 is isolated
    # (gap before it) so it only contributes as a pair-start with day 11
    days = ["1995-01-01", "1995-01-02", "1995-01-03", "1995-01-04"]
    _write(
        tmp_path,
        "lineitem",
        {
            "l_shipdate": pa.array(np.array(days, "datetime64[us]")),
            "l_extendedprice": pa.array([1.0, 2.0, 1.0, 2.0]),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        revenue_autocorr,
    )

    got = revenue_autocorr(str(tmp_path)).to_pandas()
    assert got.iloc[0]["n_pairs"] == 3
    assert got.iloc[0]["autocorr"] == -1.0


def test_top_customer_share_and_ties(ray_session, tmp_path):
    # three customers with revenue 300/200/100 -> top-2 share = 500/600
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 2, 3], pa.int64()),
            "l_extendedprice": pa.array([3.0, 2.0, 1.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0]),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([7, 8, 9], pa.int64()),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        top_customer_share,
    )

    got = top_customer_share(str(tmp_path), k=2).to_pandas().iloc[0]
    assert got["top_k"] == 2
    assert got["top_revenue"] == (300 + 200) * 100
    assert got["total_revenue"] == 600 * 100
    assert got["share"] == 500.0 / 600.0


def test_orders_fill_rate_all_lines_must_pass(ray_session, tmp_path):
    # order 1: lines at +10d and +91d -> NOT filled (one line breaks it);
    # order 2: single line at +90d (boundary, <=) -> filled
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_shipdate": pa.array(
                np.array(
                    ["1995-01-11", "1995-04-02", "1995-04-01"], "datetime64[us]"
                )
            ),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_orderdate": pa.array(
                np.array(["1995-01-01", "1995-01-01"], "datetime64[us]")
            ),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        orders_fill_rate,
    )

    got = orders_fill_rate(str(tmp_path)).to_pandas().iloc[0]
    assert got["n_orders"] == 2
    assert got["n_filled"] == 1
    assert got["fill_rate"] == 0.5


def test_label_conductance_two_cliques_one_bridge(ray_session, tmp_path):
    # two triangles {1,2,3} (size%3==0 -> label 0) and {4,5,6} (label 1)
    # joined by one bridge (3,4): cut=1 for both labels,
    # vol = 2*3+1 = 7 each -> conductance 1/7
    _write(
        tmp_path,
        "lineitem",
        {
            # each order of 2 parts creates exactly one co-purchase edge
            "l_orderkey": pa.array(
                [1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7], pa.int64()
            ),
            "l_partkey": pa.array(
                [1, 2, 2, 3, 1, 3, 4, 5, 5, 6, 4, 6, 3, 4], pa.int64()
            ),
        },
    )
    _write(
        tmp_path,
        "part",
        {
            "p_partkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "p_size": pa.array([3, 6, 9, 1, 4, 7], pa.int32()),  # %3: 0,0,0,1,1,1
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        label_conductance,
    )

    got = label_conductance(str(tmp_path)).to_pandas().set_index("label")
    for l in (0, 1):
        assert got.loc[l, "n_internal"] == 3
        assert got.loc[l, "n_cut"] == 1
        assert round(got.loc[l, "conductance"], 6) == round(1 / 7, 6)


def test_two_hop_reach_path_graph(ray_session, tmp_path):
    # path 1-2-3-4 (three 2-part orders): reach2(1)={2,3}=2,
    # reach2(2)={1,3,4}=3, reach2(3)={1,2,4}=3, reach2(4)={2,3}=2
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
            "l_partkey": pa.array([1, 2, 2, 3, 3, 4], pa.int64()),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import two_hop_reach

    got = two_hop_reach(str(tmp_path)).to_pandas().set_index("vid")["reach2"]
    assert got.to_dict() == {1: 2, 2: 3, 3: 3, 4: 2}


def test_local_bridges_triangle_plus_pendant(ray_session, tmp_path):
    # strong graph (every pair co-occurs in >= 2 orders here): triangle
    # {1,2,3} + pendant edge (3,4): only (3,4) is a local bridge
    ok, pk = [], []
    oid = 0
    for a, b in [(1, 2), (2, 3), (1, 3), (3, 4)]:
        for _ in range(2):  # two orders per pair -> passes threshold 2
            oid += 1
            ok += [oid, oid]
            pk += [a, b]
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array(ok, pa.int64()),
            "l_partkey": pa.array(pk, pa.int64()),
        },
    )
    _write(tmp_path, "part", {"p_partkey": pa.array([1, 2, 3, 4], pa.int64())})
    from subgraph_isomorphism_pregel_ray.pipelines.relational import local_bridges

    got = local_bridges(str(tmp_path), num_buckets=4).to_pandas()
    assert [tuple(r) for r in got.itertuples(index=False)] == [(3, 4)]


def test_customer_migration_quartile_flip(ray_session, tmp_path):
    # 4 customers active both years; 1995 revenue order 1>2>3>4 (tiles
    # 1..4), 1996 exactly reversed -> anti-diagonal matrix; customer 5
    # active only in 1995 -> excluded
    rows_ok, rows_ck, rows_dt, rows_tp = [], [], [], []
    oid = 0
    for ck, rev95, rev96 in [(1, 400, 10), (2, 300, 20), (3, 200, 30), (4, 100, 40)]:
        for yr, rev in (("1995", rev95), ("1996", rev96)):
            oid += 1
            rows_ok.append(oid); rows_ck.append(ck)
            rows_dt.append(f"{yr}-06-01"); rows_tp.append(float(rev))
    oid += 1
    rows_ok.append(oid); rows_ck.append(5)
    rows_dt.append("1995-06-01"); rows_tp.append(999.0)
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array(rows_ok, pa.int64()),
            "o_custkey": pa.array(rows_ck, pa.int64()),
            "o_orderdate": pa.array(np.array(rows_dt, "datetime64[us]")),
            "o_totalprice": pa.array(rows_tp),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        customer_migration,
    )

    got = customer_migration(str(tmp_path)).to_pandas()
    m = {(r.tile_from, r.tile_to): r.n_customers for r in got.itertuples()}
    # customer 5 pushes everyone's 1995 tile down one... it has the top
    # 1995 revenue (999) -> tiles 1995: c5=1, c1=2, c2=3, c3=4, c4=4?
    # n=5, k=4 -> tile sizes 2,1,1,1 -> ranks: c5(999)=t1, c1(400)=t1,
    # c2(300)=t2, c3(200)=t3, c4(100)=t4
    # 1996 (only 4 customers): c4=1, c3=2, c2=3, c1=4
    assert m == {(1, 4): 1, (2, 3): 1, (3, 2): 1, (4, 1): 1}


def test_order_value_magnitude_exact_boundaries(ray_session, tmp_path):
    # cents: 99 -> mag 1, 100 -> mag 2 (boundary), 9.99 -> 999 cents mag 2,
    # 10.00 -> 1000 cents mag 3
    _write(
        tmp_path,
        "orders",
        {"o_totalprice": pa.array([0.99, 1.00, 9.99, 10.00])},
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        order_value_magnitude,
    )

    got = order_value_magnitude(str(tmp_path)).to_pandas().set_index("magnitude")
    assert got.loc[1, "n_orders"] == 1   # 99 cents
    assert got.loc[2, "n_orders"] == 2   # 100, 999
    assert got.loc[3, "n_orders"] == 1   # 1000


def test_benford_first_digit_leading_extraction(ray_session, tmp_path):
    # cents: 1 -> d1, 95 -> d9, 123 -> d1, 20000 -> d2; zero excluded
    _write(
        tmp_path,
        "orders",
        {"o_totalprice": pa.array([0.01, 0.95, 1.23, 200.0, 0.0])},
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        benford_first_digit,
    )

    got = benford_first_digit(str(tmp_path)).to_pandas().set_index("digit")
    assert got.loc[1, "n_orders"] == 2
    assert got.loc[9, "n_orders"] == 1
    assert got.loc[2, "n_orders"] == 1
    assert got["n_orders"].sum() == 4
    assert round(got.loc[1, "expected"], 6) == round(np.log10(2), 6)


def test_isolated_parts_counts(ray_session, tmp_path):
    # parts 1,2 co-purchased; part 3 only ever alone; part 4 never ordered
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_partkey": pa.array([1, 2, 3], pa.int64()),
        },
    )
    _write(tmp_path, "part", {"p_partkey": pa.array([1, 2, 3, 4], pa.int64())})
    from subgraph_isomorphism_pregel_ray.pipelines.relational import isolated_parts

    got = isolated_parts(str(tmp_path)).to_pandas().iloc[0]
    assert got["n_parts"] == 4
    assert got["n_connected"] == 2
    assert got["n_isolated"] == 2
    assert got["isolation_rate"] == 0.5


def test_revenue_pareto_exact_cut(ray_session, tmp_path):
    # revenues 50,30,10,10 (total 100): cum 50,80,90,100; 80% cut at k=2
    # with share exactly 0.80 (boundary: 5*80 >= 4*100)
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_extendedprice": pa.array([0.50, 0.30, 0.10, 0.10]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        },
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import revenue_pareto

    got = revenue_pareto(str(tmp_path), num_buckets=4).to_pandas().iloc[0]
    assert got["n_customers"] == 4
    assert got["k80"] == 2
    assert got["share_k80"] == 0.8


def test_order_value_trimmed_mean_vs_scalar(ray_session):
    """Trim boundaries and kept sums equal a driver-side sorted replay."""
    import numpy as np

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        order_value_trimmed_mean,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    got = order_value_trimmed_mean(sf).to_pandas().iloc[0]
    df = read_table(sf, "orders", columns=["o_orderkey", "o_totalprice"]).to_pandas()
    c = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
    k = df["o_orderkey"].to_numpy().astype(np.int64)
    order = np.lexsort((k, c))
    n = len(c)
    lo = n // 10
    kept = c[order][lo : n - lo]
    assert int(got["n_orders"]) == n
    assert int(got["n_trim"]) == lo
    assert int(got["n_kept"]) == len(kept)
    assert int(got["sum_cents"]) == int(kept.sum())
    assert abs(got["trimmed_mean_cents"] - round(kept.sum() / len(kept), 6)) < 1e-9
    # the trim must actually move the mean on this skewed table
    assert abs(got["trimmed_mean_cents"] - c.mean()) > 1.0
