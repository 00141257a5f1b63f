"""Relational pipelines over the TESTDATA tables — the SQL-checkable surface.

These exercise the generic engine machinery (pruned reads, vectorized
map_batches, partial aggregation before groupby, shuffle joins, windowed
aggregates) against the driver's DuckDB oracle; the graph pipelines consume
``copurchase_edges`` as their deterministic edge table.

Scale notes: every aggregate pre-combines inside ``map_batches`` (one row per
key per batch) before the groupby shuffle; the co-purchase build is a proper
shuffle self-join on l_orderkey (both sides large → no broadcast).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.tables import read_table

__all__ = ["q1_lineitem", "copurchase_edges", "part_labels", "events_window"]


def q1_lineitem(sf_dir: str, ship_before: str = "1998-09-01"):
    """TPC-H Q1-style pricing summary (the classic groupby-aggregate)."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )
    cutoff = np.datetime64(ship_before, "us")

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["l_shipdate"].to_numpy() < cutoff]
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_disc_price=("disc_price", "sum"),
                count_order=("l_quantity", "size"),
            )
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
    )

    def _round(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": np.round(t["sum_qty"].to_numpy(), 4),
                "sum_base_price": np.round(t["sum_base_price"].to_numpy(), 4),
                "sum_disc_price": np.round(t["sum_disc_price"].to_numpy(), 4),
                "count_order": t["count_order"],
            }
        )

    return out.map_batches(_round, batch_format="pyarrow")


def copurchase_edges(sf_dir: str):
    """Distinct co-purchase part pairs: (src < dst) parts sharing an order.

    A both-sides-large equi-join expressed as a Dataset hash join on
    l_orderkey, then a distinct (groupby) on the pair — two shuffles total.
    """
    from ray.data.aggregate import Count

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    a = li.map_batches(
        lambda t: pa.table({"l_orderkey": t["l_orderkey"], "pa_": t["l_partkey"]}),
        batch_format="pyarrow",
    )
    b = li.map_batches(
        lambda t: pa.table({"l_orderkey": t["l_orderkey"], "pb_": t["l_partkey"]}),
        batch_format="pyarrow",
    )
    joined = a.join(b, "inner", 8, on=("l_orderkey",))

    def _pairs(t: pa.Table) -> pa.Table:
        x = t["pa_"].to_numpy()
        y = t["pb_"].to_numpy()
        m = x < y
        return pa.table({"src": x[m], "dst": y[m]})

    return (
        joined.map_batches(_pairs, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["src", "dst"])
    )


def part_labels(sf_dir: str, mod: int = 3):
    """Dataset(vid, label) for the matcher: label = p_size % mod."""
    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_size"])
    return parts.map_batches(
        lambda t: pa.table(
            {
                "vid": t["p_partkey"].to_numpy().astype(np.uint64),
                "label": (t["p_size"].to_numpy().astype(np.int64) % mod),
            }
        ),
        batch_format="pyarrow",
    )


def events_window(sf_dir: str, window_sec: int = 300):
    """Tumbling-window aggregate per user: the streaming-shaped workload.

    → (user_id, wstart:int64 epoch-seconds, n_events, sum_value). Events are
    an ordered log; tumbling windows are a pure function of ts, so this is a
    partial-agg map_batches + one groupby — no per-key ordering needed.
    """
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["ts", "user_id", "value"])
    w = np.timedelta64(window_sec, "s")

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        epoch = df["ts"].astype("int64") // 1_000_000  # us → s
        df["wstart"] = (epoch // window_sec) * window_sec
        g = df.groupby(["user_id", "wstart"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["user_id", "wstart"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    )

    def _round(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "wstart": t["wstart"],
                "n_events": t["n_events"],
                "sum_value": np.round(t["sum_value"].to_numpy(), 6),
            }
        )

    return out.map_batches(_round, batch_format="pyarrow")
