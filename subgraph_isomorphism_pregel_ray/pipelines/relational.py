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

from ..functions.rounding import round_half_away
import pandas as pd
import pyarrow as pa

from ..sources.tables import read_table, table_path

__all__ = [
    "order_value_trimmed_mean",
    "session_depth_histogram",
    "q1_lineitem",
    "copurchase_edges",
    "copurchase_edges_join",
    "copurchase_weights",
    "part_labels",
    "events_window",
    "events_hopping",
    "events_sessionize",
    "events_asof_prior",
    "events_quantiles",
    "events_range_join",
    "events_lag",
    "events_rolling",
    "events_zscore",
    "label_mixing_matrix",
    "events_path_trigrams",
    "customer_rfm",
    "events_ema",
    "butterfly_count",
    "brand_discount_elasticity",
    "user_gap_cv",
    "repeat_purchase_rate",
    "part_supplier_hhi",
    "user_type_entropy",
    "session_conversion",
    "events_funnel",
    "events_retention",
    "events_percent_rank",
    "succ_edges",
    "revenue_by_nation",
    "revenue_by_region",
    "rich_club",
    "fk_integrity",
    "order_priority_semi",
    "customer_order_histogram",
    "small_qty_revenue",
    "large_volume_orders",
    "shipping_priority_topk",
    "waiting_suppliers",
    "sales_opportunity",
    "events_cumsum",
    "succ_reciprocity",
    "revenue_rollup",
    "user_event_pivot",
    "events_ntile",
    "user_first_last",
    "events_daily_delta",
    "events_props_stats",
    "parts_skyline",
    "succ_inout_correlation",
    "forecast_revenue",
    "events_value_stats",
    "bloom_filtered_revenue",
    "orders_active_backlog",
    "promo_revenue",
    "events_transition_matrix",
]


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
                "sum_qty": round_half_away(t["sum_qty"].to_numpy(), 4),
                "sum_base_price": round_half_away(t["sum_base_price"].to_numpy(), 4),
                "sum_disc_price": round_half_away(t["sum_disc_price"].to_numpy(), 4),
                "count_order": t["count_order"],
            }
        )

    return out.map_batches(_round, batch_format="pyarrow")


def _pair_shift(sf_dir: str):
    """Packing shift for (src < dst) part-pair keys, sized from the parquet
    FOOTER max (no table scan): ``key = src * shift + dst`` is valid iff
    2·W ≤ 62 bits for W = partkey width. Returns ``None`` when keys are too
    wide to pack in one int64 — callers must take the two-column (k1, k2)
    route. The old fixed 2^21 shift silently fabricated vertices once
    partkeys passed 2^21 (caught by the round-5 10× scale-bump, whose
    replica offsets produce 2^33-range keys; plain TPC-H sf≥100 would hit
    it too)."""
    from ..sources.tables import table_col_max

    mx = table_col_max(sf_dir, "lineitem", "l_partkey")
    w = int(mx).bit_length() if mx is not None else 21
    if 2 * max(21, w) > 62:
        return None
    return np.int64(1) << np.int64(max(21, w))


_PAIR_MIX = np.uint64(0x9E3779B97F4A7C15)
_PAIR_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _pair_bucket(a: np.ndarray, b: np.ndarray, num_buckets) -> np.ndarray:
    """Deterministic bucket id for a vid PAIR with no packing — safe for
    full-64-bit vids (url-hash graphs): a splitmix-style multiply-xor mix
    of both coordinates. Replaces the `key % B` bucketing of the old
    packed pair keys; co-location of equal pairs is all the downstream
    per-bucket dedup/count logic needs."""
    h = (a.astype(np.uint64) * _PAIR_MIX) ^ (b.astype(np.uint64) * _PAIR_MIX2)
    h ^= h >> np.uint64(29)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _pair_dedup_cols(l: np.ndarray, r: np.ndarray):
    """Sorted unique (l, r) pairs via lexsort — the wide-key analogue of
    ``np.unique`` on a packed key."""
    o = np.lexsort((r, l))
    ls, rs = l[o], r[o]
    first = np.ones(len(ls), bool)
    first[1:] = (ls[1:] != ls[:-1]) | (rs[1:] != rs[:-1])
    return ls[first], rs[first]

_ROWS_PER_BUCKET = 2_000_000


def _sorted_dim_lookup(dim_keys: np.ndarray, probe_keys: np.ndarray):
    """Shared kernel of the bucketed dimension-lookup join: sort the dim
    side, searchsorted the probes, clamp, and verify equality so a missing
    key is DROPPED, never misattributed to the neighboring key. Returns
    (order, pos_c, hit): apply ``order`` to every dim value column, index
    with ``pos_c[hit]`` (or mask with ``hit``)."""
    order = np.argsort(dim_keys)
    dk = dim_keys[order]
    if len(dk) == 0 or len(probe_keys) == 0:
        return order, np.zeros(len(probe_keys), np.int64), np.zeros(
            len(probe_keys), bool
        )
    pos_c = np.minimum(np.searchsorted(dk, probe_keys), len(dk) - 1)
    return order, pos_c, dk[pos_c] == probe_keys


def _auto_buckets(ds, requested: int | None, floor: int = 32) -> int:
    """Bucket count for the hash-bucketed ``map_groups`` ops: ``requested``
    if given, else scaled so ONE bucket ≈ ``_ROWS_PER_BUCKET`` input rows
    (floor 32). Results are bucket-count-invariant (a bucket is a key
    hash, whole key groups stay intact at any count); what the count sets
    is the peak memory of one map_groups task — a FIXED 32 would grow a
    bucket linearly with the input at 100 TB. ``ds`` must be the fresh
    parquet read, so ``count()`` is a metadata lookup, not a scan."""
    if requested is not None:
        return requested
    return max(floor, int(ds.count() // _ROWS_PER_BUCKET) + 1)


def copurchase_edges(
    sf_dir: str,
    num_buckets: int | None = None,
    min_orders: int = 1,
    _keep_counts: bool = False,
):
    """Distinct co-purchase part pairs: (src < dst) parts sharing an order.

    ``min_orders`` > 1 keeps only pairs co-purchased in at least that many
    DISTINCT orders (the "strong" co-purchase graph — much sparser; used by
    the deep-query benchmark). Orders are whole within a bucket, so the
    per-bucket distinct-order count per pair sums globally to the exact
    distinct-order count. ``_keep_counts`` (internal, used by
    :func:`_copurchase_pair_counts`) runs the counting pipeline but skips
    the threshold filter and keeps ``n`` in the output.

    The explicit partitioned self-join: hash l_orderkey into ``num_buckets``,
    one ``map_groups`` per WHOLE bucket generates all within-order pairs
    vectorized (lexsort + segment expansion — no per-order Python), with
    in-bucket ``np.unique`` as the partial combine; a single-key groupby
    dedups globally. One pass over lineitem, two light shuffles. (The
    ``Dataset.join`` formulation is ``copurchase_edges_join`` — same result,
    kept as the generic-join expression; the bucket form is ~3× faster here
    because it avoids the second large shuffle's aggregator fleet.)
    """
    from ray.data.aggregate import Count

    from ..state.csr import flat_gather

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    num_buckets = _auto_buckets(li, num_buckets)
    shift = _pair_shift(sf_dir)  # None → keys too wide to pack: (k1, k2)

    def _bucket(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        return t.append_column("b", pa.array((ok % num_buckets).astype(np.int32)))

    def _bucket_pairs(g: pa.Table) -> pa.Table:
        ok = g["l_orderkey"].to_numpy()
        pk = g["l_partkey"].to_numpy()
        order = np.argsort(ok, kind="stable")
        ok_s, pk_s = ok[order], pk[order]
        _, starts_idx, counts = np.unique(ok_s, return_index=True, return_counts=True)
        cpe = np.repeat(counts, counts)  # per element: its order's size
        left = np.repeat(pk_s, cpe)
        right = pk_s[flat_gather(np.repeat(starts_idx, counts), cpe)]
        m = left < right
        l, r = left[m].astype(np.int64), right[m].astype(np.int64)
        if min_orders <= 1 and not _keep_counts:
            if shift is not None:
                return pa.table({"k": np.unique(l * shift + r)})
            k1, k2 = _pair_dedup_cols(l, r)
            return pa.table({"k1": k1, "k2": k2})
        # distinct-order count per pair in this bucket: a part can appear in
        # several lineitems of one order, so dedup (order, pair) rows first
        # (lexsort + adjacent-dedup), then count orders per pair
        okm = np.repeat(ok_s, cpe)[m]
        if shift is not None:
            key = l * shift + r
            o2 = np.lexsort((okm, key))
            ks, os_ = key[o2], okm[o2]
            first = np.ones(len(ks), bool)  # len-0-safe (no pairs in bucket)
            first[1:] = (ks[1:] != ks[:-1]) | (os_[1:] != os_[:-1])
            uk, c = np.unique(ks[first], return_counts=True)
            return pa.table({"k": uk, "c": c.astype(np.int64)})
        o2 = np.lexsort((okm, r, l))
        ls, rs, os_ = l[o2], r[o2], okm[o2]
        first = np.ones(len(ls), bool)
        first[1:] = (
            (ls[1:] != ls[:-1]) | (rs[1:] != rs[:-1]) | (os_[1:] != os_[:-1])
        )
        p1, p2 = ls[first], rs[first]  # (pair, order)-deduped, pair-sorted
        pf = np.ones(len(p1), bool)
        pf[1:] = (p1[1:] != p1[:-1]) | (p2[1:] != p2[:-1])
        idx = np.flatnonzero(pf)
        c = np.diff(np.append(idx, len(p1)))
        return pa.table(
            {"k1": p1[pf], "k2": p2[pf], "c": c.astype(np.int64)}
        )

    def _decode(t: pa.Table) -> pa.Table:
        keep = (
            t["n"].to_numpy() >= min_orders
            if min_orders > 1 and not _keep_counts
            else np.ones(len(t), bool)
        )
        if shift is not None:
            k = t["k"].to_numpy()[keep]
            src, dst = k // shift, k % shift
        else:
            src = t["k1"].to_numpy()[keep]
            dst = t["k2"].to_numpy()[keep]
        cols = {"src": src, "dst": dst}
        if _keep_counts:
            cols["n"] = t["n"].to_numpy()[keep]
        return pa.table(cols)

    grouped = (
        li.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_bucket_pairs, batch_format="pyarrow")
        .groupby(
            "k" if shift is not None else ["k1", "k2"],
            num_partitions=max(2, num_buckets // 4),
        )
    )
    if min_orders > 1 or _keep_counts:
        from ray.data.aggregate import Sum

        agg = grouped.aggregate(Sum("c", alias_name="n"))
    else:
        agg = grouped.aggregate(Count(alias_name="n"))
    return agg.map_batches(_decode, batch_format="pyarrow")


def strong_copurchase_edges(
    sf_dir: str, max_avg_deg: float = 8.0, thresholds=(2, 3, 4, 5), num_buckets: int = 32
):
    """Scale-adaptive strong co-purchase graph: the SMALLEST ``min_orders``
    threshold whose directed strong-edge count is ≤ ``max_avg_deg`` × |part|
    (last threshold as fallback). The relative density of the ≥2-order graph
    varies wildly with scale factor (avg degree 23 at sf0.001 vs 3.7 at
    sf0.01), and a 7-vertex query explodes on the dense one — this rule is
    cheap (pair counts materialized once — they are ≪ lineitem — then one
    count per candidate threshold), deterministic, and exactly reproducible
    in the SQL oracle. Returns Dataset(src, dst), src < dst (callers
    symmetrize)."""
    parts_n = read_table(sf_dir, "part", columns=["p_partkey"]).count()
    # reuse the bucketed pair-count pipeline, keeping the count column
    cnts = _copurchase_pair_counts(sf_dir, num_buckets).materialize()
    for m in thresholds:
        ne = cnts.filter(expr=f"n >= {m}").count()
        if ne / max(parts_n, 1) <= max_avg_deg or m == thresholds[-1]:
            chosen = m
            break

    def _decode(t: pa.Table) -> pa.Table:
        keep = t["n"].to_numpy() >= chosen
        return pa.table(
            {
                "src": t["src"].to_numpy()[keep],
                "dst": t["dst"].to_numpy()[keep],
            }
        )

    return cnts.map_batches(_decode, batch_format="pyarrow")


def _copurchase_pair_counts(sf_dir: str, num_buckets: int | None = None):
    """(src, dst, n distinct orders) for every (src < dst) co-purchase
    pair — the count-annotated core of :func:`copurchase_edges`. The packed
    exchange key is an internal detail (adaptive shift, or two columns when
    partkeys are too wide to pack — see :func:`_pair_shift`); rows come out
    decoded."""
    return copurchase_edges(sf_dir, num_buckets, _keep_counts=True)


def copurchase_weights(sf_dir: str, num_buckets: int | None = None):
    """Weighted co-purchase edge table (src, dst, n_orders) — the
    count-annotated pairs behind :func:`copurchase_edges` /
    :func:`strong_copurchase_edges`, exposed for weighted-graph
    consumers (weighted degree, tie-strength cuts). Same bucketed
    whole-order pair expansion with in-bucket partial combine; only the
    decode keeps the count."""
    agg = _copurchase_pair_counts(sf_dir, num_buckets)

    def _decode(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src": t["src"], "dst": t["dst"], "n_orders": t["n"]}
        )

    return agg.map_batches(_decode, batch_format="pyarrow")


def copurchase_edges_join(sf_dir: str, num_partitions: int | None = None):
    """Dataset.join formulation of :func:`copurchase_edges` (same output)."""
    import ray
    from ray.data.aggregate import Count

    if num_partitions is None:
        # size shuffle partitions to data volume, not CPU count: each hash
        # partition costs an aggregator actor; at this table size (~10⁵–10⁶
        # rows/partition target) a handful is optimal. At 100 TB you'd set
        # ≈ bytes / 500 MB.
        num_partitions = max(4, min(16, int(ray.cluster_resources().get("CPU", 8)) // 4))
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    a = li.map_batches(
        lambda t: pa.table({"l_orderkey": t["l_orderkey"], "pa_": t["l_partkey"]}),
        batch_format="pyarrow",
    )
    b = li.map_batches(
        lambda t: pa.table({"l_orderkey": t["l_orderkey"], "pb_": t["l_partkey"]}),
        batch_format="pyarrow",
    )
    joined = a.join(b, "inner", num_partitions, on=("l_orderkey",))

    # pack the pair into one int64 key, pre-dedup per batch, then one global
    # unique — measurably faster than a two-key groupby at every scale, and
    # the in-batch np.unique is the partial-combine that keeps the shuffle
    # proportional to distinct pairs.
    SHIFT = np.int64(1) << np.int64(21)  # partkeys < 2^21 per TPC-H scaling

    def _pairs(t: pa.Table) -> pa.Table:
        x = t["pa_"].to_numpy()
        y = t["pb_"].to_numpy()
        m = x < y
        key = x[m].astype(np.int64) * SHIFT + y[m].astype(np.int64)
        return pa.table({"k": np.unique(key)})

    def _decode(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        return pa.table({"src": k // SHIFT, "dst": k % SHIFT})

    return (
        joined.map_batches(_pairs, batch_format="pyarrow")
        .groupby("k", num_partitions=num_partitions)
        .aggregate(Count(alias_name="n"))
        .map_batches(_decode, batch_format="pyarrow")
    )


def rich_club(sf_dir: str, kmax: int = 16, num_partitions: int = 8):
    """Rich-club coefficient curve (Zhou & Mondragón 2004, public) of the
    co-purchase graph: for k = 0..kmax-1, among the N_k nodes with
    degree > k and the E_k distinct edges between two such nodes,
    rc(k) = 2·E_k / (N_k·(N_k−1)) — how densely the hubs link to each
    other vs a complete graph.

    Scale shape: per-batch partial degree histograms → one groupby-sum;
    two ``Dataset.join``s ship each endpoint's degree to its edges (no
    driver-side degree map); min-degree histograms are capped at kmax
    per batch, so the final fold the driver sees is O(kmax) numbers —
    never a per-vertex or per-edge collection."""
    from ray.data.aggregate import Sum

    eu = copurchase_edges(sf_dir).materialize()  # distinct src<dst pairs

    def _deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([t["src"].to_numpy(), t["dst"].to_numpy()])
        u, c = np.unique(v, return_counts=True)
        return pa.table({"vid": u, "c": c.astype(np.int64)})

    deg = (
        eu.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("vid", num_partitions=num_partitions)
        .aggregate(Sum("c", alias_name="deg"))
        .materialize()
    )

    def _hist(ds, col):
        """Tiny capped histogram of ``col``: value → count, ≤ kmax+1 rows."""
        def part(t: pa.Table) -> pa.Table:
            x = np.minimum(t[col].to_numpy(), kmax)
            u, c = np.unique(x, return_counts=True)
            return pa.table({"d": u.astype(np.int64), "c": c.astype(np.int64)})

        out = np.zeros(kmax + 1, dtype=np.int64)
        small = ds.map_batches(part, batch_format="pyarrow").groupby("d").aggregate(
            Sum("c", alias_name="n")
        )
        for row in small.take_all():
            out[int(row["d"])] += int(row["n"])
        return out

    nhist = _hist(deg, "deg")

    dsrc = deg.map_batches(
        lambda t: pa.table({"src": t["vid"], "dsrc": t["deg"]}),
        batch_format="pyarrow",
    )
    ddst = deg.map_batches(
        lambda t: pa.table({"dst": t["vid"], "ddst": t["deg"]}),
        batch_format="pyarrow",
    )
    both = eu.join(dsrc, "inner", num_partitions, on=("src",)).join(
        ddst, "inner", num_partitions, on=("dst",)
    )
    mmin = both.map_batches(
        lambda t: pa.table(
            {"deg": np.minimum(t["dsrc"].to_numpy(), t["ddst"].to_numpy())}
        ),
        batch_format="pyarrow",
    )
    ehist = _hist(mmin, "deg")

    from ..functions.rounding import round_half_away

    ks = np.arange(kmax, dtype=np.int64)
    # deg > k ⟺ capped hist index > k (k < kmax): suffix sums of the hists
    n_nodes = np.array([nhist[k + 1 :].sum() for k in ks], dtype=np.int64)
    n_edges = np.array([ehist[k + 1 :].sum() for k in ks], dtype=np.int64)
    rc = np.where(
        n_nodes >= 2, 2.0 * n_edges / (n_nodes * (n_nodes - 1.0)), 0.0
    )
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "k": ks,
                "n_nodes": n_nodes,
                "n_edges": n_edges,
                "rc": round_half_away(rc, 6),
            }
        )
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


def label_mixing_matrix(sf_dir: str, mod: int = 3):
    """Label MIXING MATRIX of the co-purchase graph → (label_a, label_b,
    n_edges): directed symmetrized edge counts by endpoint label
    (``part_labels``' p_size-derived classes) — the homophily/assortative-
    mixing structure (Newman 2003, "Mixing patterns in networks"): a
    diagonal-heavy matrix means same-class products co-sell.

    Scale shape: the label table is a part-dimension lookup (one int per
    part), broadcast ONCE via ``ray.put`` and probed per edge batch with
    the shared sorted-dim kernel on BOTH endpoints — no edge shuffle at
    all; per-batch (label_a, label_b) counts combine in-batch and the
    final groupby moves ≤ mod² rows per batch. Edges with an endpoint
    missing from the dimension are dropped (never misattributed) on both
    sides — the FK guarantees none exist here."""
    import ray
    from ray.data.aggregate import Sum

    from .build_graph import symmetrize

    lab = part_labels(sf_dir, mod=mod).to_pandas()
    vids0 = lab["vid"].to_numpy().astype(np.int64)
    order0 = np.argsort(vids0)
    lab_ref = ray.put((vids0[order0], lab["label"].to_numpy()[order0]))

    def _mix(t: pa.Table) -> pa.Table:
        vids, lbls = ray.get(lab_ref)  # pre-sorted by vid
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        _, pos_s, hit_s = _sorted_dim_lookup(vids, s)
        _, pos_d, hit_d = _sorted_dim_lookup(vids, d)
        ok = hit_s & hit_d
        la, lb = lbls[pos_s[ok]], lbls[pos_d[ok]]
        key = la * np.int64(mod) + lb
        uk, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "label_a": (uk // mod).astype(np.int64),
                "label_b": (uk % mod).astype(np.int64),
                "n_edges": c.astype(np.int64),
            }
        )

    edges = symmetrize(copurchase_edges(sf_dir))
    return (
        edges.map_batches(_mix, batch_format="pyarrow")
        .groupby(["label_a", "label_b"])
        .aggregate(Sum("n_edges", alias_name="n_edges"))
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
                "sum_value": round_half_away(t["sum_value"].to_numpy(), 6),
            }
        )

    return out.map_batches(_round, batch_format="pyarrow")


def events_hopping(sf_dir: str, window_sec: int = 600, hop_sec: int = 300):
    """Hopping (sliding) windows per user — each event lands in
    ``window_sec / hop_sec`` overlapping windows (the standard streaming
    aggregation alongside tumbling/session windows).

    → (user_id, wstart:int64 epoch-seconds, n_events, sum_value). Same
    shape as ``events_window`` with an in-batch replication factor: the
    partial-agg map emits one pre-aggregated row per (user, window) per
    batch, so the shuffle carries the ×(W/H) fan-out AFTER combining —
    exchange volume ≈ distinct (user, window) pairs, not events × W/H.
    """
    assert window_sec % hop_sec == 0, "window must be a multiple of hop"
    factor = window_sec // hop_sec
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["ts", "user_id", "value"])

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        epoch = df["ts"].astype("int64") // 1_000_000  # us → s
        base = epoch // hop_sec
        reps = []
        for j in range(factor):
            d = df[["user_id", "value"]].copy()
            d["wstart"] = (base - j) * hop_sec
            reps.append(d)
        import pandas as pd

        allr = pd.concat(reps, ignore_index=True)
        g = allr.groupby(["user_id", "wstart"], as_index=False).agg(
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
                "sum_value": round_half_away(t["sum_value"].to_numpy(), 6),
            }
        )

    return out.map_batches(_round, batch_format="pyarrow")


def events_sessionize(sf_dir: str, gap_sec: int = 600, num_buckets: int | None = None):
    """Gap-based session windows per user (streaming-shaped workload #2).

    A new session starts when the gap to the user's previous event exceeds
    ``gap_sec``. → (user_id, session_start_us:int64, n_events, sum_value).

    Scale shape: users are hash-bucketed (ONE shuffle); each ``map_groups``
    call receives a whole bucket and sessionizes every user in it vectorized
    (lexsort by (user, ts) + diff + cumsum — no per-user Python). The
    ordering assumption (events sorted within user by (ts, event_id)) is
    established inside the bucket, so input order is irrelevant.
    """
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _sessionize(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        val = g["value"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, val = u[order], ts[order], val[order]
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        gap = np.concatenate([[0], ts[1:] - ts[:-1]])
        brk = new_user | (gap > gap_sec * 1_000_000)
        sess = np.cumsum(brk) - 1
        starts = np.nonzero(brk)[0]
        counts = np.diff(np.concatenate([starts, [len(u)]]))
        sums = np.add.reduceat(val, starts)
        return pa.table(
            {
                "user_id": u[starts],
                "session_start_us": ts[starts],
                "n_events": counts.astype(np.int64),
                "sum_value": round_half_away(sums, 6),
            }
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_sessionize, batch_format="pyarrow")
    )


def succ_edges(sf_dir: str, max_qty: float = 8.0, num_buckets: int | None = None):
    """Directed part-SUCCESSOR graph: within each order (lines filtered to
    ``l_quantity <= max_qty`` — full lineitem yields one trivial giant SCC;
    the filter keeps the graph sparse enough to have real strongly-connected
    structure), an edge from each line's part to the NEXT line's part in
    ``l_linenumber`` order → (src, dst), self-successions dropped.

    Scale shape: a 4-column pruned read; orders hash-bucketed (ONE shuffle,
    the same machine as ``events_lag``); a whole bucket is processed
    vectorized — lexsort by (orderkey, linenumber), one shifted compare —
    and partially deduped per bucket via np.unique over a packed 64-bit
    pair key (adaptive shift; two-column lexsort dedup when partkeys are
    too wide to pack — see :func:`_pair_shift`). Cross-bucket duplicates
    are left for the consumer (the CSR build dedups; SQL consumers say
    DISTINCT) — a global distinct here would be a second shuffle for no
    correctness gain."""
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"],
    )
    num_buckets = _auto_buckets(ds, num_buckets)
    shift = _pair_shift(sf_dir)

    def _bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pa.array(t["l_quantity"].to_numpy() <= max_qty))
        o = t["l_orderkey"].to_numpy()
        return pa.table(
            {
                "l_orderkey": o,
                "l_linenumber": t["l_linenumber"].to_numpy(),
                "l_partkey": t["l_partkey"].to_numpy(),
                "b": (o % num_buckets).astype(np.int32),
            }
        )

    def _edges(g: pa.Table) -> pa.Table:
        o = g["l_orderkey"].to_numpy()
        ln = g["l_linenumber"].to_numpy()
        p = g["l_partkey"].to_numpy()
        # (o, ln, p) — the partkey tie-break makes succession WELL-DEFINED:
        # the raw data has duplicate (orderkey, linenumber) rows, so sorting
        # by (o, ln) alone leaves succession at the mercy of scan order
        # (green at small SF by luck, diverged from the SQL oracle on the
        # round-5 10× input); oracles say ORDER BY l_linenumber, l_partkey
        order = np.lexsort((p, ln, o))
        o, p = o[order], p[order]
        same = np.concatenate([[False], o[1:] == o[:-1]])
        prev = np.concatenate([[0], p[:-1]])
        sel = same & (prev != p)
        l, r = prev[sel].astype(np.int64), p[sel].astype(np.int64)
        if shift is not None:
            key = np.unique(l * shift + r)
            return pa.table({"src": key // shift, "dst": key % shift})
        k1, k2 = _pair_dedup_cols(l, r)
        return pa.table({"src": k1, "dst": k2})

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_edges, batch_format="pyarrow")
    )


def events_funnel(sf_dir: str,
                  steps=("signup", "view", "click", "purchase"),
                  window_us: int = 48 * 3600 * 1_000_000,
                  num_buckets: int | None = None):
    """Windowed ordered funnel (the classic product-analytics op): per
    user, stage k+1 counts only with an event of that type STRICTLY after
    — and within ``window_us`` of — the user's first qualifying stage-k
    event (first-touch, per-transition window) → (user_id,
    steps_completed ∈ 0..len(steps)). The 48 h default yields a real
    drop-off curve on the synthetic events table at every sf.

    Scale shape: users hash-bucketed (the ONE shuffle shared with
    lag/sessionize/rolling); per bucket each stage is a single vectorized
    pass — type mask, then per-user min-ts-in-(tprev, tprev+window] via
    np.minimum.at — so the whole funnel is len(steps) array sweeps, no
    per-user loop. A user who misses stage k gets t_k = +INF, whose
    window (wrapping negative, masked under errstate) stays empty —
    ordered-funnel semantics for free."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    INF = np.int64(np.iinfo(np.int64).max)
    START = np.int64(-(2**62))
    WIN = np.int64(window_us)

    def _funnel(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uu, ui = np.unique(u, return_inverse=True)
        tprev = np.full(len(uu), START)
        completed = np.zeros(len(uu), dtype=np.int64)
        first = True
        for stp in steps:
            m = pc.equal(g["event_type"], stp).to_numpy(zero_copy_only=False)
            tk = np.full(len(uu), INF)
            valid = m & (ts > tprev[ui])
            if not first:  # stage 1 has no prior transition to window
                with np.errstate(over="ignore"):
                    valid &= ts <= tprev[ui] + WIN
            np.minimum.at(tk, ui[valid], ts[valid])
            completed += (tk < INF).astype(np.int64)
            tprev = tk
            first = False
        return pa.table({"user_id": uu, "steps_completed": completed})

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_funnel, batch_format="pyarrow")
    )


_DAY_US = np.int64(86_400_000_000)


def events_retention(sf_dir: str, num_buckets: int | None = None):
    """Retention cohorts (the other classic product-analytics op): users
    grouped by FIRST-ACTIVITY day, then for each day offset the count of
    cohort users active that day → (cohort_day, offset_days, n_users),
    cohort_day = days since epoch (int64, hash-stable across engines).

    Scale shape: users hash-bucketed (the ONE shuffle shared with
    lag/funnel/sessionize); per bucket everything is np.unique /
    minimum.at array math — distinct (user, day) pairs and first days via
    packed int64 keys — emitting PARTIAL (cohort, offset, n) counts that
    are exact because a user lives in exactly one bucket (disjoint-user
    partials sum to distinct-user counts); then one tiny groupby-sum over
    the (cohort × offset) keyspace."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return pa.table(
            {
                "user_id": u,
                "day": t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
                // _DAY_US,
                "b": (u % num_buckets).astype(np.int32),
            }
        )

    SHIFT = np.int64(1) << np.int64(20)  # day-since-epoch < 2^20 for ~2870 yrs

    def _cohort(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        day = g["day"].to_numpy()
        pairs = np.unique(u * SHIFT + day)  # distinct (user, active-day)
        pu, pd_ = pairs // SHIFT, pairs % SHIFT
        uu, ui = np.unique(pu, return_inverse=True)
        first = np.full(len(uu), np.iinfo(np.int64).max)
        np.minimum.at(first, ui, pd_)
        cohort, counts = np.unique(
            first[ui] * SHIFT + (pd_ - first[ui]), return_counts=True
        )
        return pa.table(
            {
                "cohort_day": cohort // SHIFT,
                "offset_days": cohort % SHIFT,
                "n": counts.astype(np.int64),
            }
        )

    agg = (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_cohort, batch_format="pyarrow")
        .groupby(["cohort_day", "offset_days"])
        .aggregate(Sum("n", alias_name="n_users"))
    )
    return agg


def events_percent_rank(sf_dir: str, num_buckets: int | None = None, round_to: int = 6):
    """PERCENT_RANK window function: each event's value ranked within its
    user's events → (event_id, pr) with pr = (rank-1)/(n-1), rank = 1 +
    count of strictly smaller values (SQL tie semantics: equal values
    share the minimum rank), pr = 0 for a single-event user.

    Scale shape: the shared user-hash bucket shuffle; per bucket ONE
    lexsort by (user, value) then pure shifted-compare array math — group
    first-positions give tied ranks without any per-user loop. The
    division (rank-1)*1.0/(n-1) is the same IEEE op on both sides;
    rounded half-away at 6 for the hash compare."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "value"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _pr(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        val = g["value"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((val, u))
        u, val, eid = u[order], val[order], eid[order]
        n = len(u)
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        new_val = new_user | np.concatenate([[True], val[1:] != val[:-1]])
        pos = np.arange(n, dtype=np.int64)
        seg_start = pos[new_user][np.cumsum(new_user) - 1]  # per row: user start
        grp_first = pos[new_val][np.cumsum(new_val) - 1]  # per row: tie-group start
        # user sizes: next user start − own start
        starts = pos[new_user]
        sizes = np.diff(np.concatenate([starts, [n]]))
        n_user = sizes[np.cumsum(new_user) - 1]
        rank0 = grp_first - seg_start
        pr = np.where(
            n_user > 1, rank0 * 1.0 / np.maximum(n_user - 1, 1), 0.0
        )
        return pa.table(
            {"event_id": eid, "pr": round_half_away(pr, round_to)}
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_pr, batch_format="pyarrow")
    )


def events_ntile(sf_dir: str, k: int = 4, num_buckets: int | None = None):
    """NTILE(k) window function: each event's quartile (k=4) within its
    user's timeline ordered by (ts, event_id) → (event_id, tile).

    SQL NTILE semantics exactly: with n rows, the first n % k tiles hold
    ceil(n/k) rows, the rest floor(n/k) — computed as closed-form integer
    arithmetic on the row's 0-based position, no per-user loop.

    Scale shape: the shared ONE-shuffle user-hash bucket machine; a whole
    bucket is one lexsort + shifted-compare position math."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    num_buckets = _auto_buckets(ds, num_buckets)
    K = np.int64(k)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _ntile(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, eid = u[order], eid[order]
        n = len(u)
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        pos = np.arange(n, dtype=np.int64)
        starts = pos[new_user]
        sizes = np.diff(np.concatenate([starts, [n]]))
        uidx = np.cumsum(new_user) - 1
        p = pos - starts[uidx]  # 0-based position within user
        nu = sizes[uidx]  # user row count
        small = nu // K
        n_big = nu % K
        cut = n_big * (small + 1)
        tile = np.where(
            p < cut,
            p // np.maximum(small + 1, 1),
            n_big + (p - cut) // np.maximum(small, 1),
        ) + 1
        return pa.table({"event_id": eid, "tile": tile.astype(np.int64)})

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_ntile, batch_format="pyarrow")
    )


def user_first_last(sf_dir: str, num_buckets: int | None = None):
    """FIRST_VALUE / LAST_VALUE per user (ordered by ts then event_id) plus
    the event count → (user_id, first_value, last_value, n_events).

    Scale shape: genuinely partial-able arg-min/arg-max — each batch emits
    ONE row per user it saw (its local first/last by the total (ts,
    event_id) key + local count), so the exchange carries per-user
    partials, not events; the bucket fold re-selects across partials with
    the same lexsort. Values are carried untouched (no arithmetic), so the
    hash compare is trivially exact."""

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.int64)
        ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy().astype(np.int64)
        val = t["value"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, eid, val = u[order], ts[order], eid[order], val[order]
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        starts = np.flatnonzero(new_user)
        ends = np.concatenate([starts[1:], [len(u)]]) - 1
        uk = u[starts]
        return pa.table(
            {
                "user_id": uk,
                "ts_f": ts[starts], "eid_f": eid[starts], "v_f": val[starts],
                "ts_l": ts[ends], "eid_l": eid[ends], "v_l": val[ends],
                "cnt": np.diff(np.concatenate([starts, [len(u)]])).astype(np.int64),
                "b": (uk % num_buckets).astype(np.int32),
            }
        )

    def _fold(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        # first: min (ts_f, eid_f) partial per user
        of = np.lexsort((g["eid_f"].to_numpy(), g["ts_f"].to_numpy(), u))
        uf = u[of]
        keep_f = np.concatenate([[True], uf[1:] != uf[:-1]])
        # last: max (ts_l, eid_l) partial per user (descending pick)
        ol = np.lexsort((-g["eid_l"].to_numpy(), -g["ts_l"].to_numpy(), u))
        ul = u[ol]
        keep_l = np.concatenate([[True], ul[1:] != ul[:-1]])
        uk = uf[keep_f]
        cnt = np.zeros(len(uk), np.int64)
        key, inv = np.unique(u, return_inverse=True)
        np.add.at(cnt, inv, g["cnt"].to_numpy())  # key order == uk order
        return pa.table(
            {
                "user_id": uk,
                "first_value": g["v_f"].to_numpy()[of][keep_f],
                "last_value": g["v_l"].to_numpy()[ol][keep_l],
                "n_events": cnt,
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_fold, batch_format="pyarrow")
    )


def events_daily_delta(sf_dir: str):
    """WINDOW-over-AGGREGATE composition: daily value totals per event
    type with the day-over-day change → (event_type, day, day_value,
    delta_value); the first day of a type has delta 0 (COALESCE).

    Scale shape: per-batch partial (type, day, cents) aggregation (the
    exchange carries one row per type·day per batch); one groupby on
    event_type finishes totals AND computes the lag in the same
    ``map_groups`` (days sorted within the group — group size = #days,
    bounded, never the event stream). Totals fold as exact int cents; the
    two divisions by 100 are the only float ops."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def _partial(t: pa.Table) -> pa.Table:
        day_i = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        typ = t["event_type"].to_numpy(zero_copy_only=False)
        c100 = np.round(t["value"].to_numpy() * 100).astype(np.int64)
        tkey, tinv = np.unique(typ, return_inverse=True)
        packed = tinv.astype(np.int64) * np.int64(1 << 32) + day_i
        u, inv = np.unique(packed, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, c100)
        return pa.table(
            {
                "event_type": tkey[(u >> np.int64(32)).astype(np.int64)],
                "day_i": (u & np.int64(0xFFFFFFFF)),
                "c100": s,
            }
        )

    def _delta(g: pa.Table) -> pa.Table:
        day_i = g["day_i"].to_numpy()
        c100 = g["c100"].to_numpy()
        u, inv = np.unique(day_i, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, c100)
        prev = np.concatenate([[0], s[:-1]])
        delta = s - prev
        delta[0] = 0
        return pa.table(
            {
                "event_type": pa.array(
                    [g["event_type"][0].as_py()] * len(u), pa.string()
                ),
                "day": np.datetime_as_string(u.astype("datetime64[D]"), unit="D"),
                "day_value": s.astype(np.float64) / 100.0,
                "delta_value": delta.astype(np.float64) / 100.0,
            }
        )

    return (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(_delta, batch_format="pyarrow")
    )


def events_props_stats(sf_dir: str):
    """Semi-structured column handling: extract the integer ``k`` field
    from the JSON ``props`` string per event and aggregate per type →
    (event_type, n, sum_k, avg_k). Extraction contract = top-level INTEGER
    ``k`` (the TESTDATA shape): a strict fullmatch regex is the vectorized
    fast path, anything else falls back to a real JSON parse that accepts
    only top-level ints — so a nested/quoted "k" can never false-positive
    against the oracle's ``json_extract('$.k')``; events whose props lack
    an integer ``k`` are skipped on both sides.

    Scale shape: per-batch partial (type, sum, count) rows, one tiny
    groupby; avg is a single IEEE division of exact ints."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    ev = read_table(sf_dir, "events", columns=["event_type", "props"])

    def _partial(t: pa.Table) -> pa.Table:
        import json

        typ = t["event_type"].to_numpy(zero_copy_only=False)
        props = pd.Series(t["props"].to_numpy(zero_copy_only=False))
        # fast path: the generated shape is exactly {"k": <int>} — a strict
        # FULLMATCH so a nested/quoted "k" can never false-positive; rows
        # that don't match fall back to a real JSON parse (top-level int
        # only), keeping json_extract('$.k') semantics
        ks = props.str.fullmatch(r'\{"k": (-?\d+)\}').to_numpy()
        vals = props.str.extract(r'^\{"k": (-?\d+)\}$', expand=False).to_numpy()
        slow = ~ks
        if slow.any():
            for i in np.flatnonzero(slow):
                try:
                    v = json.loads(props.iloc[i]).get("k")
                except (ValueError, AttributeError):
                    v = None
                vals[i] = str(v) if isinstance(v, (int,)) and not isinstance(
                    v, bool
                ) else None
        has = vals != None  # noqa: E711
        k = vals[has].astype(np.int64)
        tkey, tinv = np.unique(typ[has], return_inverse=True)
        s = np.zeros(len(tkey), np.int64)
        n = np.zeros(len(tkey), np.int64)
        np.add.at(s, tinv, k)
        np.add.at(n, tinv, 1)
        return pa.table(
            {
                "event_type": pa.array(list(tkey), pa.string()),
                "s": s,
                "n": n,
            }
        )

    agg = (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("s", alias_name="sum_k"), Sum("n", alias_name="n"))
    )

    def _final(t: pa.Table) -> pa.Table:
        s = t["sum_k"].to_numpy().astype(np.int64)
        n = t["n"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": n,
                "sum_k": s,
                "avg_k": round_half_away(s / n, 6),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def parts_skyline(sf_dir: str):
    """Distributed SKYLINE (Pareto frontier): parts not dominated on
    (minimize p_retailprice, minimize p_size) → (p_partkey, p_retailprice,
    p_size). q dominates p iff q.price ≤ p.price AND q.size ≤ p.size with
    at least one strict; equal (price, size) pairs are mutually
    non-dominating, so ties all survive.

    Scale shape: the skyline operator is ASSOCIATIVE — skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B)) — so each batch reduces to its local
    frontier (sort by price then a running-min sweep on size, fully
    vectorized) and ONE single-group fold finishes; the exchange carries
    frontier points only, never the table."""
    part = read_table(
        sf_dir, "part", columns=["p_partkey", "p_retailprice", "p_size"]
    )

    def _local(t: pa.Table) -> pa.Table:
        key = t["p_partkey"].to_numpy().astype(np.int64)
        raw = t["p_retailprice"].to_numpy()
        price = np.round(raw * 100).astype(np.int64)
        size = t["p_size"].to_numpy()  # source dtype carried through
        keep = _skyline_mask(price, size.astype(np.int64))
        return pa.table(
            {
                "one": np.ones(int(keep.sum()), np.int32),
                "p_partkey": key[keep],
                "price100": price[keep],
                # original columns carried untouched for the output
                "p_retailprice": raw[keep],
                "p_size": size[keep],
            }
        )

    def _fold(g: pa.Table) -> pa.Table:
        key = g["p_partkey"].to_numpy()
        price = g["price100"].to_numpy()
        size = g["p_size"].to_numpy()
        keep = _skyline_mask(price, size.astype(np.int64))
        return pa.table(
            {
                "p_partkey": key[keep],
                "p_retailprice": g["p_retailprice"].to_numpy()[keep],
                "p_size": size[keep],
            }
        )

    return (
        part.map_batches(_local, batch_format="pyarrow")
        .groupby("one")
        .map_groups(_fold, batch_format="pyarrow")
    )


def _skyline_mask(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Vectorized 2-D min-min skyline: sort by (price, size); a point
    survives iff its size is strictly below the running min of all
    STRICTLY-cheaper points, and among equal-price points only the min
    size survives (plus its exact duplicates)."""
    n = len(price)
    if n == 0:
        return np.zeros(0, bool)
    order = np.lexsort((size, price))
    p, s = price[order], size[order]
    # running min size over strictly-lower price prefix
    new_price = np.ones(n, bool)
    new_price[1:] = p[1:] != p[:-1]
    # min size within each price group = first element (sorted by size)
    grp = np.cumsum(new_price) - 1
    grp_min = s[new_price][grp]
    # prefix min of group minima over PRIOR price groups
    gmins = s[new_price]
    prior = np.concatenate([[np.iinfo(np.int64).max], np.minimum.accumulate(gmins)[:-1]])
    prior_min = prior[grp]
    keep_sorted = (s < prior_min) & (s == grp_min)
    keep = np.zeros(n, bool)
    keep[order] = keep_sorted
    return keep


def events_lag(sf_dir: str, num_buckets: int | None = None):
    """Per-user LAG window function: each event joined with the user's
    previous event → (event_id, prev_event_id, gap_us, delta_value).
    First event per user: prev = -1, gap/delta = 0 (COALESCE semantics).

    Scale shape: users hash-bucketed (ONE shuffle, same as sessionize);
    a whole bucket is processed vectorized — lexsort by (user, ts,
    event_id) then a single shifted compare. gap is exact int64 µs;
    delta_value is one IEEE subtraction of the raw doubles → bit-equal to
    the SQL oracle's ``value - lag(value)``.
    """
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _lag(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        val = g["value"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, eid, val = u[order], ts[order], eid[order], val[order]
        same_user = np.concatenate([[False], u[1:] == u[:-1]])
        prev = np.where(same_user, np.concatenate([[0], eid[:-1]]), -1)
        gap = np.where(same_user, ts - np.concatenate([[0], ts[:-1]]), 0)
        delta = np.where(same_user, val - np.concatenate([[0.0], val[:-1]]), 0.0)
        return pa.table(
            {
                "event_id": eid,
                "prev_event_id": prev.astype(np.int64),
                "gap_us": gap.astype(np.int64),
                "delta_value": delta,
            }
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_lag, batch_format="pyarrow")
    )


def events_rolling(sf_dir: str, window_rows: int = 5, num_buckets: int | None = None):
    """Per-user rolling mean of ``value`` over the trailing
    ``window_rows`` events (ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW,
    ordered by ts, event_id) → (event_id, rolling_avg) — the classic
    smoothing window every event pipeline needs.

    Scale shape: users hash-bucketed (ONE shuffle, shared with
    lag/sessionize); a whole bucket is processed vectorized — lexsort,
    then the window sum is built by adding k shifted copies of the value
    array masked to the user segment (k float adds per row in a FIXED
    order; the ~1e-13 relative float noise vs the oracle's window AVG is
    far below the 6-decimal round). No per-row Python, no per-user
    loop."""
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _roll(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        val = g["value"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, eid, val = u[order], eid[order], val[order]
        n = len(u)
        # position within the user's run: 0 at each new user
        new_seg = np.concatenate([[True], u[1:] != u[:-1]])
        seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))
        pos = np.arange(n) - seg_start
        take = np.minimum(pos + 1, window_rows)
        total = val.copy()
        for k in range(1, window_rows):  # oldest-to-newest shifted adds
            shifted = np.concatenate([np.zeros(k), val[:-k]]) if k < n else np.zeros(n)
            total = total + np.where(pos >= k, shifted, 0.0)
        return pa.table(
            {
                "event_id": eid,
                "rolling_avg": round_half_away(total / take, 6),
            }
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_roll, batch_format="pyarrow")
    )


def brand_discount_elasticity(sf_dir: str):
    """Per-brand OLS regression of quantity on discount → (brand, n,
    slope, intercept): the distributed exact-moment least-squares every
    pricing/elasticity analysis starts from. Discounts carry two decimals
    so all four moments fold as exact int64 (x in discount-cents, y in
    units): slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) — integer numerator
    and denominator, ONE IEEE division; intercept = (Σy − slope·Σx)/n
    mirrors the same op order in SQL, so both are bit-reproducible (the
    ``events_zscore`` integer-moment trick applied to regression).

    Scale shape: the part→brand dimension broadcast ONCE (``ray.put`` +
    the shared sorted-dim kernel), one lineitem pass with in-batch
    per-brand integer partials, one tiny groupby-sum, closed-form finish.
    Degenerate brands (zero discount variance) emit slope/intercept 0/0
    — flagged by n on both sides."""
    import ray
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pdf = parts.to_pandas()
    brands = np.sort(pdf["p_brand"].unique())
    bidx = {b: i for i, b in enumerate(brands)}
    pk = pdf["p_partkey"].to_numpy().astype(np.int64)
    order = np.argsort(pk)
    dim_ref = ray.put(
        (pk[order], pdf["p_brand"].map(bidx).to_numpy()[order].astype(np.int64))
    )

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_discount", "l_quantity"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        vids, blab = ray.get(dim_ref)
        p = t["l_partkey"].to_numpy().astype(np.int64)
        _, pos, hit = _sorted_dim_lookup(vids, p)
        b = blab[pos[hit]]
        x = np.round(t["l_discount"].to_numpy()[hit] * 100).astype(np.int64)
        y = np.round(t["l_quantity"].to_numpy()[hit]).astype(np.int64)
        ub, inv = np.unique(b, return_inverse=True)
        out = {"b": ub}
        for name, vals in (
            ("n", np.ones(len(b), np.int64)),
            ("sx", x),
            ("sy", y),
            ("sxy", x * y),
            ("sxx", x * x),
        ):
            acc = np.zeros(len(ub), dtype=np.int64)
            np.add.at(acc, inv, vals)
            out[name] = acc
        return pa.table(out)

    agg = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
    )

    def _final(t: pa.Table) -> pa.Table:
        b = t["b"].to_numpy()
        n = t["n"].to_numpy().astype(np.float64)
        sx = t["sx"].to_numpy().astype(np.float64)
        sy = t["sy"].to_numpy().astype(np.float64)
        sxy = t["sxy"].to_numpy().astype(np.float64)
        sxx = t["sxx"].to_numpy().astype(np.float64)
        den = n * sxx - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(den > 0, (n * sxy - sx * sy) / den, 0.0)
            intercept = np.where(n > 0, (sy - slope * sx) / n, 0.0)
        return pa.table(
            {
                "brand": pa.array([str(brands[i]) for i in b], pa.string()),
                "n": t["n"],
                "slope": round_half_away(slope, 6),
                "intercept": round_half_away(intercept, 6),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def butterfly_count(sf_dir: str, num_buckets: int | None = None):
    """BUTTERFLY count of the order×part bipartite graph → one row
    (n_butterflies): a butterfly = a bipartite 4-cycle (two orders sharing
    two parts) — THE motif primitive of bipartite graph analysis (Wang et
    al., "Vertex Priority Based Butterfly Counting", VLDB 2019 lineage;
    the bipartite analogue of triangle counting). Identity used:
    #butterflies = Σ over part pairs C(co-orders(p1, p2), 2), so the whole
    op rides the existing :func:`copurchase_weights` pair machine plus one
    exact-int fold — no new shuffle shape. Sums are exact int64 (C(w,2)
    with w ≤ orders-per-pair)."""
    from ray.data.aggregate import Sum

    w_ds = copurchase_weights(sf_dir, num_buckets)

    def _partial(t: pa.Table) -> pa.Table:
        w = t["n_orders"].to_numpy().astype(np.int64)
        return pa.table({"b": np.array([(w * (w - 1) // 2).sum()], np.int64)})

    total = (
        w_ds.map_batches(_partial, batch_format="pyarrow")
        .aggregate(Sum("b", alias_name="n"))["n"]
    )
    return pa.table({"n_butterflies": pa.array([int(total)], pa.int64())})


def events_zscore(
    sf_dir: str,
    window_rows: int = 20,
    min_n: int = 5,
    num_buckets: int | None = None,
):
    """Trailing-window anomaly z-score per event → (event_id, n_prev,
    zscore): how many population standard deviations the event's value
    sits from the mean of the SAME USER's previous ≤ ``window_rows``
    events (ROWS BETWEEN window_rows PRECEDING AND 1 PRECEDING, ordered by
    ts, event_id) — the classic per-entity outlier/fraud gate. zscore = 0
    when fewer than ``min_n`` history rows exist or the window variance is
    zero.

    Bit-exactness: values carry two decimals, so window moments fold as
    exact int64 cents (S = Σc, SS = Σc²) via padded segment cumsums, and
    the algebra collapses to z = (n·c − S) / sqrt(n·SS − S²) — integer
    numerator, ONE IEEE sqrt and ONE divide, identical in numpy and
    DuckDB (no mean/std intermediate, no summation-order drift).

    Scale shape: the shared user-hash bucket shuffle (same ONE exchange as
    rolling/lag/sessionize), whole bucket vectorized — lexsort + two
    cumsums + gather; no per-row Python, no per-user loop."""
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _z(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        c = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, eid, c = u[order], eid[order], c[order]
        n = len(u)
        new_seg = np.concatenate([[True], u[1:] != u[:-1]])
        seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))
        i = np.arange(n)
        lo = np.maximum(seg_start, i - window_rows)
        P = np.concatenate([[0], np.cumsum(c)])
        P2 = np.concatenate([[0], np.cumsum(c * c)])
        n_prev = i - lo
        S = P[i] - P[lo]
        SS = P2[i] - P2[lo]
        disc = n_prev * SS - S * S
        ok = (n_prev >= min_n) & (disc > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(ok, (n_prev * c - S) / np.sqrt(disc), 0.0)
        return pa.table(
            {
                "event_id": eid,
                "n_prev": n_prev.astype(np.int64),
                "zscore": round_half_away(z, 6),
            }
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_z, batch_format="pyarrow")
    )


def events_range_join(
    sf_dir: str,
    window_sec: int = 600,
    probe_type: str = "purchase",
    build_type: str = "click",
):
    """Pure time-RANGE join (no equality key): for every ``probe_type``
    event, count/sum the ``build_type`` events in the trailing window
    ``[ts - window_sec, ts)``. → (event_id, n_prior, sum_prior).

    Ray Data has no range join; the scale shape is time-bucketing with
    bucket width == window width: a build row in bucket ``b`` can only
    match probes in buckets ``b`` and ``b+1``, so builds are replicated
    exactly once rightward, probes routed to their own bucket, and ONE
    ``groupby(bucket)`` co-locates every candidate pair. Within a whole
    bucket the join is vectorized: builds sorted by ts once, per-probe
    window = two ``searchsorted`` cuts, count/sum read off prefix sums.
    No build row is compared against out-of-window probes — work is
    O(n log n) per bucket vs the oracle's O(n²) nested loop.

    Partitioning assumption (documented per the custom-operator rule):
    bucket population is bounded by the event rate × window, so hot
    buckets are data-rate-bounded, not cardinality-bounded; at 100 TB
    the bucket count (timespan/window) far exceeds worker count.

    Determinism — ``value`` carries 2 decimals (synth spec), so sums are
    folded as exact int64 cents and divided once at the end: bit-equal to
    the SQL oracle's ``sum(CAST(round(value*100) AS BIGINT))/100.0`` at
    any partition count.
    """
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "event_type", "value"])
    w_us = np.int64(window_sec) * 1_000_000

    def _route(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy()
        cents = np.round(t["value"].to_numpy() * 100.0).astype(np.int64)
        probe = et == probe_type
        build = et == build_type
        pb, bb = ts[probe] // w_us, ts[build] // w_us
        return pa.table(
            {
                "b": np.concatenate([pb, bb, bb + 1]),
                "side": np.concatenate(
                    [
                        np.ones(probe.sum(), np.int8),
                        np.zeros(2 * build.sum(), np.int8),
                    ]
                ),
                "event_id": np.concatenate([eid[probe], eid[build], eid[build]]),
                "ts_us": np.concatenate([ts[probe], ts[build], ts[build]]),
                "cents": np.concatenate(
                    [np.zeros(probe.sum(), np.int64), cents[build], cents[build]]
                ),
            }
        )

    def _join(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy()
        ts = g["ts_us"].to_numpy()
        p = side == 1
        pts, pid = ts[p], g["event_id"].to_numpy()[p]
        if not p.any():
            return pa.table(
                {
                    "event_id": np.array([], np.int64),
                    "n_prior": np.array([], np.int64),
                    "sum_prior": np.array([], np.float64),
                }
            )
        bts = ts[~p]
        order = np.argsort(bts, kind="stable")
        bts = bts[order]
        bcents = g["cents"].to_numpy()[~p][order]
        cs = np.concatenate([[0], np.cumsum(bcents)])
        lo = np.searchsorted(bts, pts - w_us, side="left")
        hi = np.searchsorted(bts, pts, side="left")
        return pa.table(
            {
                "event_id": pid,
                "n_prior": (hi - lo).astype(np.int64),
                "sum_prior": (cs[hi] - cs[lo]) / 100.0,
            }
        )

    return (
        ds.map_batches(_route, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_join, batch_format="pyarrow")
    )


def _revenue_cents_by_nation(sf_dir: str, num_buckets: int = 32):
    """TPC-H-Q5-shaped rollup: lineitem ⋈ orders ⋈ customer ⋈ nation →
    per-nation exact int64 revenue cents·100 (pandas frame with n_name /
    n_regionkey, ≤ 25 rows). ``revenue_by_nation`` / ``revenue_by_region``
    divide once at the end. revenue = Σ l_extendedprice·(1−l_discount).

    Scale shape — two bucketed repartition joins, never ``Dataset.join``
    (acero dies on post-aggregate blocks, see dedup.py) and never a
    driver-side table: each join unions the two sides under a common schema
    with a bucket column (ONE shuffle per join), and a whole bucket —
    thousands of keys from both sides — is merged vectorized via
    ``searchsorted``. Lineitem is pre-aggregated to (orderkey, rev) inside
    each batch before anything is shuffled, and again to (custkey, rev)
    between the joins, so exchanges carry partials, not rows. The 25-row
    nation table alone is read on the driver (broadcast-small-side rule).

    Determinism — revenue is summed as EXACT integers: prices/discounts
    carry 2 decimals, so cents·(100−disc_cents) is an exact int64 in units
    of 10⁻⁴ dollars; partial sums stay < 2⁵³ and the single final division
    by 10⁴ matches the SQL oracle's ``sum(bigint)/10000.0`` bit-exactly at
    any partition count or summation order.
    """
    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    B = np.int64(num_buckets)

    def _li_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        rev = cents * (100 - disc)
        k, inv = np.unique(ok, return_inverse=True)
        s = np.bincount(inv, weights=rev.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "k": k,
                "rev": s,
                "aux": np.full(len(k), -1, np.int64),
                "b": (k % B).astype(np.int32),
            }
        )

    def _orders_side(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        return pa.table(
            {
                "k": k,
                "rev": np.zeros(len(k), np.int64),
                "aux": t["o_custkey"].to_numpy().astype(np.int64),
                "b": (k % B).astype(np.int32),
            }
        )

    def _cust_side(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy()
        return pa.table(
            {
                "k": k,
                "rev": np.zeros(len(k), np.int64),
                "aux": t["c_nationkey"].to_numpy().astype(np.int64),
                "b": (k % B).astype(np.int32),
            }
        )

    def _merge(g: pa.Table) -> pa.Table:
        """One bucket, both sides: map each rev row's key to the dimension
        side's aux (searchsorted on the sorted dimension keys), then
        pre-aggregate rev by aux before it leaves the bucket."""
        aux = g["aux"].to_numpy()
        dim = aux >= 0
        k = g["k"].to_numpy()
        dk, da = k[dim], aux[dim]
        order = np.argsort(dk)
        dk, da = dk[order], da[order]
        fk, frev = k[~dim], g["rev"].to_numpy()[~dim]
        pos = np.searchsorted(dk, fk)
        pos_c = np.minimum(pos, max(len(dk) - 1, 0))
        hit = (len(dk) > 0) & (dk[pos_c] == fk) if len(dk) else np.zeros(len(fk), bool)
        nk, inv = np.unique(da[pos_c[hit]], return_inverse=True)
        # exact int64 accumulation: a single nation-level cell here carries a
        # whole nation's revenue for the bucket — beyond the 2^53 float-
        # exactness bound long before the int64 bound (~$9.2e14)
        s = np.zeros(len(nk), np.int64)
        np.add.at(s, inv, frev[hit])
        return pa.table(
            {
                "k": nk,
                "rev": s,
                "aux": np.full(len(nk), -1, np.int64),
                "b": (nk % B).astype(np.int32),
            }
        )

    j1 = (
        li.map_batches(_li_partial, batch_format="pyarrow")
        .union(orders.map_batches(_orders_side, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_merge, batch_format="pyarrow")
    )  # → (custkey, rev) partials, already bucketed by custkey
    j2 = (
        j1.union(cust.map_batches(_cust_side, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_merge, batch_format="pyarrow")
    )  # → (nationkey, rev) partials

    from ray.data.aggregate import Sum

    per_nation = (
        j2.groupby("k").aggregate(Sum("rev", alias_name="rev")).to_pandas()
    )  # ≤ 25 rows on the driver
    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    return per_nation.merge(nation, left_on="k", right_on="n_nationkey")


def part_supplier_hhi(sf_dir: str, num_buckets: int | None = None):
    """Supplier-concentration per part → (part, n_suppliers, hhi): the
    Herfindahl–Hirschman index Σ share² of each supplier's revenue share
    of the part (1 = single-sourced, →1/n = evenly split) — the
    supply-chain-risk screen, and algebraically exact here:
    HHI = (Σ r_s²) / (Σ r_s)² with r_s the supplier's exact int64 cents —
    integer numerator and denominator, ONE IEEE division (int→double
    conversion is nearest-even on both sides), so bit-equal to SQL with
    no share intermediate. r_s² stays < 2⁶³ for per-(part,supplier)
    revenue < ~$3·10⁷ — the SQL side uses HUGEINT so larger scales stay
    exact there.

    Scale shape: one lineitem pass with in-batch (part, supplier) cents
    partials, one groupby-sum, one part-bucket vectorized fold."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"]
    )
    num_buckets = _auto_buckets(li, num_buckets)

    def _partial(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy().astype(np.int64)
        s = t["l_suppkey"].to_numpy().astype(np.int64)
        r = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        key = (p << np.int64(21)) | s  # suppkeys < 2^21 per TPC-H scaling
        uk, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(acc, inv, r)
        return pa.table({"ps": uk, "rev": acc})

    agg = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("ps")
        .aggregate(Sum("rev", alias_name="rev"))
    )

    def _pbucket(t: pa.Table) -> pa.Table:
        p = (t["ps"].to_numpy() >> np.int64(21))
        return t.append_column("pb", pa.array((p % num_buckets).astype(np.int32)))

    def _fold(g: pa.Table) -> pa.Table:
        p = g["ps"].to_numpy() >> np.int64(21)
        r = g["rev"].to_numpy().astype(np.int64)
        up, inv = np.unique(p, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        tot = np.zeros(len(up), dtype=np.int64)
        num = np.zeros(len(up), dtype=np.int64)
        np.add.at(tot, inv, r)
        np.add.at(num, inv, r * r)
        tot_f = tot.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            # num / (double(tot) · double(tot)) — the SQL mirrors this op
            # order exactly (NOT double(tot²): tot² > 2⁵³ would round
            # differently than the product of two rounded doubles)
            hhi = np.where(tot > 0, num / (tot_f * tot_f), 0.0)
        return pa.table(
            {
                "part": up,
                "n_suppliers": n,
                "hhi": round_half_away(hhi, 6),
            }
        )

    return (
        agg.map_batches(_pbucket, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(_fold, batch_format="pyarrow")
    )


def repeat_purchase_rate(sf_dir: str, num_buckets: int | None = None):
    """Per-part customer loyalty → (part, n_cust, n_repeat, repeat_rate):
    distinct buying customers, customers who bought the part in ≥ 2
    DISTINCT orders, and their ratio — the repeat-purchase KPI behind
    every retention dashboard.

    Scale shape: the fact-to-fact hop (lineitem needs o_custkey) is the
    repo's union + orderkey-bucket repartition join — both arms ship only
    (orderkey, key) int pairs, each bucket resolves custkeys vectorized
    with the sorted-dim kernel; the second shuffle buckets the resulting
    (part, cust, order) triples by part and folds distinct-order counts
    per (part, cust) with packed-key np.unique. rate = one int/int IEEE
    division, bit-exact vs SQL."""
    from ..functions.rounding import round_half_away

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    num_buckets = _auto_buckets(li, num_buckets)

    def _li_arm(t: pa.Table) -> pa.Table:
        o = t["l_orderkey"].to_numpy().astype(np.int64)
        p = t["l_partkey"].to_numpy().astype(np.int64)
        # distinct (order, part) within batch — dedup before the shuffle
        key = np.unique((o << np.int64(21)) | p)  # partkeys < 2^21 (TPC-H)
        return pa.table(
            {
                "b": ((key >> np.int64(21)) % num_buckets).astype(np.int32),
                "okey": key >> np.int64(21),
                "val": key & np.int64((1 << 21) - 1),
                "is_dim": np.zeros(len(key), dtype=bool),
            }
        )

    def _ord_arm(t: pa.Table) -> pa.Table:
        o = t["o_orderkey"].to_numpy().astype(np.int64)
        c = t["o_custkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "b": (o % num_buckets).astype(np.int32),
                "okey": o,
                "val": c,
                "is_dim": np.ones(len(o), dtype=bool),
            }
        )

    def _attach(g: pa.Table) -> pa.Table:
        okey = g["okey"].to_numpy()
        val = g["val"].to_numpy()
        is_dim = g["is_dim"].to_numpy(zero_copy_only=False)
        dk, dv = okey[is_dim], val[is_dim]
        rk, rp = okey[~is_dim], val[~is_dim]
        order, pos, hit = _sorted_dim_lookup(dk, rk)
        cust = dv[order][pos[hit]]
        return pa.table(
            {
                "part": rp[hit],
                "cust": cust,
                "okey": rk[hit],
            }
        )

    triples = (
        li.map_batches(_li_arm, batch_format="pyarrow")
        .union(orders.map_batches(_ord_arm, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_attach, batch_format="pyarrow")
    )

    def _pbucket(t: pa.Table) -> pa.Table:
        p = t["part"].to_numpy()
        return t.append_column("pb", pa.array((p % num_buckets).astype(np.int32)))

    def _fold(g: pa.Table) -> pa.Table:
        p = g["part"].to_numpy()
        c = g["cust"].to_numpy()
        o = g["okey"].to_numpy()
        # distinct (part, cust, order), then orders per (part, cust),
        # then per part — three nested segment passes off ONE lexsort
        order3 = np.lexsort((o, c, p))
        ps, cs, os_ = p[order3], c[order3], o[order3]
        new3 = np.concatenate(
            [[True], (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1]) | (os_[1:] != os_[:-1])]
        )
        ps, cs = ps[new3], cs[new3]
        new2 = np.concatenate([[True], (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])])
        seg = np.cumsum(new2) - 1
        orders_per_pc = np.bincount(seg)
        pp = ps[new2]
        new1 = np.concatenate([[True], pp[1:] != pp[:-1]])
        pseg = np.cumsum(new1) - 1
        n_cust = np.bincount(pseg)
        n_repeat = np.bincount(pseg, weights=(orders_per_pc >= 2)).astype(np.int64)
        parts_u = pp[new1]
        with np.errstate(divide="ignore", invalid="ignore"):
            rate = np.where(n_cust > 0, n_repeat / n_cust, 0.0)
        return pa.table(
            {
                "part": parts_u,
                "n_cust": n_cust.astype(np.int64),
                "n_repeat": n_repeat,
                "repeat_rate": round_half_away(rate, 6),
            }
        )

    return (
        triples.map_batches(_pbucket, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(_fold, batch_format="pyarrow")
    )


def revenue_by_nation(sf_dir: str, num_buckets: int = 32):
    out = _revenue_cents_by_nation(sf_dir, num_buckets)
    return pa.table(
        {
            "n_name": out["n_name"].to_numpy(),
            "revenue": out["rev"].to_numpy().astype(np.float64) / 10000.0,
        }
    )


def revenue_by_region(sf_dir: str, num_buckets: int = 32):
    """Region-level revenue rollup — the last dimension hop of the TPC-H
    snowflake (nation → region, 25 → 5 rows, both driver-read per the
    broadcast-small-side rule). The fold stays exact int64 cents until the
    single final division, so it is bit-equal to the SQL five-way join at
    any partition count."""
    import pyarrow.parquet as pq

    out = _revenue_cents_by_nation(sf_dir, num_buckets)
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    out = out.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    g = out.groupby("r_name", as_index=False)["rev"].sum()  # exact int64
    return pa.table(
        {
            "r_name": g["r_name"].to_numpy(),
            "revenue": g["rev"].to_numpy().astype(np.float64) / 10000.0,
        }
    )


def topk_parts_per_nation(sf_dir: str, k: int = 5):
    """Grouped top-k: the ``k`` highest-revenue parts per supplier nation →
    (nation, partkey, revenue, rnk), rnk 1..k, ties broken by partkey asc.

    Scale shape — ONE shuffle end-to-end:
    * supplier is the broadcast small side (|S| ≪ |lineitem|): shipped once
      via ``ray.put`` and mapped per batch with a searchsorted lookup, never
      joined through an exchange (SURVEY J5 at the relational layer).
    * each lineitem batch partial-aggregates revenue by packed
      (nation, partkey) BEFORE the shuffle, so the exchange carries one row
      per distinct key per batch, not per lineitem row.
    * the single ``groupby(nation)`` then finishes the sum and takes top-k
      inside the group, vectorized. 25 nations bound the group count — at
      extreme scale, salt the nation key and fold two top-k stages; the
      per-group state is O(distinct parts), not O(rows).

    Revenue uses the same exact-int-cents trick as :func:`revenue_by_nation`
    (summation-order-independent, bit-exact vs the SQL oracle).
    """
    import pyarrow.parquet as pq
    import ray

    sup = pq.read_table(
        table_path(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    )
    sk = sup["s_suppkey"].to_numpy().astype(np.int64)
    order = np.argsort(sk)
    sup_ref = ray.put(
        (sk[order], sup["s_nationkey"].to_numpy().astype(np.int64)[order])
    )

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"],
    )

    def _partial(t: pa.Table) -> pa.Table:
        skeys, snation = ray.get(sup_ref)
        supp = t["l_suppkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(skeys, supp)
        pos_c = np.minimum(pos, max(len(skeys) - 1, 0))
        # inner-join semantics: rows whose suppkey has no supplier are
        # dropped, never misattributed to the next key (clamp + verify,
        # same discipline as revenue_by_nation's bucket merge)
        hit = skeys[pos_c] == supp
        nation = snation[pos_c[hit]]
        part = t["l_partkey"].to_numpy().astype(np.int64)[hit]
        cents = np.round(t["l_extendedprice"].to_numpy()[hit] * 100).astype(np.int64)
        disc = np.round(t["l_discount"].to_numpy()[hit] * 100).astype(np.int64)
        rev = (cents * (100 - disc)).astype(np.float64)
        packed = (nation << np.int64(40)) | part
        key, inv = np.unique(packed, return_inverse=True)
        s = np.bincount(inv, weights=rev).astype(np.int64)
        return pa.table(
            {"nation": (key >> np.int64(40)), "partkey": key & ((1 << 40) - 1), "rev": s}
        )

    def _topk(g: pa.Table) -> pa.Table:
        part = g["partkey"].to_numpy()
        key, inv = np.unique(part, return_inverse=True)
        s = np.bincount(inv, weights=g["rev"].to_numpy().astype(np.float64)).astype(
            np.int64
        )
        pick = np.lexsort((key, -s))[:k]
        return pa.table(
            {
                "nation": np.full(len(pick), g["nation"][0].as_py(), np.int64),
                "partkey": key[pick],
                "revenue": s[pick].astype(np.float64) / 10000.0,
                "rnk": np.arange(1, len(pick) + 1, dtype=np.int64),
            }
        )

    return (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("nation")
        .map_groups(_topk, batch_format="pyarrow")
    )


def distinct_users_daily(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per (event_type, day) →
    (event_type, day, n_users).

    Scale shape — the distinct is pushed down: each batch emits its *unique*
    (event_type, day, user_id) triples (vectorized np.unique over packed
    day/user keys), so the single shuffle carries partial-deduped triples,
    not raw events; the per-group finish is one more np.unique. This is the
    COUNT DISTINCT analogue of combiner-before-shuffle (vocab_topk). Day is
    emitted as a 'YYYY-MM-DD' string on both sides so the driver's hash
    compare never sees a date-type mismatch.
    """
    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "user_id"])

    def _partial(t: pa.Table) -> pa.Table:
        day_i = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        user = t["user_id"].to_numpy().astype(np.int64)
        typ = t["event_type"].to_numpy(zero_copy_only=False)
        # dedupe triples inside the batch: dictionary-encode type, then a
        # lexsort + boundary mask — no bit-packing width assumptions, full
        # int64 range for day and user_id
        tkey, tinv = np.unique(typ, return_inverse=True)
        order = np.lexsort((user, day_i, tinv))
        ti, di, ui = tinv[order], day_i[order], user[order]
        first = np.ones(len(ti), bool)
        first[1:] = (ti[1:] != ti[:-1]) | (di[1:] != di[:-1]) | (ui[1:] != ui[:-1])
        return pa.table(
            {
                "event_type": tkey[ti[first]],
                "day": np.datetime_as_string(
                    di[first].astype("datetime64[D]"), unit="D"
                ),
                "user_id": ui[first],
            }
        )

    def _count(g: pa.Table) -> pa.Table:
        n = len(np.unique(g["user_id"].to_numpy()))
        return pa.table(
            {
                "event_type": [g["event_type"][0].as_py()],
                "day": [g["day"][0].as_py()],
                "n_users": np.array([n], np.int64),
            }
        )

    return (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .map_groups(_count, batch_format="pyarrow")
    )


def parts_never_ordered(sf_dir: str, min_qty: int = 45, num_buckets: int = 32):
    """Distributed ANTI-join: parts with NO lineitem of quantity ≥ min_qty
    → (p_partkey,).

    Scale shape — both sides are key-deduped inside each batch before the
    single bucketed shuffle (the fact side additionally predicate-filtered
    at the read boundary), so the exchange carries distinct keys only. A
    whole bucket is resolved vectorized with ``np.isin`` — no acero join,
    no driver-side set. The same composition gives SEMI-join by flipping
    the mask.
    """
    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])
    part = read_table(sf_dir, "part", columns=["p_partkey"])
    B = np.int64(num_buckets)

    def _fact(t: pa.Table) -> pa.Table:
        k = t["l_partkey"].to_numpy()[t["l_quantity"].to_numpy() >= min_qty]
        k = np.unique(k).astype(np.int64)
        return pa.table(
            {"k": k, "probe": np.ones(len(k), bool), "b": (k % B).astype(np.int32)}
        )

    def _dim(t: pa.Table) -> pa.Table:
        k = np.unique(t["p_partkey"].to_numpy()).astype(np.int64)
        return pa.table(
            {"k": k, "probe": np.zeros(len(k), bool), "b": (k % B).astype(np.int32)}
        )

    def _anti(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy()
        probe = g["probe"].to_numpy(zero_copy_only=False)
        keep = k[~probe][~np.isin(k[~probe], k[probe])]
        return pa.table({"p_partkey": np.sort(keep)})

    return (
        li.map_batches(_fact, batch_format="pyarrow")
        .union(part.map_batches(_dim, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_anti, batch_format="pyarrow")
    )


_FK_RELATIONS = (
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
)


def fk_integrity(sf_dir: str, num_buckets: int = 32, relations=_FK_RELATIONS):
    """Referential-integrity audit over every foreign-key edge of the star
    schema → (relation, n_keys, n_orphans): distinct child FK values and
    how many have NO parent row — the data-quality gate every 100 TB
    ingest runs before anything else trusts a join.

    Scale shape per relation: the same distinct-key anti-join machine as
    ``parts_never_ordered`` — both sides key-deduped per batch (the
    exchange carries distinct keys only), one bucketed union-groupby, a
    vectorized ``np.isin`` per whole bucket emitting per-bucket partial
    (n_keys, n_orphans) counts that sum exactly (buckets partition the key
    space); the 7 relations' tiny partials concatenate via Dataset.union,
    one final count fold. No driver-side key set at any point."""
    from ray.data.aggregate import Sum

    outs = []
    for rel, child, fk, parent, pk in relations:
        c = read_table(sf_dir, child, columns=[fk])
        p = read_table(sf_dir, parent, columns=[pk])
        B = np.int64(num_buckets)

        def _child(t: pa.Table, fk=fk, rel=rel) -> pa.Table:
            k = np.unique(t[fk].to_numpy()).astype(np.int64)
            return pa.table(
                {"k": k, "probe": np.zeros(len(k), bool),
                 "b": (k % B).astype(np.int32)}
            )

        def _parent(t: pa.Table, pk=pk) -> pa.Table:
            k = np.unique(t[pk].to_numpy()).astype(np.int64)
            return pa.table(
                {"k": k, "probe": np.ones(len(k), bool),
                 "b": (k % B).astype(np.int32)}
            )

        def _audit(g: pa.Table, rel=rel) -> pa.Table:
            k = g["k"].to_numpy()
            probe = g["probe"].to_numpy(zero_copy_only=False)
            child_k = np.unique(k[~probe])  # distinct across batches
            orphans = int((~np.isin(child_k, k[probe])).sum())
            return pa.table(
                {
                    "relation": pa.array([rel], pa.string()),
                    "n_keys": pa.array([len(child_k)], pa.int64()),
                    "n_orphans": pa.array([orphans], pa.int64()),
                }
            )

        outs.append(
            c.map_batches(_child, batch_format="pyarrow")
            .union(p.map_batches(_parent, batch_format="pyarrow"))
            .groupby("b")
            .map_groups(_audit, batch_format="pyarrow")
        )
    all_parts = outs[0]
    for o in outs[1:]:
        all_parts = all_parts.union(o)
    return (
        all_parts.groupby("relation")
        .aggregate(
            Sum("n_keys", alias_name="n_keys"),
            Sum("n_orphans", alias_name="n_orphans"),
        )
    )


def order_priority_semi(sf_dir: str, min_qty: float = 48.0, num_buckets: int = 32):
    """Q4-shaped EXISTS semi-join count: orders having ≥ 1 lineitem with
    ``l_quantity >= min_qty``, counted per o_orderpriority →
    (o_orderpriority, n_orders).

    Scale shape: the probe side ships DISTINCT qualifying orderkeys only
    (predicate applied + deduped inside each batch), the orders side ships
    (key, priority) pairs; one bucketed union-groupby resolves the
    semi-join vectorized (``np.isin`` per whole bucket) and emits one
    partial count per priority per bucket; a final tiny groupby sums.
    Same distinct-key anti-join machine as :func:`parts_never_ordered`
    with the mask flipped (SURVEY J2 at the relational layer)."""
    from ray.data.aggregate import Sum

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    B = np.int64(num_buckets)

    def _probe(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy()[t["l_quantity"].to_numpy() >= min_qty]
        k = np.unique(k).astype(np.int64)
        return pa.table(
            {
                "k": k,
                "pri": pa.array([""] * len(k), pa.string()),
                "probe": np.ones(len(k), bool),
                "b": (k % B).astype(np.int32),
            }
        )

    def _orders(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "k": k,
                "pri": t["o_orderpriority"],
                "probe": np.zeros(len(k), bool),
                "b": (k % B).astype(np.int32),
            }
        )

    def _semi(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy()
        probe = g["probe"].to_numpy(zero_copy_only=False)
        pri = g["pri"].to_numpy(zero_copy_only=False)
        hit = np.isin(k[~probe], k[probe])
        key, cnt = np.unique(pri[~probe][hit], return_counts=True)
        return pa.table(
            {
                "o_orderpriority": pa.array(list(key), pa.string()),
                "n": cnt.astype(np.int64),
            }
        )

    return (
        li.map_batches(_probe, batch_format="pyarrow")
        .union(orders.map_batches(_orders, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_semi, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n_orders"))
    )


def customer_order_histogram(sf_dir: str, num_buckets: int = 32):
    """Q13-shaped left-join distribution: how many customers placed exactly
    N orders (INCLUDING the zero-order customers an inner join would drop)
    → (n_orders, n_custs).

    Scale shape: orders batches pre-count per custkey (the exchange carries
    one partial per key per batch, not per order row); customer batches ship
    distinct keys. One bucketed union-groupby finishes per-customer totals —
    a custkey's partials all land in its own bucket, so per-bucket totals
    are final — and emits a per-bucket partial histogram; the second
    groupby over ≤ a few hundred distinct counts is trivially small."""
    from ray.data.aggregate import Sum

    orders = read_table(sf_dir, "orders", columns=["o_custkey"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    B = np.int64(num_buckets)

    def _orders(t: pa.Table) -> pa.Table:
        k, cnt = np.unique(t["o_custkey"].to_numpy().astype(np.int64), return_counts=True)
        return pa.table(
            {
                "k": k,
                "cnt": cnt.astype(np.int64),
                "is_cust": np.zeros(len(k), bool),
                "b": (k % B).astype(np.int32),
            }
        )

    def _cust(t: pa.Table) -> pa.Table:
        k = np.unique(t["c_custkey"].to_numpy()).astype(np.int64)
        return pa.table(
            {
                "k": k,
                "cnt": np.zeros(len(k), np.int64),
                "is_cust": np.ones(len(k), bool),
                "b": (k % B).astype(np.int32),
            }
        )

    def _hist(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy()
        cnt = g["cnt"].to_numpy()
        is_cust = g["is_cust"].to_numpy(zero_copy_only=False)
        # LEFT-join semantics: totals only for keys present on the customer
        # side; orders from keys with no customer row are dropped
        ckeys = np.unique(k[is_cust])
        key, inv = np.unique(k, return_inverse=True)
        tot = np.zeros(len(key), np.int64)
        np.add.at(tot, inv, cnt)  # int64 accumulation, exact past 2^53
        per_cust = tot[np.searchsorted(key, ckeys)]
        n_orders, n_custs = np.unique(per_cust, return_counts=True)
        return pa.table(
            {"n_orders": n_orders, "n": n_custs.astype(np.int64)}
        )

    return (
        orders.map_batches(_orders, batch_format="pyarrow")
        .union(cust.map_batches(_cust, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_hist, batch_format="pyarrow")
        .groupby("n_orders")
        .aggregate(Sum("n", alias_name="n_custs"))
    )


def small_qty_revenue(sf_dir: str, num_buckets: int = 32):
    """Q17-shaped correlated-average join: yearly-averaged revenue of
    lineitems whose quantity is below 20% of their part's average quantity
    → one row (avg_yearly).

    The below-average predicate is evaluated in EXACT integer arithmetic —
    ``q < 0.2·(S/n)`` rewritten as ``5·q100·n < S100`` with q100/S100 the
    hundredths-scaled ints — so no float-summation-order ulp can flip a
    borderline row (the same reason revenues fold as int cents).

    Scale shape: pass 1 pre-aggregates (S100, n) per partkey inside each
    batch before one groupby; pass 2 re-streams lineitem rows unioned with
    those tiny per-part stats through a second bucketed groupby — stats and
    rows co-bucket by partkey, the filter and the cent-sum are vectorized
    per whole bucket, and only per-bucket int partials reach the final fold.
    The per-part stats are NOT broadcast: at 100 TB `part` has ~10^10 keys,
    so they ride the same exchange as the rows."""
    from ray.data.aggregate import Sum

    B = np.int64(num_buckets)
    li1 = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def _stats_partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        q100 = np.round(t["l_quantity"].to_numpy() * 100).astype(np.int64)
        key, inv = np.unique(pk, return_inverse=True)
        s = np.bincount(inv, weights=q100.astype(np.float64)).astype(np.int64)
        n = np.bincount(inv).astype(np.int64)
        return pa.table({"pk": key, "s100": s, "n": n})

    stats = (
        li1.map_batches(_stats_partial, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("s100", alias_name="s100"), Sum("n", alias_name="n"))
    )

    def _stats_row(t: pa.Table) -> pa.Table:
        pk = t["pk"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "pk": pk,
                "q100": t["s100"].to_numpy().astype(np.int64),
                "price100": t["n"].to_numpy().astype(np.int64),
                "is_stat": np.ones(len(pk), bool),
                "b": (pk % B).astype(np.int32),
            }
        )

    li2 = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )

    def _rows(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "pk": pk,
                "q100": np.round(t["l_quantity"].to_numpy() * 100).astype(np.int64),
                "price100": np.round(t["l_extendedprice"].to_numpy() * 100).astype(
                    np.int64
                ),
                "is_stat": np.zeros(len(pk), bool),
                "b": (pk % B).astype(np.int32),
            }
        )

    def _filter_sum(g: pa.Table) -> pa.Table:
        pk = g["pk"].to_numpy()
        q100 = g["q100"].to_numpy()
        price100 = g["price100"].to_numpy()
        is_stat = g["is_stat"].to_numpy(zero_copy_only=False)
        skey = pk[is_stat]
        rpk = pk[~is_stat]
        if len(skey) == 0 or len(rpk) == 0:
            return pa.table({"rev100": np.array([0], np.int64)})
        order, pos_c, hit = _sorted_dim_lookup(skey, rpk)
        s100 = q100[is_stat][order]
        n = price100[is_stat][order]
        # exact-integer below-average predicate: 5·q·n < S
        keep = hit & (5 * q100[~is_stat] * n[pos_c] < s100[pos_c])
        return pa.table(
            {"rev100": np.array([price100[~is_stat][keep].sum()], np.int64)}
        )

    partials = (
        li2.map_batches(_rows, batch_format="pyarrow")
        .union(stats.map_batches(_stats_row, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_filter_sum, batch_format="pyarrow")
    )
    total = partials.aggregate(Sum("rev100", alias_name="rev100"))["rev100"]
    return pd.DataFrame({"avg_yearly": [float(total or 0) / 700.0]})


def large_volume_orders(sf_dir: str, min_qty_sum: float = 250.0, num_buckets: int = 32):
    """Q18-shaped HAVING filter + join: orders whose total lineitem quantity
    exceeds ``min_qty_sum`` with their customer and price attributes →
    (o_orderkey, o_custkey, o_totalprice, total_qty).

    Scale shape: lineitem pre-sums quantity per orderkey inside each batch
    (int hundredths, exact); orders ships (key, custkey, totalprice) once.
    One bucketed union-groupby finishes per-order totals (an orderkey's
    partials co-bucket), applies the HAVING filter, and inner-joins the
    surviving keys to the order attributes vectorized — only qualifying
    rows leave the bucket. o_totalprice is carried untouched (no float
    arithmetic), so the hash compare is trivially exact."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    B = np.int64(num_buckets)
    thresh100 = np.int64(round(min_qty_sum * 100))

    def _li(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        q100 = np.round(t["l_quantity"].to_numpy() * 100).astype(np.int64)
        key, inv = np.unique(k, return_inverse=True)
        s = np.bincount(inv, weights=q100.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "k": key,
                "q100": s,
                "custkey": np.zeros(len(key), np.int64),
                "price": np.zeros(len(key), np.float64),
                "is_order": np.zeros(len(key), bool),
                "b": (key % B).astype(np.int32),
            }
        )

    def _orders(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "k": k,
                "q100": np.zeros(len(k), np.int64),
                "custkey": t["o_custkey"].to_numpy().astype(np.int64),
                "price": t["o_totalprice"].to_numpy(),
                "is_order": np.ones(len(k), bool),
                "b": (k % B).astype(np.int32),
            }
        )

    def _having(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy()
        q100 = g["q100"].to_numpy()
        is_order = g["is_order"].to_numpy(zero_copy_only=False)
        okey = k[is_order]
        key, inv = np.unique(k[~is_order], return_inverse=True)
        tot = np.bincount(inv, weights=q100[~is_order].astype(np.float64)).astype(
            np.int64
        )
        big = tot > thresh100
        bkey, btot = key[big], tot[big]
        if len(okey) == 0 or len(bkey) == 0:
            empty = np.array([], np.int64)
            return pa.table(
                {
                    "o_orderkey": empty,
                    "o_custkey": empty,
                    "o_totalprice": np.array([], np.float64),
                    "total_qty": np.array([], np.float64),
                }
            )
        order, pos_c, hit = _sorted_dim_lookup(okey, bkey)
        ocust = g["custkey"].to_numpy()[is_order][order]
        oprice = g["price"].to_numpy()[is_order][order]
        return pa.table(
            {
                "o_orderkey": bkey[hit],
                "o_custkey": ocust[pos_c[hit]],
                "o_totalprice": oprice[pos_c[hit]],
                "total_qty": btot[hit].astype(np.float64) / 100.0,
            }
        )

    return (
        li.map_batches(_li, batch_format="pyarrow")
        .union(orders.map_batches(_orders, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_having, batch_format="pyarrow")
    )


def shipping_priority_topk(
    sf_dir: str, cutoff: str = "1997-06-15", k: int = 10, num_buckets: int = 32
):
    """Q3-shaped filtered join + global top-k: the ``k`` highest-revenue
    orders placed before ``cutoff`` among lineitems shipped after it →
    (o_orderkey, revenue, o_orderdate, rnk), ties broken by orderkey asc.

    Scale shape: both sides are predicate-filtered AT THE BATCH boundary
    and lineitem pre-sums revenue per orderkey (exact int cents) before the
    one bucketed union-groupby; each bucket emits only its local top-k, so
    the final fold sees ≤ k·num_buckets rows — the global top-k never
    requires a sort of the joined table."""
    cut = np.datetime64(cutoff, "us")
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    B = np.int64(num_buckets)

    def _li(t: pa.Table) -> pa.Table:
        m = t["l_shipdate"].to_numpy() > cut
        k_ = t["l_orderkey"].to_numpy().astype(np.int64)[m]
        cents = np.round(t["l_extendedprice"].to_numpy()[m] * 100).astype(np.int64)
        disc = np.round(t["l_discount"].to_numpy()[m] * 100).astype(np.int64)
        rev = cents * (100 - disc)
        key, inv = np.unique(k_, return_inverse=True)
        s = np.bincount(inv, weights=rev.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "k": key,
                "rev": s,
                "odate": pa.array([""] * len(key), pa.string()),
                "is_order": np.zeros(len(key), bool),
                "b": (key % B).astype(np.int32),
            }
        )

    def _orders(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy()
        m = d < cut
        k_ = t["o_orderkey"].to_numpy().astype(np.int64)[m]
        return pa.table(
            {
                "k": k_,
                "rev": np.zeros(len(k_), np.int64),
                "odate": np.datetime_as_string(d[m].astype("datetime64[D]"), unit="D"),
                "is_order": np.ones(len(k_), bool),
                "b": (k_ % B).astype(np.int32),
            }
        )

    def _local_topk(g: pa.Table) -> pa.Table:
        kk = g["k"].to_numpy()
        rev = g["rev"].to_numpy()
        is_order = g["is_order"].to_numpy(zero_copy_only=False)
        odate = g["odate"].to_numpy(zero_copy_only=False)
        okey = kk[is_order]
        key, inv = np.unique(kk[~is_order], return_inverse=True)
        tot = np.bincount(inv, weights=rev[~is_order].astype(np.float64)).astype(
            np.int64
        )
        if len(okey) == 0 or len(key) == 0:
            key = tot = np.array([], np.int64)
            od = np.array([], object)
        else:
            order, pos_c, hit = _sorted_dim_lookup(okey, key)
            od = odate[is_order][order]
            key, tot, od = key[hit], tot[hit], od[pos_c[hit]]
        pick = np.lexsort((key, -tot))[:k]
        return pa.table(
            {
                "one": np.ones(len(pick), np.int32),
                "o_orderkey": key[pick],
                "rev": tot[pick],
                "o_orderdate": pa.array(list(od[pick]), pa.string()),
            }
        )

    def _global_topk(g: pa.Table) -> pa.Table:
        key = g["o_orderkey"].to_numpy()
        tot = g["rev"].to_numpy()
        od = g["o_orderdate"].to_numpy(zero_copy_only=False)
        pick = np.lexsort((key, -tot))[:k]
        return pa.table(
            {
                "o_orderkey": key[pick],
                "revenue": tot[pick].astype(np.float64) / 10000.0,
                "o_orderdate": pa.array(list(od[pick]), pa.string()),
                "rnk": np.arange(1, len(pick) + 1, dtype=np.int64),
            }
        )

    return (
        li.map_batches(_li, batch_format="pyarrow")
        .union(orders.map_batches(_orders, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_local_topk, batch_format="pyarrow")
        .groupby("one")
        .map_groups(_global_topk, batch_format="pyarrow")
    )


def waiting_suppliers(sf_dir: str, num_buckets: int = 32):
    """Q21-shaped multi-predicate same-key join: per supplier, the number
    of multi-supplier orders where THIS supplier was the only one with a
    returned ('R') lineitem → (l_suppkey, numwait).

    One key (l_orderkey) carries a semi-join (≥ 2 distinct suppliers), an
    anti-join (no OTHER supplier returned), and the positive predicate —
    all resolved in a single bucketed exchange. Per-batch combine dedupes
    to (order, supplier, any-R) triples (``np.maximum.reduceat`` over the
    sorted run boundaries) so the shuffle carries distinct pairs, not
    lineitem rows; the whole bucket then qualifies suppliers vectorized
    and emits per-supplier partial counts."""
    from ray.data.aggregate import Sum

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_returnflag"]
    )
    B = np.int64(num_buckets)

    def _dedupe(o, s, f):
        order = np.lexsort((s, o))
        o, s, f = o[order], s[order], f[order]
        start = np.ones(len(o), bool)
        start[1:] = (o[1:] != o[:-1]) | (s[1:] != s[:-1])
        idx = np.nonzero(start)[0]
        if len(idx) == 0:
            return o, s, f
        fmax = np.maximum.reduceat(f, idx)
        return o[start], s[start], fmax

    def _pairs(t: pa.Table) -> pa.Table:
        o = t["l_orderkey"].to_numpy().astype(np.int64)
        s = t["l_suppkey"].to_numpy().astype(np.int64)
        f = (t["l_returnflag"].to_numpy(zero_copy_only=False) == "R").astype(np.int8)
        o, s, f = _dedupe(o, s, f)
        return pa.table(
            {"o": o, "s": s, "f": f, "b": (o % B).astype(np.int32)}
        )

    def _qualify(g: pa.Table) -> pa.Table:
        o, s, f = _dedupe(
            g["o"].to_numpy(), g["s"].to_numpy(), g["f"].to_numpy()
        )
        okey, inv, nsupp = np.unique(o, return_inverse=True, return_counts=True)
        nr = np.zeros(len(okey), np.int64)
        np.add.at(nr, inv, f.astype(np.int64))
        win = (f == 1) & (nr[inv] == 1) & (nsupp[inv] >= 2)
        skey, cnt = np.unique(s[win], return_counts=True)
        return pa.table({"l_suppkey": skey, "n": cnt.astype(np.int64)})

    return (
        li.map_batches(_pairs, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_qualify, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("n", alias_name="numwait"))
    )


def sales_opportunity(sf_dir: str, since: str = "2000-06-01", num_buckets: int = 32):
    """Q22-shaped scalar-subquery + anti-join: per nation, the count and
    total balance of CHURNED high-value customers — balance above the
    global average positive balance AND no order since ``since`` →
    (c_nationkey, numcust, totacctbal).

    The global average is folded first as exact int cents (one tiny
    aggregate — two scalars reach the driver, O(1), then ride into the
    predicate closure); ``bal > avg`` is evaluated as ``c100·n > S100`` in
    exact ints so no float ulp flips a borderline customer. The
    no-recent-orders anti-join is the distinct-key bucket machine (probe
    side date-filtered AND deduped inside each batch); surviving customers
    partial-aggregate per nation inside their bucket."""
    from ray.data.aggregate import Sum

    cust_bal = read_table(sf_dir, "customer", columns=["c_acctbal"])

    def _bal_partial(t: pa.Table) -> pa.Table:
        c100 = np.round(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        pos = c100 > 0
        return pa.table(
            {
                "s100": np.array([c100[pos].sum()], np.int64),
                "n": np.array([int(pos.sum())], np.int64),
            }
        )

    tot = cust_bal.map_batches(_bal_partial, batch_format="pyarrow").aggregate(
        Sum("s100", alias_name="s100"), Sum("n", alias_name="n")
    )
    s100, n = np.int64(tot["s100"] or 0), np.int64(tot["n"] or 0)

    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    B = np.int64(num_buckets)
    since_us = np.datetime64(since, "us")

    def _cust(t: pa.Table) -> pa.Table:
        c100 = np.round(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        keep = c100 * n > s100  # exact-int above-average predicate
        k = t["c_custkey"].to_numpy().astype(np.int64)[keep]
        return pa.table(
            {
                "k": k,
                "nation": t["c_nationkey"].to_numpy().astype(np.int64)[keep],
                "c100": c100[keep],
                "probe": np.zeros(len(k), bool),
                "b": (k % B).astype(np.int32),
            }
        )

    def _orders(t: pa.Table) -> pa.Table:
        recent = t["o_orderdate"].to_numpy() >= since_us
        k = np.unique(t["o_custkey"].to_numpy()[recent]).astype(np.int64)
        return pa.table(
            {
                "k": k,
                "nation": np.zeros(len(k), np.int64),
                "c100": np.zeros(len(k), np.int64),
                "probe": np.ones(len(k), bool),
                "b": (k % B).astype(np.int32),
            }
        )

    def _anti(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy()
        probe = g["probe"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(k[~probe], k[probe])
        nation = g["nation"].to_numpy()[~probe][keep]
        c100 = g["c100"].to_numpy()[~probe][keep]
        key, inv, cnt = np.unique(nation, return_inverse=True, return_counts=True)
        s = np.zeros(len(key), np.int64)
        np.add.at(s, inv, c100)
        return pa.table(
            {
                "c_nationkey": key,
                "numcust": cnt.astype(np.int64),
                "tot100": s,
            }
        )

    out = (
        cust.map_batches(_cust, batch_format="pyarrow")
        .union(orders.map_batches(_orders, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_anti, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("numcust", alias_name="numcust"), Sum("tot100", alias_name="tot100"))
    )

    def _finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_nationkey": t["c_nationkey"],
                "numcust": t["numcust"],
                "totacctbal": t["tot100"].to_numpy().astype(np.float64) / 100.0,
            }
        )

    return out.map_batches(_finish, batch_format="pyarrow")


def events_cumsum(sf_dir: str, num_buckets: int | None = None):
    """Per-user RUNNING SUM window function (ROWS UNBOUNDED PRECEDING,
    ordered by ts then event_id) → (event_id, cum_value).

    Scale shape: the events_lag machine — ONE user-bucketed shuffle, a
    whole bucket handled vectorized (lexsort + cumsum with per-user base
    subtraction). Values carry two decimals, so the running sum is folded
    as exact int cents — no float-summation-order dependence vs the SQL
    window (whose segment-tree summation would otherwise differ in ulps)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _cumsum(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        c100 = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, eid, c100 = u[order], eid[order], c100[order]
        c = np.cumsum(c100)
        start = np.ones(len(u), bool)
        start[1:] = u[1:] != u[:-1]
        idx = np.nonzero(start)[0]
        run = np.diff(np.append(idx, len(u)))
        base = np.repeat(np.where(idx > 0, c[idx - 1], 0), run)
        return pa.table(
            {
                "event_id": eid,
                "cum_value": (c - base).astype(np.float64) / 100.0,
            }
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_cumsum, batch_format="pyarrow")
    )


def succ_reciprocity(sf_dir: str, num_buckets: int = 32, round_to: int = 6):
    """Reciprocity of the directed part-successor graph: the fraction of
    distinct directed edges whose reverse edge also exists → one row
    (n_edges, n_recip, reciprocity).

    Scale shape: consumes :func:`succ_edges` (which dedupes per bucket but
    not globally), canonicalizes each edge to an undirected (lo, hi) pair
    + direction bit, and buckets by a pair HASH (:func:`_pair_bucket` —
    no packed key, so full-64-bit url-hash vids work) — both directions
    and all duplicate sightings of a pair co-locate, so one exchange
    yields exact global counts from per-bucket partials (distinct
    directed edges; pairs seen with both direction bits). The driver
    folds B partial rows."""
    from ..functions.rounding import round_half_away
    from ray.data.aggregate import Sum

    edges = succ_edges(sf_dir)

    def _canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.uint64)
        d = t["dst"].to_numpy().astype(np.uint64)
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        direc = np.where(s < d, 1, 2).astype(np.int8)
        return pa.table(
            {
                "lo": lo.view(np.int64),
                "hi": hi.view(np.int64),
                "direc": direc,
                "b": _pair_bucket(lo, hi, num_buckets),
            }
        )

    def _count(g: pa.Table) -> pa.Table:
        lo = g["lo"].to_numpy()
        hi = g["hi"].to_numpy()
        direc = g["direc"].to_numpy().astype(np.int64)
        order = np.lexsort((direc, hi, lo))
        lo, hi, direc = lo[order], hi[order], direc[order]
        first = np.ones(len(lo), bool)
        first[1:] = (
            (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1]) | (direc[1:] != direc[:-1])
        )
        lo, hi = lo[first], hi[first]  # distinct directed edges
        pf = np.ones(len(lo), bool)
        pf[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        idx = np.flatnonzero(pf)
        cnt = np.diff(np.append(idx, len(lo)))
        return pa.table(
            {
                "n_edges": np.array([len(lo)], np.int64),
                "n_recip": np.array([2 * int((cnt == 2).sum())], np.int64),
            }
        )

    parts = (
        edges.map_batches(_canon, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_count, batch_format="pyarrow")
    )
    tot = parts.aggregate(
        Sum("n_edges", alias_name="n_edges"), Sum("n_recip", alias_name="n_recip")
    )
    ne, nr = int(tot["n_edges"] or 0), int(tot["n_recip"] or 0)
    return pd.DataFrame(
        {
            "n_edges": [ne],
            "n_recip": [nr],
            "reciprocity": [float(round_half_away(nr / ne, round_to)) if ne else 0.0],
        }
    )


def revenue_rollup(sf_dir: str, num_buckets: int = 32):
    """GROUPING SETS rollup — ((region, nation), (region), ()) — in ONE
    pass over the fact table → (r_name, n_name, revenue) with 'ALL' as the
    rollup placeholder (so the hash compare never sees NULL semantics).

    Scale shape: the heavy three-join aggregation runs ONCE (the
    :func:`_revenue_cents_by_nation` machine — exchanges carry per-key
    int-cent partials); the region and grand-total levels re-fold the
    ≤ 25-row nation result against the driver-read region lookup
    (broadcast-small-side rule). This is how a rollup should be computed
    at 100 TB: one fact pass, higher levels derived from the finest."""
    import pyarrow.parquet as pq

    out = _revenue_cents_by_nation(sf_dir, num_buckets)
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    out = out.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    rows_r = [str(x) for x in out["r_name"]]
    rows_n = [str(x) for x in out["n_name"]]
    revs = [int(x) for x in out["rev"]]
    per_region = out.groupby("r_name")["rev"].sum()  # exact int64
    rows_r += [str(r) for r in per_region.index]
    rows_n += ["ALL"] * len(per_region)
    revs += [int(x) for x in per_region.values]
    rows_r.append("ALL")
    rows_n.append("ALL")
    revs.append(int(out["rev"].sum()))
    return pa.table(
        {
            "r_name": pa.array(rows_r, pa.string()),
            "n_name": pa.array(rows_n, pa.string()),
            "revenue": np.array(revs, np.int64).astype(np.float64) / 10000.0,
        }
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_event_pivot(sf_dir: str, num_buckets: int | None = None):
    """PIVOT: one row per user with a count column per event type plus the
    exact total value → (user_id, n_click, n_error, n_purchase, n_signup,
    n_view, total_value).

    Scale shape: each batch partial-pivots vectorized (np.add.at into a
    |users_in_batch| × |types| count matrix + int-cent value sums), so the
    single user-bucketed shuffle carries one partial row per user per
    batch; the per-bucket finish just re-sums columns. The type set is a
    fixed schema (the pivot contract), not data-dependent."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])
    num_buckets = _auto_buckets(ds, num_buckets)
    tmap = {t: i for i, t in enumerate(_EVENT_TYPES)}

    def _partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.int64)
        typ = t["event_type"].to_numpy(zero_copy_only=False)
        c100 = np.round(t["value"].to_numpy() * 100).astype(np.int64)
        ut, inv_t = np.unique(typ, return_inverse=True)
        lut = np.array([tmap.get(x, -1) for x in ut], np.int64)  # ≤ |types|
        ti = lut[inv_t]
        uk, inv = np.unique(u, return_inverse=True)
        counts = np.zeros((len(uk), len(_EVENT_TYPES)), np.int64)
        known = ti >= 0
        np.add.at(counts, (inv[known], ti[known]), 1)
        v = np.zeros(len(uk), np.int64)
        np.add.at(v, inv, c100)
        cols = {"user_id": uk}
        for j, name in enumerate(_EVENT_TYPES):
            cols[f"n_{name}"] = counts[:, j]
        cols["v100"] = v
        cols["b"] = (uk % num_buckets).astype(np.int32)
        return pa.table(cols)

    def _finish(g: pa.Table) -> pa.Table:
        uk, inv = np.unique(g["user_id"].to_numpy(), return_inverse=True)
        cols = {"user_id": uk}
        for name in _EVENT_TYPES:
            s = np.zeros(len(uk), np.int64)
            np.add.at(s, inv, g[f"n_{name}"].to_numpy())
            cols[f"n_{name}"] = s
        v = np.zeros(len(uk), np.int64)
        np.add.at(v, inv, g["v100"].to_numpy())
        cols["total_value"] = v.astype(np.float64) / 100.0
        return pa.table(cols)

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_finish, batch_format="pyarrow")
    )


def succ_inout_correlation(sf_dir: str, num_buckets: int = 32, round_to: int = 6):
    """Pearson correlation between in-degree and out-degree over the
    directed part-successor graph → one row (n_vertices, r). Answers "do
    parts that lead INTO many others also get led into?" — the directed
    analogue of degree assortativity.

    Scale shape: succ edges are globally deduped in their key bucket
    (both duplicate sightings co-locate), per-bucket partial degree
    contributions flow through ONE vid-bucketed exchange where full
    (in, out) pairs form, and each bucket emits a single row of exact
    int64 moment partials (n, Σx, Σy, Σx², Σy², Σxy) — the driver folds
    B rows and evaluates one float expression, mirrored term for term in
    the SQL oracle."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    edges = succ_edges(sf_dir)
    B = np.uint64(num_buckets)

    def _canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.uint64)
        d = t["dst"].to_numpy().astype(np.uint64)
        # pair-hash bucketing, no packed key — full-64-bit-vid safe
        return pa.table(
            {
                "s": s.view(np.int64),
                "d": d.view(np.int64),
                "b": _pair_bucket(s, d, num_buckets),
            }
        )

    def _dedupe_degrees(g: pa.Table) -> pa.Table:
        src, dst = _pair_dedup_cols(g["s"].to_numpy(), g["d"].to_numpy())
        uo, co = np.unique(src, return_counts=True)
        ui, ci = np.unique(dst, return_counts=True)
        vid = np.concatenate([uo, ui])
        return pa.table(
            {
                "vid": vid,
                "o": np.concatenate([co.astype(np.int64), np.zeros(len(ui), np.int64)]),
                "i": np.concatenate([np.zeros(len(uo), np.int64), ci.astype(np.int64)]),
                "vb": ((vid.astype(np.uint64)) % B).astype(np.int32),
            }
        )

    def _moments(g: pa.Table) -> pa.Table:
        vid = g["vid"].to_numpy()
        key, inv = np.unique(vid, return_inverse=True)
        x = np.zeros(len(key), np.int64)
        y = np.zeros(len(key), np.int64)
        np.add.at(x, inv, g["o"].to_numpy())
        np.add.at(y, inv, g["i"].to_numpy())
        return pa.table(
            {
                "n": np.array([len(key)], np.int64),
                "sx": np.array([x.sum()], np.int64),
                "sy": np.array([y.sum()], np.int64),
                "sxx": np.array([(x * x).sum()], np.int64),
                "syy": np.array([(y * y).sum()], np.int64),
                "sxy": np.array([(x * y).sum()], np.int64),
            }
        )

    m = (
        edges.map_batches(_canon, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_dedupe_degrees, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(_moments, batch_format="pyarrow")
        .aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"),
        )
    )
    n = int(m["n"] or 0)
    sx, sy = int(m["sx"] or 0), int(m["sy"] or 0)
    sxx, syy, sxy = int(m["sxx"] or 0), int(m["syy"] or 0), int(m["sxy"] or 0)
    den = float((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy))
    r = (n * sxy - sx * sy) / np.sqrt(den) if den > 0 else 0.0
    return pd.DataFrame(
        {
            "n_vertices": [n],
            "r": [float(round_half_away(r, round_to))],
        }
    )


def forecast_revenue(
    sf_dir: str,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
):
    """Q6-shaped pure filter-aggregate: revenue that would be gained by
    dropping discounts in a band → one row (revenue). All predicates are
    evaluated on exact int cents (the discount band compares hundredths,
    so no float boundary can flip a row) and the product folds as int64.

    Scale shape: the canonical pushdown case — a 4-column pruned read,
    per-batch vectorized predicate + int partial sum, one scalar fold."""
    from ray.data.aggregate import Sum

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo = np.datetime64(date_from, "us")
    hi = np.datetime64(date_to, "us")
    d_lo = np.int64(round(disc_lo * 100))
    d_hi = np.int64(round(disc_hi * 100))
    q_hi = np.int64(round(max_qty * 100))

    def _partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy()
        disc = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        qty = np.round(t["l_quantity"].to_numpy() * 100).astype(np.int64)
        keep = (
            (ship >= lo)
            & (ship < hi)
            & (disc >= d_lo)
            & (disc <= d_hi)
            & (qty < q_hi)
        )
        cents = np.round(t["l_extendedprice"].to_numpy()[keep] * 100).astype(np.int64)
        rev = (cents * disc[keep]).sum()
        return pa.table({"rev": np.array([rev], np.int64)})

    total = li.map_batches(_partial, batch_format="pyarrow").aggregate(
        Sum("rev", alias_name="rev")
    )["rev"]
    return pd.DataFrame({"revenue": [float(total or 0) / 10000.0]})


def events_value_stats(sf_dir: str, round_to: int = 6):
    """Per-type variance/stddev of event values from EXACT integer
    moments → (event_type, n, mean, var_pop, stddev_pop). Values carry
    two decimals, so Σx and Σx² fold as exact int64 (in cents and
    cents²); the mean/variance float expressions are mirrored term for
    term in the SQL oracle — no Welford-order drift on either side.

    var_pop = (n·Σx² − (Σx)²) / (n² · 10⁴) in dollars²; stddev = sqrt.
    Scale shape: one pass, per-batch per-type int partials, tiny groupby."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])

    def _partial(t: pa.Table) -> pa.Table:
        typ = t["event_type"].to_numpy(zero_copy_only=False)
        c100 = np.round(t["value"].to_numpy() * 100).astype(np.int64)
        key, inv = np.unique(typ, return_inverse=True)
        n = np.zeros(len(key), np.int64)
        s = np.zeros(len(key), np.int64)
        ss = np.zeros(len(key), np.int64)
        np.add.at(n, inv, 1)
        np.add.at(s, inv, c100)
        np.add.at(ss, inv, c100 * c100)
        return pa.table(
            {
                "event_type": pa.array(list(key), pa.string()),
                "n": n,
                "s": s,
                "ss": ss,
            }
        )

    agg = (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
        .to_pandas()
    )
    n = agg["n"].to_numpy().astype(np.int64)
    s = agg["s"].to_numpy().astype(object)  # exact python ints for n*ss
    ss = agg["ss"].to_numpy().astype(object)
    num = np.array(
        [int(ni) * int(ssi) - int(si) * int(si) for ni, si, ssi in zip(n, s, ss)],
        dtype=np.float64,
    )
    den = (n.astype(np.float64) * n.astype(np.float64)) * 10000.0
    var = num / den
    return pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n": n,
            "mean": round_half_away(
                agg["s"].to_numpy().astype(np.float64) / (n * 100.0), round_to
            ),
            "var_pop": round_half_away(var, round_to),
            "stddev_pop": round_half_away(np.sqrt(var), round_to),
        }
    )


def bloom_filtered_revenue(
    sf_dir: str, priority: str = "1-URGENT", m_bits: int = 1 << 20,
    num_buckets: int = 32,
):
    """Semi-join with BLOOM-FILTER pushdown (the working form of the
    reference's dead Bloom-filter type, SURVEY T6): revenue of lineitems
    whose order has the given priority → one row (revenue, n_rows).

    Scale shape: the qualifying orderkeys fold into a fixed-size bitmap
    (per-batch partials OR-folded — a bitmap is m/8 bytes REGARDLESS of
    key count) broadcast once via ``ray.put``; the lineitem scan probes it
    and drops definitely-non-joining rows BEFORE the exchange — at a 2-3%
    false-positive rate the shuffle shrinks to ≈ the qualifying fraction.
    Correctness never depends on the bloom: the bucketed exact semi-join
    downstream removes false positives (false negatives are impossible),
    so the result is bit-equal to the plain join."""
    import ray
    from ray.data.aggregate import Sum

    from ..functions.bloom import bloom_build, bloom_partial, bloom_probe

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def _keys(t: pa.Table) -> pa.Table:
        m = t["o_orderpriority"].to_numpy(zero_copy_only=False) == priority
        k = t["o_orderkey"].to_numpy().astype(np.int64)[m]
        return pa.table(
            {"bloom": pa.array([bloom_partial(k, m_bits).tobytes()], pa.binary())}
        )

    parts = orders.map_batches(_keys, batch_format="pyarrow").take_all()
    words = bloom_build(
        [np.frombuffer(r["bloom"], np.uint64) for r in parts]
    )
    bloom_ref = ray.put(words)

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    B = np.int64(num_buckets)

    def _probe(t: pa.Table) -> pa.Table:
        w = ray.get(bloom_ref)
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        keep = bloom_probe(w, k)  # prunes BEFORE the exchange
        k = k[keep]
        cents = np.round(t["l_extendedprice"].to_numpy()[keep] * 100).astype(np.int64)
        disc = np.round(t["l_discount"].to_numpy()[keep] * 100).astype(np.int64)
        rev = cents * (100 - disc)
        key, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(key), np.int64)
        n = np.zeros(len(key), np.int64)
        np.add.at(s, inv, rev)
        np.add.at(n, inv, 1)
        return pa.table(
            {"k": key, "rev": s, "n": n,
             "probe": np.zeros(len(key), bool),
             "b": (key % B).astype(np.int32)}
        )

    def _dim(t: pa.Table) -> pa.Table:
        m = t["o_orderpriority"].to_numpy(zero_copy_only=False) == priority
        k = np.unique(t["o_orderkey"].to_numpy().astype(np.int64)[m])
        z = np.zeros(len(k), np.int64)
        return pa.table(
            {"k": k, "rev": z, "n": z,
             "probe": np.ones(len(k), bool),
             "b": (k % B).astype(np.int32)}
        )

    def _semi(g: pa.Table) -> pa.Table:
        # exact semi-join: removes the bloom's false positives
        k = g["k"].to_numpy()
        probe = g["probe"].to_numpy(zero_copy_only=False)
        hit = np.isin(k[~probe], k[probe])
        return pa.table(
            {
                "rev": np.array([g["rev"].to_numpy()[~probe][hit].sum()], np.int64),
                "n": np.array([g["n"].to_numpy()[~probe][hit].sum()], np.int64),
            }
        )

    tot = (
        li.map_batches(_probe, batch_format="pyarrow")
        .union(orders.map_batches(_dim, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_semi, batch_format="pyarrow")
        .aggregate(Sum("rev", alias_name="rev"), Sum("n", alias_name="n"))
    )
    return pd.DataFrame(
        {
            "revenue": [float(tot["rev"] or 0) / 10000.0],
            "n_rows": [int(tot["n"] or 0)],
        }
    )


def orders_active_backlog(sf_dir: str, window_days: int = 30):
    """SWEEP-LINE interval aggregation: how many orders are "active" (placed
    within the trailing ``window_days``) on each calendar day any order
    starts or expires → (day, n_active). The classic difference-array
    technique: each order contributes +1 at its start day and −1 at
    start+window; the running sum over event days is the concurrency curve.

    Scale shape: each batch emits per-day DELTA partials (two ints per
    order, pre-summed per day inside the batch), one tiny groupby over
    distinct days finishes the deltas, and the cumulative sum runs over
    the ≤ |days| rows in a single-group fold — the orders table is
    touched once and never leaves its batches. Exact int arithmetic end
    to end."""
    from ray.data.aggregate import Sum

    orders = read_table(sf_dir, "orders", columns=["o_orderdate"])
    W = np.int64(window_days)

    def _deltas(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        days = np.concatenate([day, day + W])
        delt = np.concatenate(
            [np.ones(len(day), np.int64), -np.ones(len(day), np.int64)]
        )
        key, inv = np.unique(days, return_inverse=True)
        s = np.zeros(len(key), np.int64)
        np.add.at(s, inv, delt)
        return pa.table({"day_i": key, "delta": s})

    agg = (
        orders.map_batches(_deltas, batch_format="pyarrow")
        .groupby("day_i")
        .aggregate(Sum("delta", alias_name="delta"))
    )

    def _one(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(np.ones(len(t), np.int32)))

    def _cumsum(g: pa.Table) -> pa.Table:
        day_i = g["day_i"].to_numpy()
        delta = g["delta"].to_numpy()
        order = np.argsort(day_i)
        day_i, delta = day_i[order], delta[order]
        return pa.table(
            {
                "day": np.datetime_as_string(
                    day_i.astype("datetime64[D]"), unit="D"
                ),
                "n_active": np.cumsum(delta).astype(np.int64),
            }
        )

    return (
        agg.map_batches(_one, batch_format="pyarrow")
        .groupby("one")
        .map_groups(_cumsum, batch_format="pyarrow")
    )


def promo_revenue(sf_dir: str, ptype: str = "PROMO", num_buckets: int = 32):
    """Q14-shaped conditional-share aggregate: the percentage of total
    revenue coming from parts of the given type → one row (promo_pct).

    Scale shape: ONE bucketed repartition join (lineitem partials pre-
    aggregated per partkey inside each batch — the exchange carries
    (partkey, rev) partials; the part side ships (key, is_promo) bits);
    both the promo and total revenue fold as exact int cents in the same
    pass, and the single final percentage division mirrors the SQL
    expression: ``100.0 * promo / total`` rounded half-away at 6."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_type"])
    B = np.int64(num_buckets)

    def _li(t: pa.Table) -> pa.Table:
        k = t["l_partkey"].to_numpy().astype(np.int64)
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        rev = cents * (100 - disc)
        key, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(key), np.int64)
        np.add.at(s, inv, rev)
        return pa.table(
            {"k": key, "rev": s, "promo": np.zeros(len(key), np.int8),
             "is_dim": np.zeros(len(key), bool), "b": (key % B).astype(np.int32)}
        )

    def _part(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy().astype(np.int64)
        promo = (
            t["p_type"].to_numpy(zero_copy_only=False) == ptype
        ).astype(np.int8)
        return pa.table(
            {"k": k, "rev": np.zeros(len(k), np.int64), "promo": promo,
             "is_dim": np.ones(len(k), bool), "b": (k % B).astype(np.int32)}
        )

    def _fold(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy()
        is_dim = g["is_dim"].to_numpy(zero_copy_only=False)
        order, pos_c, hit = _sorted_dim_lookup(k[is_dim], k[~is_dim])
        promo = g["promo"].to_numpy()[is_dim][order]
        rev = g["rev"].to_numpy()[~is_dim]
        prom = rev[hit & (promo[pos_c] == 1)].sum()
        tot = rev[hit].sum()  # inner-join semantics
        return pa.table(
            {"p": np.array([prom], np.int64), "t": np.array([tot], np.int64)}
        )

    agg = (
        li.map_batches(_li, batch_format="pyarrow")
        .union(part.map_batches(_part, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_fold, batch_format="pyarrow")
        .aggregate(Sum("p", alias_name="p"), Sum("t", alias_name="t"))
    )
    p, t = int(agg["p"] or 0), int(agg["t"] or 0)
    return pd.DataFrame(
        {"promo_pct": [float(round_half_away(100.0 * p / t, 6)) if t else 0.0]}
    )


def session_conversion(
    sf_dir: str,
    gap_sec: int = 600,
    convert_type: str = "purchase",
    num_buckets: int | None = None,
):
    """Per-day session conversion → (day, n_sessions, n_converted, rate):
    of the sessions STARTING each day (same gap rule as
    ``events_sessionize``), how many contained ≥ 1 ``convert_type`` event
    — the conversion-funnel headline number. ``day`` is int64 days since
    epoch (UTC floor) so both sides agree without date-type coercion;
    rate = one int/int IEEE division rounded to 6.

    Scale shape: the ONE-shuffle user-bucket sessionizer (lexsort + diff +
    cumsum + reduceat — no per-user loop) emits per-batch (day, n, conv)
    partials; a tiny day groupby-sum and a closed-form finish."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    ds = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _sess(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        ty = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, ty = u[order], ts[order], ty[order]
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        gap = np.concatenate([[0], ts[1:] - ts[:-1]])
        brk = new_user | (gap > gap_sec * 1_000_000)
        starts = np.nonzero(brk)[0]
        if len(starts) == 0:
            return pa.table(
                {
                    "day": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "conv": pa.array([], pa.int64()),
                }
            )
        is_conv = (ty == convert_type).astype(np.int64)
        conv = (np.add.reduceat(is_conv, starts) > 0).astype(np.int64)
        day = ts[starts] // np.int64(86_400_000_000)
        ud, inv = np.unique(day, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        c = np.zeros(len(ud), dtype=np.int64)
        np.add.at(c, inv, conv)
        return pa.table({"day": ud, "n": n, "conv": c})

    agg = (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_sess, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n_sessions"),
                   Sum("conv", alias_name="n_converted"))
    )

    def _rate(t: pa.Table) -> pa.Table:
        n = t["n_sessions"].to_numpy().astype(np.float64)
        c = t["n_converted"].to_numpy().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(n > 0, c / n, 0.0)
        return t.append_column("rate", pa.array(round_half_away(r, 6)))

    return agg.map_batches(_rate, batch_format="pyarrow")


def user_type_entropy(sf_dir: str, num_buckets: int | None = None):
    """Behavioural diversity per user → (user_id, n_events, n_types,
    entropy): Shannon entropy (nats) of the user's event-type
    distribution — H = ln n − (Σ c·ln c)/n, the single-pass identity that
    needs only exact integer counts (no probability intermediate). Low
    entropy + high volume = single-action automation; complements
    ``user_gap_cv``'s timing signal with a behavioural one.

    Scale shape: in-batch (user, type) count partials, one groupby-sum,
    one user-bucket vectorized fold. ln is the usual 1-ulp
    numpy-vs-DuckDB noise, ~12 orders below the 6-decimal round."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        tkey, tinv = np.unique(ty, return_inverse=True)
        key = u * np.int64(len(tkey)) + tinv
        uk, inv = np.unique(key, return_inverse=True)
        c = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "user_id": (uk // len(tkey)).astype(np.int64),
                "etype": pa.array(
                    [tkey[i] for i in (uk % len(tkey)).astype(np.int64)],
                    pa.string(),
                ),
                "c": c,
            }
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["user_id", "etype"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _fold(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        c = g["c"].to_numpy().astype(np.float64)
        uu, inv = np.unique(u, return_inverse=True)
        n = np.zeros(len(uu))
        s = np.zeros(len(uu))
        k = np.bincount(inv).astype(np.int64)
        np.add.at(n, inv, c)
        np.add.at(s, inv, c * np.log(c))
        with np.errstate(divide="ignore", invalid="ignore"):
            h = np.where(n > 0, np.log(n) - s / n, 0.0)
        return pa.table(
            {
                "user_id": uu,
                "n_events": n.astype(np.int64),
                "n_types": k,
                "entropy": round_half_away(h, 6),
            }
        )

    return (
        agg.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_fold, batch_format="pyarrow")
    )


def user_gap_cv(sf_dir: str, min_gaps: int = 5, num_buckets: int | None = None):
    """Bot-likeness signal per user → (user_id, n_gaps, mean_gap_s, cv):
    the coefficient of variation of inter-event times — metronomic
    automation scores cv ≈ 0, humans are bursty (cv ≳ 1); the standard
    first-pass bot filter for web event streams. Users with fewer than
    ``min_gaps`` gaps or zero mean are emitted with cv 0 (insufficient
    signal), flagged by n_gaps.

    Bit-exactness: gaps are floored to WHOLE SECONDS (µs gaps square past
    int64 — a day-long gap² is ~10²²; second-granularity keeps every
    moment an exact int64 while second-level regularity is exactly the
    bot signal), so per-user moments (S = Σg, SS = Σg²) fold exactly and
    cv = sqrt(n·SS − S²) / S — integer radicand, ONE IEEE sqrt and ONE
    divide, identical in numpy and DuckDB; mean_gap_s = S/n mirrored
    verbatim. Same ONE-shuffle user-bucket machine as the other window
    ops."""
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _cv(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        n = len(u)
        same = np.concatenate([[False], u[1:] == u[:-1]])
        gap = np.concatenate([[0], (ts[1:] - ts[:-1]) // 1_000_000])
        gu, gv = u[same], gap[same].astype(np.float64)
        uu, inv = np.unique(u, return_inverse=True)
        ug, ginv = np.unique(gu, return_inverse=True)
        ng = np.zeros(len(ug), np.int64)
        S = np.zeros(len(ug), np.float64)
        SS = np.zeros(len(ug), np.float64)
        np.add.at(ng, ginv, 1)
        np.add.at(S, ginv, gv)
        np.add.at(SS, ginv, gv * gv)
        # users appearing at all (≥1 event) get a row; map gap stats onto them
        pos = np.searchsorted(ug, uu)
        has = (pos < len(ug)) & (ug[np.minimum(pos, len(ug) - 1)] == uu)
        n_g = np.where(has, ng[np.minimum(pos, len(ug) - 1)], 0)
        S_u = np.where(has, S[np.minimum(pos, len(ug) - 1)], 0.0)
        SS_u = np.where(has, SS[np.minimum(pos, len(ug) - 1)], 0.0)
        disc = n_g * SS_u - S_u * S_u
        ok = (n_g >= min_gaps) & (S_u > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            cv = np.where(ok, np.sqrt(np.maximum(disc, 0.0)) / S_u, 0.0)
            mean_s = np.where(n_g > 0, S_u / n_g, 0.0)
        return pa.table(
            {
                "user_id": uu,
                "n_gaps": n_g.astype(np.int64),
                "mean_gap_s": round_half_away(mean_s, 6),
                "cv": round_half_away(cv, 6),
            }
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_cv, batch_format="pyarrow")
    )


def events_ema(
    sf_dir: str, alpha: float = 0.25, num_buckets: int | None = None
):
    """Per-user EXPONENTIAL moving average of ``value`` →
    (event_id, ema): y₀ = x₀, yᵢ = α·xᵢ + (1−α)·yᵢ₋₁ over the user's
    (ts, event_id) order — the O(1)-state smoother (vs the O(W) rolling
    window) every streaming anomaly/trend stack runs.

    Bit-exactness by RECURRENCE-ORDER PARITY: an EMA is inherently
    sequential, so instead of a closed-form rescaled scan (whose float
    rounding would drift from SQL's), the bucket kernel iterates over
    POSITIONS — one vectorized step per within-user position, every user
    in the bucket advanced at once — evaluating literally
    ``alpha * x + (1 - alpha) * y_prev`` per step, the SAME two products
    and one add, in the SAME order, as the oracle's recursive CTE. Step
    count per bucket = the longest user timeline (≤ 99 here), each step
    a full-width numpy expression — not a per-row loop.

    Scale shape: the shared ONE-shuffle user-hash bucket machine."""
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    num_buckets = _auto_buckets(ds, num_buckets)
    a = float(alpha)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _ema(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        x = g["value"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, eid, x = u[order], eid[order], x[order]
        n = len(u)
        new_seg = np.concatenate([[True], u[1:] != u[:-1]])
        seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))
        pos = np.arange(n) - seg_start
        y = x.copy()  # position 0: y = x
        max_pos = int(pos.max()) if n else 0
        for p in range(1, max_pos + 1):
            m = pos == p
            y[m] = a * x[m] + (1 - a) * y[np.nonzero(m)[0] - 1]
        return pa.table(
            {"event_id": eid, "ema": round_half_away(y, 6)}
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_ema, batch_format="pyarrow")
    )


def customer_rfm(sf_dir: str, k: int = 5, num_buckets: int | None = None):
    """RFM customer segmentation (Hughes 1994; the classic marketing
    quantile code) → (custkey, r_tile, f_tile, m_tile, rfm): NTILE(k)
    quintiles of Recency (last order date, most recent = tile 1),
    Frequency (order count) and Monetary (exact cents total), rfm =
    100·r + 10·f + m. Tie-break custkey ASC everywhere, so every tile
    edge is deterministic.

    Scale shape: one orders pass with in-batch per-customer combine + one
    groupby → the per-customer aggregate table; each dimension is then a
    DISTRIBUTED sort with global ordinal (the TeraSort two-phase trick,
    ``stages/sort.py``) and the tile is closed-form integer arithmetic on
    (ordinal, n) — NTILE without a window engine and without
    materializing customers on the driver; the three tile columns meet in
    the custkey-bucket union-groupby (no chained joins)."""
    from ray.data.aggregate import Max, Sum

    from ..stages.sort import sort_with_ordinal

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    num_buckets = _auto_buckets(orders, num_buckets)

    def _partial(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy()
        r = t["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        m = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        uc, inv = np.unique(c, return_inverse=True)
        rmax = np.full(len(uc), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(rmax, inv, r)
        f = np.bincount(inv).astype(np.int64)
        ms = np.zeros(len(uc), dtype=np.int64)
        np.add.at(ms, inv, m)
        return pa.table({"custkey": uc, "r": rmax, "f": f, "m": ms})

    agg = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(
            Max("r", alias_name="r"),
            Sum("f", alias_name="f"),
            Sum("m", alias_name="m"),
        )
        .materialize()
    )
    n = agg.count()
    K = np.int64(k)

    def _tile_stage(dim: str, tag: int):
        def _tile(t: pa.Table) -> pa.Table:
            p = t["ordinal"].to_numpy()
            small = np.int64(n) // K
            n_big = np.int64(n) % K
            cut = n_big * (small + 1)
            tile = np.where(
                p < cut,
                p // np.maximum(small + 1, 1),
                n_big + (p - cut) // np.maximum(small, 1),
            ) + 1
            return pa.table(
                {
                    "custkey": t["custkey"],
                    "tag": np.full(len(p), tag, dtype=np.int8),
                    "tile": tile.astype(np.int64),
                }
            )

        return sort_with_ordinal(
            agg.select_columns(["custkey", dim]),
            [dim, "custkey"],
            descending=[True, False],
        ).map_batches(_tile, batch_format="pyarrow")

    arms = _tile_stage("r", 0).union(_tile_stage("f", 1), _tile_stage("m", 2))

    def _bucket(t: pa.Table) -> pa.Table:
        c = t["custkey"].to_numpy()
        return t.append_column("b", pa.array((c % num_buckets).astype(np.int32)))

    def _resolve(g: pa.Table) -> pa.Table:
        c = g["custkey"].to_numpy()
        tag = g["tag"].to_numpy()
        tile = g["tile"].to_numpy()
        uc, inv = np.unique(c, return_inverse=True)
        tiles = np.zeros((len(uc), 3), dtype=np.int64)
        tiles[inv, tag] = tile
        return pa.table(
            {
                "custkey": uc,
                "r_tile": tiles[:, 0],
                "f_tile": tiles[:, 1],
                "m_tile": tiles[:, 2],
                "rfm": tiles[:, 0] * 100 + tiles[:, 1] * 10 + tiles[:, 2],
            }
        )

    return (
        arms.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_resolve, batch_format="pyarrow")
    )


def events_path_trigrams(sf_dir: str, num_buckets: int | None = None):
    """Second-order journey mining: consecutive event-type TRIPLES within
    each user's timeline (ordered by ts, event_id), counted corpus-wide →
    (t1, t2, t3, n) — the path patterns a first-order transition matrix
    cannot see (e.g. view→click→purchase vs view→click→view).

    Same one-shuffle user-bucket machine as ``events_transition_matrix``;
    a bucket is one lexsort + two shifted compares, pre-aggregated to
    ≤ |types|³ partials per bucket."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                               "event_type"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _tri(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        typ = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, typ = u[order], typ[order]
        tkey, tinv = np.unique(typ, return_inverse=True)
        k = np.int64(len(tkey))
        same1 = np.concatenate([[False], u[1:] == u[:-1]])
        same2 = np.concatenate([[False, False], u[2:] == u[:-2]])
        ok = same1 & same2  # rows with two same-user predecessors
        p2 = np.concatenate([[0, 0], tinv[:-2]])
        p1 = np.concatenate([[0], tinv[:-1]])
        packed = (p2[ok].astype(np.int64) * k + p1[ok]) * k + tinv[ok]
        key, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "t1": tkey[(key // (k * k)).astype(np.int64)],
                "t2": tkey[((key // k) % k).astype(np.int64)],
                "t3": tkey[(key % k).astype(np.int64)],
                "n": cnt.astype(np.int64),
            }
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_tri, batch_format="pyarrow")
        .groupby(["t1", "t2", "t3"])
        .aggregate(Sum("n", alias_name="n"))
    )


def events_transition_matrix(sf_dir: str, num_buckets: int | None = None):
    """Markov TRANSITION COUNTS over user journeys: consecutive event-type
    pairs within each user's timeline (ordered by ts, event_id), counted
    corpus-wide → (from_type, to_type, n) — the first-order behavioural
    model every funnel/session analysis starts from.

    Scale shape: the one-shuffle user-bucket machine; a whole bucket is
    one lexsort + shifted compare, and each bucket pre-aggregates its
    (from, to) pairs so the final groupby sees |types|² partials per
    bucket, not transitions."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                               "event_type"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _trans(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        typ = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, typ = u[order], typ[order]
        same = np.concatenate([[False], u[1:] == u[:-1]])
        tkey, tinv = np.unique(typ, return_inverse=True)
        prev = np.concatenate([[0], tinv[:-1]])
        f, to = prev[same], tinv[same]
        packed = f.astype(np.int64) * np.int64(len(tkey)) + to
        key, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "from_type": tkey[(key // len(tkey)).astype(np.int64)],
                "to_type": tkey[(key % len(tkey)).astype(np.int64)],
                "n": cnt.astype(np.int64),
            }
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_trans, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def events_quantiles(sf_dir: str, qs: tuple = (0.5, 0.95)):
    """Exact per-group quantiles, distributed: ONE global sort by
    (group, value) with ordinal (the TeraSort machinery), a small per-group
    count aggregate, then only the ≤ 2·|groups|·|qs| boundary-rank rows are
    fetched for interpolation — the driver never sees the data, just the
    ranks it asked for. → (event_type, quantile, n, value).

    This is the scale path for exact quantiles (vs ``map_groups`` per group,
    which ships a whole group to one worker and dies on skew): the sort
    spreads every group across blocks, and quantile extraction is O(1) rows
    per group afterwards. Interpolation is ``v0 + (v1−v0)·f`` rounded to 6
    — DuckDB's ``quantile_cont`` agrees within float ulps and the inputs
    carry ≤ 4 decimals, so the rounded values are deterministic.
    """
    from ..functions.rounding import round_half_away
    from ..stages.sort import sort_with_ordinal

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    sorted_ds = sort_with_ordinal(ds, ["event_type", "value"])
    cnt = (
        ds.groupby("event_type")
        .count()
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    counts = cnt["count()"].to_numpy().astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # boundary ranks per (group, quantile) — a handful of int64s
    pos = np.array(
        [off + q * (n - 1) for off, n in zip(offsets, counts) for q in qs]
    )
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, np.repeat(offsets + counts - 1, len(qs)))
    need = np.unique(np.concatenate([i0, i1]))

    def _pick(t: pa.Table) -> pa.Table:
        m = np.isin(t["ordinal"].to_numpy(), need)
        return t.filter(pa.array(m))

    picked = (
        sorted_ds.map_batches(_pick, batch_format="pyarrow")
        .to_pandas()
        .set_index("ordinal")["value"]
    )
    v0 = picked.loc[i0].to_numpy()
    v1 = picked.loc[i1].to_numpy()
    f = pos - np.floor(pos)
    return pa.table(
        {
            "event_type": pa.array(np.repeat(cnt["event_type"].to_numpy(), len(qs))),
            "quantile": np.tile(np.asarray(qs, dtype=np.float64), len(counts)),
            "n": np.repeat(counts, len(qs)),
            "value": round_half_away(v0 + (v1 - v0) * f, 6),
        }
    )


def events_asof_prior(
    sf_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
    num_buckets: int = 32,
):
    """Point-in-time (as-of) join: for every ``left_type`` event, the same
    user's latest STRICTLY-prior ``right_type`` event (ties on timestamp
    broken by max event_id). → (event_id, prior_event_id, prior_ts); lefts
    with no prior right are dropped (inner as-of). ``left_type`` and
    ``right_type`` must differ.

    Ray Data has no as-of join; this is the composition path (prompt-listed
    custom operator): hash-bucket users (the ONE shuffle — both join sides
    co-partition for free since they are rows of the same stream), then one
    vectorized kernel per bucket: lexsort by (user, ts, left-before-right,
    event_id) and a ``maximum.accumulate`` forward-fill of right-row indices.
    A fill that lands on a previous user's row cannot be a false match —
    the sort groups users contiguously, so it just means "no prior right for
    this user" and is masked by one user-equality check. O(n log n) per
    bucket, no per-user loop, works for any interleaving of the two sides.
    """
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _asof(g: pa.Table) -> pa.Table:
        typ = np.asarray(g["event_type"].to_pylist(), dtype=object)
        m = (typ == left_type) | (typ == right_type)
        u = g["user_id"].to_numpy()[m]
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)[m]
        eid = g["event_id"].to_numpy()[m]
        is_right = typ[m] == right_type
        # lefts sort BEFORE rights at equal (user, ts) → an equal-ts right is
        # never counted as "prior" (strictness); rights at the kept position
        # sort by event_id → the fill picks max event_id at the max ts.
        order = np.lexsort((eid, is_right, ts, u))
        u, ts, eid, is_right = u[order], ts[order], eid[order], is_right[order]
        ffill = np.maximum.accumulate(
            np.where(is_right, np.arange(len(u)), -1), dtype=np.int64
        )
        li = np.flatnonzero(~is_right & (ffill >= 0))
        li = li[u[ffill[li]] == u[li]]
        prior = ffill[li]
        return pa.table(
            {
                "event_id": eid[li],
                "prior_event_id": eid[prior],
                "prior_ts": pa.array(ts[prior]).cast(pa.timestamp("us")),
            }
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_asof, batch_format="pyarrow")
    )


def nation_trade_volume(sf_dir: str, num_buckets: int = 32):
    """TPC-H-Q7-shaped nation-pair trade flow: revenue shipped between
    DIFFERENT customer and supplier nations → (cust_nation, supp_nation,
    revenue), one row per ordered pair with any cross-nation trade.

    Scale shape — three bucketed repartition joins in sequence, re-keying
    the fact stream suppkey → orderkey → custkey (never ``Dataset.join``;
    same union+bucket-groupby machine as ``_revenue_cents_by_nation``).
    The fact side is pre-aggregated inside every batch and again inside
    every bucket to (next-key, supp-nation) partials, so each exchange
    carries partials, not lineitem rows; supplier and customer keys stream
    through the bucket exchange (only the 25-row nation table is
    driver-read, per the broadcast-small-side rule). Revenue accumulates
    as exact int64 cents·(100−disc) with ONE final division, bit-equal to
    the SQL oracle at any partition count.
    """
    from ray.data.aggregate import Sum

    B = np.int64(num_buckets)
    NPACK = np.int64(1000)  # nationkeys < 1000 by far

    def _agg_pairs(k, pay, rev):
        """Sum rev over unique (k, pay) pairs — lexsort + reduceat."""
        if len(k) == 0:
            return k, pay, rev
        order = np.lexsort((pay, k))
        k, pay, rev = k[order], pay[order], rev[order]
        start = np.ones(len(k), bool)
        start[1:] = (k[1:] != k[:-1]) | (pay[1:] != pay[:-1])
        idx = np.nonzero(start)[0]
        return k[start], pay[start], np.add.reduceat(rev, idx)

    def _li_fact(t: pa.Table) -> pa.Table:
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        k, pay, rev = _agg_pairs(
            t["l_suppkey"].to_numpy().astype(np.int64),
            t["l_orderkey"].to_numpy().astype(np.int64),
            cents * (100 - disc),
        )
        return pa.table(
            {"k": k, "rev": rev, "pay": pay,
             "aux": np.full(len(k), -1, np.int64),
             "b": (k % B).astype(np.int32)}
        )

    def _dim(kcol: str, auxcol: str):
        def _side(t: pa.Table) -> pa.Table:
            k = t[kcol].to_numpy().astype(np.int64)
            return pa.table(
                {"k": k, "rev": np.zeros(len(k), np.int64),
                 "pay": np.zeros(len(k), np.int64),
                 "aux": t[auxcol].to_numpy().astype(np.int64),
                 "b": (k % B).astype(np.int32)}
            )
        return _side

    def _mk_merge(mode: str):
        """Resolve one bucket: map fact keys through the dim side, then
        re-key — 'swap' (J1: payload becomes the key, dim value the
        payload), 'chain' (J2: dim value becomes the key), or 'final'
        (J3: pack (cust_nation, supp_nation) into one key)."""
        def _merge(g: pa.Table) -> pa.Table:
            aux = g["aux"].to_numpy()
            k = g["k"].to_numpy()
            dim = aux >= 0
            dk, da = k[dim], aux[dim]
            order = np.argsort(dk)
            dk, da = dk[order], da[order]
            fk = k[~dim]
            frev = g["rev"].to_numpy()[~dim]
            fpay = g["pay"].to_numpy()[~dim]
            pos = np.searchsorted(dk, fk)
            pos_c = np.minimum(pos, max(len(dk) - 1, 0))
            hit = dk[pos_c] == fk if len(dk) else np.zeros(len(fk), bool)
            mapped = da[pos_c[hit]]
            if mode == "swap":
                nk, npay = fpay[hit], mapped
            elif mode == "chain":
                nk, npay = mapped, fpay[hit]
            else:
                nk, npay = mapped * NPACK + fpay[hit], np.zeros(int(hit.sum()), np.int64)
            kk, pp, rr = _agg_pairs(nk, npay, frev[hit])
            return pa.table(
                {"k": kk, "rev": rr, "pay": pp,
                 "aux": np.full(len(kk), -1, np.int64),
                 "b": (kk % B).astype(np.int32)}
            )
        return _merge

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"],
    )
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    j1 = (
        li.map_batches(_li_fact, batch_format="pyarrow")
        .union(supp.map_batches(_dim("s_suppkey", "s_nationkey"), batch_format="pyarrow"))
        .groupby("b").map_groups(_mk_merge("swap"), batch_format="pyarrow")
    )  # → (orderkey, rev, supp_nation)
    j2 = (
        j1.union(orders.map_batches(_dim("o_orderkey", "o_custkey"), batch_format="pyarrow"))
        .groupby("b").map_groups(_mk_merge("chain"), batch_format="pyarrow")
    )  # → (custkey, rev, supp_nation)
    j3 = (
        j2.union(cust.map_batches(_dim("c_custkey", "c_nationkey"), batch_format="pyarrow"))
        .groupby("b").map_groups(_mk_merge("final"), batch_format="pyarrow")
    )  # → (cust_nation·1000 + supp_nation, rev)

    from ray.data.aggregate import Sum as _Sum  # noqa: F811

    pairs = j3.groupby("k").aggregate(_Sum("rev", alias_name="rev")).to_pandas()
    # ≤ n_nations² rows on the driver
    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas().set_index("n_nationkey")["n_name"]
    cn = (pairs["k"].to_numpy() // int(NPACK)).astype(np.int64)
    sn = (pairs["k"].to_numpy() % int(NPACK)).astype(np.int64)
    keep = cn != sn
    return pa.table(
        {
            "cust_nation": nation.loc[cn[keep]].to_numpy(),
            "supp_nation": nation.loc[sn[keep]].to_numpy(),
            "revenue": pairs["rev"].to_numpy()[keep].astype(np.float64) / 10000.0,
        }
    )


def returned_customer_topk(sf_dir: str, k: int = 20, num_buckets: int = 32):
    """TPC-H-Q10-shaped returned-item ranking: the ``k`` customers with the
    highest revenue from RETURNED ('R') lineitems → (c_custkey, c_name,
    n_name, revenue, rnk), ties broken by custkey asc.

    Scale shape: lineitem is return-flag-filtered at the batch boundary and
    pre-summed to (orderkey, rev cents) partials; ONE bucketed union join
    re-keys to custkey; the custkey bucket groupby then sums AND emits only
    its local top-k, so the driver folds ≤ k·num_buckets rows. Customer
    name / nation ride a PRUNED point read of the k winning keys (a 100 TB
    customer table never streams for a 20-row answer). Exact int64 cents
    make the ranking summation-order-independent; rank ties break on the
    key, so the top-k set is deterministic at any partition count."""
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    B = np.int64(num_buckets)

    def _li(t: pa.Table) -> pa.Table:
        m = t["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
        kk = t["l_orderkey"].to_numpy().astype(np.int64)[m]
        cents = np.round(t["l_extendedprice"].to_numpy()[m] * 100).astype(np.int64)
        disc = np.round(t["l_discount"].to_numpy()[m] * 100).astype(np.int64)
        rev = cents * (100 - disc)
        key, inv = np.unique(kk, return_inverse=True)
        s = np.bincount(inv, weights=rev.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "k": key,
                "rev": s,
                "aux": np.full(len(key), -1, np.int64),
                "b": (key % B).astype(np.int32),
            }
        )

    def _orders(t: pa.Table) -> pa.Table:
        kk = t["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "k": kk,
                "rev": np.zeros(len(kk), np.int64),
                "aux": t["o_custkey"].to_numpy().astype(np.int64),
                "b": (kk % B).astype(np.int32),
            }
        )

    def _rekey(g: pa.Table) -> pa.Table:
        aux = g["aux"].to_numpy()
        kk = g["k"].to_numpy()
        dim = aux >= 0
        dk, da = kk[dim], aux[dim]
        order = np.argsort(dk)
        dk, da = dk[order], da[order]
        fk, frev = kk[~dim], g["rev"].to_numpy()[~dim]
        pos = np.searchsorted(dk, fk)
        pos_c = np.minimum(pos, max(len(dk) - 1, 0))
        hit = dk[pos_c] == fk if len(dk) else np.zeros(len(fk), bool)
        ck, inv = np.unique(da[pos_c[hit]], return_inverse=True)
        s = np.zeros(len(ck), np.int64)
        np.add.at(s, inv, frev[hit])
        return pa.table({"c": ck, "rev": s, "b": (ck % B).astype(np.int32)})

    def _local_topk(g: pa.Table) -> pa.Table:
        ck = g["c"].to_numpy()
        key, inv = np.unique(ck, return_inverse=True)
        s = np.zeros(len(key), np.int64)
        np.add.at(s, inv, g["rev"].to_numpy())
        order = np.lexsort((key, -s))[:k]
        return pa.table({"c": key[order], "rev": s[order]})

    top = (
        li.map_batches(_li, batch_format="pyarrow")
        .union(orders.map_batches(_orders, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_rekey, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    order = np.lexsort((top["c"].to_numpy(), -top["rev"].to_numpy()))[:k]
    ck = top["c"].to_numpy()[order]
    rev = top["rev"].to_numpy()[order]

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    cust = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
        columns=["c_custkey", "c_name", "c_nationkey"],
        filter=pads.field("c_custkey").isin([int(x) for x in ck]),
    ).to_pandas().set_index("c_custkey")
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas().set_index("n_nationkey")["n_name"]
    return pa.table(
        {
            "c_custkey": ck,
            "c_name": cust["c_name"].loc[ck].to_numpy(),
            "n_name": nation.loc[cust["c_nationkey"].loc[ck].to_numpy()].to_numpy(),
            "revenue": rev.astype(np.float64) / 10000.0,
            "rnk": np.arange(1, len(ck) + 1, dtype=np.int64),
        }
    )


def disjunctive_revenue(sf_dir: str, num_buckets: int = 32):
    """TPC-H-Q19-shaped disjunctive-predicate revenue: Σ revenue over three
    OR'd (brand, size-range, quantity-range) branches → one row
    (revenue). Branches (adapted to this schema's 25 brands, no
    containers): Brand#12/size 1-5/qty 1-11, Brand#23/size 1-10/qty
    10-20, Brand#15/size 1-15/qty 20-30.

    Scale shape: lineitem pre-filters to the union of the quantity ranges
    AT THE BATCH BOUNDARY (the read-side prune a disjunction still
    allows), then pre-aggregates revenue by (partkey, quantity) — quantity
    is integral 1-50 so partials collapse hard; ONE bucketed union join
    against (partkey, brand, size) resolves the full disjunction
    vectorized inside each bucket and emits a single partial per bucket.
    Exact int64 cents, one final division."""
    from ray.data.aggregate import Sum

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    B = np.int64(num_buckets)
    BRANCHES = ((12, 1, 5, 1, 11), (23, 1, 10, 10, 20), (15, 1, 15, 20, 30))
    QLO = min(b[3] for b in BRANCHES)
    QHI = max(b[4] for b in BRANCHES)

    def _li(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy().astype(np.int64)
        m = (q >= QLO) & (q <= QHI)
        pk = t["l_partkey"].to_numpy().astype(np.int64)[m]
        q = q[m]
        cents = np.round(t["l_extendedprice"].to_numpy()[m] * 100).astype(np.int64)
        disc = np.round(t["l_discount"].to_numpy()[m] * 100).astype(np.int64)
        rev = cents * (100 - disc)
        key = pk * np.int64(64) + q  # qty < 64
        kk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(kk), np.int64)
        np.add.at(s, inv, rev)
        pk_u = kk // 64
        return pa.table(
            {
                "pk": pk_u,
                "q": (kk % 64).astype(np.int64),
                "rev": s,
                "brand": np.full(len(kk), -1, np.int64),
                "size": np.zeros(len(kk), np.int64),
                "b": (pk_u % B).astype(np.int32),
            }
        )

    def _part(t: pa.Table) -> pa.Table:
        pk = t["p_partkey"].to_numpy().astype(np.int64)
        brand_s = t["p_brand"].to_numpy(zero_copy_only=False)
        brand = np.array([int(s.split("#", 1)[1]) for s in brand_s], np.int64)
        return pa.table(
            {
                "pk": pk,
                "q": np.zeros(len(pk), np.int64),
                "rev": np.zeros(len(pk), np.int64),
                "brand": brand,
                "size": t["p_size"].to_numpy().astype(np.int64),
                "b": (pk % B).astype(np.int32),
            }
        )

    def _eval(g: pa.Table) -> pa.Table:
        brand = g["brand"].to_numpy()
        pk = g["pk"].to_numpy()
        dim = brand >= 0
        dk = pk[dim]
        order = np.argsort(dk)
        dk = dk[order]
        dbrand = brand[dim][order]
        dsize = g["size"].to_numpy()[dim][order]
        fk = pk[~dim]
        fq = g["q"].to_numpy()[~dim]
        frev = g["rev"].to_numpy()[~dim]
        pos = np.searchsorted(dk, fk)
        pos_c = np.minimum(pos, max(len(dk) - 1, 0))
        hit = dk[pos_c] == fk if len(dk) else np.zeros(len(fk), bool)
        br, sz = dbrand[pos_c[hit]], dsize[pos_c[hit]]
        q, rev = fq[hit], frev[hit]
        keep = np.zeros(len(q), bool)
        for b_, slo, shi, qlo, qhi in BRANCHES:
            keep |= (br == b_) & (sz >= slo) & (sz <= shi) & (q >= qlo) & (q <= qhi)
        return pa.table({"rev": np.array([rev[keep].sum()], np.int64)})

    total = (
        li.map_batches(_li, batch_format="pyarrow")
        .union(part.map_batches(_part, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_eval, batch_format="pyarrow")
        .aggregate(Sum("rev", alias_name="rev"))
    )
    return pa.table({"revenue": np.array([total["rev"] / 10000.0], np.float64)})


def product_type_profit(sf_dir: str, name_like: str = "red", num_buckets: int = 32):
    """TPC-H-Q9-shaped profit rollup: revenue from lineitems whose part
    name contains ``name_like``, grouped by supplier nation and order year
    → (n_name, o_year, sum_profit). (No partsupp table in this schema, so
    profit = revenue — the join/grouping shape is what Q9 exercises.)

    Scale shape: three bucketed re-keying joins (partkey → suppkey →
    orderkey); the part side is substring-filtered AT THE BATCH BOUNDARY
    (a semi-join — only matching partkeys enter the exchange) and the fact
    stream pre-aggregates to pair partials before every shuffle. Two
    payload columns ride the fact rows (orderkey + suppkey) until each is
    consumed by its join. Exact int64 cents, one final division."""
    from ray.data.aggregate import Sum

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_suppkey", "l_orderkey",
                 "l_extendedprice", "l_discount"],
    )
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    B = np.int64(num_buckets)
    PACK = np.int64(10000)  # years < 10000

    def _agg2(k, p1, rev):
        if len(k) == 0:
            return k, p1, rev
        order = np.lexsort((p1, k))
        k, p1, rev = k[order], p1[order], rev[order]
        start = np.ones(len(k), bool)
        start[1:] = (k[1:] != k[:-1]) | (p1[1:] != p1[:-1])
        idx = np.nonzero(start)[0]
        return k[start], p1[start], np.add.reduceat(rev, idx)

    def _li(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "k": pk,
                "rev": cents * (100 - disc),
                "p1": t["l_orderkey"].to_numpy().astype(np.int64),
                "p2": t["l_suppkey"].to_numpy().astype(np.int64),
                "aux": np.full(len(pk), -1, np.int64),
                "b": (pk % B).astype(np.int32),
            }
        )

    def _part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.match_substring(t["p_name"], name_like).to_numpy(zero_copy_only=False)
        pk = t["p_partkey"].to_numpy().astype(np.int64)[m]
        z = np.zeros(len(pk), np.int64)
        return pa.table(
            {"k": pk, "rev": z, "p1": z, "p2": z, "aux": z,
             "b": (pk % B).astype(np.int32)}
        )

    def _orders_dim(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy().astype(np.int64)
        yr = t["o_orderdate"].to_numpy().astype("datetime64[Y]").astype(np.int64) + 1970
        z = np.zeros(len(ok), np.int64)
        return pa.table(
            {"k": ok, "rev": z, "p1": z, "p2": z, "aux": yr,
             "b": (ok % B).astype(np.int32)}
        )

    def _supp_dim(t: pa.Table) -> pa.Table:
        sk = t["s_suppkey"].to_numpy().astype(np.int64)
        z = np.zeros(len(sk), np.int64)
        return pa.table(
            {"k": sk, "rev": z, "p1": z, "p2": z,
             "aux": t["s_nationkey"].to_numpy().astype(np.int64),
             "b": (sk % B).astype(np.int32)}
        )

    def _dim_sorted(g: pa.Table, dim_mask):
        k = g["k"].to_numpy()
        dk = k[dim_mask]
        order = np.argsort(dk)
        return k, dk[order], order

    def _semi(g: pa.Table) -> pa.Table:
        # parts have aux == 0 AND rev == 0 AND p1 == 0: mark dim by rev<0?
        # dim rows are the ones with aux >= 0 here — but fact aux == -1
        aux = g["aux"].to_numpy()
        dim = aux >= 0
        k, dk, order = _dim_sorted(g, dim)
        fk = k[~dim]
        pos = np.searchsorted(dk, fk)
        pos_c = np.minimum(pos, max(len(dk) - 1, 0))
        hit = dk[pos_c] == fk if len(dk) else np.zeros(len(fk), bool)
        frev = g["rev"].to_numpy()[~dim][hit]
        p1 = g["p1"].to_numpy()[~dim][hit]   # orderkey
        p2 = g["p2"].to_numpy()[~dim][hit]   # suppkey → next key
        kk, pp, rr = _agg2(p2, p1, frev)
        return pa.table(
            {"k": kk, "rev": rr, "p1": pp, "p2": np.zeros(len(kk), np.int64),
             "aux": np.full(len(kk), -1, np.int64),
             "b": (kk % B).astype(np.int32)}
        )

    def _join_supp(g: pa.Table) -> pa.Table:
        aux = g["aux"].to_numpy()
        dim = aux >= 0
        k, dk, order = _dim_sorted(g, dim)
        da = aux[dim][order]
        fk = k[~dim]
        pos = np.searchsorted(dk, fk)
        pos_c = np.minimum(pos, max(len(dk) - 1, 0))
        hit = dk[pos_c] == fk if len(dk) else np.zeros(len(fk), bool)
        nat = da[pos_c[hit]]
        okey = g["p1"].to_numpy()[~dim][hit]
        frev = g["rev"].to_numpy()[~dim][hit]
        kk, pp, rr = _agg2(okey, nat, frev)
        return pa.table(
            {"k": kk, "rev": rr, "p1": pp, "p2": np.zeros(len(kk), np.int64),
             "aux": np.full(len(kk), -1, np.int64),
             "b": (kk % B).astype(np.int32)}
        )

    def _join_orders(g: pa.Table) -> pa.Table:
        aux = g["aux"].to_numpy()
        dim = aux >= 0
        k, dk, order = _dim_sorted(g, dim)
        da = aux[dim][order]
        fk = k[~dim]
        pos = np.searchsorted(dk, fk)
        pos_c = np.minimum(pos, max(len(dk) - 1, 0))
        hit = dk[pos_c] == fk if len(dk) else np.zeros(len(fk), bool)
        yr = da[pos_c[hit]]
        nat = g["p1"].to_numpy()[~dim][hit]
        frev = g["rev"].to_numpy()[~dim][hit]
        key = nat * PACK + yr
        kk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(kk), np.int64)
        np.add.at(s, inv, frev)
        return pa.table({"k": kk, "rev": s})

    j1 = (
        li.map_batches(_li, batch_format="pyarrow")
        .union(part.map_batches(_part, batch_format="pyarrow"))
        .groupby("b").map_groups(_semi, batch_format="pyarrow")
    )  # → (suppkey, orderkey, rev)
    j2 = (
        j1.union(supp.map_batches(_supp_dim, batch_format="pyarrow"))
        .groupby("b").map_groups(_join_supp, batch_format="pyarrow")
    )  # → (orderkey, nation, rev)
    j3 = (
        j2.union(orders.map_batches(_orders_dim, batch_format="pyarrow"))
        .groupby("b").map_groups(_join_orders, batch_format="pyarrow")
    )  # → (nation·PACK + year, rev)

    out = j3.groupby("k").aggregate(Sum("rev", alias_name="rev")).to_pandas()
    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas().set_index("n_nationkey")["n_name"]
    nat = (out["k"].to_numpy() // int(PACK)).astype(np.int64)
    yr = (out["k"].to_numpy() % int(PACK)).astype(np.int64)
    return pa.table(
        {
            "n_name": nation.loc[nat].to_numpy(),
            "o_year": yr,
            "sum_profit": out["rev"].to_numpy().astype(np.float64) / 10000.0,
        }
    )


def late_shipment_rate(sf_dir: str, late_days: int = 60, num_buckets: int = 32):
    """TPC-H-Q12-shaped conditional aggregate: per order priority, how many
    lineitems shipped more than ``late_days`` days after the order date →
    (o_orderpriority, n_late, n_lines, late_rate).  (This schema has no
    l_returnflag, so priority plays Q12's shipmode role; the join + CASE-sum
    shape is what Q12 exercises — ``pregel_app_subgraph.h`` has no
    relational layer, this extends SURVEY §2.8's "ours adds" surface.)

    Scale shape: ONE bucketed union-groupby join on orderkey (the
    distinct-key machine of :func:`order_priority_semi`); the fact side
    ships (orderkey, ship_day:int64) only, the dim side (orderkey,
    priority, order_day:int64); each bucket emits per-priority partial
    (late, total) int64 counts, a tiny final groupby sums, and the rate is
    ONE double division after the fold (bit-exact vs SQL)."""
    from ray.data.aggregate import Sum

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority", "o_orderdate"])
    B = np.int64(num_buckets)

    def _fact(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        day = t["l_shipdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pa.table(
            {
                "k": k,
                "day": day,
                "pri": pa.array([""] * len(k), pa.string()),
                "dim": np.zeros(len(k), bool),
                "b": (k % B).astype(np.int32),
            }
        )

    def _dim(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        day = t["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pa.table(
            {
                "k": k,
                "day": day,
                "pri": t["o_orderpriority"],
                "dim": np.ones(len(k), bool),
                "b": (k % B).astype(np.int32),
            }
        )

    def _join(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy()
        day = g["day"].to_numpy()
        dim = g["dim"].to_numpy(zero_copy_only=False)
        pri = g["pri"].to_numpy(zero_copy_only=False)
        dk = k[dim]
        order = np.argsort(dk)
        dk = dk[order]
        dday = day[dim][order]
        dpri = pri[dim][order]
        fk = k[~dim]
        pos = np.searchsorted(dk, fk)
        pos_c = np.minimum(pos, max(len(dk) - 1, 0))
        hit = dk[pos_c] == fk if len(dk) else np.zeros(len(fk), bool)
        late = (day[~dim][hit] - dday[pos_c[hit]]) > late_days
        p = dpri[pos_c[hit]]
        keys, inv = np.unique(p, return_inverse=True)
        n_late = np.zeros(len(keys), np.int64)
        np.add.at(n_late, inv, late.astype(np.int64))
        n_tot = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        return pa.table(
            {
                "o_orderpriority": pa.array(list(keys), pa.string()),
                "late": n_late,
                "tot": n_tot,
            }
        )

    out = (
        li.map_batches(_fact, batch_format="pyarrow")
        .union(orders.map_batches(_dim, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_join, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("late", alias_name="n_late"), Sum("tot", alias_name="n_lines"))
        .to_pandas()
    )
    late = out["n_late"].to_numpy().astype(np.int64)
    tot = out["n_lines"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "o_orderpriority": out["o_orderpriority"].to_numpy(),
            "n_late": late,
            "n_lines": tot,
            "late_rate": late.astype(np.float64) / tot.astype(np.float64),
        }
    )


def nation_market_share(
    sf_dir: str,
    region: str = "ASIA",
    nation: str = "NATION_2",
    num_buckets: int = 32,
):
    """TPC-H-Q8-shaped market share: among orders placed by customers in
    ``region``, the share of lineitem revenue supplied by ``nation``, per
    order year → (o_year, target_units, total_units, mkt_share).

    Scale shape: supplier→nation and nation→region are DIM BROADCASTS
    resolved at the batch boundary (supplier is a true dimension even at
    100 TB — SURVEY J5); the fact stream carries two int64 revenue
    accumulators (target / total) through TWO bucketed re-keying joins
    (orderkey → custkey for the region semi-filter), pre-aggregated by key
    before every shuffle. Share is ONE double division after the final
    fold (bit-exact vs SQL). Units are cents·(100−disc), exact int64."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = {r["r_name"]: r["r_regionkey"] for r in reg.to_pylist()}[region]
    region_nations = np.sort(
        nat.to_pandas().query("n_regionkey == @rkey")["n_nationkey"]
        .to_numpy().astype(np.int64)
    )
    target_nkey = {r["n_name"]: r["n_nationkey"] for r in nat.to_pylist()}[nation]
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    target_supp = np.sort(
        supp.query("s_nationkey == @target_nkey")["s_suppkey"]
        .to_numpy().astype(np.int64)
    )

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    B = np.int64(num_buckets)
    PACK = np.int64(10000)  # years < 10000

    def _agg2v(k, rt, ra):
        """Pre-aggregate two int64 value columns by key."""
        if len(k) == 0:
            return k, rt, ra
        order = np.argsort(k, kind="stable")
        k, rt, ra = k[order], rt[order], ra[order]
        start = np.ones(len(k), bool)
        start[1:] = k[1:] != k[:-1]
        idx = np.nonzero(start)[0]
        return k[start], np.add.reduceat(rt, idx), np.add.reduceat(ra, idx)

    def _li(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        rev = cents * (100 - disc)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(target_supp, sk)
        pos_c = np.minimum(pos, max(len(target_supp) - 1, 0))
        tgt = (target_supp[pos_c] == sk) if len(target_supp) else np.zeros(len(sk), bool)
        kk, rt, ra = _agg2v(k, np.where(tgt, rev, 0), rev)
        return pa.table(
            {"k": kk, "rt": rt, "ra": ra,
             "aux": np.full(len(kk), -1, np.int64),
             "b": (kk % B).astype(np.int32)}
        )

    def _orders_dim(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        yr = t["o_orderdate"].to_numpy().astype("datetime64[Y]").astype(np.int64) + 1970
        ck = t["o_custkey"].to_numpy().astype(np.int64)
        z = np.zeros(len(k), np.int64)
        return pa.table(
            {"k": k, "rt": z, "ra": z, "aux": ck * PACK + yr,
             "b": (k % B).astype(np.int32)}
        )

    def _cust_dim(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].to_numpy().astype(np.int64)
        nk = t["c_nationkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(region_nations, nk)
        pos_c = np.minimum(pos, max(len(region_nations) - 1, 0))
        in_reg = region_nations[pos_c] == nk
        ck = ck[in_reg]  # region semi-filter at the batch boundary
        z = np.zeros(len(ck), np.int64)
        return pa.table(
            {"k": ck, "rt": z, "ra": z, "aux": z,
             "b": (ck % B).astype(np.int32)}
        )

    def _join_orders(g: pa.Table) -> pa.Table:
        aux = g["aux"].to_numpy()
        dim = aux >= 0
        k = g["k"].to_numpy()
        dk = k[dim]
        order = np.argsort(dk)
        dk, da = dk[order], aux[dim][order]
        fk = k[~dim]
        pos = np.searchsorted(dk, fk)
        pos_c = np.minimum(pos, max(len(dk) - 1, 0))
        hit = dk[pos_c] == fk if len(dk) else np.zeros(len(fk), bool)
        packed = da[pos_c[hit]]  # custkey*PACK + year
        rt = g["rt"].to_numpy()[~dim][hit]
        ra = g["ra"].to_numpy()[~dim][hit]
        kk, rtt, raa = _agg2v(packed, rt, ra)
        ck = kk // PACK
        return pa.table(
            {"k": ck, "rt": rtt, "ra": raa,
             "aux": np.full(len(kk), -(kk % PACK) - 2, np.int64),  # -year-2 < -1
             "b": (ck % B).astype(np.int32)}
        )

    def _join_cust(g: pa.Table) -> pa.Table:
        aux = g["aux"].to_numpy()
        dim = aux == 0  # customer dim rows (facts carry -year-2)
        k = g["k"].to_numpy()
        dk = np.sort(k[dim])
        fk = k[~dim]
        pos = np.searchsorted(dk, fk)
        pos_c = np.minimum(pos, max(len(dk) - 1, 0))
        hit = dk[pos_c] == fk if len(dk) else np.zeros(len(fk), bool)
        yr = (-aux[~dim][hit]) - 2
        rt = g["rt"].to_numpy()[~dim][hit]
        ra = g["ra"].to_numpy()[~dim][hit]
        kk, rtt, raa = _agg2v(yr, rt, ra)
        return pa.table({"o_year": kk, "rt": rtt, "ra": raa})

    out = (
        li.map_batches(_li, batch_format="pyarrow")
        .union(orders.map_batches(_orders_dim, batch_format="pyarrow"))
        .groupby("b").map_groups(_join_orders, batch_format="pyarrow")
        .union(cust.map_batches(_cust_dim, batch_format="pyarrow"))
        .groupby("b").map_groups(_join_cust, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("rt", alias_name="target_units"),
                   Sum("ra", alias_name="total_units"))
        .to_pandas()
    )
    t = out["target_units"].to_numpy().astype(np.int64)
    a = out["total_units"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "o_year": out["o_year"].to_numpy().astype(np.int64),
            "target_units": t,
            "total_units": a,
            "mkt_share": t.astype(np.float64) / a.astype(np.float64),
        }
    )


def top_supplier_revenue(
    sf_dir: str,
    ship_from: str = "1995-01-01",
    ship_to: str = "1995-04-01",
):
    """TPC-H-Q15-shaped scalar-subquery max: revenue per supplier over a
    3-month shipdate window; return the supplier(s) achieving the maximum
    (ties kept, as in Q15) → (s_suppkey, s_name, total_revenue).

    Scale shape: the shipdate window prunes at the batch boundary; facts
    pre-aggregate (suppkey, units) per batch before ONE small groupby —
    supplier is a dimension, so the reduced table is dim-sized and the
    max+tie filter runs on the driver over dim-sized data (documented
    small-side materialization, SURVEY J5); names join via broadcast dim
    lookup. Exact int64 units; revenue = units/10000.0 mirrored by SQL."""
    from ray.data.aggregate import Sum

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    lo = np.datetime64(ship_from, "us")
    hi = np.datetime64(ship_to, "us")

    def _fact(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy()
        m = (sd >= lo) & (sd < hi)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)[m]
        cents = np.round(t["l_extendedprice"].to_numpy()[m] * 100).astype(np.int64)
        disc = np.round(t["l_discount"].to_numpy()[m] * 100).astype(np.int64)
        units = cents * (100 - disc)
        if len(sk):
            order = np.argsort(sk, kind="stable")
            sk, units = sk[order], units[order]
            start = np.ones(len(sk), bool)
            start[1:] = sk[1:] != sk[:-1]
            idx = np.nonzero(start)[0]
            sk, units = sk[start], np.add.reduceat(units, idx)
        return pa.table({"s_suppkey": sk, "units": units})

    rev = (
        li.map_batches(_fact, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("units", alias_name="units"))
        .to_pandas()
    )
    units = rev["units"].to_numpy().astype(np.int64)
    best = units == units.max()
    sk = rev["s_suppkey"].to_numpy().astype(np.int64)[best]
    u = units[best]
    import pyarrow.parquet as pq

    name = (
        pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
        .to_pandas().set_index("s_suppkey")["s_name"]
    )
    order = np.argsort(sk)
    sk, u = sk[order], u[order]
    return pa.table(
        {
            "s_suppkey": sk,
            "s_name": name.loc[sk].to_numpy(),
            "total_revenue": u.astype(np.float64) / 10000.0,
        }
    )


def supplier_variety(sf_dir: str, num_buckets: int = 32):
    """TPC-H-Q16-shaped distinct-count with a NOT-IN anti-join: per
    (p_brand, p_size), how many DISTINCT suppliers ship that part group,
    excluding "complaint" suppliers (s_acctbal < 0 plays Q16's comment
    filter — this schema has no s_comment) → (p_brand, p_size,
    supplier_cnt).

    Scale shape: the excluded-supplier set is a DIM BROADCAST applied at
    the batch boundary (anti-join before any shuffle); facts dedupe
    (partkey, suppkey) pairs per batch, ONE bucketed join maps partkey →
    (brand, size), then a SECOND suppkey-keyed bucket dedupes
    (brand, size, suppkey) triples globally and emits per-group partial
    counts; a tiny final groupby sums. Only int keys + the small brand
    string ride the shuffles."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    bad = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    ).to_pandas()
    bad_supp = np.sort(
        bad.query("s_acctbal < 0")["s_suppkey"].to_numpy().astype(np.int64)
    )

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    B = np.int64(num_buckets)

    def _fact(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        if len(bad_supp):
            pos = np.searchsorted(bad_supp, sk)
            pos_c = np.minimum(pos, len(bad_supp) - 1)
            keep = bad_supp[pos_c] != sk
            pk, sk = pk[keep], sk[keep]
        if len(sk) and sk.max() < (1 << 20):  # pack guard (suppkey width)
            pair = np.unique(pk << np.int64(20) | sk)
            pk, sk = pair >> np.int64(20), pair & np.int64((1 << 20) - 1)
        else:
            order = np.lexsort((sk, pk))
            pk, sk = pk[order], sk[order]
            keep = np.ones(len(pk), bool)
            keep[1:] = (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])
            pk, sk = pk[keep], sk[keep]
        return pa.table(
            {"k": pk, "sk": sk, "size": np.full(len(pk), -1, np.int64),
             "brand": pa.array([""] * len(pk), pa.string()),
             "b": (pk % B).astype(np.int32)}
        )

    def _dim(t: pa.Table) -> pa.Table:
        pk = t["p_partkey"].to_numpy().astype(np.int64)
        return pa.table(
            {"k": pk, "sk": np.zeros(len(pk), np.int64),
             "size": t["p_size"].to_numpy().astype(np.int64),
             "brand": t["p_brand"],
             "b": (pk % B).astype(np.int32)}
        )

    def _join(g: pa.Table) -> pa.Table:
        size = g["size"].to_numpy()
        dim = size >= 0
        k = g["k"].to_numpy()
        dk = k[dim]
        order = np.argsort(dk)
        dk = dk[order]
        dsize = size[dim][order]
        dbrand = g["brand"].to_numpy(zero_copy_only=False)[dim][order]
        fk = k[~dim]
        pos = np.searchsorted(dk, fk)
        pos_c = np.minimum(pos, max(len(dk) - 1, 0))
        hit = dk[pos_c] == fk if len(dk) else np.zeros(len(fk), bool)
        sk = g["sk"].to_numpy()[~dim][hit]
        return pa.table(
            {"brand": pa.array(list(dbrand[pos_c[hit]]), pa.string()),
             "size": dsize[pos_c[hit]], "sk": sk,
             "b2": (sk % B).astype(np.int32)}
        )

    def _dedupe_count(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates(["brand", "size", "sk"])
        cnt = df.groupby(["brand", "size"], sort=True).size().reset_index()
        return pa.table(
            {"p_brand": pa.array(cnt["brand"].to_numpy(), pa.string()),
             "p_size": cnt["size"].to_numpy().astype(np.int64),
             "n": cnt[0].to_numpy().astype(np.int64)}
        )

    # final (brand,size) fold on the driver — ≤ B partials per group over
    # a dim-sized key space (988 groups at sf0.01), documented small side
    res = (
        li.map_batches(_fact, batch_format="pyarrow")
        .union(part.map_batches(_dim, batch_format="pyarrow"))
        .groupby("b").map_groups(_join, batch_format="pyarrow")
        .groupby("b2").map_groups(_dedupe_count, batch_format="pyarrow")
        .to_pandas()
        .groupby(["p_brand", "p_size"], sort=True)["n"].sum().reset_index()
    )
    return pa.table(
        {"p_brand": pa.array(res["p_brand"].to_numpy(), pa.string()),
         "p_size": res["p_size"].to_numpy().astype(np.int64),
         "supplier_cnt": res["n"].to_numpy().astype(np.int64)}
    )


def min_cost_supplier(sf_dir: str, num_buckets: int = 32):
    """TPC-H-Q2-shaped correlated min: for every part, the supplier
    offering the lowest unit price (l_extendedprice / l_quantity over the
    lineitem bridge — this schema has no partsupp), smallest suppkey on
    ties → (p_partkey, s_suppkey, s_name, n_name, unit_price).

    Scale shape: per-batch partial argmin (one lexsort, first-row-per-key
    mask) cuts each batch to ≤ one row per partkey before the ONE bucketed
    shuffle; the same reduction runs per bucket; supplier→(name, nation)
    resolves via broadcast dim lookup after the fold. The double division
    is elementwise on the raw column values, so DuckDB's `/` reproduces it
    bit-exactly; ranking compares those identical doubles (round-then-rank
    determinism is not needed — both sides rank the same bit patterns)."""
    import pyarrow.parquet as pq

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )
    B = np.int64(num_buckets)

    def _first_per_part(pk, sk, unit):
        order = np.lexsort((sk, unit, pk))
        pk, sk, unit = pk[order], sk[order], unit[order]
        first = np.ones(len(pk), bool)
        first[1:] = pk[1:] != pk[:-1]
        return pk[first], sk[first], unit[first]

    def _fact(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        unit = t["l_extendedprice"].to_numpy() / t["l_quantity"].to_numpy()
        pk, sk, unit = _first_per_part(pk, sk, unit)
        return pa.table(
            {"k": pk, "sk": sk, "unit": unit, "b": (pk % B).astype(np.int32)}
        )

    def _reduce(g: pa.Table) -> pa.Table:
        pk, sk, unit = _first_per_part(
            g["k"].to_numpy(), g["sk"].to_numpy(), g["unit"].to_numpy()
        )
        return pa.table({"p_partkey": pk, "s_suppkey": sk, "unit_price": unit})

    out = (
        li.map_batches(_fact, batch_format="pyarrow")
        .groupby("b").map_groups(_reduce, batch_format="pyarrow")
        .to_pandas()
    )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    ).to_pandas().set_index("s_suppkey")
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas().set_index("n_nationkey")["n_name"]
    out = out.sort_values("p_partkey").reset_index(drop=True)
    sk = out["s_suppkey"].to_numpy()
    return pa.table(
        {
            "p_partkey": out["p_partkey"].to_numpy().astype(np.int64),
            "s_suppkey": sk.astype(np.int64),
            "s_name": supp.loc[sk, "s_name"].to_numpy(),
            "n_name": nat.loc[supp.loc[sk, "s_nationkey"].to_numpy()].to_numpy(),
            "unit_price": out["unit_price"].to_numpy(),
        }
    )


def events_cusum(
    sf_dir: str, k_ref: float = 60.0, h: float = 200.0,
    num_buckets: int | None = None,
):
    """Per-user one-sided upper CUSUM (Page 1954) change detection over
    ``value`` → (event_id, cusum, alarm): s₀ = max(0, x₀ − k),
    sᵢ = max(0, sᵢ₋₁ + (xᵢ − k)) over the user's (ts, event_id) order;
    alarm = s > h — the classic drift detector for metric streams
    (complements :func:`events_zscore`'s point anomalies).

    Bit-exactness by the RECURRENCE-ORDER PARITY trick of
    :func:`events_ema`: the bucket kernel advances every user one
    within-user POSITION per vectorized step, evaluating literally
    ``max(0, s_prev + (x − k))`` — same subtraction, same add, same max,
    same order as the oracle's recursive CTE ``greatest(0, r.s +
    (b.value − k))``. Scale shape: the shared ONE-shuffle user-hash
    bucket machine."""
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    num_buckets = _auto_buckets(ds, num_buckets)
    kr = float(k_ref)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _cusum(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        x = g["value"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, eid, x = u[order], eid[order], x[order]
        n = len(u)
        new_seg = np.concatenate([[True], u[1:] != u[:-1]])
        seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))
        pos = np.arange(n) - seg_start
        s = np.maximum(0.0, x - kr)  # position 0
        max_pos = int(pos.max()) if n else 0
        for p in range(1, max_pos + 1):
            m = pos == p
            s[m] = np.maximum(0.0, s[np.nonzero(m)[0] - 1] + (x[m] - kr))
        return pa.table(
            {"event_id": eid, "cusum": round_half_away(s, 6),
             "alarm": s > h}
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_cusum, batch_format="pyarrow")
    )


def events_holt(
    sf_dir: str, alpha: float = 0.25, beta: float = 0.125,
    num_buckets: int | None = None,
):
    """Per-user Holt double-exponential smoothing (level + trend) over
    ``value`` → (event_id, level, trend): l₀ = x₀, b₀ = 0;
    lᵢ = α·xᵢ + (1−α)·(lᵢ₋₁ + bᵢ₋₁); bᵢ = β·(lᵢ − lᵢ₋₁) + (1−β)·bᵢ₋₁ —
    the trend-aware smoother behind short-horizon metric forecasts
    (:func:`forecast_revenue`'s streaming cousin, with per-user state).

    Bit-exactness by the RECURRENCE-ORDER PARITY trick of
    :func:`events_ema`: the bucket kernel advances every user one
    within-user position per vectorized step, evaluating the two Holt
    equations with literally the same products/adds/parentheses as the
    oracle's recursive CTE (which carries BOTH l and b columns through
    the recursion). Defaults are DYADIC (α=0.25, β=0.125) so 1−α and 1−β
    are exact doubles and the SQL literals 0.75/0.875 reproduce them —
    the same convention as events_ema's α=0.25. Scale shape: the shared
    ONE-shuffle user-hash bucket machine."""
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    num_buckets = _auto_buckets(ds, num_buckets)
    a, bt = float(alpha), float(beta)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _holt(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        x = g["value"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, eid, x = u[order], eid[order], x[order]
        n = len(u)
        new_seg = np.concatenate([[True], u[1:] != u[:-1]])
        seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))
        pos = np.arange(n) - seg_start
        lv = x.copy()               # position 0: l = x
        tr = np.zeros(n)            # position 0: b = 0
        max_pos = int(pos.max()) if n else 0
        for p in range(1, max_pos + 1):
            m = pos == p
            prev = np.nonzero(m)[0] - 1
            l_new = a * x[m] + (1 - a) * (lv[prev] + tr[prev])
            tr[m] = bt * (l_new - lv[prev]) + (1 - bt) * tr[prev]
            lv[m] = l_new
        return pa.table(
            {"event_id": eid, "level": round_half_away(lv, 6),
             "trend": round_half_away(tr, 6)}
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_holt, batch_format="pyarrow")
    )


def important_parts_value(sf_dir: str, mult: float = 1.5, num_buckets: int = 32):
    """TPC-H-Q11-shaped scalar-subquery HAVING: per-part total lineitem
    value (exact int64 cents), keeping parts whose value exceeds ``mult`` ×
    the corpus-average part value → (p_partkey, value). Q11's fixed
    fraction of total is scale-dependent; the average-multiple form keeps
    the selectivity stable across sf (same shape: one global scalar
    gates a per-group aggregate).

    Scale shape: per-batch pre-aggregation by partkey, ONE groupby; the
    global total/count fold and the threshold comparison run over the
    dim-sized per-part table. Threshold = mult · (double(total)/double(n))
    with dyadic ``mult`` — mirrored literally by the SQL."""
    from ray.data.aggregate import Sum

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])

    def _fact(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        order = np.argsort(pk, kind="stable")
        pk, cents = pk[order], cents[order]
        start = np.ones(len(pk), bool)
        start[1:] = pk[1:] != pk[:-1]
        idx = np.nonzero(start)[0]
        return pa.table(
            {"p_partkey": pk[start], "c": np.add.reduceat(cents, idx)}
        )

    v = (
        li.map_batches(_fact, batch_format="pyarrow")
        .groupby("p_partkey")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    c = v["c"].to_numpy().astype(np.int64)
    thr = float(mult) * (np.float64(int(c.sum())) / np.float64(len(c)))
    keep = c.astype(np.float64) > thr
    pk = v["p_partkey"].to_numpy().astype(np.int64)[keep]
    order = np.argsort(pk)
    return pa.table(
        {
            "p_partkey": pk[order],
            "value": c[keep][order].astype(np.float64) / 100.0,
        }
    )


def bulk_suppliers(
    sf_dir: str, name_like: str = "ol", min_qty: float = 80.0,
    num_buckets: int = 32,
):
    """TPC-H-Q20-shaped nested-IN: suppliers that ship at least one
    matching part (p_name contains ``name_like``) in bulk (per-(supplier,
    part) shipped quantity > ``min_qty``) → (s_suppkey, s_name,
    n_bulk_parts). Q20's partsupp availability test becomes a shipped-
    quantity test over the lineitem bridge.

    Scale shape: the part-name filter is a DIM BROADCAST semi-filter at
    the batch boundary; facts pre-aggregate (suppkey, partkey, qty) per
    batch, ONE suppkey-bucketed groupby finishes the per-(supp, part)
    sums, applies the HAVING, and counts qualifying parts per supplier;
    names resolve via broadcast dim lookup over the dim-sized result."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    import pyarrow.compute as pc

    m = pc.match_substring(part["p_name"], name_like).to_numpy(zero_copy_only=False)
    match_pk = np.sort(part["p_partkey"].to_numpy().astype(np.int64)[m])

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_quantity"])
    B = np.int64(num_buckets)

    def _agg(sk, pk, q):
        order = np.lexsort((pk, sk))
        sk, pk, q = sk[order], pk[order], q[order]
        start = np.ones(len(sk), bool)
        start[1:] = (sk[1:] != sk[:-1]) | (pk[1:] != pk[:-1])
        idx = np.nonzero(start)[0]
        return sk[start], pk[start], np.add.reduceat(q, idx)

    def _fact(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(match_pk, pk)
        pos_c = np.minimum(pos, max(len(match_pk) - 1, 0))
        hit = (match_pk[pos_c] == pk) if len(match_pk) else np.zeros(len(pk), bool)
        pk = pk[hit]
        sk = t["l_suppkey"].to_numpy().astype(np.int64)[hit]
        q = np.round(t["l_quantity"].to_numpy()[hit]).astype(np.int64)
        sk, pk, q = _agg(sk, pk, q)
        return pa.table(
            {"sk": sk, "pk": pk, "q": q, "b": (sk % B).astype(np.int32)}
        )

    def _having(g: pa.Table) -> pa.Table:
        sk, pk, q = _agg(g["sk"].to_numpy(), g["pk"].to_numpy(), g["q"].to_numpy())
        bulk = q > min_qty
        usk, cnt = np.unique(sk[bulk], return_counts=True)
        return pa.table({"s_suppkey": usk, "n_bulk_parts": cnt.astype(np.int64)})

    out = (
        li.map_batches(_fact, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_having, batch_format="pyarrow")
        .to_pandas()
        .sort_values("s_suppkey")
    )
    name = (
        pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
        .to_pandas().set_index("s_suppkey")["s_name"]
    )
    sk = out["s_suppkey"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "s_suppkey": sk,
            "s_name": name.loc[sk].to_numpy(),
            "n_bulk_parts": out["n_bulk_parts"].to_numpy().astype(np.int64),
        }
    )


def succ_triad_motifs(sf_dir: str, max_qty: float = 25.0, num_buckets: int = 32):
    """Directed triangle census of the part-successor graph (the two
    connected 3-edge triad classes of Holland–Leinhardt's census that
    need real joins): CYCLIC a→b→c→a vs TRANSITIVE a→b→c with a→c →
    one row (n_cyclic, n_transitive). Distinguishing feed-forward from
    feedback loops is the standard motif significance probe for directed
    web/flow graphs (Milo et al., Science 2002).

    Scale shape: THREE bucketed exchanges, ints only. (1) pair-bucket
    distinct of the successor edges (succ_edges leaves cross-bucket
    dupes by contract); (2) middle-vertex bucket: in×out wedge expansion
    (a→m→c, a≠c), each wedge emitting TWO probes — (a,c) for the
    transitive closure and (c,a) for the cyclic one; (3) pair-bucket
    closure: probes count against present edge markers via a WITHIN-BUCKET
    dense-rank pack (distinct coordinate values per bucket always fit 32
    bits, so raw vids can be full 64-bit url hashes — no global pack, no
    width guard). Cycles are triple-counted by rotation → one final //3.
    Per-middle fanout = in(m)·out(m); the qty filter keeps hubs bounded
    (same reasoning as succ_edges' sparsity filter)."""
    from ray.data.aggregate import Sum

    edges = succ_edges(sf_dir, max_qty=max_qty)
    B = np.int64(num_buckets)

    def _pairb(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        return pa.table(
            {"src": s, "dst": d, "b": _pair_bucket(s, d, num_buckets)}
        )

    def _dedup(g: pa.Table) -> pa.Table:
        src, dst = _pair_dedup_cols(g["src"].to_numpy(), g["dst"].to_numpy())
        return pa.table({"src": src, "dst": dst})

    dedges = (
        edges.map_batches(_pairb, batch_format="pyarrow")
        .groupby("b").map_groups(_dedup, batch_format="pyarrow")
    )

    def _roles(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        # out-role keyed by src (m = src), in-role keyed by dst (m = dst)
        m = np.concatenate([s, d])
        other = np.concatenate([d, s])
        is_out = np.concatenate(
            [np.ones(len(s), bool), np.zeros(len(d), bool)]
        )
        return pa.table(
            {"m": m, "other": other, "out": is_out,
             "b": (m % B).astype(np.int32)}
        )

    def _wedges(g: pa.Table) -> pa.Table:
        m = g["m"].to_numpy()
        other = g["other"].to_numpy()
        is_out = g["out"].to_numpy(zero_copy_only=False)
        order = np.argsort(m, kind="stable")
        m, other, is_out = m[order], other[order], is_out[order]
        starts = np.nonzero(np.r_[True, m[1:] != m[:-1]])[0]
        ends = np.r_[starts[1:], len(m)]
        pk, pb = [], []
        for s, e in zip(starts, ends):
            o = other[s:e]
            f = is_out[s:e]
            ins, outs = o[~f], o[f]
            if len(ins) == 0 or len(outs) == 0:
                continue
            a = np.repeat(ins, len(outs))
            c = np.tile(outs, len(ins))
            ok = a != c
            a, c = a[ok], c[ok]
            # transitive probe: does edge (a,c) exist?  cyclic: (c,a)?
            pk.append((np.concatenate([a, c]), np.concatenate([c, a])))
            pb.append(np.concatenate([np.zeros(len(a), np.int8),
                                      np.ones(len(c), np.int8)]))
        if not pk:
            return pa.table({"x": np.array([], np.int64),
                             "y": np.array([], np.int64),
                             "kind": np.array([], np.int8),
                             "b": np.array([], np.int32)})
        x = np.concatenate([p[0] for p in pk])
        y = np.concatenate([p[1] for p in pk])
        kind = np.concatenate(pb)
        return pa.table(
            {"x": x, "y": y, "kind": kind,
             "b": _pair_bucket(x, y, num_buckets)}
        )

    def _edge_markers(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        return pa.table(
            {"x": s, "y": d, "kind": np.full(len(s), 2, np.int8),
             "b": _pair_bucket(s, d, num_buckets)}
        )

    # materialize the deduped edge table once; it feeds both roles & markers
    dedges = dedges.materialize()

    def _close(g: pa.Table) -> pa.Table:
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        kind = g["kind"].to_numpy()
        # within-bucket dense-rank pack: distinct coordinate values in one
        # bucket always fit 32 bits, so the packed lookup key is valid for
        # arbitrary 64-bit vids
        _, ix = np.unique(x, return_inverse=True)
        _, iy = np.unique(y, return_inverse=True)
        key = ix.astype(np.int64) << np.int64(32) | iy.astype(np.int64)
        present = np.sort(key[kind == 2])
        probes = kind != 2
        pk_, pkind = key[probes], kind[probes]
        if len(present) and len(pk_):
            pos = np.minimum(np.searchsorted(present, pk_), len(present) - 1)
            hit = present[pos] == pk_
        else:
            hit = np.zeros(len(pk_), bool)
        return pa.table(
            {
                "cyc": np.array([int(hit[pkind == 1].sum())], np.int64),
                "trans": np.array([int(hit[pkind == 0].sum())], np.int64),
            }
        )

    probes = dedges.map_batches(_roles, batch_format="pyarrow").groupby(
        "b"
    ).map_groups(_wedges, batch_format="pyarrow")
    closed = (
        probes.union(dedges.map_batches(_edge_markers, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_close, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.table(
        {
            "n_cyclic": np.array([int(closed["cyc"].sum()) // 3], np.int64),
            "n_transitive": np.array([int(closed["trans"].sum())], np.int64),
        }
    )


def basket_lift(sf_dir: str, min_both: int = 2, num_buckets: int = 32):
    """Market-basket association strength (the Apriori 2-itemset stage,
    Agrawal & Srikant VLDB'94): for every part pair co-occurring in ≥
    ``min_both`` orders, lift = P(ab)/(P(a)·P(b)) = n_ab·N / (n_a·n_b) →
    (part_a, part_b, n_both, lift). Lift > 1 = genuine affinity, < 1 =
    substitution — the recommender-bootstrap signal over any basket log.

    Scale shape: pair counts ride the existing whole-order pair machine
    (:func:`copurchase_weights`); per-part basket counts fold from
    distinct (order, part) rows; the two count attachments are TWO
    bucketed union-joins re-keyed part_a → part_b (ints only — same
    two-hop norm attach as the TF-IDF all-pairs engine); N comes from the
    orders table's metadata. ONE rounded double expression at the end,
    op-order-mirrored by the SQL."""
    import pyarrow.parquet as pq

    from ..functions.rounding import round_half_away
    from ray.data.aggregate import Sum

    B = np.int64(num_buckets)
    N = float(pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows)

    pairs = copurchase_weights(sf_dir, num_buckets=num_buckets)

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _po(t: pa.Table) -> pa.Table:
        # ship RAW packed (order, part) keys bucketed by part — the global
        # distinct happens in the part-owning bucket (cross-batch dupes of
        # an order's lines would otherwise double-count n_a)
        o = t["l_orderkey"].to_numpy().astype(np.int64)
        p = t["l_partkey"].to_numpy().astype(np.int64)
        if len(o) and (int(o.max()) >= (1 << 41) or int(p.max()) >= (1 << 22)):
            raise ValueError("basket_lift: key exceeds the 41/22-bit pack")
        key = np.unique(o << np.int64(22) | p)
        p = key & np.int64((1 << 22) - 1)
        return pa.table(
            {"ka": p, "kb": np.full(len(p), -1, np.int64),
             "n": key, "na": np.zeros(len(p), np.int64),
             "b2": (p % B).astype(np.int32)}
        )

    def _pairs_in(t: pa.Table) -> pa.Table:
        a = t["src"].to_numpy().astype(np.int64)
        bb = t["dst"].to_numpy().astype(np.int64)
        n = t["n_orders"].to_numpy().astype(np.int64)
        keep = n >= min_both
        a, bb, n = a[keep], bb[keep], n[keep]
        return pa.table(
            {"ka": a, "kb": bb, "n": n, "na": np.zeros(len(a), np.int64),
             "b2": (a % B).astype(np.int32)}
        )

    def _attach_na(g: pa.Table) -> pa.Table:
        ka = g["ka"].to_numpy()
        kb = g["kb"].to_numpy()
        n = g["n"].to_numpy()
        dim = kb == -1
        # global distinct of the raw (order, part) keys, then count per part
        pkey = np.unique(n[dim])
        dpart = pkey & np.int64((1 << 22) - 1)
        dk, cnt = np.unique(dpart, return_counts=True)
        cnt = cnt.astype(np.int64)
        pa_, pb_, pn_ = ka[~dim], kb[~dim], n[~dim]
        na = cnt[np.searchsorted(dk, pa_)] if len(pa_) else np.array([], np.int64)
        ka_out = np.concatenate([dk, pb_])      # re-key pairs by part_b
        kb_out = np.concatenate([np.full(len(dk), -1, np.int64), pa_])
        n_out = np.concatenate([cnt, pn_])
        na_out = np.concatenate([np.zeros(len(dk), np.int64), na])
        return pa.table(
            {"ka": ka_out, "kb": kb_out, "n": n_out, "na": na_out,
             "b2": (ka_out % B).astype(np.int32)}
        )

    def _attach_nb(g: pa.Table) -> pa.Table:
        ka = g["ka"].to_numpy()
        kb = g["kb"].to_numpy()
        n = g["n"].to_numpy()
        na = g["na"].to_numpy()
        dim = kb == -1
        dk, dinv = np.unique(ka[dim], return_inverse=True)
        cnt = np.zeros(len(dk), np.int64)
        np.add.at(cnt, dinv, n[dim])
        pb_, pa_, pn_, pna = ka[~dim], kb[~dim], n[~dim], na[~dim]
        nb = cnt[np.searchsorted(dk, pb_)] if len(pb_) else np.array([], np.int64)
        lift = round_half_away(
            pn_.astype(np.float64) * N
            / (pna.astype(np.float64) * nb.astype(np.float64)),
            6,
        )
        o = np.lexsort((pb_, pa_))
        return pa.table(
            {"part_a": pa_[o], "part_b": pb_[o], "n_both": pn_[o],
             "lift": lift[o]}
        )

    return (
        pairs.map_batches(_pairs_in, batch_format="pyarrow")
        .union(li.map_batches(_po, batch_format="pyarrow"))
        .groupby("b2").map_groups(_attach_na, batch_format="pyarrow")
        .groupby("b2").map_groups(_attach_nb, batch_format="pyarrow")
    )


def degree_gini(sf_dir: str, num_buckets: int | None = None, round_to: int = 6):
    """Gini coefficient of the co-purchase degree distribution — the
    one-number inequality summary of a link graph (web graphs run high;
    a Gini collapse after a pipeline change means the hub structure
    changed) → one row (n_vertices, sum_degree, gini).

    G = (2·Σᵢ i·dᵢ) / (n·Σd) − (n+1)/n over degrees sorted ascending,
    rank i 1-based. Rank ties are irrelevant to the sum (equal values
    commute), but the sort key is (degree, vid) anyway so the ordinal is
    deterministic end to end.

    Scale shape: degrees fold from the edge stream (per-batch partials +
    one groupby); the global rank comes from the distributed sort-ordinal
    machine (``stages/sort.py``, the TeraSort prefix-sum shape — NO
    driver-side sort); Σ i·dᵢ folds per block as exact int64; ONE float
    expression at the end, op-order-mirrored by the SQL."""
    from ray.data.aggregate import Sum

    from ..stages.sort import sort_with_ordinal

    edges = copurchase_edges(sf_dir, num_buckets=num_buckets)

    def _deg_partial(t: pa.Table) -> pa.Table:
        # copurchase_edges emits each undirected edge once (src < dst):
        # both endpoints gain a degree
        both = np.concatenate([t["src"].to_numpy(), t["dst"].to_numpy()])
        u, c = np.unique(both, return_counts=True)
        return pa.table({"vid": u, "d": c.astype(np.int64)})

    deg = (
        edges.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("d", alias_name="d"))
    )
    ranked = sort_with_ordinal(deg, ["d", "vid"], ordinal_col="i0")

    def _moments(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy().astype(np.int64)
        i = t["i0"].to_numpy().astype(np.int64) + 1  # 1-based rank
        return pa.table(
            {
                "n": np.array([len(d)], np.int64),
                "sd": np.array([int(d.sum())], np.int64),
                "sid": np.array([int((i * d).sum())], np.int64),
            }
        )

    m = ranked.map_batches(_moments, batch_format="pyarrow").to_pandas()
    n = int(m["n"].sum())
    sd = int(m["sd"].sum())
    sid = int(m["sid"].sum())
    from ..functions.rounding import round_half_away

    gini = (2.0 * np.float64(sid)) / (np.float64(n) * np.float64(sd)) - (
        np.float64(n + 1) * 1.0 / np.float64(n)
    )
    return pa.table(
        {
            "n_vertices": np.array([n], np.int64),
            "sum_degree": np.array([sd], np.int64),
            "gini": round_half_away(np.array([gini]), round_to),
        }
    )


def avg_neighbor_degree(sf_dir: str, num_buckets: int | None = None,
                        round_to: int = 6):
    """Degree-correlation curve knn(k) (Pastor-Satorras et al. 2001): for
    every degree class k, the degree-weighted mean neighbor degree of
    k-degree vertices → (degree, n_vertices, avg_nbr_degree). Rising
    curve = assortative, falling = disassortative hubs — the structural
    fingerprint of a web link graph, read alongside the scalar
    assortativity coefficient.

    knn(k) = Σ_{v:d(v)=k} Σ_{u∈N(v)} d(u) / (k · |{v:d(v)=k}|) — the
    degree-weighted form keeps BOTH sums exact int64, so the result is
    ONE double division (bit-exact vs SQL; the per-vertex-ratio variant
    would sum floats in engine-dependent order).

    Scale shape: degrees fold from the edge stream; ONE neighbor-keyed
    bucket join attaches d(u) to each directed edge copy and folds
    Σd(u) per vertex in-bucket; a SECOND vertex-keyed bucket join pairs
    S_v with d(v); the final fold is per-degree (≤ max-degree rows)."""
    from ray.data.aggregate import Sum

    edges = copurchase_edges(sf_dir, num_buckets=num_buckets)

    def _deg_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate([t["src"].to_numpy(), t["dst"].to_numpy()])
        u, c = np.unique(both, return_counts=True)
        return pa.table({"vid": u, "d": c.astype(np.int64)})

    deg = (
        edges.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("d", alias_name="d"))
        .materialize()
    )
    B = np.int64(32)

    def _edge_rows(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        v = np.concatenate([s, d])
        u = np.concatenate([d, s])
        return pa.table(
            {"k": u, "v": v, "d": np.full(len(v), -1, np.int64),
             "b": (u % B).astype(np.int32)}
        )

    def _deg_dim(t: pa.Table) -> pa.Table:
        vid = t["vid"].to_numpy().astype(np.int64)
        return pa.table(
            {"k": vid, "v": np.zeros(len(vid), np.int64),
             "d": t["d"].to_numpy().astype(np.int64),
             "b": (vid % B).astype(np.int32)}
        )

    def _attach_nbr_deg(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy()
        v = g["v"].to_numpy()
        d = g["d"].to_numpy()
        dim = d >= 0
        dk = k[dim]
        order = np.argsort(dk)
        dk, dd = dk[order], d[dim][order]
        fk, fv = k[~dim], v[~dim]
        du = dd[np.searchsorted(dk, fk)] if len(fk) else np.array([], np.int64)
        uv, vinv = np.unique(fv, return_inverse=True)
        sd = np.zeros(len(uv), np.int64)
        np.add.at(sd, vinv, du)
        return pa.table(
            {"k": uv, "v": np.zeros(len(uv), np.int64), "d": sd,
             "b": (uv % B).astype(np.int32), "is_s": np.ones(len(uv), bool)}
        )

    def _deg_dim2(t: pa.Table) -> pa.Table:
        vid = t["vid"].to_numpy().astype(np.int64)
        return pa.table(
            {"k": vid, "v": np.zeros(len(vid), np.int64),
             "d": t["d"].to_numpy().astype(np.int64),
             "b": (vid % B).astype(np.int32),
             "is_s": np.zeros(len(vid), bool)}
        )

    def _per_degree(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy()
        d = g["d"].to_numpy()
        is_s = g["is_s"].to_numpy(zero_copy_only=False)
        dk = k[~is_s]
        order = np.argsort(dk)
        dk, dd = dk[order], d[~is_s][order]
        # fold per-bucket S_v partials per vertex FIRST (a vertex's
        # neighbor-sum rows arrive from several stage-1 buckets)
        fk = k[is_s]
        uv, uinv = np.unique(fk, return_inverse=True)
        sv = np.zeros(len(uv), np.int64)
        np.add.at(sv, uinv, d[is_s])
        dv = dd[np.searchsorted(dk, uv)] if len(uv) else np.array([], np.int64)
        ud, dinv = np.unique(dv, return_inverse=True)
        ssum = np.zeros(len(ud), np.int64)
        np.add.at(ssum, dinv, sv)
        cnt = np.bincount(dinv, minlength=len(ud)).astype(np.int64)
        return pa.table({"degree": ud, "ss": ssum, "cnt": cnt})

    # S_v per vertex (bucket 1), then (S_v, d_v) pairing (bucket 2)
    sv = (
        edges.map_batches(_edge_rows, batch_format="pyarrow")
        .union(deg.map_batches(_deg_dim, batch_format="pyarrow"))
        .groupby("b").map_groups(_attach_nbr_deg, batch_format="pyarrow")
    )
    per_deg = (
        sv.union(deg.map_batches(_deg_dim2, batch_format="pyarrow"))
        .groupby("b").map_groups(_per_degree, batch_format="pyarrow")
        .groupby("degree")
        .aggregate(Sum("ss", alias_name="ss"), Sum("cnt", alias_name="cnt"))
        .to_pandas().sort_values("degree")
    )
    from ..functions.rounding import round_half_away

    k = per_deg["degree"].to_numpy().astype(np.int64)
    ss = per_deg["ss"].to_numpy().astype(np.int64)
    cnt = per_deg["cnt"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "degree": k,
            "n_vertices": cnt,
            "avg_nbr_degree": round_half_away(
                ss.astype(np.float64) / (k.astype(np.float64) * cnt.astype(np.float64)),
                round_to,
            ),
        }
    )


def revenue_autocorr(sf_dir: str, round_to: int = 6):
    """Lag-1 Pearson autocorrelation of the DAILY revenue series — the
    one-number "is revenue momentum real" check behind
    :func:`forecast_revenue`: pairs are consecutive calendar days (d,
    d+1) that BOTH have revenue → one row (n_pairs, autocorr).

    r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)) over
    exact integer cents. Scale shape: the fact stream folds per-day cent
    partials (per-batch pre-agg + ONE day groupby); the day series is
    calendar-sized (thousands of rows at ANY corpus scale), so the
    moment fold runs driver-side in arbitrary-precision Python ints —
    overflow-free where a distributed int64 fold would clip — and the
    SQL mirrors it in HUGEINT. Two sqrts + one division at the end."""
    from ray.data.aggregate import Sum

    li = read_table(sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice"])

    def _daily(t: pa.Table) -> pa.Table:
        day = t["l_shipdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"day": u, "c": s})

    daily = (
        li.map_batches(_daily, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("day")
    )
    day = daily["day"].to_numpy().astype(np.int64)
    c = daily["c"].to_numpy().astype(np.int64)
    nxt = dict(zip(day.tolist(), c.tolist()))
    xs, ys = [], []
    for d, v in zip(day.tolist(), c.tolist()):
        if d + 1 in nxt:
            xs.append(v)
            ys.append(nxt[d + 1])
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    from ..functions.rounding import round_half_away

    num = np.float64(n * sxy - sx * sy)
    den = np.sqrt(np.float64(n * sxx - sx * sx)) * np.sqrt(
        np.float64(n * syy - sy * sy)
    )
    return pa.table(
        {
            "n_pairs": np.array([n], np.int64),
            "autocorr": round_half_away(np.array([num / den]), round_to),
        }
    )


def top_customer_share(sf_dir: str, k: int = 10, num_buckets: int = 32):
    """Revenue concentration: the share of total revenue earned from the
    top-``k`` customers → one row (top_k, top_revenue, total_revenue,
    share). The 80/20 health check every account team runs; a share jump
    means key-account risk.

    Scale shape: per-batch (custkey, cents) pre-aggregation + ONE
    groupby; ranking runs over the dim-sized per-customer table with the
    repo's round-then-rank determinism (exact-int revenue, custkey
    tiebreak); share = one double division mirrored by the SQL."""
    from ray.data.aggregate import Sum

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    B = np.int64(num_buckets)

    def _fact(t: pa.Table) -> pa.Table:
        kk = t["l_orderkey"].to_numpy().astype(np.int64)
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        rev = cents * (100 - disc)
        order = np.argsort(kk, kind="stable")
        kk, rev = kk[order], rev[order]
        start = np.ones(len(kk), bool)
        start[1:] = kk[1:] != kk[:-1]
        idx = np.nonzero(start)[0]
        return pa.table(
            {"k": kk[start], "rev": np.add.reduceat(rev, idx),
             "cust": np.full(int(start.sum()), -1, np.int64),
             "b": (kk[start] % B).astype(np.int32)}
        )

    def _dim(t: pa.Table) -> pa.Table:
        kk = t["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {"k": kk, "rev": np.zeros(len(kk), np.int64),
             "cust": t["o_custkey"].to_numpy().astype(np.int64),
             "b": (kk % B).astype(np.int32)}
        )

    def _join(g: pa.Table) -> pa.Table:
        cust = g["cust"].to_numpy()
        dim = cust >= 0
        kk = g["k"].to_numpy()
        dk = kk[dim]
        order = np.argsort(dk)
        dk, dc = dk[order], cust[dim][order]
        fk = kk[~dim]
        pos = np.searchsorted(dk, fk)
        pos_c = np.minimum(pos, max(len(dk) - 1, 0))
        hit = dk[pos_c] == fk if len(dk) else np.zeros(len(fk), bool)
        cu = dc[pos_c[hit]]
        rv = g["rev"].to_numpy()[~dim][hit]
        u, inv = np.unique(cu, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, rv)
        return pa.table({"c_custkey": u, "rev": s})

    per_cust = (
        li.map_batches(_fact, batch_format="pyarrow")
        .union(orders.map_batches(_dim, batch_format="pyarrow"))
        .groupby("b").map_groups(_join, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    rev = per_cust["rev"].to_numpy().astype(np.int64)
    ck = per_cust["c_custkey"].to_numpy().astype(np.int64)
    order = np.lexsort((ck, -rev))[:k]
    top = int(rev[order].sum())
    total = int(rev.sum())
    return pa.table(
        {
            "top_k": np.array([min(k, len(rev))], np.int64),
            "top_revenue": np.array([top], np.int64),
            "total_revenue": np.array([total], np.int64),
            "share": np.array(
                [np.float64(top) / np.float64(total)], np.float64
            ),
        }
    )


def orders_fill_rate(sf_dir: str, within_days: int = 90, num_buckets: int = 32):
    """Universal-quantifier per-group aggregate (SQL ``bool_and``): an
    order is FULLY FILLED iff EVERY lineitem shipped within
    ``within_days`` of the order date → one row (n_orders, n_filled,
    fill_rate). The complement of Q12's per-line lateness — the
    fulfilment SLA is per ORDER, one slow line breaks the whole order.

    Scale shape: the facts fold a per-order running MAX ship-day per
    batch (the ALL() reduces to one max compare), ONE orderkey-bucketed
    union join against (orderkey, order-day), per-bucket (filled, total)
    partials, tiny final fold; rate = one double division."""
    from ray.data.aggregate import Sum

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    B = np.int64(num_buckets)

    def _fact(t: pa.Table) -> pa.Table:
        kk = t["l_orderkey"].to_numpy().astype(np.int64)
        day = t["l_shipdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        order = np.argsort(kk, kind="stable")
        kk, day = kk[order], day[order]
        start = np.ones(len(kk), bool)
        start[1:] = kk[1:] != kk[:-1]
        idx = np.nonzero(start)[0]
        mx = np.maximum.reduceat(day, idx)
        return pa.table(
            {"k": kk[start], "day": mx,
             "dim": np.zeros(int(start.sum()), bool),
             "b": (kk[start] % B).astype(np.int32)}
        )

    def _dim(t: pa.Table) -> pa.Table:
        kk = t["o_orderkey"].to_numpy().astype(np.int64)
        day = t["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pa.table(
            {"k": kk, "day": day, "dim": np.ones(len(kk), bool),
             "b": (kk % B).astype(np.int32)}
        )

    def _join(g: pa.Table) -> pa.Table:
        kk = g["k"].to_numpy()
        day = g["day"].to_numpy()
        dim = g["dim"].to_numpy(zero_copy_only=False)
        # fold cross-batch fact partials: max ship-day per order
        fk = kk[~dim]
        fd = day[~dim]
        u, inv = np.unique(fk, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, fd)
        dk = kk[dim]
        order = np.argsort(dk)
        dk, dd = dk[order], day[dim][order]
        pos = np.searchsorted(dk, u)
        pos_c = np.minimum(pos, max(len(dk) - 1, 0))
        hit = dk[pos_c] == u if len(dk) else np.zeros(len(u), bool)
        filled = (mx[hit] - dd[pos_c[hit]]) <= within_days
        return pa.table(
            {
                "n": np.array([int(hit.sum())], np.int64),
                "f": np.array([int(filled.sum())], np.int64),
            }
        )

    out = (
        li.map_batches(_fact, batch_format="pyarrow")
        .union(orders.map_batches(_dim, batch_format="pyarrow"))
        .groupby("b").map_groups(_join, batch_format="pyarrow")
        .to_pandas()
    )
    n = int(out["n"].sum())
    f = int(out["f"].sum())
    return pa.table(
        {
            "n_orders": np.array([n], np.int64),
            "n_filled": np.array([f], np.int64),
            "fill_rate": np.array([np.float64(f) / np.float64(n)], np.float64),
        }
    )


def label_conductance(sf_dir: str, mod: int = 3, num_buckets: int | None = None,
                      round_to: int = 6):
    """Community-quality cut metric: for every part-label class S
    (p_size % mod, the matcher's label scheme), conductance
    φ(S) = cut(S) / min(vol(S), vol(V∖S)) over the co-purchase graph →
    (label, n_internal, n_cut, conductance). Low φ = the label is a real
    cluster; read alongside lpa_modularity (global) and
    label_mixing_matrix (pairwise) — φ is the per-class bottleneck view.

    Scale shape: ONE pass over the undirected edge stream; the vid→label
    map is a broadcast dim lookup at the batch boundary (part is a
    dimension); each batch emits ≤ mod partial rows (internal/cut
    counters — vol(S) = 2·internal + cut needs no degree table); a
    label-sized fold and ONE double division finish it."""
    import pyarrow.parquet as pq

    from ..functions.rounding import round_half_away
    from ray.data.aggregate import Sum

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"])
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    lab = part["p_size"].to_numpy().astype(np.int64) % mod
    order = np.argsort(pk)
    pk, lab = pk[order], lab[order]

    edges = copurchase_edges(sf_dir, num_buckets=num_buckets)

    def _partial(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        la = lab[np.searchsorted(pk, s)]
        lb = lab[np.searchsorted(pk, d)]
        internal = np.zeros(mod, np.int64)
        cut = np.zeros(mod, np.int64)
        same = la == lb
        np.add.at(internal, la[same], 1)
        np.add.at(cut, la[~same], 1)
        np.add.at(cut, lb[~same], 1)
        nz = np.nonzero(internal + cut)[0]
        return pa.table(
            {"label": nz.astype(np.int64), "i": internal[nz], "c": cut[nz]}
        )

    agg = (
        edges.map_batches(_partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("i", alias_name="n_internal"), Sum("c", alias_name="n_cut"))
        .to_pandas()
        .sort_values("label")
    )
    internal = agg["n_internal"].to_numpy().astype(np.int64)
    cut = agg["n_cut"].to_numpy().astype(np.int64)
    vol = 2 * internal + cut
    tv = int(vol.sum())
    denom = np.minimum(vol, tv - vol)
    return pa.table(
        {
            "label": agg["label"].to_numpy().astype(np.int64),
            "n_internal": internal,
            "n_cut": cut,
            "conductance": round_half_away(
                cut.astype(np.float64) / denom.astype(np.float64), round_to
            ),
        }
    )


def two_hop_reach(sf_dir: str, num_buckets: int | None = None):
    """Friends-of-friends reach: for every vertex, the number of DISTINCT
    vertices within ≤ 2 hops (self excluded) → (vid, reach2). The
    audience-estimation primitive for social/link graphs — ad reach,
    influence caps, crawl frontier sizing — and the first moment of the
    neighborhood function HyperBall approximates at higher radii.

    Scale shape: wedge expansion per middle vertex (the
    :func:`avg_neighbor_degree` role machine) emits candidate (v, w)
    pairs both ways, unioned with the direct edges (both ways); ONE
    v-keyed bucket groupby dedups pairs globally per vertex and counts.
    Per-batch np.unique bounds the exchange; hub middles fan out
    in(m)·out(m) wedges — the same bound the triad census documents. The
    wedge SET is inherently Θ(Σ deg²): on dense graphs (the 10× bump's
    24M-edge co-purchase graph spills past single-box disk) use the
    HyperBall neighborhood-function sketch (``hyperball``) instead —
    exact reach is a sparse-graph / filtered-frontier tool."""
    edges = copurchase_edges(sf_dir, num_buckets=num_buckets)
    B = np.int64(32)

    def _roles(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        m = np.concatenate([s, d])
        other = np.concatenate([d, s])
        return pa.table(
            {"m": m, "other": other, "b": (m % B).astype(np.int32)}
        )

    def _wedge_pairs(g: pa.Table) -> pa.Table:
        m = g["m"].to_numpy()
        other = g["other"].to_numpy()
        order = np.argsort(m, kind="stable")
        m, other = m[order], other[order]
        starts = np.nonzero(np.r_[True, m[1:] != m[:-1]])[0]
        ends = np.r_[starts[1:], len(m)]
        vs, ws = [], []
        for s, e in zip(starts, ends):
            o = np.unique(other[s:e])  # m's neighborhood, deduped
            if len(o) < 2:
                continue
            ia, ib = np.triu_indices(len(o), k=1)
            a, c = o[ia], o[ib]
            vs.append(np.concatenate([a, c]))
            ws.append(np.concatenate([c, a]))
        # direct ≤1-hop pairs ride along (both ways)
        vs.append(m)
        ws.append(other)
        # two-column lexsort dedup — no packed key, 64-bit-vid safe
        v, w = _pair_dedup_cols(np.concatenate(vs), np.concatenate(ws))
        return pa.table({"v": v, "w": w, "b2": (v % B).astype(np.int32)})

    def _count(g: pa.Table) -> pa.Table:
        v, w = _pair_dedup_cols(g["v"].to_numpy(), g["w"].to_numpy())
        uv, cnt = np.unique(v, return_counts=True)
        return pa.table({"vid": uv, "reach2": cnt.astype(np.int64)})

    return (
        edges.map_batches(_roles, batch_format="pyarrow")
        .groupby("b").map_groups(_wedge_pairs, batch_format="pyarrow")
        .groupby("b2").map_groups(_count, batch_format="pyarrow")
    )


def local_bridges(sf_dir: str, num_buckets: int = 32):
    """Local bridges (Easley–Kleinberg §3.2): edges whose endpoints share
    NO common neighbor (span > 2 — removing one lengthens the shortest
    path to ≥ 3) → (src, dst), src < dst. On an information graph these
    are the weak-tie conduits between communities; on the STRONG
    co-purchase graph (the sparse tie-strength cut) most surviving edges
    are exactly such conduits, which is the Granovetter point.

    Scale shape: an ANTI-join of the edge set against the wedge-closure
    set — the :func:`succ_triad_motifs` machine with the mask flipped:
    middles emit (a, c) witness pairs (a < c), edges emit probe rows, one
    pair-keyed bucket keeps probes with zero witnesses. Witness fanout =
    C(deg, 2) per middle, bounded by the strong graph's ≤ 8·|V| edges."""
    sedges = strong_copurchase_edges(sf_dir, num_buckets=num_buckets)
    B = np.int64(num_buckets)

    def _roles(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        m = np.concatenate([s, d])
        other = np.concatenate([d, s])
        return pa.table(
            {"m": m, "other": other, "b": (m % B).astype(np.int32)}
        )

    def _witnesses(g: pa.Table) -> pa.Table:
        m = g["m"].to_numpy()
        other = g["other"].to_numpy()
        order = np.argsort(m, kind="stable")
        m, other = m[order], other[order]
        starts = np.nonzero(np.r_[True, m[1:] != m[:-1]])[0]
        ends = np.r_[starts[1:], len(m)]
        xs, ys = [], []
        for s, e in zip(starts, ends):
            o = np.unique(other[s:e])
            if len(o) < 2:
                continue
            ia, ib = np.triu_indices(len(o), k=1)
            xs.append(o[ia])  # a < c by unique order
            ys.append(o[ib])
        if not xs:
            return pa.table({"x": np.array([], np.int64),
                             "y": np.array([], np.int64),
                             "probe": np.array([], bool),
                             "b2": np.array([], np.int32)})
        x, y = _pair_dedup_cols(np.concatenate(xs), np.concatenate(ys))
        return pa.table(
            {"x": x, "y": y, "probe": np.zeros(len(x), bool),
             "b2": _pair_bucket(x, y, num_buckets)}
        )

    def _probes(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        return pa.table(
            {"x": s, "y": d, "probe": np.ones(len(s), bool),
             "b2": _pair_bucket(s, d, num_buckets)}
        )

    def _anti(g: pa.Table) -> pa.Table:
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        probe = g["probe"].to_numpy(zero_copy_only=False)
        # within-bucket dense-rank pack (64-bit-vid safe, see triad census)
        _, ix = np.unique(x, return_inverse=True)
        _, iy = np.unique(y, return_inverse=True)
        key = ix.astype(np.int64) << np.int64(32) | iy.astype(np.int64)
        wit = np.sort(key[~probe])
        pk = key[probe]
        if len(wit) and len(pk):
            pos = np.minimum(np.searchsorted(wit, pk), len(wit) - 1)
            hit = wit[pos] == pk
        else:
            hit = np.zeros(len(pk), bool)
        xs, ys = x[probe][~hit], y[probe][~hit]
        order = np.lexsort((ys, xs))
        return pa.table({"src": xs[order], "dst": ys[order]})

    sedges = sedges.materialize()  # feeds both roles and probes
    return (
        sedges.map_batches(_roles, batch_format="pyarrow")
        .groupby("b").map_groups(_witnesses, batch_format="pyarrow")
        .union(sedges.map_batches(_probes, batch_format="pyarrow"))
        .groupby("b2").map_groups(_anti, batch_format="pyarrow")
    )


def customer_migration(sf_dir: str, y_from: int = 1995, y_to: int = 1996,
                       k: int = 4, num_buckets: int | None = None):
    """Year-over-year segment migration matrix: customers are NTILE(k)
    revenue-quartiled independently in ``y_from`` and ``y_to`` (exact
    cents, revenue DESC, custkey tiebreak — tile 1 = top spenders), and
    the transition counts are tallied over customers active in BOTH
    years → (tile_from, tile_to, n_customers). The cohort-health matrix:
    mass below the diagonal = down-migration = churn risk.

    Scale shape: one orders pass with per-batch (custkey, year) combine;
    each year's quartile comes from the distributed sort-ordinal NTILE
    closed form (:func:`customer_rfm`'s machine — no window engine); the
    two tile arms meet in a custkey-bucket union-groupby and only the
    k×k matrix leaves."""
    from ray.data.aggregate import Sum

    from ..stages.sort import sort_with_ordinal

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    num_buckets = _auto_buckets(orders, num_buckets)
    K = np.int64(k)
    PACK = np.int64(10000)

    def _partial(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy().astype(np.int64)
        yr = t["o_orderdate"].to_numpy().astype("datetime64[Y]").astype(np.int64) + 1970
        m = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        sel = (yr == y_from) | (yr == y_to)
        key = c[sel] * PACK + yr[sel]
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, m[sel])
        return pa.table({"key": uk, "rev": s})

    agg = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("rev", alias_name="rev"))
        .materialize()
    )

    def _year_slice(year: int):
        def _pick(t: pa.Table) -> pa.Table:
            key = t["key"].to_numpy()
            m = key % PACK == year
            return pa.table(
                {"custkey": key[m] // PACK, "rev": t["rev"].to_numpy()[m]}
            )

        return agg.map_batches(_pick, batch_format="pyarrow").materialize()

    def _tile_arm(year: int, tag: int):
        sliced = _year_slice(year)
        n = np.int64(sliced.count())

        def _tile(t: pa.Table) -> pa.Table:
            p = t["ordinal"].to_numpy()
            small = n // K
            n_big = n % K
            cut = n_big * (small + 1)
            tile = np.where(
                p < cut,
                p // np.maximum(small + 1, 1),
                n_big + (p - cut) // np.maximum(small, 1),
            ) + 1
            return pa.table(
                {
                    "custkey": t["custkey"],
                    "tag": np.full(len(p), tag, np.int8),
                    "tile": tile.astype(np.int64),
                }
            )

        return sort_with_ordinal(
            sliced, ["rev", "custkey"], descending=[True, False]
        ).map_batches(_tile, batch_format="pyarrow")

    arms = _tile_arm(y_from, 0).union(_tile_arm(y_to, 1))

    def _bucket(t: pa.Table) -> pa.Table:
        c = t["custkey"].to_numpy()
        return t.append_column(
            "b", pa.array((c % num_buckets).astype(np.int32))
        )

    def _matrix(g: pa.Table) -> pa.Table:
        c = g["custkey"].to_numpy()
        tag = g["tag"].to_numpy()
        tile = g["tile"].to_numpy()
        uc, inv = np.unique(c, return_inverse=True)
        tf = np.zeros(len(uc), np.int64)
        tt = np.zeros(len(uc), np.int64)
        tf[inv[tag == 0]] = tile[tag == 0]
        tt[inv[tag == 1]] = tile[tag == 1]
        both = (tf > 0) & (tt > 0)
        base = K + 1  # tiles are 1-based; base k would alias (t, k) pairs
        key = tf[both] * base + tt[both]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"tile_from": uk // base, "tile_to": uk % base,
             "n": cnt.astype(np.int64)}
        )

    out = (
        arms.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_matrix, batch_format="pyarrow")
        .to_pandas()
        .groupby(["tile_from", "tile_to"], sort=True)["n"].sum().reset_index()
    )
    return pa.table(
        {
            "tile_from": out["tile_from"].to_numpy().astype(np.int64),
            "tile_to": out["tile_to"].to_numpy().astype(np.int64),
            "n_customers": out["n"].to_numpy().astype(np.int64),
        }
    )


def events_disorder(sf_dir: str, min_events: int = 5,
                    num_buckets: int | None = None, round_to: int = 6):
    """Stream-disorder audit: per user, how badly event arrival order
    (event_id, the ingestion sequence) disagrees with event time (ts) →
    (user_id, n_events, n_inversions, tau). An inversion is a pair where
    the later-ingested event has the EARLIER timestamp; τ = 1 −
    4·inv/(n·(n−1)) is Kendall's tau between the two orders. τ ≈ 1 =
    clean append-only stream; low τ = backfill/clock-skew — decides
    whether downstream sessionization can trust ingestion order.

    Scale shape: the ONE-shuffle user-hash bucket machine; per user the
    inversion count is a vectorized O(n²) pair compare on ranks (user
    timelines are short; a mergesort count is the n ≫ 10⁴ swap-in).
    Exact integer counts; τ is one rounded double expression."""
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _disorder(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        order = np.lexsort((ts, eid, u))  # by user, ingestion order
        u, ts, eid = u[order], ts[order], eid[order]
        starts = np.nonzero(np.r_[True, u[1:] != u[:-1]])[0]
        ends = np.r_[starts[1:], len(u)]
        uids, ns, invs = [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < min_events:
                continue
            t_seq = ts[s:e]
            # pairs (i < j in ingestion order) with ts_i > ts_j
            inv = int(np.sum(np.triu(t_seq[:, None] > t_seq[None, :], k=1)))
            uids.append(u[s]); ns.append(n); invs.append(inv)
        uids = np.asarray(uids, np.int64)
        ns = np.asarray(ns, np.int64)
        invs = np.asarray(invs, np.int64)
        tau = round_half_away(
            1.0 - 4.0 * invs.astype(np.float64)
            / (ns.astype(np.float64) * (ns - 1).astype(np.float64)),
            round_to,
        )
        return pa.table(
            {"user_id": uids, "n_events": ns, "n_inversions": invs, "tau": tau}
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_disorder, batch_format="pyarrow")
    )


def weekday_revenue(sf_dir: str, round_to: int = 6):
    """Calendar seasonality rollup: revenue by ISO day-of-week →
    (isodow, revenue, rev_share). The demand-shape fingerprint feeding
    staffing/forecast seasonal factors.

    Scale shape: per-batch (dow, cents) partials (dow from pure int64
    day arithmetic — (day+3) % 7 + 1 reproduces isodow, epoch day 0 was
    a Thursday), one 7-row fold, one double division per row."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    li = read_table(sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice"])

    def _partial(t: pa.Table) -> pa.Table:
        day = t["l_shipdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        dow = (day + 3) % 7 + 1
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        u, inv = np.unique(dow, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"isodow": u, "c": s})

    out = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("isodow")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("isodow")
    )
    c = out["c"].to_numpy().astype(np.int64)
    total = int(c.sum())
    return pa.table(
        {
            "isodow": out["isodow"].to_numpy().astype(np.int64),
            "revenue": c.astype(np.float64) / 100.0,
            "rev_share": round_half_away(
                c.astype(np.float64) / np.float64(total), round_to
            ),
        }
    )


def window_distinct_users(sf_dir: str, window_sec: int = 3600,
                          num_buckets: int | None = None):
    """EXACT distinct users per tumbling window → (window_start,
    n_events, n_users) — the exact counterpart of the HLL sketch pair
    (approx_distinct_users_daily), at window grain: dashboards want the
    sketch, billing wants the exact count.

    Scale shape: per-batch (window, user) dedup, ONE window-hash bucket
    groupby finishes the global dedup and counts — users never leave
    their window's bucket, and only (window, count) rows come back."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])
    num_buckets = _auto_buckets(ds, num_buckets)
    W = np.int64(window_sec * 1_000_000)

    def _assign(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        w = ts // W  # window INDEX (small) — raw µs would overflow the pack
        u = t["user_id"].to_numpy().astype(np.int64)
        if len(u) and (int(u.max()) >= (1 << 20) or int(w.max()) >= (1 << 43)):
            raise ValueError("window_distinct_users: key exceeds 43/20-bit pack")
        key = np.unique(w << np.int64(20) | u)
        uw = key >> np.int64(20)
        uu = key & np.int64((1 << 20) - 1)
        # per-batch event counts per window ride separately (not deduped)
        cw, cc = np.unique(w, return_counts=True)
        return pa.table(
            {
                "w": np.concatenate([uw, cw]),
                "u": np.concatenate([uu, np.full(len(cw), -1, np.int64)]),
                "n": np.concatenate([np.zeros(len(uw), np.int64),
                                     cc.astype(np.int64)]),
                "b": (np.concatenate([uw, cw]) % num_buckets).astype(np.int32),
            }
        )

    def _count(g: pa.Table) -> pa.Table:
        w = g["w"].to_numpy()
        u = g["u"].to_numpy()
        n = g["n"].to_numpy()
        users = u >= 0
        key = np.unique(w[users] << np.int64(20) | u[users])
        uw, cnt = np.unique(key >> np.int64(20), return_counts=True)
        ew, einv = np.unique(w[~users], return_inverse=True)
        ec = np.zeros(len(ew), np.int64)
        np.add.at(ec, einv, n[~users])
        # uw and ew cover the same windows (every window has ≥1 event)
        order = np.searchsorted(uw, ew)
        return pa.table(
            {
                "window_start": (ew * W).astype("datetime64[us]"),
                "n_events": ec,
                "n_users": cnt[order].astype(np.int64),
            }
        )

    return (
        ds.map_batches(_assign, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_count, batch_format="pyarrow")
    )


def order_value_magnitude(sf_dir: str):
    """Log-scale (decimal-magnitude) histogram of order values →
    (magnitude, n_orders): magnitude = ⌊log₁₀(total cents)⌋ computed by
    EXACT integer power-of-ten comparison (np.digitize against 10^k — no
    float log, so the SQL's digit-count reproduces it bit-exactly).
    The heavy-tail shape check (Benford-adjacent) for transaction values.

    Scale shape: per-batch partial histogram, one ≤19-row fold."""
    from ray.data.aggregate import Sum

    orders = read_table(sf_dir, "orders", columns=["o_totalprice"])
    pows = 10 ** np.arange(1, 19, dtype=np.int64)

    def _partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        mag = np.digitize(cents, pows)
        u, c = np.unique(mag, return_counts=True)
        return pa.table({"magnitude": u.astype(np.int64),
                         "n": c.astype(np.int64)})

    out = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("magnitude")
        .aggregate(Sum("n", alias_name="n_orders"))
        .to_pandas()
        .sort_values("magnitude")
    )
    return pa.table(
        {
            "magnitude": out["magnitude"].to_numpy().astype(np.int64),
            "n_orders": out["n_orders"].to_numpy().astype(np.int64),
        }
    )


def user_activity_streaks(sf_dir: str, num_buckets: int | None = None):
    """Gaps-and-islands: per user, the LONGEST run of consecutive active
    calendar days and the active-day count → (user_id, n_active_days,
    longest_streak). The engagement metric behind every "7-day streak"
    badge, and the canonical SQL islands problem (day − row_number()
    grouping) done distributed.

    Scale shape: the ONE-shuffle user-hash bucket machine; per bucket,
    distinct (user, day) pairs come from one np.unique, runs from one
    shifted compare on the day-sorted array — no per-user loop."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _streaks(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy().astype(np.int64)
        day = g["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        if len(u) and (int(day.max()) >= (1 << 22) or int(u.max()) >= (1 << 41)):
            raise ValueError("user_activity_streaks: key exceeds 41/22-bit pack")
        key = np.unique(u << np.int64(22) | day)  # distinct (user, day)
        u2 = key >> np.int64(22)
        d2 = key & np.int64((1 << 22) - 1)
        # runs: same user AND day exactly +1 from previous row
        cont = np.zeros(len(u2), bool)
        if len(u2) > 1:
            cont[1:] = (u2[1:] == u2[:-1]) & (d2[1:] == d2[:-1] + 1)
        run_start = np.nonzero(~cont)[0]
        run_id = np.cumsum(~cont) - 1
        run_len = np.bincount(run_id)
        # longest run per user: runs are user-contiguous
        run_user = u2[run_start]
        uu, uinv = np.unique(run_user, return_inverse=True)
        longest = np.zeros(len(uu), np.int64)
        np.maximum.at(longest, uinv, run_len)
        n_days = np.bincount(
            np.searchsorted(uu, u2), minlength=len(uu)
        ).astype(np.int64)
        return pa.table(
            {"user_id": uu, "n_active_days": n_days,
             "longest_streak": longest}
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_streaks, batch_format="pyarrow")
    )


def benford_first_digit(sf_dir: str, round_to: int = 6):
    """Benford's-law fraud screen on order values → (digit, n_orders,
    share, expected): observed leading-digit distribution of the exact
    integer cents vs the Benford expectation log₁₀(1 + 1/d). The
    deviation pattern is the standard first-pass anomaly test on
    transaction amounts.

    Scale shape: leading digit by exact integer arithmetic (power-of-ten
    digitize + one integer division — no float log on the data path);
    per-batch 9-bin partials, one 9-row fold, rounded doubles only in
    the final expectation/share columns."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    orders = read_table(sf_dir, "orders", columns=["o_totalprice"])
    pows = 10 ** np.arange(1, 19, dtype=np.int64)

    def _partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        cents = cents[cents > 0]
        mag = np.digitize(cents, pows)
        lead = cents // (10 ** mag.astype(np.int64))
        u, c = np.unique(lead, return_counts=True)
        return pa.table({"digit": u.astype(np.int64), "n": c.astype(np.int64)})

    out = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n_orders"))
        .to_pandas()
        .sort_values("digit")
    )
    d = out["digit"].to_numpy().astype(np.int64)
    n = out["n_orders"].to_numpy().astype(np.int64)
    total = int(n.sum())
    return pa.table(
        {
            "digit": d,
            "n_orders": n,
            "share": round_half_away(
                n.astype(np.float64) / np.float64(total), round_to
            ),
            "expected": round_half_away(
                np.log10(1.0 + 1.0 / d.astype(np.float64)), round_to
            ),
        }
    )


def conversion_latency(sf_dir: str, from_type: str = "view",
                       to_type: str = "purchase",
                       num_buckets: int | None = None):
    """Conversion-latency rollup: per user, seconds from their FIRST
    ``from_type`` event to the first ``to_type`` event AFTER it; corpus
    rollup → one row (n_converters, total_latency_sec, avg_latency_sec).
    The time-to-value headline behind every funnel dashboard.

    Scale shape: the ONE-shuffle user-hash bucket machine; per bucket one
    lexsort finds each user's first trigger and the first conversion
    after it (searchsorted, no loop); whole-second int64 latencies fold
    exactly; avg = ONE double division after the final fold."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id", "event_type"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column("b", pa.array((u % num_buckets).astype(np.int32)))

    def _latency(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        is_from = et == from_type
        is_to = et == to_type
        # first trigger per user
        fu, finv = np.unique(u[is_from], return_inverse=True)
        fts = np.full(len(fu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(fts, finv, ts[is_from])
        # first conversion AFTER the trigger, per user
        tu = u[is_to]
        tts = ts[is_to]
        order = np.lexsort((tts, tu))
        tu, tts = tu[order], tts[order]
        n_conv = 0
        total = 0
        starts = np.searchsorted(tu, fu)
        ends = np.searchsorted(tu, fu, side="right")
        for i in range(len(fu)):
            s, e = starts[i], ends[i]
            if s == e:
                continue
            pos = np.searchsorted(tts[s:e], fts[i])
            if pos < e - s:
                n_conv += 1
                total += int((tts[s + pos] - fts[i]) // 1_000_000)
        return pa.table(
            {"n": np.array([n_conv], np.int64),
             "t": np.array([total], np.int64)}
        )

    out = (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_latency, batch_format="pyarrow")
        .to_pandas()
    )
    n = int(out["n"].sum())
    t = int(out["t"].sum())
    return pa.table(
        {
            "n_converters": np.array([n], np.int64),
            "total_latency_sec": np.array([t], np.int64),
            "avg_latency_sec": np.array(
                [np.float64(t) / np.float64(n)], np.float64
            ),
        }
    )


def isolated_parts(sf_dir: str, num_buckets: int | None = None):
    """Catalog-coverage audit: parts that never co-occur with another
    part in any order → one row (n_parts, n_connected, n_isolated,
    isolation_rate). The merchandising dead-stock signal, and the
    link-graph "singleton vertex" count the component histogram cannot
    see (isolated vertices never enter the edge table).

    Scale shape: connected vertices = distinct endpoints of the
    co-purchase edge stream (per-batch dedup + one vid-bucket distinct
    count — only per-bucket counts return); n_parts from parquet
    metadata; one division."""
    import pyarrow.parquet as pq

    edges = copurchase_edges(sf_dir, num_buckets=num_buckets)
    n_parts = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    B = np.int64(32)

    def _verts(t: pa.Table) -> pa.Table:
        v = np.unique(np.concatenate([t["src"].to_numpy(), t["dst"].to_numpy()]))
        return pa.table({"v": v.astype(np.int64),
                         "b": (v % B).astype(np.int32)})

    def _count(g: pa.Table) -> pa.Table:
        return pa.table(
            {"n": np.array([len(np.unique(g["v"].to_numpy()))], np.int64)}
        )

    out = (
        edges.map_batches(_verts, batch_format="pyarrow")
        .groupby("b").map_groups(_count, batch_format="pyarrow")
        .to_pandas()
    )
    n_conn = int(out["n"].sum())
    n_iso = n_parts - n_conn
    return pa.table(
        {
            "n_parts": np.array([n_parts], np.int64),
            "n_connected": np.array([n_conn], np.int64),
            "n_isolated": np.array([n_iso], np.int64),
            "isolation_rate": np.array(
                [np.float64(n_iso) / np.float64(n_parts)], np.float64
            ),
        }
    )


def events_mad(sf_dir: str, round_to: int = 6):
    """Robust global dispersion: the median absolute deviation of
    ``value`` → one row (median, mad). The outlier-immune σ replacement
    for alert thresholds (events_zscore's robust cousin) — and a TWO-PASS
    exact-quantile composition: median first, then the median of
    |x − median|, each via the distributed sort-ordinal machine.

    Both medians interpolate v0 + (v1 − v0)·f on the two boundary-rank
    rows (DuckDB ``median`` agrees bit-for-bit after round-half-away at
    6, as events_quantiles established); the deviation column is computed
    vectorized per batch between the passes — the driver only ever sees
    the four boundary rows."""
    from ..functions.rounding import round_half_away
    from ..stages.sort import sort_with_ordinal

    ds = read_table(sf_dir, "events", columns=["event_id", "value"]).materialize()
    n = ds.count()

    def _median_of(sorted_ds, col):
        pos = 0.5 * (n - 1)
        i0 = int(np.floor(pos))
        i1 = min(i0 + 1, n - 1)

        def _pick(t: pa.Table) -> pa.Table:
            m = np.isin(t["ordinal"].to_numpy(), [i0, i1])
            return t.filter(pa.array(m))

        picked = (
            sorted_ds.map_batches(_pick, batch_format="pyarrow")
            .to_pandas().set_index("ordinal")[col]
        )
        v0, v1 = picked.loc[i0], picked.loc[i1]
        return v0 + (v1 - v0) * (pos - np.floor(pos))

    med = _median_of(
        sort_with_ordinal(ds.select_columns(["event_id", "value"]),
                          ["value", "event_id"]),
        "value",
    )

    def _dev(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "dev": np.abs(t["value"].to_numpy() - med),
            }
        )

    mad = _median_of(
        sort_with_ordinal(
            ds.map_batches(_dev, batch_format="pyarrow"), ["dev", "event_id"]
        ),
        "dev",
    )
    return pa.table(
        {
            "median": round_half_away(np.array([med]), round_to),
            "mad": round_half_away(np.array([mad]), round_to),
        }
    )


def events_heatmap(sf_dir: str):
    """Product-analytics activity heatmap: events by (ISO weekday, hour
    of day) → (isodow, hour, n_events). The staffing/load-shape view; a
    bot traffic spike shows as an off-hours hot row.

    Scale shape: pure int64 calendar arithmetic per batch ((day+3)%7+1
    for isodow, µs//3600e6 % 24 for hour), ≤168-row partials, one tiny
    fold."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["ts"])

    def _partial(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        day = us // 86_400_000_000
        dow = (day + 3) % 7 + 1
        hour = us // 3_600_000_000 % 24
        key = dow * 24 + hour
        u, c = np.unique(key, return_counts=True)
        return pa.table({"k": u, "n": c.astype(np.int64)})

    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n_events"))
        .to_pandas()
        .sort_values("k")
    )
    k = out["k"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "isodow": k // 24,
            "hour": k % 24,
            "n_events": out["n_events"].to_numpy().astype(np.int64),
        }
    )


def revenue_pareto(sf_dir: str, num_buckets: int = 32):
    """Pareto cut point: the smallest k such that the top-k customers
    carry ≥ 80% of total revenue → one row (n_customers, k80, share_k80).
    The "how top-heavy is the book" number behind every account-coverage
    plan; the 80%-test is EXACT integer arithmetic (5·cum ≥ 4·total — no
    float thresholds).

    Scale shape: the per-customer exact-cents fold of
    :func:`top_customer_share`; the rank scan runs over the dim-sized
    per-customer table (sorted rev DESC, custkey tiebreak); one rounded
    division for the reported share."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    B = np.int64(num_buckets)

    def _fact(t: pa.Table) -> pa.Table:
        kk = t["l_orderkey"].to_numpy().astype(np.int64)
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        rev = cents * (100 - disc)
        order = np.argsort(kk, kind="stable")
        kk, rev = kk[order], rev[order]
        start = np.ones(len(kk), bool)
        start[1:] = kk[1:] != kk[:-1]
        idx = np.nonzero(start)[0]
        return pa.table(
            {"k": kk[start], "rev": np.add.reduceat(rev, idx),
             "cust": np.full(int(start.sum()), -1, np.int64),
             "b": (kk[start] % B).astype(np.int32)}
        )

    def _dim(t: pa.Table) -> pa.Table:
        kk = t["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {"k": kk, "rev": np.zeros(len(kk), np.int64),
             "cust": t["o_custkey"].to_numpy().astype(np.int64),
             "b": (kk % B).astype(np.int32)}
        )

    def _join(g: pa.Table) -> pa.Table:
        cust = g["cust"].to_numpy()
        dim = cust >= 0
        kk = g["k"].to_numpy()
        dk = kk[dim]
        order = np.argsort(dk)
        dk, dc = dk[order], cust[dim][order]
        fk = kk[~dim]
        pos = np.searchsorted(dk, fk)
        pos_c = np.minimum(pos, max(len(dk) - 1, 0))
        hit = dk[pos_c] == fk if len(dk) else np.zeros(len(fk), bool)
        cu = dc[pos_c[hit]]
        rv = g["rev"].to_numpy()[~dim][hit]
        u, inv = np.unique(cu, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, rv)
        return pa.table({"c_custkey": u, "rev": s})

    per_cust = (
        li.map_batches(_fact, batch_format="pyarrow")
        .union(orders.map_batches(_dim, batch_format="pyarrow"))
        .groupby("b").map_groups(_join, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    rev = per_cust["rev"].to_numpy().astype(np.int64)
    ck = per_cust["c_custkey"].to_numpy().astype(np.int64)
    order = np.lexsort((ck, -rev))
    cum = np.cumsum(rev[order])
    total = int(cum[-1]) if len(cum) else 0
    k80 = int(np.searchsorted(cum * 5, 4 * total) + 1)  # 5·cum ≥ 4·total
    share = round_half_away(
        np.array([np.float64(int(cum[k80 - 1])) / np.float64(total)]), 6
    )
    return pa.table(
        {
            "n_customers": np.array([len(rev)], np.int64),
            "k80": np.array([k80], np.int64),
            "share_k80": share,
        }
    )


def weekly_stickiness(sf_dir: str, num_buckets: int | None = None,
                      round_to: int = 6):
    """DAU/WAU stickiness per epoch week → (week, n_days_active, sum_dau,
    wau, stickiness = sum_dau/(n_days_active·wau)). THE product
    engagement ratio: 1.0 = every weekly user shows up every active day.
    Weeks are pure int64 epoch arithmetic (day // 7 — no ISO-week
    calendar logic to mirror).

    Scale shape: per-batch distinct (week, day, user) and (week, user)
    keys, ONE week-hash bucket groupby finishes both distinct counts —
    a user's rows land in its week's bucket, so the dedup is global."""
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _assign(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        week = day // 7
        dow = day % 7
        u = t["user_id"].to_numpy().astype(np.int64)
        if len(u) and (int(u.max()) >= (1 << 20) or int(week.max()) >= (1 << 40)):
            raise ValueError("weekly_stickiness: key exceeds 40/3/20-bit pack")
        # key: week | dow | user  (distinct daily-active rows)
        kd = np.unique(week << np.int64(23) | dow << np.int64(20) | u)
        return pa.table(
            {"key": kd,
             "b": ((kd >> np.int64(23)) % num_buckets).astype(np.int32)}
        )

    def _fold(g: pa.Table) -> pa.Table:
        key = np.unique(g["key"].to_numpy())
        week = key >> np.int64(23)
        dow = (key >> np.int64(20)) & np.int64(7)
        u = key & np.int64((1 << 20) - 1)
        uw, winv = np.unique(week, return_inverse=True)
        # sum of daily distinct users = count of (week,dow,user) keys
        sum_dau = np.bincount(winv, minlength=len(uw)).astype(np.int64)
        # distinct days active per week
        wd = np.unique(week << np.int64(3) | dow)
        uwd, wdcnt = np.unique(wd >> np.int64(3), return_counts=True)
        # weekly distinct users
        wu = np.unique(week << np.int64(20) | u)
        uwu, wucnt = np.unique(wu >> np.int64(20), return_counts=True)
        # uw == uwd == uwu by construction
        nd = wdcnt.astype(np.int64)
        wau = wucnt.astype(np.int64)
        return pa.table(
            {"week": uw, "n_days_active": nd, "sum_dau": sum_dau,
             "wau": wau}
        )

    out = (
        ds.map_batches(_assign, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_fold, batch_format="pyarrow")
        .to_pandas()
        .sort_values("week")
    )
    nd = out["n_days_active"].to_numpy().astype(np.int64)
    sd = out["sum_dau"].to_numpy().astype(np.int64)
    wau = out["wau"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "week": out["week"].to_numpy().astype(np.int64),
            "n_days_active": nd,
            "sum_dau": sd,
            "wau": wau,
            "stickiness": round_half_away(
                sd.astype(np.float64) / (nd * wau).astype(np.float64), round_to
            ),
        }
    )


def frequent_triples(sf_dir: str, min_support: int = 2,
                     num_buckets: int | None = None):
    """Apriori 3-itemset stage (Agrawal & Srikant VLDB'94, the level
    above :func:`basket_lift`'s pairs): every part TRIPLE bought together
    in ≥ ``min_support`` distinct orders → (p1, p2, p3, support) with
    p1 < p2 < p3. The bundle-detection signal pair lift can't see —
    a triple can be frequent while one of its pairs is mere noise.

    Scale shape: per-batch distinct (order, part) keys → ONE
    order-bucket groupby generates each basket's C(n,3) combinations
    (basket size is bounded — TPC-H ≤ 7 lines/order at ANY sf, data
    max 13 here — so the expansion is constant work per order, never
    quadratic blowup) with a local `np.unique` combiner → ONE
    triple-key-bucket groupby sums supports and applies the threshold.
    Triples pack into one int64 (3 × 21-bit part keys — guarded; at
    larger key spaces widen to the two-column (hi, lo) pack used by the
    pair ops). The ≥ min_support filter runs INSIDE the owning bucket,
    so only frequent triples ever reach the driver."""
    from itertools import combinations

    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    B = np.int64(_auto_buckets(ds, num_buckets))

    def _op(t: pa.Table) -> pa.Table:
        o = t["l_orderkey"].to_numpy().astype(np.int64)
        p = t["l_partkey"].to_numpy().astype(np.int64)
        if len(o) and (int(o.max()) >= (1 << 41) or int(p.max()) >= (1 << 21)):
            raise ValueError("frequent_triples: key exceeds the 41/21-bit pack")
        key = np.unique(o << np.int64(21) | p)
        return pa.table(
            {"key": key,
             "b": ((key >> np.int64(21)) % B).astype(np.int32)}
        )

    def _triples(g: pa.Table) -> pa.Table:
        key = np.unique(g["key"].to_numpy())
        o = key >> np.int64(21)
        p = key & np.int64((1 << 21) - 1)
        # segment per order (keys are sorted, so parts are sorted per order)
        cut = np.flatnonzero(np.r_[True, o[1:] != o[:-1]])
        ends = np.r_[cut[1:], len(o)]
        out = []
        for s, e in zip(cut, ends):
            if e - s >= 3:
                for a, bb, c in combinations(p[s:e].tolist(), 3):
                    out.append((a << 42) | (bb << 21) | c)
        if not out:
            return pa.table(
                {"tk": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
                 "b2": pa.array([], pa.int32())}
            )
        tk, n = np.unique(np.asarray(out, np.int64), return_counts=True)
        return pa.table(
            {"tk": tk, "n": n.astype(np.int64),
             "b2": (tk % B).astype(np.int32)}
        )

    def _thresh(g: pa.Table) -> pa.Table:
        tk = g["tk"].to_numpy()
        n = g["n"].to_numpy()
        utk, inv = np.unique(tk, return_inverse=True)
        s = np.zeros(len(utk), np.int64)
        np.add.at(s, inv, n)
        keep = s >= min_support
        utk, s = utk[keep], s[keep]
        m = np.int64((1 << 21) - 1)
        return pa.table(
            {"p1": (utk >> np.int64(42)) & m, "p2": (utk >> np.int64(21)) & m,
             "p3": utk & m, "support": s}
        )

    return (
        ds.map_batches(_op, batch_format="pyarrow")
        .groupby("b").map_groups(_triples, batch_format="pyarrow")
        .groupby("b2").map_groups(_thresh, batch_format="pyarrow")
        .select_columns(["p1", "p2", "p3", "support"])
    )


def etype_cooccur_lift(sf_dir: str, num_buckets: int | None = None,
                       round_to: int = 6):
    """Event-type co-occurrence lift at user-day granularity → one row
    per unordered type pair (type_a < type_b): n_days_both (distinct
    user-days seeing BOTH types) and lift = P(ab)/(P(a)·P(b)) =
    n_both·N / (n_a·n_b) over N = all distinct user-days. The
    "do errors travel with purchases" product-analytics cross-tab.

    Scale shape: per-batch distinct (user, day, type) rows → ONE
    user-bucket groupby; inside each bucket the pair counts come from a
    presence-matrix Gram product (M.T @ M over a user-day × type 0/1
    matrix — vectorized, no per-pair loop), so what leaves every bucket
    is a ≤ T×T count matrix (T = #event types, tiny by construction).
    Driver folds the constant-size partials; ONE rounded division per
    pair mirrored by the SQL (n_both·N and n_a·n_b are exact int64)."""
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["ts", "user_id", "event_type"])
    B = np.int64(_auto_buckets(ds, num_buckets))

    def _ud(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        u = t["user_id"].to_numpy().astype(np.int64)
        if len(u) and (int(u.max()) >= (1 << 41) or int(day.max()) >= (1 << 22)):
            raise ValueError("etype_cooccur_lift: key exceeds the 41/22-bit pack")
        ud = u << np.int64(22) | day
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"ud": ud, "et": et}).drop_duplicates()
        return pa.table(
            {"ud": df["ud"].to_numpy(np.int64),
             "et": pa.array(df["et"].tolist(), pa.string()),
             "b": (df["ud"].to_numpy(np.int64) % B).astype(np.int32)}
        )

    def _gram(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"ud": g["ud"].to_numpy(), "et": g["et"].to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        uds, udi = np.unique(df["ud"].to_numpy(np.int64), return_inverse=True)
        ets, eti = np.unique(df["et"].to_numpy(), return_inverse=True)
        M = np.zeros((len(uds), len(ets)), np.int64)
        M[udi, eti] = 1
        G = M.T @ M  # co-occurrence counts; diagonal = singleton counts
        ta, tb, n = [], [], []
        for i in range(len(ets)):
            for j in range(i, len(ets)):
                ta.append(str(ets[i]))
                tb.append(str(ets[j]) if j != i else "")
                n.append(int(G[i, j]))
        ta.append("")
        tb.append("")
        n.append(len(uds))  # user-day total partial
        return pa.table(
            {"ta": pa.array(ta, pa.string()), "tb": pa.array(tb, pa.string()),
             "n": pa.array(n, pa.int64())}
        )

    out = (
        ds.map_batches(_ud, batch_format="pyarrow")
        .groupby("b").map_groups(_gram, batch_format="pyarrow")
        .to_pandas()
    )
    fold = out.groupby(["ta", "tb"], as_index=False)["n"].sum()
    total = int(fold[(fold["ta"] == "") & (fold["tb"] == "")]["n"].iloc[0])
    single = {
        r.ta: int(r.n)
        for r in fold[(fold["tb"] == "") & (fold["ta"] != "")].itertuples()
    }
    pairs = fold[(fold["ta"] != "") & (fold["tb"] != "")].sort_values(
        ["ta", "tb"]
    )
    nb = pairs["n"].to_numpy(np.int64)
    na = np.array([single[t] for t in pairs["ta"]], np.int64)
    nbb = np.array([single[t] for t in pairs["tb"]], np.int64)
    return pa.table(
        {
            "type_a": pa.array(pairs["ta"].tolist(), pa.string()),
            "type_b": pa.array(pairs["tb"].tolist(), pa.string()),
            "n_days_both": nb,
            "lift": round_half_away(
                (nb * total).astype(np.float64) / (na * nbb).astype(np.float64),
                round_to,
            ),
        }
    )


def late_events(sf_dir: str, allowed_lateness_s: int = 3600,
                num_buckets: int = 64):
    """Event-time WATERMARK lateness audit (the Beam/Flink allowed-
    lateness drop rule): replay events in a deterministic SHUFFLED
    arrival order — arrival key = ``md5_lower64(event_id)`` — and flag
    every event whose ts trails the running max(ts) high watermark by
    more than ``allowed_lateness_s`` → (event_id, late_by_s), whole
    seconds, exact int64 µs arithmetic. (The events table is stored in
    event-time order, so an audit over storage order is vacuously
    empty; the md5 replay restores the out-of-order-arrival regime a
    real ingest sees, while staying reproducible and SQL-checkable.)

    Scale shape: the classic two-phase distributed prefix scan —
    (1) ONE pass folds per-arrival-range max(ts) partials (ranges are
    the top bits of the arrival hash, so they are uniform by
    construction); the driver prefix-maxes the O(#ranges) directory;
    (2) ONE range-bucketed groupby re-scans, each bucket seeding its
    running max from the broadcast directory — no global sort, and
    nothing but the directory ever leaves the workers."""
    import ray
    from ray.data.aggregate import Max

    from ..functions.hashing import md5_lower64

    ds = read_table(sf_dir, "events", columns=["event_id", "ts"])
    shift = np.uint64(64 - max(1, int(np.log2(num_buckets))))
    SENT = np.int64(np.iinfo(np.int64).min)

    def _rng(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy().astype(np.int64)
        ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        b = (md5_lower64(eid.astype(str)) >> shift).astype(np.int64)
        ub, inv = np.unique(b, return_inverse=True)
        m = np.full(len(ub), SENT, np.int64)
        np.maximum.at(m, inv, ts)
        return pa.table({"r": ub, "m": m})

    directory = (
        ds.map_batches(_rng, batch_format="pyarrow")
        .groupby("r").aggregate(Max("m", alias_name="m"))
        .to_pandas().sort_values("r")
    )
    rs = directory["r"].to_numpy(np.int64)
    ms = directory["m"].to_numpy(np.int64)
    pfx = np.full(len(rs), SENT, np.int64)
    run = int(SENT)
    for i in range(len(rs)):
        pfx[i] = run
        run = max(run, int(ms[i]))
    base = ray.put({int(r): int(p) for r, p in zip(rs, pfx)})
    lateness_us = np.int64(allowed_lateness_s) * np.int64(1_000_000)

    def _bucket(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy().astype(np.int64)
        h = md5_lower64(eid.astype(str))
        return t.append_column("h", pa.array(h.astype(np.uint64))) \
                .append_column("b", pa.array((h >> shift).astype(np.int32)))

    def _scan(g: pa.Table) -> pa.Table:
        bmap = ray.get(base)
        eid = g["event_id"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        h = g["h"].to_numpy().astype(np.uint64)
        order = np.lexsort((eid, h))
        eid, ts = eid[order], ts[order]
        seed = np.int64(bmap[int(h[order[0]] >> shift)])
        # exclusive running max of (seed, ts[0..i-1])
        prev = np.r_[seed, ts[:-1]]
        wm = np.maximum.accumulate(prev)
        valid = wm != SENT  # rows with no true predecessor are never late
        late = valid & ((wm - ts) > lateness_us)
        return pa.table(
            {
                "event_id": eid[late],
                "late_by_s": ((wm[late] - ts[late]) // np.int64(1_000_000)),
            }
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b").map_groups(_scan, batch_format="pyarrow")
    )


def weighted_sample_orders(sf_dir: str, k: int = 50, round_to: int = 6):
    """Deterministic WEIGHTED reservoir sample of ``k`` orders with
    probability ∝ o_totalprice (Efraimidis–Spirakis A-Res, IPL 2006:
    key = −ln(u)/w with u a (0,1] hash-uniform; the k SMALLEST keys win
    the exponential race) → (o_orderkey, w_cents, key). Deterministic —
    u comes from ``md5_lower64(o_orderkey)`` — so the sample is
    reproducible run-to-run AND SQL-checkable, the property that makes
    distributed sampling auditable.

    Scale shape: one stateless pass computes keys per batch and keeps a
    per-batch top-k partial; the driver folds ≤ k·#batches candidate
    rows. No shuffle, no sort of the corpus — the A-Res trick is exactly
    what lets 100 TB be sampled with a driver fold of k rows."""
    from ..functions.hashing import md5_lower64
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    M = np.float64(9007199254740992.0)  # 2^53

    def _keys(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy().astype(np.int64)
        w = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        m = (md5_lower64(ok.astype(str)) % np.uint64(1 << 53)).astype(np.float64)
        u = (m + 1.0) / M
        key = -np.log(u) / w.astype(np.float64)
        top = np.argsort(key, kind="stable")[:k]
        return pa.table(
            {"o_orderkey": ok[top], "w_cents": w[top], "key": key[top]}
        )

    cand = ds.map_batches(_keys, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["key", "o_orderkey"]).head(k)
    return pa.table(
        {
            "o_orderkey": cand["o_orderkey"].to_numpy(np.int64),
            "w_cents": cand["w_cents"].to_numpy(np.int64),
            "key": round_half_away(cand["key"].to_numpy(np.float64), round_to),
        }
    )


def revenue_outlier_days(sf_dir: str, round_to: int = 6):
    """Tukey-fence outlier DAYS of the daily-revenue series → (day,
    rev_cents, side) for days outside [q1 − 1.5·IQR, q3 + 1.5·IQR] —
    the ops-dashboard anomaly row (flash sale, outage, backfill glitch).
    Quartiles use the percentile_cont linear interpolation, written out
    as EXPLICIT arithmetic (pos = (n−1)·p; v[lo] + frac·(v[lo+1]−v[lo]))
    on exact int cents so the SQL oracle can mirror the op order
    bit-for-bit instead of trusting an opaque percentile built-in.

    Scale shape: the fact stream folds per-day cent partials (per-batch
    pre-agg + ONE day groupby); the day series is calendar-sized at any
    corpus scale, so the fence math is a constant-size driver fold."""
    from ray.data.aggregate import Sum

    li = read_table(sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice"])

    def _daily(t: pa.Table) -> pa.Table:
        day = t["l_shipdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"day": u, "c": s})

    daily = (
        li.map_batches(_daily, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("day")
    )
    day = daily["day"].to_numpy(np.int64)
    c = daily["c"].to_numpy(np.int64)
    v = np.sort(c)
    n = len(v)

    def _q(p: float) -> np.float64:
        pos = np.float64(n - 1) * np.float64(p)
        lo = int(np.floor(pos))
        frac = pos - np.float64(lo)
        hi = min(lo + 1, n - 1)
        return np.float64(v[lo]) + frac * np.float64(v[hi] - v[lo])

    q1, q3 = _q(0.25), _q(0.75)
    iqr = q3 - q1
    lo_f = q1 - np.float64(1.5) * iqr
    hi_f = q3 + np.float64(1.5) * iqr
    cf = c.astype(np.float64)
    low = cf < lo_f
    high = cf > hi_f
    side = np.where(low, "low", "high")
    keep = low | high
    return pa.table(
        {
            "day": day[keep],
            "rev_cents": c[keep],
            "side": pa.array(side[keep].tolist(), pa.string()),
        }
    )


def user_acquisition_curve(sf_dir: str, num_buckets: int | None = None):
    """User-acquisition growth curve → (day, n_new_users,
    cum_users): a user is NEW on the day of their first event; the
    cumulative column is the headline "total users ever seen" metric.

    Scale shape: per-batch (user → min day) partials → ONE user-bucket
    groupby finishes the global first-seen day (the classic min-fold);
    per-bucket day histograms fold on the driver, where the running sum
    runs over the calendar-sized day series — exact int64 end to end."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _min_day(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        u = t["user_id"].to_numpy().astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        m = np.full(len(uu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(m, inv, day)
        return pa.table(
            {"u": uu, "d": m, "b": (uu % num_buckets).astype(np.int32)}
        )

    def _fold(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy()
        d = g["d"].to_numpy()
        uu, inv = np.unique(u, return_inverse=True)
        m = np.full(len(uu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(m, inv, d)
        ud, c = np.unique(m, return_counts=True)
        return pa.table({"day": ud, "n": c.astype(np.int64)})

    out = (
        ds.map_batches(_min_day, batch_format="pyarrow")
        .groupby("b").map_groups(_fold, batch_format="pyarrow")
        .to_pandas()
    )
    agg = out.groupby("day", as_index=False)["n"].sum().sort_values("day")
    n = agg["n"].to_numpy(np.int64)
    return pa.table(
        {
            "day": agg["day"].to_numpy(np.int64),
            "n_new_users": n,
            "cum_users": np.cumsum(n),
        }
    )


def dow_revenue_anomaly(sf_dir: str, z_cut: float = 2.0, round_to: int = 6):
    """Weekday-CONDITIONED revenue anomalies → (day, rev_cents, z) for
    days whose revenue sits more than ``z_cut`` sample-stddevs from
    THEIR OWN weekday's mean — seasonality-aware outlier detection (a
    huge Saturday is normal; the same number on a Tuesday is not),
    which plain fences (:func:`revenue_outlier_days`) cannot see.

    Scale shape: per-day cent partials → ONE day groupby; the day
    series is calendar-sized, so the per-weekday moments fold driver-
    side in arbitrary-precision ints (µs-cents squares overflow int64);
    z = (n·x − S)/√(n·(n·SS − S²)/(n−1)) assembled as single IEEE ops
    on exact ints, mirrored by HUGEINT SQL, rounded half-away BEFORE
    the |z| > cut test (round-then-compare keeps the cut identical)."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    li = read_table(sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice"])

    def _daily(t: pa.Table) -> pa.Table:
        day = t["l_shipdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"day": u, "c": s})

    daily = (
        li.map_batches(_daily, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("day")
    )
    day = daily["day"].to_numpy(np.int64)
    c = daily["c"].to_numpy(np.int64)
    dow = day % 7
    days_out, cents_out, z_out = [], [], []
    for w in range(7):
        m = dow == w
        if int(m.sum()) < 2:
            continue
        xs = [int(v) for v in c[m]]
        n, S = len(xs), sum(xs)
        SS = sum(v * v for v in xs)
        varn = n * SS - S * S  # n²·sample-var·(n-1)/n... exact int
        for dd, x in zip(day[m], xs):
            num = np.float64(n * x - S)
            den = np.sqrt(np.float64(varn) * np.float64(n) / np.float64(n - 1))
            zz = round_half_away(np.array([num / den]), round_to)[0]
            if abs(zz) > z_cut:
                days_out.append(int(dd))
                cents_out.append(x)
                z_out.append(zz)
    order = np.argsort(np.asarray(days_out, np.int64)) if days_out else []
    return pa.table(
        {
            "day": np.asarray(days_out, np.int64)[order] if len(days_out)
            else np.array([], np.int64),
            "rev_cents": np.asarray(cents_out, np.int64)[order]
            if len(days_out) else np.array([], np.int64),
            "z": np.asarray(z_out, np.float64)[order] if len(days_out)
            else np.array([], np.float64),
        }
    )


def weekly_churn(sf_dir: str, num_buckets: int | None = None,
                 round_to: int = 6):
    """Weekly churn rate → (week, n_active, n_churned, churn_rate):
    a user active in epoch week w CHURNS if they have no event in week
    w+1; the last observed week is excluded (its churn is unknowable —
    right-censored). THE retention-dashboard complement to
    :func:`weekly_stickiness`.

    Scale shape: per-batch distinct (user, week) keys → ONE user-bucket
    groupby; a user's whole week set lands in one group, so the
    "has w+1" probe is a local sorted-set membership (np.isin on the
    packed keys) — no second shuffle; per-week partials fold on the
    calendar-sized driver series. churn_rate = ONE int/int division,
    rounded half-away."""
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _uw(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        wk = day // 7
        u = t["user_id"].to_numpy().astype(np.int64)
        if len(u) and (int(u.max()) >= (1 << 41) or int(wk.max()) >= (1 << 22)):
            raise ValueError("weekly_churn: key exceeds the 41/22-bit pack")
        key = np.unique(u << np.int64(22) | wk)
        return pa.table(
            {"key": key,
             "b": ((key >> np.int64(22)) % num_buckets).astype(np.int32)}
        )

    def _fold(g: pa.Table) -> pa.Table:
        key = np.unique(g["key"].to_numpy())
        wk = key & np.int64((1 << 22) - 1)
        nxt = np.isin(key + 1, key)  # same user, week+1 present?
        uw, inv = np.unique(wk, return_inverse=True)
        act = np.bincount(inv, minlength=len(uw)).astype(np.int64)
        ret = np.zeros(len(uw), np.int64)
        np.add.at(ret, inv, nxt.astype(np.int64))
        return pa.table({"week": uw, "act": act, "ret": ret})

    out = (
        ds.map_batches(_uw, batch_format="pyarrow")
        .groupby("b").map_groups(_fold, batch_format="pyarrow")
        .to_pandas()
    )
    agg = out.groupby("week", as_index=False).sum().sort_values("week")
    last = int(agg["week"].max())
    agg = agg[agg["week"] < last]
    act = agg["act"].to_numpy(np.int64)
    ret = agg["ret"].to_numpy(np.int64)
    churned = act - ret
    return pa.table(
        {
            "week": agg["week"].to_numpy(np.int64),
            "n_active": act,
            "n_churned": churned,
            "churn_rate": round_half_away(
                churned.astype(np.float64) / act.astype(np.float64), round_to
            ),
        }
    )


def bounce_rate_daily(sf_dir: str, gap_sec: int = 600,
                      num_buckets: int | None = None, round_to: int = 6):
    """Daily BOUNCE RATE → (day, n_sessions, n_bounces, bounce_rate): a
    bounce is a gap-based session (:func:`events_sessionize`, same gap
    rule) containing exactly ONE event, attributed to its start day —
    the engagement-quality headline next to the session count.

    Scale shape: rides the sessionize machine unchanged (ONE user-bucket
    shuffle, vectorized in-bucket session splits); per-batch (day,
    sessions, bounces) partials fold on the calendar-sized driver
    series; ONE rounded division per day."""
    from ..functions.rounding import round_half_away

    sess = events_sessionize(sf_dir, gap_sec=gap_sec, num_buckets=num_buckets)

    def _p(t: pa.Table) -> pa.Table:
        day = (t["session_start_us"].to_numpy() // 86_400_000_000).astype(
            np.int64
        )
        is_b = (t["n_events"].to_numpy() == 1).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        ns = np.bincount(inv, minlength=len(u)).astype(np.int64)
        nb = np.zeros(len(u), np.int64)
        np.add.at(nb, inv, is_b)
        return pa.table({"day": u, "ns": ns, "nb": nb})

    out = (
        sess.map_batches(_p, batch_format="pyarrow")
        .to_pandas()
        .groupby("day", as_index=False)
        .sum()
        .sort_values("day")
    )
    ns = out["ns"].to_numpy(np.int64)
    nb = out["nb"].to_numpy(np.int64)
    return pa.table(
        {
            "day": out["day"].to_numpy(np.int64),
            "n_sessions": ns,
            "n_bounces": nb,
            "bounce_rate": round_half_away(
                nb.astype(np.float64) / ns.astype(np.float64), round_to
            ),
        }
    )


def revenue_trend_theilsen(sf_dir: str, round_to: int = 6):
    """Theil–Sen ROBUST trend of daily revenue → one row (n_days,
    n_pairs, slope, intercept): slope = median over all day pairs of
    (rev_j − rev_i)/(day_j − day_i), intercept = median of (rev −
    slope·day) — the outlier-immune alternative to OLS (breakdown point
    29 % vs 0 %): one flash-sale day cannot bend this line.

    Scale shape: the fact stream folds per-day cent partials (ONE day
    groupby); the day series is CALENDAR-sized at any corpus scale, so
    the O(days²) pairwise-slope matrix is a constant-size driver
    computation (≈250 k float64 at a 700-day span). Each slope is ONE
    division of exact int64s; the median mirrors percentile_cont(0.5)
    (mid-pair mean for even counts) so DuckDB ``median()`` reproduces it
    bit-exactly — both sides sort the SAME float multiset."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    li = read_table(sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice"])

    def _daily(t: pa.Table) -> pa.Table:
        day = t["l_shipdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"day": u, "c": s})

    daily = (
        li.map_batches(_daily, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("day")
    )
    day = daily["day"].to_numpy(np.int64)
    c = daily["c"].to_numpy(np.int64)
    n = len(day)
    i, j = np.triu_indices(n, k=1)
    slopes = (c[j] - c[i]).astype(np.float64) / (day[j] - day[i]).astype(
        np.float64
    )

    def _median(v: np.ndarray) -> np.float64:
        v = np.sort(v)
        m = len(v)
        if m % 2:
            return v[m // 2]
        return (v[m // 2 - 1] + v[m // 2]) / np.float64(2.0)

    slope = _median(slopes)
    intercept = _median(c.astype(np.float64) - slope * day.astype(np.float64))
    return pa.table(
        {
            "n_days": np.array([n], np.int64),
            "n_pairs": np.array([len(slopes)], np.int64),
            "slope": round_half_away(np.array([slope]), round_to),
            "intercept": round_half_away(np.array([intercept]), round_to),
        }
    )


def order_value_gini(sf_dir: str, round_to: int = 6):
    """Gini coefficient of ORDER VALUES → one row (n_orders, sum_cents,
    gini): the revenue-inequality twin of :func:`degree_gini` (a gini
    jump = whale orders appearing; a collapse = order-splitting or price
    normalization upstream). G = (2·Σᵢ i·xᵢ)/(n·Σx) − (n+1)/n over exact
    cents sorted ascending, rank from the distributed sort-ordinal
    machine — NO driver-side sort; Σ i·xᵢ folds per block as exact
    int64; ONE float expression at the end, op-order-mirrored by SQL."""
    from ..functions.rounding import round_half_away
    from ..stages.sort import sort_with_ordinal

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t["o_orderkey"].to_numpy().astype(np.int64),
                "c": np.round(t["o_totalprice"].to_numpy() * 100).astype(
                    np.int64
                ),
            }
        )

    ranked = sort_with_ordinal(
        ds.map_batches(_cents, batch_format="pyarrow"), ["c", "k"],
        ordinal_col="i0",
    )

    def _moments(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy().astype(np.int64)
        i = t["i0"].to_numpy().astype(np.int64) + 1
        # rank·cents products are Python-int-folded per block so the
        # partial never clips (i·c alone nears int64 at 10⁹ orders)
        sic = sum(int(a) * int(b) for a, b in zip(i.tolist(), c.tolist()))
        return pa.table(
            {
                "n": np.array([len(c)], np.int64),
                "sc": np.array([int(c.sum())], np.int64),
                "hi": np.array([sic >> 62], np.int64),
                "lo": np.array([sic & ((1 << 62) - 1)], np.int64),
            }
        )

    m = ranked.map_batches(_moments, batch_format="pyarrow").to_pandas()
    n = int(m["n"].sum())
    sc = int(m["sc"].sum())
    sic = int(sum(int(h) * (1 << 62) + int(l) for h, l in zip(m["hi"], m["lo"])))
    gini = (2.0 * np.float64(sic)) / (np.float64(n) * np.float64(sc)) - (
        np.float64(n + 1) * 1.0 / np.float64(n)
    )
    return pa.table(
        {
            "n_orders": np.array([n], np.int64),
            "sum_cents": np.array([sc], np.int64),
            "gini": round_half_away(np.array([gini]), round_to),
        }
    )


def user_hour_entropy(sf_dir: str, num_buckets: int | None = None,
                      round_to: int = 6):
    """Hour-of-day activity entropy per user → (user_id, n_events,
    hour_entropy), nats: H = ln(n) − Σ c·ln(c)/n over the user's 24-bin
    UTC-hour histogram. Near-zero entropy = all activity in one hour —
    the cron-job/bot fingerprint :func:`user_gap_cv` reads from gap
    regularity, read here from circadian spread (humans are wide, bots
    are spikes).

    Scale shape: per-batch (user, hour) count combine → ONE user-bucket
    groupby; the per-user entropy folds a ≤24-term histogram with the
    gram_entropy closed form (exact int counts; the float ln-sum rounds
    at 1e-6, far above summation-order noise)."""
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _uh(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        hr = (us // np.int64(3_600_000_000)) % np.int64(24)
        u = t["user_id"].to_numpy().astype(np.int64)
        if len(u) and int(u.max()) >= (1 << 58):
            raise ValueError("user_hour_entropy: user_id exceeds the pack")
        key = u << np.int64(5) | hr
        uk, c = np.unique(key, return_counts=True)
        return pa.table(
            {"key": uk, "c": c.astype(np.int64),
             "b": ((uk >> np.int64(5)) % num_buckets).astype(np.int32)}
        )

    def _fold(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy()
        c = g["c"].to_numpy().astype(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        cc = np.zeros(len(uk), np.int64)
        np.add.at(cc, inv, c)
        uu, uinv = np.unique(uk >> np.int64(5), return_inverse=True)
        n = np.zeros(len(uu), np.int64)
        np.add.at(n, uinv, cc)
        clnc = np.zeros(len(uu), np.float64)
        np.add.at(clnc, uinv, cc.astype(np.float64) * np.log(cc.astype(np.float64)))
        ent = np.log(n.astype(np.float64)) - clnc / n.astype(np.float64)
        return pa.table(
            {"user_id": uu, "n_events": n,
             "hour_entropy": round_half_away(ent, round_to)}
        )

    return (
        ds.map_batches(_uh, batch_format="pyarrow")
        .groupby("b").map_groups(_fold, batch_format="pyarrow")
    )


def survival_km(sf_dir: str, num_buckets: int | None = None,
                round_to: int = 6):
    """Kaplan–Meier signup→purchase SURVIVAL curve → one row per
    distinct observed time (t_days, n_risk, n_events, survival):
    time-to-conversion in whole days from a user's first signup to
    their first purchase ON/AFTER it; users who never convert are
    RIGHT-CENSORED at the corpus's last observed day. survival =
    Π (1 − d/n) over times ≤ t — the product-limit estimator (Kaplan &
    Meier 1958), THE censoring-correct conversion curve (a plain
    conversion-rate-by-day silently drops the users still at risk).

    Scale shape: distinct (user, day, type∈{signup,purchase}) rows →
    ONE user-bucket groupby resolves each user's (time, event) pair
    vectorized; (time, d, n_at) partials fold on the day-valued driver
    series, where the running product is exp(CUMULATIVE sum of
    ln((n−d)/n)) — mirrored by a window-ORDERED SQL sum, which fixes the
    summation order on both sides (n = d at the last time uses an
    exact −1e9 sentinel that underflows exp to 0.0 identically)."""
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["ts", "user_id", "event_type"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _rows(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "signup") | (et == "purchase")
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)[keep]
        u = t["user_id"].to_numpy().astype(np.int64)[keep]
        sig = (et[keep] == "signup").astype(np.int64)
        if len(u) and (int(u.max()) >= (1 << 40) or int(day.max()) >= (1 << 22)):
            raise ValueError("survival_km: key exceeds the 40/22/1-bit pack")
        key = np.unique(u << np.int64(23) | day << np.int64(1) | sig)
        # global max day (any type) rides along as a per-batch partial —
        # on a SENTINEL row (key = −1, dropped by the fold), so a block
        # with no signup/purchase rows still contributes its max
        allday = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        mx = int(allday.max()) if len(allday) else -1
        key = np.r_[key, np.int64(-1)]
        return pa.table(
            {"key": key,
             "b": (np.abs(key >> np.int64(23)) % num_buckets).astype(np.int32),
             "mx": np.full(len(key), mx, np.int64)}
        )

    def _user_fold(g: pa.Table) -> pa.Table:
        key = np.unique(g["key"].to_numpy())
        key = key[key >= 0]  # drop the mx-carrier sentinel rows
        u = key >> np.int64(23)
        day = (key >> np.int64(1)) & np.int64((1 << 22) - 1)
        sig = (key & np.int64(1)).astype(bool)
        # first signup day per user
        su, sinv = np.unique(u[sig], return_inverse=True)
        sd = np.full(len(su), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(sd, sinv, day[sig])
        # first purchase day >= signup day, per signed-up user
        smap_idx = np.searchsorted(su, u[~sig])
        valid = (smap_idx < len(su))
        pu_u = u[~sig]
        pu_d = day[~sig]
        hit = valid & (su[np.minimum(smap_idx, max(len(su) - 1, 0))] == pu_u) \
            if len(su) else np.zeros(len(pu_u), bool)
        ge = hit & (pu_d >= sd[np.minimum(smap_idx, max(len(su) - 1, 0))])
        cu, cinv = np.unique(pu_u[ge], return_inverse=True)
        cd = np.full(len(cu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(cd, cinv, pu_d[ge])
        conv = np.full(len(su), -1, np.int64)
        pos = np.searchsorted(su, cu)
        conv[pos] = cd
        return pa.table({"u": su, "sd": sd, "cd": conv})

    import pyarrow.compute as pc

    mapped = ds.map_batches(_rows, batch_format="pyarrow")
    gmax = int(mapped.max("mx"))
    users = (
        mapped.groupby("b").map_groups(_user_fold, batch_format="pyarrow")
        .to_pandas()
    )
    sd = users["sd"].to_numpy(np.int64)
    cd = users["cd"].to_numpy(np.int64)
    ev = (cd >= 0).astype(np.int64)
    t = np.where(cd >= 0, cd - sd, gmax - sd)
    ut, inv = np.unique(t, return_inverse=True)
    d_ev = np.zeros(len(ut), np.int64)
    np.add.at(d_ev, inv, ev)
    n_at = np.bincount(inv, minlength=len(ut)).astype(np.int64)
    n_risk = np.cumsum(n_at[::-1])[::-1]
    with np.errstate(divide="ignore"):
        term = np.where(
            n_risk == d_ev,
            np.float64(-1e9),
            np.log(
                (n_risk - d_ev).astype(np.float64) / n_risk.astype(np.float64)
            ),
        )
    surv = np.exp(np.cumsum(term))
    return pa.table(
        {
            "t_days": ut,
            "n_risk": n_risk,
            "n_events": d_ev,
            "survival": round_half_away(surv, round_to),
        }
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def lineitem_corr_profile(sf_dir: str, round_to: int = 6):
    """Pairwise Pearson correlations of the numeric lineitem measures →
    (col_a, col_b, r) for the 6 unordered pairs — the data-profiling
    companion of orders_profile (a correlation a loader did not expect,
    e.g. discount↔quantity, flags a generator/join bug before training).

    Exactness: measures quantize to ints (quantity is integral; price /
    discount / tax in cents), per-batch int64 partial moments stay under
    2⁶³ (≤10⁵-row batches × price² ≈ 10¹⁸·0.1), the driver folds
    PYTHON ints (arbitrary precision — the jackknife posture), and each
    r is the assortativity cast-then-operate double expression."""
    from ..functions.rounding import round_half_away

    cols = list(_CORR_COLS)
    li = read_table(sf_dir, "lineitem", columns=cols)

    def _partial(t: pa.Table) -> pa.Table:
        X = [
            np.round(t[c].to_numpy() * (1 if c == "l_quantity" else 100))
            .astype(np.int64)
            for c in cols
        ]
        out = {"n": pa.array([t.num_rows], pa.int64())}
        for i, c in enumerate(cols):
            out[f"s{i}"] = pa.array([int(X[i].sum())], pa.int64())
            out[f"q{i}"] = pa.array([int((X[i] * X[i]).sum())], pa.int64())
        for i in range(len(cols)):
            for j in range(i + 1, len(cols)):
                out[f"p{i}{j}"] = pa.array(
                    [int((X[i] * X[j]).sum())], pa.int64()
                )
        return pa.table(out)

    parts = li.map_batches(
        _partial, batch_format="pyarrow", batch_size=100_000
    ).to_pandas()
    tot = {c: int(parts[c].sum()) for c in parts.columns}  # exact int fold
    n = tot["n"]
    ca, cb, rs = [], [], []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            sx, sy = tot[f"s{i}"], tot[f"s{j}"]
            sxx, syy, sxy = tot[f"q{i}"], tot[f"q{j}"], tot[f"p{i}{j}"]
            den = np.sqrt(
                (float(n) * float(sxx) - float(sx) * float(sx))
                * (float(n) * float(syy) - float(sy) * float(sy))
            )
            r = (
                (float(n) * float(sxy) - float(sx) * float(sy)) / den
                if den > 0
                else 0.0
            )
            ca.append(cols[i]); cb.append(cols[j]); rs.append(r)
    return pa.table(
        {
            "col_a": pa.array(ca, pa.string()),
            "col_b": pa.array(cb, pa.string()),
            "r": round_half_away(np.array(rs), round_to),
        }
    )


def basket_size_histogram(sf_dir: str):
    """Items-per-order distribution → (basket_size, n_orders): the basket
    breadth histogram behind every co-purchase density argument (the pair
    expansion cost is Σ C(basket,2) — this table prices it).
    One per-batch partial count + two bounded groupbys."""
    from ray.data.aggregate import Sum

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"])

    def _partial(t: pa.Table) -> pa.Table:
        o, c = np.unique(t["l_orderkey"].to_numpy().astype(np.int64),
                         return_counts=True)
        return pa.table({"okey": o, "c": c.astype(np.int64)})

    per_order = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("okey")
        .aggregate(Sum("c", alias_name="basket_size"))
    )

    def _hist(t: pa.Table) -> pa.Table:
        b, n = np.unique(t["basket_size"].to_numpy().astype(np.int64),
                         return_counts=True)
        return pa.table({"basket_size": b, "n": n.astype(np.int64)})

    g = (
        per_order.map_batches(_hist, batch_format="pyarrow")
        .groupby("basket_size")
        .aggregate(Sum("n", alias_name="n_orders"))
        .to_pandas()
        .sort_values("basket_size")
    )
    return pa.table(
        {
            "basket_size": g["basket_size"].to_numpy().astype(np.int64),
            "n_orders": g["n_orders"].to_numpy().astype(np.int64),
        }
    )


def markov_entropy_rate(sf_dir: str, iters: int = 8,
                        num_buckets: int | None = None, round_to: int = 6):
    """Entropy rate of the user-journey Markov chain (Shannon 1948 §7 /
    Cover-Thomas ch.4): H = Σ_i π_i · h_i with h_i = −Σ_j P_ij ln P_ij —
    how unpredictable the NEXT event is, weighted by where the chain
    actually spends its time → per-state (event_type, stationary_prob,
    row_entropy, contrib); Σ contrib is the rate. Composes the
    markov_stationary machinery (same one-shuffle transition counts,
    same 8-step unrolled π; float drift ≪ round-6)."""
    from ..functions.rounding import round_half_away

    tm = events_transition_matrix(sf_dir, num_buckets=num_buckets).to_pandas()
    agg = tm.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
    types = sorted(set(agg["from_type"]) | set(agg["to_type"]))
    tidx = {t: i for i, t in enumerate(types)}
    T = len(types)
    C = np.zeros((T, T), np.int64)
    for r in agg.itertuples():
        C[tidx[r.from_type], tidx[r.to_type]] = int(r.n)
    rowsum = C.sum(axis=1)
    if (rowsum == 0).any():
        raise ValueError("markov_entropy_rate: absorbing type (zero out-row)")
    P = C.astype(np.float64) / rowsum.astype(np.float64)[:, None]
    pi = np.full(T, 1.0 / np.float64(T))
    for _ in range(iters):
        pi = pi @ P
    with np.errstate(divide="ignore", invalid="ignore"):
        plogp = np.where(P > 0, P * np.log(np.where(P > 0, P, 1.0)), 0.0)
    row_h = -plogp.sum(axis=1)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "stationary_prob": round_half_away(pi, round_to),
            "row_entropy": round_half_away(row_h, round_to),
            "contrib": round_half_away(pi * row_h, round_to),
        }
    )


def markov_stationary(sf_dir: str, iters: int = 8,
                      num_buckets: int | None = None, round_to: int = 6):
    """Stationary distribution of the user-journey Markov chain →
    (event_type, stationary_prob): ``iters`` synchronous power-iteration
    steps of π ← πP from the uniform start, P the row-normalized
    :func:`events_transition_matrix`. Where users' attention settles if
    the observed behaviour ran forever — the one-vector summary of the
    whole transition structure.

    Scale shape: transition counts come from the one-shuffle user-bucket
    machine (|types|² partials per bucket); the chain itself is
    |types|×|types| — CONSTANT-sized — so the 8 matrix-vector steps run
    on the driver, each entry a Σ of ≤|types| products (float drift
    ~1e-15 over 8 rounds, far under the 1e-6 round; same posture as the
    centroid/entropy oracles)."""
    from ..functions.rounding import round_half_away

    tm = events_transition_matrix(sf_dir, num_buckets=num_buckets).to_pandas()
    agg = tm.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
    types = sorted(set(agg["from_type"]) | set(agg["to_type"]))
    tidx = {t: i for i, t in enumerate(types)}
    T = len(types)
    C = np.zeros((T, T), np.int64)
    for r in agg.itertuples():
        C[tidx[r.from_type], tidx[r.to_type]] = int(r.n)
    rowsum = C.sum(axis=1)
    if (rowsum == 0).any():
        raise ValueError("markov_stationary: absorbing type (zero out-row)")
    P = C.astype(np.float64) / rowsum.astype(np.float64)[:, None]
    pi = np.full(T, 1.0 / np.float64(T))
    for _ in range(iters):
        pi = pi @ P
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "stationary_prob": round_half_away(pi, round_to),
        }
    )


def customer_order_gaps(sf_dir: str, num_buckets: int | None = None,
                        round_to: int = 6):
    """Reorder-cadence profile per repeat customer → (o_custkey,
    n_orders, median_gap): exact median of the whole-day gaps between a
    customer's consecutive orders — the replenishment-cycle signal
    behind "subscribe & save" targeting; median (not mean) so one long
    vacation gap doesn't poison the cadence.

    Scale shape: ONE customer-bucket shuffle of (cust, order-day) pairs;
    a whole bucket sorts per customer vectorized (lexsort + segment
    diffs). The median uses the uniform two-rank form (v[(m+1)/2] +
    v[m/2+1])/2.0 — for odd m both ranks coincide and (v+v)/2.0 ≡ v in
    IEEE — so ONE formula mirrors the SQL bit-exactly with no odd/even
    branch divergence."""
    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    num_buckets = _auto_buckets(ds, num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy().astype(np.int64)
        day = t["o_orderdate"].to_numpy().astype("datetime64[D]").astype(
            np.int64
        )
        return pa.table(
            {"c": c, "d": day, "b": (c % num_buckets).astype(np.int32)}
        )

    def _fold(g: pa.Table) -> pa.Table:
        c = g["c"].to_numpy()
        d = g["d"].to_numpy()
        order = np.lexsort((d, c))
        c, d = c[order], d[order]
        same = np.r_[False, c[1:] == c[:-1]]
        gaps = (d[1:] - d[:-1])[same[1:]]
        gc = c[1:][same[1:]]
        cu, cnt = np.unique(gc, return_counts=True)
        starts = np.r_[0, np.cumsum(cnt)[:-1]]
        med = np.empty(len(cu), np.float64)
        for i, (s, m) in enumerate(zip(starts, cnt)):
            v = np.sort(gaps[s:s + m])
            lo, hi = (m + 1) // 2, m // 2 + 1
            med[i] = (np.float64(v[lo - 1]) + np.float64(v[hi - 1])) / 2.0
        return pa.table(
            {
                "o_custkey": cu,
                "n_orders": cnt.astype(np.int64) + 1,
                "median_gap": round_half_away(med, round_to),
            }
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b").map_groups(_fold, batch_format="pyarrow")
    )


def cohort_ltv(sf_dir: str, num_buckets: int | None = None,
               round_to: int = 6):
    """Cohort LTV curve → (cohort_week, offset_weeks, n_users,
    cum_cents, ltv_per_user): users cohorted by FIRST-SEEN epoch week
    (any event type); purchase value accumulates per week offset;
    ltv_per_user = running cents / cohort size — the
    payback-period table every acquisition-spend decision reads.
    Offsets with zero purchases are omitted (the cum carries across,
    mirroring a window over existing rows).

    Scale shape: ONE user-bucket shuffle resolves cohorts (min-week per
    user) AND per-(cohort, offset) cent partials in the same fold; the
    cohort × offset grid is calendar²-sized, so the running sum is a
    driver fold in exact int64; ONE rounded division per row."""
    from ..functions.rounding import round_half_away

    ds = read_table(
        sf_dir, "events", columns=["ts", "user_id", "event_type", "value"]
    )
    num_buckets = _auto_buckets(ds, num_buckets)

    def _rows(t: pa.Table) -> pa.Table:
        wk = (
            t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64) // 7
        )
        u = t["user_id"].to_numpy().astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        cents = np.round(t["value"].to_numpy() * 100).astype(np.int64)
        isp = (et == "purchase").astype(np.int64)
        cents = np.where(isp == 1, cents, 0)
        return pa.table(
            {"u": u, "wk": wk, "c": cents, "p": isp,
             "b": (u % num_buckets).astype(np.int32)}
        )

    def _fold(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy()
        wk = g["wk"].to_numpy()
        c = g["c"].to_numpy()
        uu, inv = np.unique(u, return_inverse=True)
        cw = np.full(len(uu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(cw, inv, wk)
        off = wk - cw[inv]
        # per-(cohort, offset) purchase cents (zero-value purchases still
        # create their grid row, mirroring the SQL GROUP BY)
        key = cw[inv] << np.int64(22) | off
        sel = g["p"].to_numpy() == 1
        ku, kinv = np.unique(key[sel], return_inverse=True)
        cs = np.zeros(len(ku), np.int64)
        np.add.at(cs, kinv, c[sel])
        # cohort sizes as marker rows (off = -1)
        cwu, cwc = np.unique(cw, return_counts=True)
        return pa.table(
            {
                "cw": np.r_[ku >> np.int64(22), cwu],
                "off": np.r_[ku & np.int64((1 << 22) - 1),
                             np.full(len(cwu), -1, np.int64)],
                "v": np.r_[cs, cwc.astype(np.int64)],
            }
        )

    out = (
        ds.map_batches(_rows, batch_format="pyarrow")
        .groupby("b").map_groups(_fold, batch_format="pyarrow")
        .to_pandas()
        .groupby(["cw", "off"], as_index=False)["v"].sum()
    )
    sizes = dict(
        zip(out[out["off"] == -1]["cw"], out[out["off"] == -1]["v"])
    )
    p = out[out["off"] >= 0].sort_values(["cw", "off"])
    cum = p.groupby("cw")["v"].cumsum().to_numpy(np.int64)
    n = np.array([int(sizes[cw]) for cw in p["cw"]], np.int64)
    return pa.table(
        {
            "cohort_week": p["cw"].to_numpy(np.int64),
            "offset_weeks": p["off"].to_numpy(np.int64),
            "n_users": n,
            "cum_cents": cum,
            "ltv_per_user": round_half_away(
                cum.astype(np.float64) / n.astype(np.float64), round_to
            ),
        }
    )


def returns_rate_by_brand(sf_dir: str, round_to: int = 6):
    """Return-rate quality screen per brand → (p_brand, n_lines,
    n_returned, return_rate): the share of a brand's lineitems flagged
    'R' — the supplier-quality dashboard row (a brand whose return rate
    detaches from the fleet is a recall in progress).

    Scale shape: part→brand is a DIMENSION — broadcast ONCE via
    ``ray.put`` (sorted partkey + brand-code arrays, read zero-copy in
    every task, never re-shipped per batch); the fact pass is one
    stateless map_batches emitting per-brand (lines, returned) int
    partials; ONE tiny groupby-sum; ONE rounded division per brand."""
    import ray
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pdf = parts.to_pandas()
    brands = np.sort(pdf["p_brand"].unique())
    bidx = {b: i for i, b in enumerate(brands)}
    pk = pdf["p_partkey"].to_numpy(np.int64)
    order = np.argsort(pk)
    ref = ray.put(
        (pk[order], pdf["p_brand"].map(bidx).to_numpy()[order].astype(np.int64))
    )

    def _partial(t: pa.Table) -> pa.Table:
        keys, codes = ray.get(ref)
        lp = t["l_partkey"].to_numpy().astype(np.int64)
        rf = t["l_returnflag"].to_numpy(zero_copy_only=False)
        code = codes[np.searchsorted(keys, lp)]
        ret = (rf == "R").astype(np.int64)
        u, inv = np.unique(code, return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        r = np.zeros(len(u), np.int64)
        np.add.at(r, inv, ret)
        return pa.table({"bc": u, "n": n, "r": r})

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_returnflag"])
    agg = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("bc")
        .aggregate(Sum("n", alias_name="n"), Sum("r", alias_name="r"))
        .to_pandas()
        .sort_values("bc")
    )
    n = agg["n"].to_numpy(np.int64)
    r = agg["r"].to_numpy(np.int64)
    return pa.table(
        {
            "p_brand": pa.array(
                [str(brands[int(b)]) for b in agg["bc"]], pa.string()
            ),
            "n_lines": n,
            "n_returned": r,
            "return_rate": round_half_away(
                r.astype(np.float64) / n.astype(np.float64), round_to
            ),
        }
    )


def degree_quantiles(sf_dir: str, qs=(0.5, 0.9, 0.99),
                     num_buckets: int | None = None, round_to: int = 6):
    """Exact quantiles of the co-purchase degree distribution →
    (quantile, n_vertices, value): the distribution corners
    (median / p90 / p99 degree) that the mean-shaped stats
    (assortativity, avg_neighbor_degree) can't see — hub inflation
    shows up here first. percentile_cont linear interpolation written
    as the explicit v[lo] + frac·(v[hi]−v[lo]) arithmetic on exact
    int64 degrees so SQL mirrors the op order.

    Scale shape: degrees fold from the edge stream (one groupby); ranks
    come from the distributed sort-ordinal machine; only the ≤ 2·|qs|
    boundary-rank rows are fetched — the driver never sees the degree
    table, just the ranks it asked for."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away
    from ..stages.sort import sort_with_ordinal

    edges = copurchase_edges(sf_dir, num_buckets=num_buckets)

    def _deg_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate([t["src"].to_numpy(), t["dst"].to_numpy()])
        u, c = np.unique(both, return_counts=True)
        return pa.table({"vid": u, "d": c.astype(np.int64)})

    deg = (
        edges.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("d", alias_name="d"))
    )
    ranked = sort_with_ordinal(deg, ["d", "vid"], ordinal_col="i0").materialize()
    n = ranked.count()
    want = {}
    for q in qs:
        pos = np.float64(n - 1) * np.float64(q)
        lo = int(np.floor(pos))
        want.setdefault(lo, None)
        want.setdefault(min(lo + 1, n - 1), None)

    wset = np.array(sorted(want), np.int64)

    def _pick(t: pa.Table) -> pa.Table:
        i = t["i0"].to_numpy().astype(np.int64)
        m = np.isin(i, wset)
        return pa.table({"i0": i[m], "d": t["d"].to_numpy()[m]})

    picked = ranked.map_batches(_pick, batch_format="pyarrow").to_pandas()
    vals = dict(zip(picked["i0"].astype(int), picked["d"].astype(int)))
    out_q, out_v = [], []
    for q in qs:
        pos = np.float64(n - 1) * np.float64(q)
        lo = int(np.floor(pos))
        hi = min(lo + 1, n - 1)
        frac = pos - np.float64(lo)
        v = np.float64(vals[lo]) + frac * np.float64(vals[hi] - vals[lo])
        out_q.append(q)
        out_v.append(v)
    return pa.table(
        {
            "quantile": np.asarray(out_q, np.float64),
            "n_vertices": np.full(len(qs), n, np.int64),
            "value": round_half_away(np.asarray(out_v, np.float64), round_to),
        }
    )


def events_acf(sf_dir: str, max_lag: int = 7, round_to: int = 6):
    """Autocorrelation panel of the DAILY event-count series → one row
    per lag 1..``max_lag`` (lag, n_pairs, acf): Pearson r between
    count(d) and count(d+lag) over calendar days that both exist — the
    weekly-seasonality fingerprint (a spike at lag 7 = weekday rhythm)
    extending :func:`revenue_autocorr`'s single lag to the panel every
    forecasting model is sanity-checked against.

    Scale shape: per-batch per-day count partials → ONE day groupby; the
    day series is calendar-sized, so the per-lag moment folds run
    driver-side in arbitrary-precision Python ints (HUGEINT SQL mirror);
    two sqrts + one division per lag."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    ds = read_table(sf_dir, "events", columns=["ts"])

    def _daily(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day": u, "c": c.astype(np.int64)})

    daily = (
        ds.map_batches(_daily, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("day")
    )
    day = daily["day"].to_numpy(np.int64)
    c = daily["c"].to_numpy(np.int64)
    nxt = dict(zip(day.tolist(), c.tolist()))
    lags, npairs, acf = [], [], []
    for lag in range(1, max_lag + 1):
        xs, ys = [], []
        for d, v in zip(day.tolist(), c.tolist()):
            if d + lag in nxt:
                xs.append(v)
                ys.append(nxt[d + lag])
        n = len(xs)
        if n < 2:
            continue
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        num = np.float64(n * sxy - sx * sy)
        den = np.sqrt(np.float64(n * sxx - sx * sx)) * np.sqrt(
            np.float64(n * syy - sy * sy)
        )
        lags.append(lag)
        npairs.append(n)
        acf.append(num / den)
    return pa.table(
        {
            "lag": np.asarray(lags, np.int64),
            "n_pairs": np.asarray(npairs, np.int64),
            "acf": round_half_away(np.asarray(acf, np.float64), round_to),
        }
    )


def order_value_trimmed_mean(sf_dir: str, trim_denom: int = 10,
                             round_to: int = 6):
    """Two-sided rank-trimmed mean of order values → ONE row (n_orders,
    n_trim, n_kept, sum_cents, trimmed_mean_cents): drop the lowest and
    highest ``n // trim_denom`` orders in the total (cents, orderkey)
    order and average the rest. The robust revenue KPI (a whale order
    or a flood of free orders moves the plain mean, not this one); the
    rank trim is the distributed-order-statistics shape — selection by
    GLOBAL sort ordinal, no driver-side sort.

    Exactness: the trim count is integer ``n // trim_denom`` (never a
    float epsilon issue), kept cents fold as exact int64 block partials,
    and the mean is ONE IEEE division at the end — hash-stable vs the
    SQL window replay. Scale shape: ``sort_with_ordinal`` (the TeraSort
    two-phase ordinal) → stateless per-block masked sums → a ≤ #blocks-
    row driver fold."""
    import pyarrow as pa

    from ..functions.rounding import round_half_away
    from ..stages.sort import sort_with_ordinal

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t["o_orderkey"].to_numpy().astype(np.int64),
                "c": np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64),
            }
        )

    cents = ds.map_batches(_cents, batch_format="pyarrow")
    n = cents.count()
    lo = n // trim_denom
    hi = n - lo

    ranked = sort_with_ordinal(cents, ["c", "k"], ordinal_col="i0")

    def _partial(t: pa.Table) -> pa.Table:
        i = t["i0"].to_numpy().astype(np.int64)
        c = t["c"].to_numpy().astype(np.int64)
        keep = (i >= lo) & (i < hi)
        return pa.table(
            {
                "n_kept": np.array([int(keep.sum())], np.int64),
                "sum_cents": np.array([int(c[keep].sum())], np.int64),
            }
        )

    parts = ranked.map_batches(_partial, batch_format="pyarrow").to_pandas()
    n_kept = int(parts["n_kept"].sum())
    sum_cents = int(parts["sum_cents"].sum())
    return pa.table(
        {
            "n_orders": pa.array([n], pa.int64()),
            "n_trim": pa.array([lo], pa.int64()),
            "n_kept": pa.array([n_kept], pa.int64()),
            "sum_cents": pa.array([sum_cents], pa.int64()),
            "trimmed_mean_cents": pa.array(
                round_half_away(
                    np.array([sum_cents / float(n_kept)]), round_to
                )
            ),
        }
    )


def session_depth_histogram(sf_dir: str, gap_sec: int = 600,
                            num_buckets: int | None = None):
    """Session-DEPTH census → (n_events_in_session, n_sessions): how many
    gap-based sessions (:func:`events_sessionize`, same gap rule) contain
    exactly 1, 2, 3, … events. The engagement-depth panel next to
    ``bounce_rate_daily`` (its depth-1 bin IS the bounce count): product
    analytics reads the whole distribution to separate crawler-like
    one-shot traffic from engaged multi-event use.

    Scale shape: rides the sessionize machine unchanged (ONE user-bucket
    shuffle, vectorized in-bucket splits); per-batch ``np.unique`` depth
    partials → ONE groupby over the tiny depth keyspace (max depth is
    bounded by a user's busiest gap-free streak, not corpus size)."""
    from ray.data.aggregate import Sum

    sess = events_sessionize(sf_dir, gap_sec=gap_sec, num_buckets=num_buckets)

    def _p(t: pa.Table) -> pa.Table:
        ne = t["n_events"].to_numpy()
        u, counts = np.unique(ne, return_counts=True)
        return pa.table(
            {
                "n_events_in_session": u.astype(np.int64),
                "ns": counts.astype(np.int64),
            }
        )

    out = (
        sess.map_batches(_p, batch_format="pyarrow")
        .groupby("n_events_in_session")
        .aggregate(Sum("ns", alias_name="n_sessions"))
        .to_pandas()
        .sort_values("n_events_in_session")
    )
    return pa.table(
        {
            "n_events_in_session": out["n_events_in_session"].to_numpy(np.int64),
            "n_sessions": out["n_sessions"].to_numpy(np.int64),
        }
    )


def revenue_bootstrap(sf_dir: str, n_resamples: int = 32, round_to: int = 6):
    """Deterministic bootstrap of mean daily revenue (Efron 1979, made
    RNG-free): resample ``b`` redraws the day list with replacement via
    the md5_number_lower bridge — draw (b, i) picks sorted-day index
    md5("b:i") % n — so both sides replay the identical resamples. →
    (resample, boot_mean_cents), one row per resample; the spread across
    rows IS the bootstrap distribution (CI = its quantiles; the jackknife
    twin ``revenue_jackknife`` carries the closed-form SE).

    Exactness: daily cents are exact ints; each resample's sum folds in
    int64 (≤ n·max_day ≪ 2⁶³); the ONLY float op per row is one division
    + round. Scale shape: the calendar-bounded day table (≤ a few
    thousand rows at ANY corpus size) is the only driver-side object;
    the B·n md5 draws are one vectorized batch."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_lower64
    from ..functions.rounding import round_half_away

    orders = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def _partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"day": u, "c": s})

    daily = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("day")
    )
    c = daily["c"].to_numpy().astype(np.int64)
    n = len(c)
    keys = np.array(
        [f"{b}:{i}" for b in range(n_resamples) for i in range(n)], dtype=object
    )
    pick = (md5_lower64(keys) % np.uint64(n)).astype(np.int64).reshape(
        n_resamples, n
    )
    sums = c[pick].sum(axis=1)
    means = round_half_away(sums.astype(np.float64) / n, round_to)
    return pa.table(
        {
            "resample": np.arange(n_resamples, dtype=np.int64),
            "boot_mean_cents": means,
        }
    )


def revenue_jackknife(sf_dir: str, round_to: int = 6):
    """Jackknife standard error of mean daily revenue (Efron 1982 §2; the
    deterministic resampling CI — bootstrap without RNG) → one row
    (n_days, total_cents, mean_daily_cents, jk_se_cents).

    Exactness: the jackknife variance for the mean collapses
    algebraically to Σ(S − n·xᵢ)² / (n³(n−1)) with S = Σxᵢ — every term
    an EXACT integer in cents (the squared deviations reach ~10²¹, folded
    in Python ints; the SQL mirror folds them in HUGEINT), so the only
    float ops are one division + sqrt + the final rounds, bit-identical
    on both sides. Scale shape: per-batch (day, cents) int partials, one
    calendar-bounded day groupby (≤ a few thousand rows at ANY corpus
    size), driver folds the day table."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    orders = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def _partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"day": u, "c": s})

    daily = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    x = [int(v) for v in daily["c"].to_numpy()]
    n, S = len(x), sum(x)
    sd2 = sum((S - n * xi) ** 2 for xi in x)
    mean = float(S) / n
    se = float(np.sqrt(float(sd2) / float(n * n * n * (n - 1)))) if n > 1 else 0.0
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "total_cents": pa.array([S], pa.int64()),
            "mean_daily_cents": pa.array(
                [float(round_half_away(mean, round_to))], pa.float64()
            ),
            "jk_se_cents": pa.array(
                [float(round_half_away(se, round_to))], pa.float64()
            ),
        }
    )


def ldiversity_customers(sf_dir: str, l: int = 3):
    """l-diversity audit (Machanavajjhala et al. 2007 — the k-anonymity
    successor): per quasi-identifier group (c_nationkey, c_mktsegment),
    the count of DISTINCT sensitive values (account-balance kilobucket
    floor(c_acctbal/1000)); a group with < l distinct sensitive values
    leaks the attribute even when k-anonymous → per-group
    (nation, segment, n_rows, n_distinct_sensitive, l_diverse).

    Scale shape: per-batch (qi, sensitive) pre-dedup partials, one
    groupby over (qi, sensitive) then one over qi — both bounded by
    |nations|×|segments|×|buckets|."""
    from ray.data.aggregate import Count, Sum

    cust = read_table(
        sf_dir, "customer", columns=["c_nationkey", "c_mktsegment", "c_acctbal"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        n = t["c_nationkey"].to_numpy().astype(np.int64)
        s = t["c_mktsegment"].to_numpy(zero_copy_only=False)
        b = np.floor(t["c_acctbal"].to_numpy() / 1000.0).astype(np.int64)
        skey, sinv = np.unique(s, return_inverse=True)
        key = (n * 64 + sinv) * 64 + (b + 16)  # acctbal buckets ≥ -16
        u, first, inv = np.unique(key, return_index=True, return_inverse=True)
        c = np.zeros(len(u), np.int64)
        np.add.at(c, inv, 1)
        first_idx = first
        return pa.table(
            {
                "nation": (u // (64 * 64)).astype(np.int64),
                "segment": pa.array([s[i] for i in first_idx], pa.string()),
                "bucket": (u % 64 - 16).astype(np.int64),
                "c": c,
            }
        )

    per_sens = (
        cust.map_batches(_partial, batch_format="pyarrow")
        .groupby(["nation", "segment", "bucket"])
        .aggregate(Sum("c", alias_name="c"))
    )
    g = (
        per_sens.groupby(["nation", "segment"])
        .aggregate(Sum("c", alias_name="n_rows"),
                   Count(alias_name="n_distinct_sensitive"))
        .to_pandas()
        .sort_values(["nation", "segment"])
    )
    nd = g["n_distinct_sensitive"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "nation": g["nation"].to_numpy().astype(np.int64),
            "segment": pa.array(g["segment"].tolist(), pa.string()),
            "n_rows": g["n_rows"].to_numpy().astype(np.int64),
            "n_distinct_sensitive": nd,
            "l_diverse": pa.array((nd >= l).tolist(), pa.bool_()),
        }
    )


def kanonymity_customers(sf_dir: str, k: int = 5):
    """k-anonymity audit of the customer table under the quasi-identifier
    pair (c_nationkey, c_mktsegment) (Sweeney 2002) → one row
    (k, n_rows, n_groups, n_violating_groups, n_exposed_rows,
    min_group_size): a group smaller than k re-identifies its members —
    n_exposed_rows is how many records a release of these columns would
    expose. The governance check you run BEFORE publishing any slice of a
    user-keyed table.

    Scale shape: per-batch packed-key group-count partials, ONE groupby
    over the quasi-identifier keyspace (bounded: |nations|×|segments|),
    driver folds the tiny group table."""
    from ray.data.aggregate import Sum

    cust = read_table(sf_dir, "customer", columns=["c_nationkey", "c_mktsegment"])

    def _partial(t: pa.Table) -> pa.Table:
        n = t["c_nationkey"].to_numpy().astype(np.int64)
        s = t["c_mktsegment"].to_numpy(zero_copy_only=False)
        skey, sinv = np.unique(s, return_inverse=True)
        key = n * 64 + sinv  # segment ids are per-batch; carry the string
        u, first, inv = np.unique(key, return_index=True, return_inverse=True)
        c = np.zeros(len(u), np.int64)
        np.add.at(c, inv, 1)
        return pa.table(
            {
                "nation": (u // 64).astype(np.int64),
                "segment": pa.array([s[i] for i in first], pa.string()),
                "c": c,
            }
        )

    g = (
        cust.map_batches(_partial, batch_format="pyarrow")
        .groupby(["nation", "segment"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    c = g["c"].to_numpy().astype(np.int64)
    viol = c < k
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "n_rows": pa.array([int(c.sum())], pa.int64()),
            "n_groups": pa.array([len(c)], pa.int64()),
            "n_violating_groups": pa.array([int(viol.sum())], pa.int64()),
            "n_exposed_rows": pa.array([int(c[viol].sum())], pa.int64()),
            "min_group_size": pa.array(
                [int(c.min()) if len(c) else 0], pa.int64()
            ),
        }
    )


def rapid_repeat_orders(sf_dir: str, max_days: int = 7, num_buckets: int = 32):
    """Burst-ordering / double-billing audit: pairs of orders by the SAME
    customer placed within ``max_days`` of each other, with the exact cent
    delta between their totals → (o1, o2, custkey, day_gap, cents_diff),
    o1 < o2 — near-zero deltas at near-zero gaps are the replayed-ingest /
    double-charge signature; the relational cousin of the text near-dup
    family.

    Scale shape: orders bucket by customer hash (ONE shuffle); pair
    expansion is vectorized per bucket over customer-sorted runs — the
    blowup is bounded by the max orders-per-customer in the window, not
    the bucket size."""
    from ..state.csr import flat_gather

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )

    def _bucket(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy().astype(np.int64)
        day = t["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "b": (c % num_buckets).astype(np.int32),
                "cust": c,
                "okey": t["o_orderkey"].to_numpy().astype(np.int64),
                "cents": cents,
                "day": day,
            }
        )

    def _pairs(g: pa.Table) -> pa.Table:
        cust = g["cust"].to_numpy()
        okey = g["okey"].to_numpy()
        cents = g["cents"].to_numpy()
        day = g["day"].to_numpy()
        order = np.lexsort((okey, day, cust))
        cu, ok, ce, dy = cust[order], okey[order], cents[order], day[order]
        first = np.concatenate([[True], cu[1:] != cu[:-1]])
        starts = np.flatnonzero(first)
        counts = np.diff(np.concatenate([starts, [len(cu)]]))
        cpe = np.repeat(counts, counts)
        li = np.repeat(np.arange(len(cu)), cpe)
        ri = flat_gather(np.repeat(starts, counts), cpe)
        m = (ok[li] < ok[ri]) & (np.abs(dy[li] - dy[ri]) <= max_days)
        li, ri = li[m], ri[m]
        return pa.table(
            {
                "o1": pa.array(ok[li], pa.int64()),
                "o2": pa.array(ok[ri], pa.int64()),
                "custkey": pa.array(cu[li], pa.int64()),
                "day_gap": pa.array(
                    np.abs(dy[li] - dy[ri]).astype(np.int64), pa.int64()
                ),
                "cents_diff": pa.array(
                    np.abs(ce[li] - ce[ri]).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        orders.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_pairs, batch_format="pyarrow")
    )


def orders_profile(sf_dir: str):
    """Classic column profiler over the orders table → one row per column
    (col, n_rows, n_distinct, min_val, max_val) — the first scan a data
    engineer runs on an unknown table (key candidates, ranges, row
    parity). Values are normalized to DOUBLE (dates as epoch days) so the
    profile is one typed frame.

    Scale shape: ONE pass emits per-batch (col, n, min, max) partials plus
    per-batch-deduped (col, value) rows; distinct counts fold via a
    (col, value) groupby then per-col partial sums — the exact
    COUNT DISTINCT pushdown of distinct_users_daily, per column."""
    from ray.data.aggregate import Max, Min, Sum

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    )

    def _num(t: pa.Table) -> dict:
        return {
            "o_orderkey": t["o_orderkey"].to_numpy().astype(np.float64),
            "o_custkey": t["o_custkey"].to_numpy().astype(np.float64),
            "o_totalprice": t["o_totalprice"].to_numpy().astype(np.float64),
            "o_orderdate": t["o_orderdate"]
            .to_numpy()
            .astype("datetime64[D]")
            .astype(np.int64)
            .astype(np.float64),
        }

    def _stats(t: pa.Table) -> pa.Table:
        cols = _num(t)
        names = sorted(cols)
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n": pa.array([len(cols[c]) for c in names], pa.int64()),
                "mn": pa.array([float(cols[c].min()) for c in names]),
                "mx": pa.array([float(cols[c].max()) for c in names]),
            }
        )

    def _vals(t: pa.Table) -> pa.Table:
        cols = _num(t)
        names = sorted(cols)
        out_c, out_v = [], []
        for c in names:
            u = np.unique(cols[c])
            out_c.extend([c] * len(u))
            out_v.append(u)
        return pa.table(
            {
                "col": pa.array(out_c, pa.string()),
                "v": np.concatenate(out_v) if out_v else np.array([], np.float64),
            }
        )

    stats = (
        orders.map_batches(_stats, batch_format="pyarrow")
        .groupby("col")
        .aggregate(
            Sum("n", alias_name="n_rows"),
            Min("mn", alias_name="min_val"),
            Max("mx", alias_name="max_val"),
        )
        .to_pandas()
        .set_index("col")
    )

    def _cnt(t: pa.Table) -> pa.Table:
        c = t["col"].to_numpy(zero_copy_only=False)
        u, counts = np.unique(c, return_counts=True)
        return pa.table(
            {"col": pa.array(list(u), pa.string()),
             "d": pa.array(counts, pa.int64())}
        )

    nd = (
        orders.map_batches(_vals, batch_format="pyarrow")
        .groupby(["col", "v"])
        .aggregate(Sum("v", alias_name="x"))  # dedupe (col, v)
        .map_batches(_cnt, batch_format="pyarrow")
        .groupby("col")
        .aggregate(Sum("d", alias_name="n_distinct"))
        .to_pandas()
        .set_index("col")
    )
    names = sorted(stats.index)
    return pa.table(
        {
            "col": pa.array(names, pa.string()),
            "n_rows": pa.array(
                [int(stats.loc[c, "n_rows"]) for c in names], pa.int64()
            ),
            "n_distinct": pa.array(
                [int(nd.loc[c, "n_distinct"]) for c in names], pa.int64()
            ),
            "min_val": pa.array([float(stats.loc[c, "min_val"]) for c in names]),
            "max_val": pa.array([float(stats.loc[c, "max_val"]) for c in names]),
        }
    )


def fd_audit(sf_dir: str):
    """Functional-dependency audit (the Metanome-style profiling check) →
    one row per candidate FD (fd, n_lhs, n_violating, holds): an FD X→Y
    holds iff no X-group contains two distinct Y values. Candidates span
    the three base tables: c_custkey→c_nationkey (a key — must hold),
    o_custkey→o_orderpriority and l_orderkey→l_returnflag (expected
    violated — repeat customers change priority, multi-line orders mix
    return flags).

    Scale shape per FD: per-batch-deduped (lhs, rhs) pairs → ONE groupby
    fold → per-batch partial (n_lhs, n_violating) counts — the exact
    COUNT DISTINCT pushdown, then two numbers per block."""
    from ray.data.aggregate import Sum

    def _one(ds, lhs: str, rhs_key) -> tuple:
        def _pairs(t: pa.Table) -> pa.Table:
            a = t[lhs].to_numpy().astype(np.int64)
            r = rhs_key(t)
            order = np.lexsort((r, a))
            a_s, r_s = a[order], r[order]
            first = np.ones(len(a_s), bool)
            first[1:] = (a_s[1:] != a_s[:-1]) | (r_s[1:] != r_s[:-1])
            return pa.table({"l": a_s[first], "r": r_s[first]})

        def _cnt(t: pa.Table) -> pa.Table:
            l = t["l"].to_numpy()
            u, counts = np.unique(l, return_counts=True)
            return pa.table(
                {
                    "n_lhs": pa.array([len(u)], pa.int64()),
                    "n_viol": pa.array([int((counts > 1).sum())], pa.int64()),
                }
            )

        def _lpart(t: pa.Table) -> pa.Table:
            l = t["l"].to_numpy()
            u, counts = np.unique(l, return_counts=True)
            return pa.table({"l": u, "c": pa.array(counts, pa.int64())})

        def _fold(t: pa.Table) -> pa.Table:
            c = t["c"].to_numpy()
            return pa.table(
                {
                    "n_lhs": pa.array([len(c)], pa.int64()),
                    "n_viol": pa.array([int((c > 1).sum())], pa.int64()),
                }
            )

        parts = (
            ds.map_batches(_pairs, batch_format="pyarrow")
            .groupby(["l", "r"])
            .aggregate(Sum("l", alias_name="x"))  # dedupe pairs
            .map_batches(_lpart, batch_format="pyarrow")
            .groupby("l")
            .aggregate(Sum("c", alias_name="c"))
            .map_batches(_fold, batch_format="pyarrow")
            .to_pandas()
        )
        return int(parts["n_lhs"].sum()), int(parts["n_viol"].sum())

    def _strkey(col):
        def _k(t: pa.Table) -> np.ndarray:
            # hash the STRING so rhs codes are global across batches (the
            # stated md5-collision caveat applies, 2^-64)
            from ..functions.hashing import md5_lower64

            s = t[col].to_numpy(zero_copy_only=False)
            return md5_lower64(s.astype(str)).view(np.int64)

        return _k

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
    rows = [
        ("c_custkey->c_nationkey",
         *_one(cust, "c_custkey", lambda t: t["c_nationkey"].to_numpy().astype(np.int64))),
        ("o_custkey->o_orderpriority",
         *_one(orders, "o_custkey", _strkey("o_orderpriority"))),
        ("l_orderkey->l_returnflag",
         *_one(li, "l_orderkey", _strkey("l_returnflag"))),
    ]
    return pa.table(
        {
            "fd": pa.array([r[0] for r in rows], pa.string()),
            "n_lhs": pa.array([r[1] for r in rows], pa.int64()),
            "n_violating": pa.array([r[2] for r in rows], pa.int64()),
            "holds": pa.array([r[2] == 0 for r in rows], pa.bool_()),
        }
    )


def ucc_audit(sf_dir: str):
    """Unique-column-combination audit over orders (the third Metanome
    profiling primitive, next to FD — :func:`fd_audit` — and IND —
    ``fk_integrity``) → one row per candidate combo
    (combo, n_rows, n_distinct, is_unique): which column sets could serve
    as a key. Candidates: custkey, orderdate, (custkey, orderdate),
    (custkey, totalprice).

    Scale shape: values normalize to int64 (dates as epoch days, prices
    as exact cents), combos pack into one int64 key, per-batch key dedup
    pushes the distinct down, ONE groupby per combo folds, per-batch
    partial counts cross the exchange."""
    from ray.data.aggregate import Sum

    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def _keys(t: pa.Table) -> dict:
        c = t["o_custkey"].to_numpy().astype(np.int64)
        d = t["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        p = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        # loud width guard (round 5): a silently truncated combo key would
        # merge distinct (custkey, x) pairs and understate distinct counts
        if len(c) and (
            int(c.max()) >= (1 << 31)
            or int(d.max()) >= (1 << 32)
            or int(p.max()) >= (1 << 32)
        ):
            raise ValueError("fd/ucc audit: combo key exceeds 64-bit pack")
        return {
            "o_custkey": c,
            "o_orderdate": d,
            "o_custkey,o_orderdate": (c << np.int64(32)) | d,
            "o_custkey,o_totalprice": (c << np.int64(32)) | p,
        }

    names = [
        "o_custkey",
        "o_orderdate",
        "o_custkey,o_orderdate",
        "o_custkey,o_totalprice",
    ]

    def _partial(t: pa.Table) -> pa.Table:
        ks = _keys(t)
        combo, key, n = [], [], []
        for i, name in enumerate(names):
            u = np.unique(ks[name])
            combo.extend([i] * len(u))
            key.append(u)
            n.append(len(ks[name]))
        return pa.table(
            {
                "combo": pa.array(combo, pa.int64()),
                "key": np.concatenate(key),
            }
        )

    def _rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array([t.num_rows], pa.int64())}
        )

    n_rows = int(
        orders.map_batches(_rows, batch_format="pyarrow").to_pandas()["n"].sum()
    )

    def _cnt(t: pa.Table) -> pa.Table:
        c = t["combo"].to_numpy()
        u, counts = np.unique(c, return_counts=True)
        return pa.table(
            {"combo": u.astype(np.int64), "d": pa.array(counts, pa.int64())}
        )

    nd = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby(["combo", "key"])
        .aggregate(Sum("key", alias_name="x"))  # dedupe (combo, key)
        .map_batches(_cnt, batch_format="pyarrow")
        .groupby("combo")
        .aggregate(Sum("d", alias_name="n_distinct"))
        .to_pandas()
        .set_index("combo")
    )
    dist = [int(nd.loc[i, "n_distinct"]) for i in range(len(names))]
    return pa.table(
        {
            "combo": pa.array(names, pa.string()),
            "n_rows": pa.array([n_rows] * len(names), pa.int64()),
            "n_distinct": pa.array(dist, pa.int64()),
            "is_unique": pa.array([d == n_rows for d in dist], pa.bool_()),
        }
    )


def edge_backbone(sf_dir: str, k: int = 5, num_buckets: int = 32):
    """Degree-bounded graph sparsification: keep each vertex's top-k
    strongest co-purchase edges (weight = co-order count, ties broken by
    neighbor id) and union both endpoints' selections → (src, dst,
    n_orders, n_directions) with src < dst and n_directions ∈ {1, 2}
    recording whether one or both endpoints ranked the edge. The standard
    backbone step BEFORE an expensive all-pairs / centrality pass at
    scale — it bounds every vertex's degree at k while provably keeping
    each vertex connected to its strongest partners (union semantics never
    orphan a vertex that has any edge).

    Scale shape: symmetric weighted edges bucket by src hash (ONE
    shuffle); per-src ranking is a vectorized lexsort + run-position mask
    per bucket; canonical pairs fold with one groupby counting directions.
    Pure integers — bit-exact at any parallelism."""
    from ray.data.aggregate import Count, Min

    we = copurchase_weights(sf_dir).map_batches(
        lambda t: t.rename_columns(["src", "dst", "w"]), batch_format="pyarrow"
    )

    def _sym(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        w = t["w"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "src": np.concatenate([s, d]),
                "dst": np.concatenate([d, s]),
                "w": np.concatenate([w, w]),
            }
        )

    def _bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "b", pa.array((t["src"].to_numpy() % num_buckets).astype(np.int32))
        )

    def _topk(g: pa.Table) -> pa.Table:
        s = g["src"].to_numpy()
        d = g["dst"].to_numpy()
        w = g["w"].to_numpy()
        order = np.lexsort((d, -w, s))
        s_o, d_o, w_o = s[order], d[order], w[order]
        first = np.concatenate([[True], s_o[1:] != s_o[:-1]])
        starts = np.flatnonzero(first)
        seg = np.cumsum(first) - 1
        pos = np.arange(len(s_o)) - starts[seg]
        keep = pos < k
        lo = np.minimum(s_o[keep], d_o[keep])
        hi = np.maximum(s_o[keep], d_o[keep])
        return pa.table(
            {"u": lo, "v": hi, "w": w_o[keep]}
        )

    return (
        we.map_batches(_sym, batch_format="pyarrow")
        .map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_topk, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Min("w", alias_name="n_orders"), Count(alias_name="n_directions"))
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t["u"],
                    "dst": t["v"],
                    "n_orders": t["n_orders"],
                    "n_directions": t["n_directions"].to_numpy().astype(np.int64),
                }
            ),
            batch_format="pyarrow",
        )
    )


def disparity_filter(sf_dir: str, alpha: float = 0.05, num_buckets: int = 32):
    """Serrano–Boguñá–Vespignani (PNAS 2009) multiscale backbone of the
    weighted co-purchase graph → (src, dst, n_orders, p_min, keep): for
    each edge direction, p = (1 − w/s_u)^(k_u − 1) is the probability a
    uniformly-random weight split of vertex u would give this edge at
    least its observed share; keep the edge iff min over both directions
    of the ROUNDED p is < α. Unlike a global weight threshold this keeps
    locally-significant weak edges — the principled backbone next to the
    degree-bounded :func:`edge_backbone`.

    Scale shape: ONE pass, ZERO joins — the symmetric emission buckets by
    src, and because ALL of u's edges co-locate in u's bucket, s_u = Σw
    and k_u = deg(u) are computed per run inside the bucket and applied to
    its edges in place; the per-direction p's fold to canonical pairs with
    one groupby Min. k = 1 vertices give p = 1 (never significant on that
    side), the paper's convention."""
    from ray.data.aggregate import Min

    from ..functions.rounding import round_half_away

    we = copurchase_weights(sf_dir).map_batches(
        lambda t: t.rename_columns(["src", "dst", "w"]), batch_format="pyarrow"
    )

    def _sym(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        w = t["w"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "src": np.concatenate([s, d]),
                "dst": np.concatenate([d, s]),
                "w": np.concatenate([w, w]),
                "b": pa.array(
                    (np.concatenate([s, d]) % num_buckets).astype(np.int32)
                ),
            }
        )

    def _pvals(g: pa.Table) -> pa.Table:
        s = g["src"].to_numpy()
        d = g["dst"].to_numpy()
        w = g["w"].to_numpy().astype(np.float64)
        order = np.lexsort((d, s))
        s_o, d_o, w_o = s[order], d[order], w[order]
        first = np.concatenate([[True], s_o[1:] != s_o[:-1]])
        seg = np.cumsum(first) - 1
        ssum = np.add.reduceat(w_o, np.flatnonzero(first))
        kdeg = np.add.reduceat(np.ones_like(w_o), np.flatnonzero(first))
        p = np.power(1.0 - w_o / ssum[seg], kdeg[seg] - 1.0)
        lo = np.minimum(s_o, d_o)
        hi = np.maximum(s_o, d_o)
        return pa.table(
            {
                "u": lo,
                "v": hi,
                "w": w_o.astype(np.int64),
                "p": round_half_away(p, 6),
            }
        )

    return (
        we.map_batches(_sym, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_pvals, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Min("w", alias_name="n_orders"), Min("p", alias_name="p_min"))
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t["u"],
                    "dst": t["v"],
                    "n_orders": t["n_orders"],
                    "p_min": t["p_min"],
                    "keep": pa.array(t["p_min"].to_numpy() < alpha),
                }
            ),
            batch_format="pyarrow",
        )
    )


def dow_seasonal_index(sf_dir: str, round_to: int = 6):
    """Classical ratio-to-moving-average weekly seasonal decomposition
    (the textbook X-11 precursor) of the daily event count series →
    (isodow, n_days, seasonal_index): for every interior day, the ratio
    of its count to the CENTERED 7-day moving average, averaged per ISO
    weekday — index > 1 marks structurally-busy weekdays; feeding these
    into a forecast de-seasonalizes it.

    Scale shape: per-batch (day, n) int partials, ONE calendar-bounded
    day groupby (≤ a few thousand rows at any corpus size), the driver
    folds the day table; ratios and means mirror the oracle's operand
    tree (centered window = AVG OVER 3 PRECEDING..3 FOLLOWING on the
    DENSE day series — missing days count 0 — with edge days dropped)."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    ev = read_table(sf_dir, "events", columns=["ts"])

    def _partial(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day": u, "n": pa.array(c, pa.int64())})

    daily = (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("day")
    )
    days = daily["day"].to_numpy().astype(np.int64)
    cnt = daily["n"].to_numpy().astype(np.float64)
    # dense series over [min, max] with zeros for missing days
    lo, hi = int(days.min()), int(days.max())
    dense = np.zeros(hi - lo + 1, np.float64)
    dense[days - lo] = cnt
    idx = np.arange(lo, hi + 1, dtype=np.int64)
    # centered 7-day MA; drop 3 edge days each side
    if len(dense) < 7:
        return pa.table(
            {
                "isodow": pa.array([], pa.int64()),
                "n_days": pa.array([], pa.int64()),
                "seasonal_index": pa.array([], pa.float64()),
            }
        )
    ma = np.convolve(dense, np.ones(7), mode="valid") / 7.0
    mid = idx[3:-3]
    ratio_ok = ma > 0
    ratios = dense[3:-3][ratio_ok] / ma[ratio_ok]
    dows = ((mid[ratio_ok] + 3) % 7 + 1).astype(np.int64)
    out_d, out_n, out_s = [], [], []
    for dow in range(1, 8):
        m = dows == dow
        if not m.any():
            continue
        out_d.append(dow)
        out_n.append(int(m.sum()))
        out_s.append(float(round_half_away(ratios[m].sum() / m.sum(), round_to)))
    return pa.table(
        {
            "isodow": pa.array(out_d, pa.int64()),
            "n_days": pa.array(out_n, pa.int64()),
            "seasonal_index": pa.array(out_s, pa.float64()),
        }
    )


def granger_daily(sf_dir: str, type_x: str = "view", type_y: str = "purchase",
                  round_to: int = 6):
    """Granger (1969) 1-lag causality F-test between two event types'
    daily count series, BOTH directions → (direction, n, f_stat): does
    yesterday's `view` activity explain today's `purchase` count beyond
    purchase's own history (and vice versa)? The classic product-analytics
    lead-indicator test.

    Exactness: all regression moments fold from EXACT integer daily
    counts over the dense calendar (missing days = 0); the closed-form
    RSS of the restricted (y~y₋₁) and full (y~y₋₁+x₋₁) OLS fits use
    scale-invariant n-scaled centered moments, so the only float ops are
    the final few divisions — operand-tree-mirrored by the oracle.
    Scale shape: per-batch (day, type) partials, one calendar-bounded
    groupby, driver folds the day table (the jackknife posture)."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def _partial(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        typ = t["event_type"].to_numpy(zero_copy_only=False)
        out_day, out_x, out_y = [], [], []
        for name, arr in (("x", day[typ == type_x]), ("y", day[typ == type_y])):
            u, c = np.unique(arr, return_counts=True)
            out_day.extend(u.tolist())
            out_x.extend((c if name == "x" else np.zeros_like(c)).tolist())
            out_y.extend((c if name == "y" else np.zeros_like(c)).tolist())
        return pa.table(
            {
                "day": pa.array(out_day, pa.int64()),
                "x": pa.array(out_x, pa.int64()),
                "y": pa.array(out_y, pa.int64()),
            }
        )

    daily = (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("x", alias_name="x"), Sum("y", alias_name="y"))
        .to_pandas()
        .sort_values("day")
    )
    days = daily["day"].to_numpy().astype(np.int64)
    lo, hi = int(days.min()), int(days.max())
    dx = np.zeros(hi - lo + 1, np.int64)
    dy = np.zeros(hi - lo + 1, np.int64)
    dx[days - lo] = daily["x"].to_numpy()
    dy[days - lo] = daily["y"].to_numpy()

    def _f(y: np.ndarray, x: np.ndarray) -> float:
        yt = [int(v) for v in y[1:]]
        y1 = [int(v) for v in y[:-1]]
        x1 = [int(v) for v in x[:-1]]
        n = len(yt)
        if n < 4:
            return 0.0
        Sy, Sy1, Sx1 = sum(yt), sum(y1), sum(x1)
        Syy = sum(a * a for a in yt)
        S11 = sum(a * a for a in y1)
        Sxx = sum(a * a for a in x1)
        Sy_y1 = sum(a * b for a, b in zip(yt, y1))
        Sy_x1 = sum(a * b for a, b in zip(yt, x1))
        S1x = sum(a * b for a, b in zip(y1, x1))
        CYY = n * Syy - Sy * Sy
        C11 = n * S11 - Sy1 * Sy1
        CXX = n * Sxx - Sx1 * Sx1
        C1Y = n * Sy_y1 - Sy1 * Sy
        CXY = n * Sy_x1 - Sx1 * Sy
        C1X = n * S1x - Sy1 * Sx1
        if C11 <= 0:
            return 0.0
        rss_r = CYY - C1Y * C1Y / C11
        det = C11 * CXX - C1X * C1X
        if det <= 0:
            return 0.0
        beta = (CXX * C1Y - C1X * CXY) / det
        gamma = (C11 * CXY - C1X * C1Y) / det
        rss_f = CYY - beta * C1Y - gamma * CXY
        if rss_f <= 0:
            return 0.0
        return (rss_r - rss_f) / (rss_f / (n - 3))

    n_pairs = len(dy) - 1
    return pa.table(
        {
            "direction": pa.array(
                [f"{type_x}->{type_y}", f"{type_y}->{type_x}"], pa.string()
            ),
            "n": pa.array([n_pairs, n_pairs], pa.int64()),
            "f_stat": pa.array(
                [
                    float(round_half_away(_f(dy, dx), round_to)),
                    float(round_half_away(_f(dx, dy), round_to)),
                ],
                pa.float64(),
            ),
        }
    )


# Attribution channels = every event type except the conversion event,
# derived from the module-wide domain so a schema extension to
# _EVENT_TYPES flows through instead of silently diverging.
_ATTR_CHANNELS = sorted(t for t in _EVENT_TYPES if t != "purchase")


def markov_attribution(sf_dir: str, iters: int = 32, round_to: int = 6,
                       num_buckets: int = 32):
    """Markov-chain removal-effect attribution (Anderl et al. 2014 — the
    data-driven alternative to last-touch) → (channel, p_conv,
    removal_effect): build each user's journey (events ordered by
    (ts, event_id) up to the FIRST purchase → 'conv', else ending in
    'null'), estimate the transition matrix over states {start, channels,
    conv, null}, compute P(conv | start) by ``iters`` rounds of absorbing-
    chain value iteration, and for each channel recompute it with that
    channel removed (its incoming probability mass re-routed to null —
    the standard removal semantics). removal_effect(c) = 1 −
    P₋c/P_full; the FULL row carries the baseline.

    Scale shape: journeys form inside user-hash buckets (ONE shuffle;
    per-user sequence logic loops inside the bucket); only (from, to)
    transition-count partials cross the exchange (≤ 7×7 rows per batch);
    the driver folds a ≤49-row matrix and iterates a 6-vector — the
    cluster cost is one user groupby regardless of corpus size. Fixed
    ``iters`` keeps the float iteration SQL-replayable (contraction ⇒
    extra rounds change nothing at round-6)."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    ev = read_table(sf_dir, "events", columns=["ts", "event_id", "user_id", "event_type"])

    def _bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "b",
            pa.array((t["user_id"].to_numpy().astype(np.int64) % num_buckets)
                     .astype(np.int32)),
        )

    def _transitions(g: pa.Table) -> pa.Table:
        import collections

        u = g["user_id"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy().astype(np.int64)
        typ = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        cnt: dict = collections.Counter()
        i = 0
        n = len(u)
        while i < n:
            j = i
            prev = "start"
            while j < n and u[order[j]] == u[order[i]]:
                st = typ[order[j]]
                if st == "purchase":
                    cnt[(prev, "conv")] += 1
                    prev = None
                    # skip the rest of this user's events
                    while j < n and u[order[j]] == u[order[i]]:
                        j += 1
                    break
                cnt[(prev, st)] += 1
                prev = st
                j += 1
            if prev is not None:
                cnt[(prev, "null")] += 1
            i = j
        if not cnt:
            return pa.table(
                {"f": pa.array([], pa.string()), "t": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        ks = sorted(cnt)
        return pa.table(
            {
                "f": pa.array([a for a, _ in ks], pa.string()),
                "t": pa.array([b for _, b in ks], pa.string()),
                "n": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    tc = (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_transitions, batch_format="pyarrow")
        .groupby(["f", "t"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    # tc is sketch-sized — ≤ (len(_ATTR_CHANNELS)+2)² transition rows —
    # and the row-source normalization is one vectorized transform
    p = tc["n"].astype(float) / tc.groupby("f")["n"].transform("sum").astype(float)
    probs: dict = dict(zip(zip(tc["f"], tc["t"]), p))

    transients = ["start"] + _ATTR_CHANNELS

    def _pconv(removed: str | None) -> float:
        p = {s: 0.0 for s in transients}
        for _ in range(iters):
            new = {}
            for s in transients:
                acc = 0.0
                for t in ["conv"] + _ATTR_CHANNELS:
                    pr = probs.get((s, t), 0.0)
                    if pr == 0.0:
                        continue
                    if t == "conv":
                        acc += pr
                    elif t != removed:
                        acc += pr * p[t]
                new[s] = acc
            p = new
        return p["start"]

    full = _pconv(None)
    rows = [("FULL", full, 0.0)]
    for c in _ATTR_CHANNELS:
        pc = _pconv(c)
        re = 1.0 - pc / full if full > 0 else 0.0
        rows.append((c, pc, re))
    return pa.table(
        {
            "channel": pa.array([r[0] for r in rows], pa.string()),
            "p_conv": pa.array(
                [float(round_half_away(r[1], round_to)) for r in rows]
            ),
            "removal_effect": pa.array(
                [float(round_half_away(r[2], round_to)) for r in rows]
            ),
        }
    )


def shapley_attribution(sf_dir: str, round_to: int = 6, num_buckets: int = 32):
    """Shapley-value channel attribution (the cooperative-game dual of
    :func:`markov_attribution`; Shapley 1953 applied to conversion
    credit) → (channel, shapley): the characteristic function is
    v(S) = (converting journeys whose touched-channel set ⊆ S) / (ALL
    journeys) — the conversion-COVERAGE coalition value (the simplified-
    Shapley form that stays informative even when overall conversion is
    near-certain; Σφ = v(C) − v(∅) = the channel-attributable
    conversion share), and each channel's
    credit is the exact 4-player Shapley sum
    φ_c = Σ_{S ⊆ C∖{c}} |S|!·(|C|−|S|−1)!/|C|! · (v(S∪{c}) − v(S)).

    Scale shape: the SAME bucketed journey pass as markov_attribution,
    but each journey folds to a (channel-bitmask, converted) pair — only
    ≤ 32 partial rows per batch cross the exchange; the driver folds the
    32-row game table and evaluates the closed-form Shapley sum. Weights
    are exact rationals evaluated in double (|C| = 4 ⇒ denominators 24);
    v ratios are one division each — the oracle mirrors every operand."""
    from math import factorial

    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    ev = read_table(sf_dir, "events", columns=["ts", "event_id", "user_id", "event_type"])
    chan_ix = {c: i for i, c in enumerate(_ATTR_CHANNELS)}

    def _bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "b",
            pa.array((t["user_id"].to_numpy().astype(np.int64) % num_buckets)
                     .astype(np.int32)),
        )

    def _journeys(g: pa.Table) -> pa.Table:
        import collections

        u = g["user_id"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy().astype(np.int64)
        typ = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        cnt: dict = collections.Counter()
        i, n = 0, len(u)
        while i < n:
            j = i
            mask, conv = 0, 0
            while j < n and u[order[j]] == u[order[i]]:
                st = typ[order[j]]
                if st == "purchase":
                    conv = 1
                    while j < n and u[order[j]] == u[order[i]]:
                        j += 1
                    break
                ix = chan_ix.get(st)  # unknown states degrade gracefully
                if ix is not None:    # (markov_attribution tolerates them too)
                    mask |= 1 << ix
                j += 1
            cnt[(mask, conv)] += 1
            i = j
        ks = sorted(cnt)
        return pa.table(
            {
                "mask": pa.array([a for a, _ in ks], pa.int64()),
                "conv": pa.array([b for _, b in ks], pa.int64()),
                "n": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    game = (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_journeys, batch_format="pyarrow")
        .groupby(["mask", "conv"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    nch = len(_ATTR_CHANNELS)
    num = np.zeros(1 << nch, np.int64)
    total = int(game["n"].sum())
    # v(S) numerator = Σ_{journey masks m ⊆ S} n(m, conv=1): scatter the
    # converting journey counts onto their masks, then a subset-sum (zeta)
    # transform — nch·2^nch int adds, exact and vectorized per bit
    cv = game[game["conv"] != 0]
    np.add.at(
        num,
        cv["mask"].to_numpy().astype(np.int64),
        cv["n"].to_numpy().astype(np.int64),
    )
    idx = np.arange(1 << nch)
    for b in range(nch):
        has = (idx & (1 << b)) != 0
        num[has] += num[idx[has] ^ (1 << b)]

    def v(S: int) -> float:
        return num[S] / total if total > 0 else 0.0

    rows = []
    fact = [factorial(i) for i in range(nch + 1)]
    for c in _ATTR_CHANNELS:
        bit = 1 << chan_ix[c]
        phi = 0.0
        for S in range(1 << nch):
            if S & bit:
                continue
            s = bin(S).count("1")
            w = fact[s] * fact[nch - s - 1] / fact[nch]
            phi += w * (v(S | bit) - v(S))
        rows.append((c, float(round_half_away(phi, round_to))))
    return pa.table(
        {
            "channel": pa.array([r[0] for r in rows], pa.string()),
            "shapley": pa.array([r[1] for r in rows], pa.float64()),
        }
    )
