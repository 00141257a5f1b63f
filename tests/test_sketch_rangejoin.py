"""Targeted tests for the time-range join and the HyperLogLog sketch.

(The driver-gate mirror in test_entry_contract.py additionally checks both
against their DuckDB oracles on the real sf0.001 tables.)
"""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from subgraph_isomorphism_pregel_ray.pipelines.sketch import (
    _LOW_BITS,
    _LOW_MASK,
    _M,
    _bit_length_u64,
    _hll_fold,
    hll_estimate,
)


# ---- range join -----------------------------------------------------------


def _brute_range_join(ts_us, etype, eid, cents, w_us):
    out = []
    for i in np.nonzero(etype == "purchase")[0]:
        m = (
            (etype == "click")
            & (ts_us >= ts_us[i] - w_us)
            & (ts_us < ts_us[i])
        )
        out.append((eid[i], int(m.sum()), int(cents[m].sum()) / 100.0))
    out.sort()
    return out


def test_events_range_join_boundaries_vs_brute_force(ray_session, tmp_path):
    """Window edges land exactly on [ts-W, ts) and on bucket boundaries:
    inclusive lower, exclusive upper, replication across adjacent buckets."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_range_join

    w_us = 600 * 1_000_000
    base = 1_700_000_000_000_000  # not bucket-aligned
    rng = np.random.default_rng(5)
    n = 400
    ts_us = base + rng.integers(0, 50 * w_us, n)
    # force the exact edge cases: build at probe-W (in), at probe (out),
    # just inside the next bucket, and a probe on a bucket boundary
    probe_a = (ts_us[0] // w_us + 1) * w_us  # bucket-aligned probe
    ts_us = np.concatenate(
        [ts_us, [probe_a, probe_a - w_us, probe_a - 1, probe_a, probe_a + 1]]
    )
    etype = np.array(
        list(rng.choice(["purchase", "click", "view"], n))
        + ["purchase", "click", "click", "click", "click"],
        dtype=object,
    )
    eid = np.arange(len(ts_us), dtype=np.int64)
    cents = rng.integers(1, 50_000, len(ts_us))
    pq.write_table(
        pa.table(
            {
                "event_id": eid,
                "ts": ts_us.astype("datetime64[us]"),
                "user_id": np.zeros(len(eid), np.int64),
                "event_type": etype,
                "value": cents / 100.0,
                "props": np.array([""] * len(eid), dtype=object),
            }
        ),
        tmp_path / "events.parquet",
    )
    got = (
        events_range_join(str(tmp_path), window_sec=600)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = _brute_range_join(ts_us, etype, eid, cents.astype(np.int64), w_us)
    assert len(got) == len(exp)
    assert got["event_id"].tolist() == [e[0] for e in exp]
    assert got["n_prior"].tolist() == [e[1] for e in exp]
    assert got["sum_prior"].tolist() == [e[2] for e in exp]
    # the crafted probe saw the build AT ts-W but not the one AT ts
    row = got[got["event_id"] == n].iloc[0]
    crafted_in = {n + 1, n + 2}  # at probe-W and probe-1
    brute_n = exp[[e[0] for e in exp].index(n)][1]
    assert row["n_prior"] == brute_n and brute_n >= len(crafted_in)


# ---- HLL ------------------------------------------------------------------


def test_bit_length_exact():
    rng = np.random.default_rng(0)
    xs = np.concatenate(
        [
            rng.integers(0, 2**63, 500, dtype=np.uint64),
            (np.uint64(1) << np.arange(64, dtype=np.uint64)),
            (np.uint64(1) << np.arange(1, 64, dtype=np.uint64)) - np.uint64(1),
            np.array([0, 2**53, 2**53 + 1, 2**64 - 1], dtype=np.uint64),
        ]
    )
    got = _bit_length_u64(xs)
    exp = np.array([int(v).bit_length() for v in xs], dtype=np.int64)
    assert np.array_equal(got, exp)


def test_hll_fold_is_mergeable():
    """Registers from one fold == max-merge of the folds of any split —
    the property that makes per-batch partials + groupby-max exact."""
    rng = np.random.default_rng(1)
    day = rng.integers(0, 4, 5000)
    h = rng.integers(0, 2**64, 5000, dtype=np.uint64)

    def dense(day_, h_):
        regs = {}
        d, b, r = _hll_fold(day_, h_)
        for i in range(len(d)):
            regs[(int(d[i]), int(b[i]))] = int(r[i])
        return regs

    whole = dense(day, h)
    merged = {}
    for sl in (slice(0, 1700), slice(1700, 3100), slice(3100, 5000)):
        for k, v in dense(day[sl], h[sl]).items():
            merged[k] = max(merged.get(k, 0), v)
    assert whole == merged


def test_hll_estimate_accuracy():
    """n distinct md5-hashed ids → estimate within 3 standard errors
    (1.04/√m ≈ 6.5%) across a cardinality sweep."""
    for n in (150, 1000, 20000):
        h = np.array(
            [
                int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little")
                for i in range(n)
            ],
            dtype=np.uint64,
        )
        _, b, r = _hll_fold(np.zeros(n, np.int64), h)
        regs = np.zeros(_M, np.int64)
        regs[b] = r
        est = hll_estimate(regs)
        assert abs(est - n) / n < 3 * 1.04 / np.sqrt(_M), (n, est)


def test_hll_rho_matches_spec():
    # bucket = top 8 bits, rho = CLZ of low 56 bits + 1, capped at 57
    h = np.array([0, 1, _LOW_MASK, np.uint64(1) << np.uint64(55)], dtype=np.uint64)
    _, b, r = _hll_fold(np.zeros(4, np.int64), h)
    # all four hash to bucket 0 → one surviving max register
    assert list(b) == [0]
    assert list(r) == [57]  # h==0 → low==0 → rho = 57 wins the max


def test_minhash_hot_bucket_cap(ray_session):
    """300 identical docs collide in every band; cap=50 must keep exactly the
    smallest 50 doc ids per bucket → C(50,2) verified pairs, all jaccard 1."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.dedup import minhash_lsh_pairs

    n, cap = 300, 50
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": ["the exact same document text repeated verbatim"] * n,
        }
    )
    out = minhash_lsh_pairs(
        rd.from_arrow(t).repartition(7), threshold=0.5, max_bucket=cap
    ).to_pandas()
    assert len(out) == cap * (cap - 1) // 2
    assert (out["jaccard"] == 1.0).all()
    assert out["doc_a"].max() < cap and out["doc_b"].max() < cap


def test_events_hopping_covers_tumbling(ray_session, tmp_path):
    """Each event appears in exactly window/hop windows; the hop-aligned
    window that EQUALS the tumbling window start matches events_window."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import numpy as np
    import pandas as pd

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        events_hopping,
        events_window,
    )

    rng = np.random.default_rng(2)
    n = 500
    ts = pd.to_datetime(rng.integers(0, 5000, n), unit="s")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, 9, n).astype(np.int64),
            "event_type": "x",
            "value": rng.normal(size=n),
            "props": "",
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "events.parquet")
    sf = str(tmp_path)

    hop = events_hopping(sf, window_sec=600, hop_sec=300).to_pandas()
    tum = events_window(sf, window_sec=300).to_pandas()
    # total event-window memberships = 2 × events
    assert hop["n_events"].sum() == 2 * n
    # exact replay: per event, windows are (epoch//300 - j)*300 for j in 0,1
    epoch = df["ts"].astype("int64") // 1_000_000
    expect = pd.concat(
        [
            pd.DataFrame(
                {
                    "user_id": df["user_id"],
                    "wstart": (epoch // 300 - j) * 300,
                    "value": df["value"],
                }
            )
            for j in (0, 1)
        ]
    ).groupby(["user_id", "wstart"], as_index=False).agg(
        n_events=("value", "size")
    )
    got = hop.sort_values(["user_id", "wstart"]).reset_index(drop=True)
    exp = expect.sort_values(["user_id", "wstart"]).reset_index(drop=True)
    assert np.array_equal(got["n_events"].values, exp["n_events"].values)
    assert len(tum) <= len(hop)


def test_events_rolling_vs_pandas(ray_session):
    """Rolling mean == pandas groupby.rolling over the same (ts, event_id)
    order, including short user prefixes (< window rows)."""
    import pandas as pd

    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_rolling
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    got = events_rolling(sf, window_rows=5).to_pandas().set_index("event_id")["rolling_avg"]
    ev = read_table(sf, "events", columns=["event_id", "ts", "user_id", "value"]).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    exp = (
        ev.groupby("user_id")["value"]
        .rolling(5, min_periods=1).mean().reset_index(level=0, drop=True)
    )
    ev["exp"] = exp
    assert len(got) == len(ev)
    for eid, e in zip(ev["event_id"], ev["exp"]):
        assert abs(got[eid] - e) < 1e-6, eid


def test_events_funnel_vs_python_brute(ray_session):
    """Funnel steps_completed == a per-user Python replay of the windowed
    first-touch rule (signup→view→click→purchase, 48 h per transition)."""
    import pandas as pd

    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_funnel
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    got = (
        events_funnel(sf)
        .to_pandas()
        .set_index("user_id")["steps_completed"]
        .to_dict()
    )
    ev = read_table(sf, "events", columns=["user_id", "ts", "event_type"]).to_pandas()
    steps = ("signup", "view", "click", "purchase")
    win = pd.Timedelta(hours=48)
    exp = {}
    for uid, g in ev.groupby("user_id"):
        tprev = None
        n = 0
        for stp in steps:
            sel = g[g.event_type == stp]
            if tprev is not None:
                sel = sel[(sel.ts > tprev) & (sel.ts <= tprev + win)]
            if len(sel) == 0:
                break
            tprev = sel.ts.min()
            n += 1
        exp[uid] = n
    assert got == exp
    assert len(set(exp.values())) > 1  # the fixture exercises real drop-off


def test_events_retention_vs_pandas_brute(ray_session):
    """Retention cohorts == a pandas replay (first day per user, distinct
    active days, offset histogram)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_retention
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    got = (
        events_retention(sf)
        .to_pandas()
        .sort_values(["cohort_day", "offset_days"])
        .reset_index(drop=True)
    )
    ev = read_table(sf, "events", columns=["user_id", "ts"]).to_pandas()
    ev["day"] = (ev.ts.values.astype("datetime64[D]").astype("int64"))
    act = ev[["user_id", "day"]].drop_duplicates()
    first = act.groupby("user_id")["day"].min().rename("cohort")
    act = act.join(first, on="user_id")
    act["offset"] = act["day"] - act["cohort"]
    exp = (
        act.groupby(["cohort", "offset"])
        .size()
        .reset_index(name="n_users")
        .sort_values(["cohort", "offset"])
        .reset_index(drop=True)
    )
    assert (got["cohort_day"].values == exp["cohort"].values).all()
    assert (got["offset_days"].values == exp["offset"].values).all()
    assert (got["n_users"].values == exp["n_users"].values).all()
    assert got["offset_days"].max() > 0  # a real multi-day curve


def test_events_percent_rank_ties(ray_session, tmp_path):
    """percent_rank with forced TIES: equal values share the minimum rank
    (SQL rank semantics); single-event user gets 0."""
    import pandas as pd

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        events_percent_rank,
    )

    df = pd.DataFrame(
        {
            "event_id": np.arange(8, dtype=np.int64),
            "ts": pd.to_datetime(np.arange(8), unit="s"),
            "user_id": np.array([1, 1, 1, 1, 1, 2, 2, 3], dtype=np.int64),
            "event_type": "x",
            "value": [5.0, 1.0, 5.0, 2.0, 9.0, 4.0, 4.0, 7.0],
            "props": "",
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    got = (
        events_percent_rank(str(tmp_path))
        .to_pandas()
        .set_index("event_id")["pr"]
        .to_dict()
    )
    # user 1 values [5,1,5,2,9] → ranks [3,1,3,2,5] → pr (r-1)/4
    # user 2 values [4,4] → both rank 1 → pr 0; user 3 single → 0
    assert got == {
        0: 0.5, 1: 0.0, 2: 0.5, 3: 0.25, 4: 1.0, 5: 0.0, 6: 0.0, 7: 0.0,
    }


def test_fk_integrity_detects_injected_orphans(ray_session, tmp_path):
    """The audit counts exactly the injected orphan keys (and distinct
    child keys) on a synthetic star slice — proving detection, since the
    shipped tables audit clean."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import fk_integrity

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 3, 99, 98, 99], pa.int64()),
                "l_partkey": pa.array([10, 11, 10, 12, 10, 11, 12], pa.int64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table({"o_orderkey": pa.array([1, 2, 3, 4], pa.int64())}),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table({"p_partkey": pa.array([10, 11], pa.int64())}),
        tmp_path / "part.parquet",
    )
    rels = (
        ("li.ok->o.ok", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("li.pk->p.pk", "lineitem", "l_partkey", "part", "p_partkey"),
    )
    got = (
        fk_integrity(str(tmp_path), relations=rels)
        .to_pandas()
        .set_index("relation")
    )
    assert got.loc["li.ok->o.ok", "n_keys"] == 5  # 1,2,3,98,99
    assert got.loc["li.ok->o.ok", "n_orphans"] == 2  # 98,99
    assert got.loc["li.pk->p.pk", "n_keys"] == 3
    assert got.loc["li.pk->p.pk", "n_orphans"] == 1  # 12


# ---- bottom-k quantile sketch ----------------------------------------------


def test_quantile_sketch_error_bound_vs_exact(ray_session):
    """Sample-quantile deviation vs the exact distributed quantiles stays
    within the classic ~1/sqrt(k) band (loose 5x factor) on real data."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_quantiles
    from subgraph_isomorphism_pregel_ray.pipelines.sketch import (
        quantile_sketch_events,
    )

    sf = "/root/testdata/sf0.001"
    est = (
        quantile_sketch_events(sf, k=256)
        .to_pandas()
        .set_index(["event_type", "quantile"])["value_est"]
    )
    exact = (
        events_quantiles(sf)
        .to_pandas()
        .set_index(["event_type", "quantile"])["value"]
    )
    # compare as RANK error: the estimated quantile's rank in the exact
    # distribution must be within 5/sqrt(256) of the target quantile
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "value"])
    df = ev.to_pandas()
    for (etype, q), v in est.items():
        vals = np.sort(df[df.event_type == etype]["value"].to_numpy())
        rank = np.searchsorted(vals, v) / max(len(vals) - 1, 1)
        assert abs(rank - q) < 5 / np.sqrt(256), (etype, q, rank)


def test_quantile_sketch_parallelism_invariant(ray_session, tmp_path):
    """Bottom-k merge = union + re-cut: the sketch is identical at any
    batch split (deterministic hash sample, not a random reservoir)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.sketch import (
        quantile_sketch_events,
    )

    sf = "/root/testdata/sf0.001"
    a = quantile_sketch_events(sf).to_pandas().sort_values(
        ["event_type", "quantile"]
    ).reset_index(drop=True)
    # same table, forced through many tiny blocks
    t = pq.read_table(f"{sf}/events.parquet")
    pq.write_table(t, tmp_path / "events.parquet", row_group_size=37)
    b = quantile_sketch_events(str(tmp_path)).to_pandas().sort_values(
        ["event_type", "quantile"]
    ).reset_index(drop=True)
    assert a.equals(b)


def test_events_zscore_vs_pandas(ray_session):
    """z == (n·c − S)/√(n·SS − S²) over the previous ≤W same-user events,
    replayed per row in pandas; gate rows (n_prev < min_n, zero variance)
    are exactly 0."""
    import pandas as pd

    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_zscore
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    W, MINN = 7, 3
    got = (
        events_zscore(sf, window_rows=W, min_n=MINN)
        .to_pandas()
        .set_index("event_id")
    )
    ev = read_table(sf, "events", columns=["event_id", "ts", "user_id", "value"]).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    ev["c"] = np.round(ev.value * 100).astype(np.int64)
    n_checked_gated = 0
    for _, grp in ev.groupby("user_id"):
        c = grp["c"].to_numpy()
        for i, eid in enumerate(grp["event_id"]):
            w = c[max(0, i - W) : i]
            npv, S, SS = len(w), int(w.sum()), int((w * w).sum())
            disc = npv * SS - S * S
            if npv >= MINN and disc > 0:
                exp = float(round_half_away(np.array([(npv * c[i] - S) / np.sqrt(disc)]), 6)[0])
            else:
                exp = 0.0
                n_checked_gated += 1
            assert got.loc[eid, "zscore"] == exp, eid
            assert got.loc[eid, "n_prev"] == npv
    assert n_checked_gated > 0  # short prefixes actually exercised


def test_events_path_trigrams_vs_python(ray_session):
    from collections import Counter

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        events_path_trigrams,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    got = events_path_trigrams(sf).to_pandas()
    ev = read_table(sf, "events", columns=["event_id", "ts", "user_id", "event_type"]).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    exp: Counter = Counter()
    for _, grp in ev.groupby("user_id"):
        t = list(grp.event_type)
        for i in range(2, len(t)):
            exp[(t[i - 2], t[i - 1], t[i])] += 1
    assert {(r.t1, r.t2, r.t3): r.n for r in got.itertuples()} == dict(exp)


def test_events_ema_vs_python(ray_session):
    """EMA equals the literal per-user recurrence (same float op order)."""
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_ema
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    a = 0.25
    got = events_ema(sf, alpha=a).to_pandas().set_index("event_id")["ema"]
    ev = read_table(sf, "events", columns=["event_id", "ts", "user_id", "value"]).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    for _, grp in ev.groupby("user_id"):
        y = None
        for eid, x in zip(grp.event_id, grp.value):
            y = x if y is None else a * x + (1 - a) * y
            assert got[eid] == round_half_away(np.array([y]), 6)[0], eid


def test_user_gap_cv_bot_vs_human(ray_session, tmp_path):
    """A metronomic (bot) user scores cv ≈ 0; a bursty user scores high;
    values equal the scalar moment computation on whole-second gaps."""
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.relational import user_gap_cv

    base = np.datetime64("2025-06-01T00:00:00", "us")
    rows = []
    # bot: exactly every 30 s × 10 events
    for i in range(10):
        rows.append((i, base + np.timedelta64(30 * i, "s"), 1, "view", 0.0, "{}"))
    # human: bursty gaps
    t = base
    for i, g in enumerate([2, 300, 5, 1200, 1, 90, 3600, 10, 50]):
        t = t + np.timedelta64(g, "s")
        rows.append((100 + i, t, 2, "view", 0.0, "{}"))
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    got = user_gap_cv(str(d), min_gaps=5).to_pandas().set_index("user_id")
    assert got.loc[1, "cv"] == 0.0 and got.loc[1, "n_gaps"] == 9  # metronome
    # gaps between the human's consecutive events (the first delta anchors t0)
    g = np.array([300, 5, 1200, 1, 90, 3600, 10, 50], dtype=np.float64)
    n, S, SS = len(g), g.sum(), (g * g).sum()
    exp_cv = float(round_half_away(np.array([np.sqrt(n * SS - S * S) / S]), 6)[0])
    assert got.loc[2, "cv"] == exp_cv and exp_cv > 1.0  # bursty human


def test_user_type_entropy_vs_scipy_style(ray_session, tmp_path):
    """Uniform 4-type user scores ln 4; single-type user scores 0; values
    equal the scalar Shannon computation."""
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        user_type_entropy,
    )

    base = np.datetime64("2025-06-01T00:00:00", "us")
    rows = []
    for i, t in enumerate(["a", "b", "c", "d"] * 3):  # user 1: uniform 4-type
        rows.append((i, 1, t))
    for i in range(5):                                  # user 2: single type
        rows.append((100 + i, 2, "view"))
    for i, t in enumerate(["x"] * 9 + ["y"]):           # user 3: 90/10
        rows.append((200 + i, 3, t))
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([base + np.timedelta64(i, "s") for i in range(len(rows))], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    got = user_type_entropy(str(d)).to_pandas().set_index("user_id")
    # scalar references
    h1 = np.log(12.0) - (4 * 3 * np.log(3.0)) / 12.0   # uniform over 4 types
    h3 = np.log(10.0) - (9 * np.log(9.0) + 1 * np.log(1.0)) / 10.0
    assert got.loc[1, "entropy"] == float(round_half_away(np.array([h1]), 6)[0])
    assert abs(got.loc[1, "entropy"] - np.log(4)) < 1e-6
    assert got.loc[2, "entropy"] == 0.0 and got.loc[2, "n_types"] == 1
    assert got.loc[3, "entropy"] == float(round_half_away(np.array([h3]), 6)[0])


def test_session_conversion_vs_python(ray_session):
    """Per-day conversion equals a scalar sessionize + any-purchase replay."""
    from collections import defaultdict

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        session_conversion,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    GAP = 600
    got = session_conversion(sf, gap_sec=GAP).to_pandas().set_index("day")
    ev = read_table(sf, "events", columns=["event_id", "ts", "user_id", "event_type"]).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    days = defaultdict(lambda: [0, 0])
    for _, grp in ev.groupby("user_id"):
        ts = grp.ts.astype("datetime64[us]").astype("int64").to_numpy()
        ty = grp.event_type.to_numpy()
        start, conv = 0, False
        for i in range(1, len(ts) + 1):
            if i == len(ts) or ts[i] - ts[i - 1] > GAP * 1_000_000:
                day = int(ts[start] // 86_400_000_000)
                days[day][0] += 1
                days[day][1] += int((ty[start:i] == "purchase").any())
                start = i
    for day, (n, c) in days.items():
        assert got.loc[day, "n_sessions"] == n
        assert got.loc[day, "n_converted"] == c
    assert len(got) == len(days)


def test_events_cusum_vs_python(ray_session):
    """CUSUM equals the literal per-user recurrence max(0, s + (x − k)),
    same float op order; alarms fire above h on the unrounded statistic."""
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_cusum
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    k, h = 60.0, 200.0
    got = events_cusum(sf, k_ref=k, h=h).to_pandas().set_index("event_id")
    ev = read_table(
        sf, "events", columns=["event_id", "ts", "user_id", "value"]
    ).to_pandas().sort_values(["user_id", "ts", "event_id"])
    n_alarm = 0
    for _, grp in ev.groupby("user_id"):
        s = None
        for eid, x in zip(grp.event_id, grp.value):
            s = max(0.0, (x - k)) if s is None else max(0.0, s + (x - k))
            assert got.loc[eid, "cusum"] == round_half_away(np.array([s]), 6)[0]
            assert got.loc[eid, "alarm"] == (s > h)
            n_alarm += int(s > h)
    assert n_alarm > 0  # the fixture actually exercises the alarm branch


def test_events_holt_vs_python(ray_session):
    """Holt level/trend equal the literal per-user recurrence with the
    same float op order (dyadic α, β)."""
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_holt
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    a, b = 0.25, 0.125
    got = events_holt(sf, alpha=a, beta=b).to_pandas().set_index("event_id")
    ev = read_table(
        sf, "events", columns=["event_id", "ts", "user_id", "value"]
    ).to_pandas().sort_values(["user_id", "ts", "event_id"])
    for _, grp in ev.groupby("user_id"):
        l = t = None
        for eid, x in zip(grp.event_id, grp.value):
            if l is None:
                l, t = x, 0.0
            else:
                l_new = a * x + (1 - a) * (l + t)
                t = b * (l_new - l) + (1 - b) * t
                l = l_new
            assert got.loc[eid, "level"] == round_half_away(np.array([l]), 6)[0]
            assert got.loc[eid, "trend"] == round_half_away(np.array([t]), 6)[0]


def test_events_disorder_counts_inversions(ray_session, tmp_path):
    """Hand-built stream: user 1 perfectly ordered (tau 1); user 2 fully
    reversed (tau -1); short users dropped."""
    import pyarrow.parquet as pq

    base = np.datetime64("2025-06-01T00:00:00", "us")
    rows = []
    for i in range(6):  # user 1: ts increases with event_id
        rows.append((100 + i, base + np.timedelta64(i, "m"), 1))
    for i in range(6):  # user 2: ts decreases as event_id increases
        rows.append((200 + i, base - np.timedelta64(i, "m"), 2))
    rows.append((300, base, 3))  # user 3: too short, dropped
    eid, ts, uid = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts": pa.array(np.array(ts, "datetime64[us]")),
                "user_id": pa.array(uid, pa.int64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_disorder

    got = events_disorder(str(tmp_path)).to_pandas().set_index("user_id")
    assert got.loc[1, "n_inversions"] == 0 and got.loc[1, "tau"] == 1.0
    assert got.loc[2, "n_inversions"] == 15 and got.loc[2, "tau"] == -1.0
    assert 3 not in got.index


def test_window_distinct_users_dedups_within_window(ray_session, tmp_path):
    """Same user twice in one hour counts once; windows split on the
    hour boundary."""
    import pyarrow.parquet as pq

    t0 = np.datetime64("2025-06-01T10:00:00", "us")
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(
                    np.array(
                        [t0, t0 + np.timedelta64(10, "m"),
                         t0 + np.timedelta64(20, "m"),
                         t0 + np.timedelta64(61, "m")],
                        "datetime64[us]",
                    )
                ),
                "user_id": pa.array([1, 1, 2, 1], pa.int64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        window_distinct_users,
    )

    got = window_distinct_users(str(tmp_path)).to_pandas().sort_values(
        "window_start"
    ).reset_index(drop=True)
    assert len(got) == 2
    assert got.iloc[0]["n_events"] == 3 and got.iloc[0]["n_users"] == 2
    assert got.iloc[1]["n_events"] == 1 and got.iloc[1]["n_users"] == 1


def test_user_activity_streaks_islands(ray_session, tmp_path):
    """User 1: days {1,2,3, 7,8} -> longest 3, active 5; user 2: single
    day; duplicate events on one day count once."""
    import pyarrow.parquet as pq

    days = ["2025-06-01", "2025-06-02", "2025-06-03", "2025-06-07",
            "2025-06-08", "2025-06-01"]
    uid = [1, 1, 1, 1, 1, 1]  # last row duplicates day 1
    days += ["2025-06-05"]
    uid += [2]
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(np.array(days, "datetime64[us]")),
                "user_id": pa.array(uid, pa.int64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        user_activity_streaks,
    )

    got = user_activity_streaks(str(tmp_path)).to_pandas().set_index("user_id")
    assert got.loc[1, "n_active_days"] == 5
    assert got.loc[1, "longest_streak"] == 3
    assert got.loc[2, "longest_streak"] == 1


def test_conversion_latency_first_after_trigger(ray_session, tmp_path):
    """Purchase BEFORE the first view doesn't count; the first purchase
    at/after it does; non-converters excluded."""
    import pyarrow.parquet as pq

    t0 = np.datetime64("2025-06-01T00:00:00", "us")
    rows = [
        (t0 - np.timedelta64(60, "s"), 1, "purchase"),  # before first view
        (t0, 1, "view"),
        (t0 + np.timedelta64(90, "s"), 1, "purchase"),  # counts: 90 s
        (t0 + np.timedelta64(500, "s"), 1, "purchase"),  # later, ignored
        (t0, 2, "view"),                                 # never converts
        (t0, 3, "purchase"),                             # no view at all
    ]
    ts, uid, et = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(np.array(ts, "datetime64[us]")),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(et),
            }
        ),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        conversion_latency,
    )

    got = conversion_latency(str(tmp_path)).to_pandas().iloc[0]
    assert got["n_converters"] == 1
    assert got["total_latency_sec"] == 90
    assert got["avg_latency_sec"] == 90.0


def test_events_mad_known_values(ray_session, tmp_path):
    """values {1..5}: median 3, deviations {2,1,0,1,2} -> MAD 1; even-n
    interpolation checked with {1,2,3,10}: median 2.5, devs
    {1.5,.5,.5,7.5} -> MAD 1.0."""
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_mad

    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(5), pa.int64()),
             "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0])}
        ),
        tmp_path / "events.parquet",
    )
    got = events_mad(str(tmp_path)).to_pandas().iloc[0]
    assert got["median"] == 3.0 and got["mad"] == 1.0

    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(4), pa.int64()),
             "value": pa.array([1.0, 2.0, 3.0, 10.0])}
        ),
        tmp_path / "events.parquet",
    )
    got = events_mad(str(tmp_path)).to_pandas().iloc[0]
    assert got["median"] == 2.5 and got["mad"] == 1.0


def test_weekly_stickiness_formula(ray_session, tmp_path):
    """2 users, one week: u1 active 2 days, u2 active 1 day -> sum_dau 3,
    wau 2, days 2 -> stickiness 3/(2*2) = 0.75."""
    import pyarrow.parquet as pq

    base = np.datetime64("2025-06-02T10:00:00", "us")  # Monday
    rows = [
        (base, 1), (base, 1),                            # u1 day0 (dup)
        (base + np.timedelta64(1, "D"), 1),              # u1 day1
        (base + np.timedelta64(1, "D"), 2),              # u2 day1
    ]
    ts, uid = zip(*rows)
    pq.write_table(
        pa.table(
            {"ts": pa.array(np.array(ts, "datetime64[us]")),
             "user_id": pa.array(uid, pa.int64())}
        ),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        weekly_stickiness,
    )

    got = weekly_stickiness(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_days_active"] == 2 and row["sum_dau"] == 3 and row["wau"] == 2
    assert row["stickiness"] == 0.75


def test_frequent_triples_threshold(ray_session, tmp_path):
    """Orders {1,2,3,4}, {1,2,3}, {1,2,3,9}, {5,6,7}: triple (1,2,3)
    support 3; every other triple support 1 -> filtered at min 2."""
    import pyarrow.parquet as pq

    orders = [(10, [1, 2, 3, 4]), (11, [1, 2, 3]), (12, [1, 2, 3, 9]),
              (13, [5, 6, 7]), (14, [8])]
    ok, pk = [], []
    for o, parts in orders:
        for p in parts:
            ok.append(o)
            pk.append(p)
            ok.append(o)  # duplicate lineitem row: distinct-ness must hold
            pk.append(p)
    pq.write_table(
        pa.table(
            {"l_orderkey": pa.array(ok, pa.int64()),
             "l_partkey": pa.array(pk, pa.int64())}
        ),
        tmp_path / "lineitem.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        frequent_triples,
    )

    got = frequent_triples(str(tmp_path), num_buckets=4).to_pandas()
    assert len(got) == 1
    assert tuple(got.iloc[0]) == (1, 2, 3, 3)
    # threshold 1 keeps every triple: C(4,3)*2 distinct + (1,2,3) folded
    all_t = frequent_triples(str(tmp_path), min_support=1,
                             num_buckets=4).to_pandas()
    # distinct triples: 4 from {1,2,3,4}, 3 NEW from {1,2,3,9}, 1 from
    # {5,6,7}; {1,2,3} adds none
    assert len(all_t) == 4 + 3 + 1
    assert all_t["support"].sum() == 4 + 4 + 1 + 1


def test_etype_cooccur_lift_formula(ray_session, tmp_path):
    """3 user-days: types {a,b}, {a}, {b} -> pair (a,b): n_both=1,
    lift = 1*3/(2*2) = 0.75."""
    import pyarrow.parquet as pq

    base = np.datetime64("2025-06-02T10:00:00", "us")
    ts = [base, base, base, base + np.timedelta64(1, "D"), base]
    uid = [1, 1, 1, 1, 2]
    et = ["a", "b", "a", "a", "b"]  # u1d0 dup 'a' must not double-count
    pq.write_table(
        pa.table(
            {"ts": pa.array(np.array(ts, "datetime64[us]")),
             "user_id": pa.array(uid, pa.int64()),
             "event_type": pa.array(et, pa.string())}
        ),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        etype_cooccur_lift,
    )

    got = etype_cooccur_lift(str(tmp_path), num_buckets=4).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert (row["type_a"], row["type_b"], row["n_days_both"]) == ("a", "b", 1)
    assert row["lift"] == 0.75


def test_late_events_watermark(ray_session, tmp_path):
    """Replay order is md5(event_id); the event whose ts trails the
    already-seen max by > allowed lateness is flagged with the exact
    whole-second gap; on-time and first-arrival rows are silent."""
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.functions.hashing import md5_lower64
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        late_events,
    )

    base = np.datetime64("2025-06-02T00:00:00", "us")
    n = 8
    eids = np.arange(n, dtype=np.int64)
    order = np.argsort(md5_lower64(eids.astype(str)), kind="stable")
    # assign ts so that the event arriving LAST in replay order is 2h
    # older than the max seen before it -> exactly one late row
    ts = np.empty(n, dtype="datetime64[us]")
    for rank, i in enumerate(order):
        ts[i] = base + np.timedelta64(rank * 600, "s")  # increasing
    late_eid = int(order[-1])
    ts[late_eid] = base - np.timedelta64(7200, "s")
    pq.write_table(
        pa.table({"event_id": pa.array(eids), "ts": pa.array(ts)}),
        tmp_path / "events.parquet",
    )
    got = late_events(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["event_id"] == late_eid
    # watermark before it = max of the first n-1 ranks = (n-2)*600s after
    # base; gap = that + 7200
    assert row["late_by_s"] == (n - 2) * 600 + 7200


def test_weighted_sample_orders_ares(ray_session, tmp_path):
    """A-Res: key = -ln(u)/w; higher weight -> stochastically smaller
    key. Scalar replay of the exact key formula for k=2 of 4."""
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.functions.hashing import md5_lower64
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        weighted_sample_orders,
    )

    ok = np.array([1, 2, 3, 4], np.int64)
    price = np.array([10.0, 20.0, 30.0, 40.0])
    pq.write_table(
        pa.table({"o_orderkey": pa.array(ok),
                  "o_totalprice": pa.array(price)}),
        tmp_path / "orders.parquet",
    )
    got = weighted_sample_orders(str(tmp_path), k=2).to_pandas()
    w = np.round(price * 100).astype(np.int64)
    m = (md5_lower64(ok.astype(str)) % np.uint64(1 << 53)).astype(np.float64)
    u = (m + 1.0) / 9007199254740992.0
    key = -np.log(u) / w.astype(np.float64)
    expect = ok[np.argsort(key, kind="stable")[:2]]
    assert sorted(got["o_orderkey"]) == sorted(expect.tolist())


def test_revenue_outlier_days_fences(ray_session, tmp_path):
    """9 quiet days + one 100x spike day -> exactly the spike flagged
    'high'."""
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        revenue_outlier_days,
    )

    days = np.arange(10)
    ship = np.datetime64("2025-01-01", "us") + days * np.timedelta64(1, "D")
    price = np.where(days == 7, 50000.0, 500.0 + days)
    pq.write_table(
        pa.table({"l_shipdate": pa.array(ship),
                  "l_extendedprice": pa.array(price)}),
        tmp_path / "lineitem.parquet",
    )
    got = revenue_outlier_days(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["side"] == "high"
    assert row["rev_cents"] == 5000000


def test_user_acquisition_curve(ray_session, tmp_path):
    """u1 first on day0 (again day2 — ignored), u2 day1, u3 day1 ->
    new users [1,2], cum [1,3]."""
    import pyarrow.parquet as pq

    base = np.datetime64("2025-06-02T10:00:00", "us")
    rows = [(base, 1), (base + np.timedelta64(2, "D"), 1),
            (base + np.timedelta64(1, "D"), 2),
            (base + np.timedelta64(1, "D"), 3)]
    ts, uid = zip(*rows)
    pq.write_table(
        pa.table({"ts": pa.array(np.array(ts, "datetime64[us]")),
                  "user_id": pa.array(uid, pa.int64())}),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        user_acquisition_curve,
    )

    got = user_acquisition_curve(str(tmp_path)).to_pandas()
    assert got["n_new_users"].tolist() == [1, 2]
    assert got["cum_users"].tolist() == [1, 3]


def test_dow_revenue_anomaly_flags_spike(ray_session, tmp_path):
    """8 same-weekday days: 7 near-equal + one big spike -> the spike is
    the only |z|>2 row; other weekdays (n<2) are skipped."""
    import pyarrow.parquet as pq

    start = np.datetime64("2025-01-06", "us")  # Monday
    ship, price = [], []
    for i in range(8):
        ship.append(start + i * np.timedelta64(7, "D"))
        price.append(100.0 + i * 0.01)
    price[5] = 100000.0
    ship.append(start + np.timedelta64(1, "D"))  # lone Tuesday, n=1
    price.append(50.0)
    pq.write_table(
        pa.table({"l_shipdate": pa.array(np.array(ship, "datetime64[us]")),
                  "l_extendedprice": pa.array(price)}),
        tmp_path / "lineitem.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        dow_revenue_anomaly,
    )

    got = dow_revenue_anomaly(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["rev_cents"] == 10000000
    assert got.iloc[0]["z"] > 2


def test_weekly_churn_censoring(ray_session, tmp_path):
    """u1 active wk0+wk1, u2 active wk0 only, u3 active wk1 only; last
    week (1) censored -> one row: week0 active 2, churned 1, rate 0.5."""
    import pyarrow.parquet as pq

    base = np.datetime64("2025-06-02T10:00:00", "us")  # week boundary-safe
    wk = np.timedelta64(7, "D")
    rows = [(base, 1), (base + wk, 1), (base, 2), (base + wk, 3)]
    ts, uid = zip(*rows)
    pq.write_table(
        pa.table({"ts": pa.array(np.array(ts, "datetime64[us]")),
                  "user_id": pa.array(uid, pa.int64())}),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import weekly_churn

    got = weekly_churn(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_active"] == 2 and row["n_churned"] == 1
    assert row["churn_rate"] == 0.5


def test_bounce_rate_daily(ray_session, tmp_path):
    """u1: 2 events 1s apart (one session, not a bounce); u2: 1 event
    same day (bounce); u3: 1 event next day (bounce) -> day0 rate 0.5,
    day1 rate 1.0."""
    import pyarrow.parquet as pq

    base = np.datetime64("2025-06-02T10:00:00", "us")
    rows = [
        (base, 1), (base + np.timedelta64(1, "s"), 1),
        (base, 2),
        (base + np.timedelta64(1, "D"), 3),
    ]
    ts, uid = zip(*rows)
    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(len(ts)), pa.int64()),
             "ts": pa.array(np.array(ts, "datetime64[us]")),
             "user_id": pa.array(uid, pa.int64()),
             "value": pa.array([1.0] * len(ts))}
        ),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        bounce_rate_daily,
    )

    got = bounce_rate_daily(str(tmp_path)).to_pandas()
    assert got["n_sessions"].tolist() == [2, 1]
    assert got["n_bounces"].tolist() == [1, 1]
    assert got["bounce_rate"].tolist() == [0.5, 1.0]


def test_revenue_trend_theilsen_robust(ray_session, tmp_path):
    """Perfect slope-200-cents/day line plus one massive outlier day:
    Theil-Sen recovers slope 200 exactly (OLS would not)."""
    import pyarrow.parquet as pq

    days = np.arange(9)
    ship = np.datetime64("2025-01-01", "us") + days * np.timedelta64(1, "D")
    price = 10.0 + 2.0 * days
    price[4] = 100000.0  # outlier
    pq.write_table(
        pa.table({"l_shipdate": pa.array(ship),
                  "l_extendedprice": pa.array(price)}),
        tmp_path / "lineitem.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        revenue_trend_theilsen,
    )

    got = revenue_trend_theilsen(str(tmp_path)).to_pandas().iloc[0]
    assert got["n_days"] == 9 and got["n_pairs"] == 36
    assert got["slope"] == 200.0  # cents/day, outlier-immune


def test_order_value_gini_extremes(ray_session, tmp_path):
    """Equal values -> gini ~0 (exactly (2*Σi)/(n*n) - (n+1)/n = 0);
    one order owns everything -> gini -> (n-1)/n."""
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        order_value_gini,
    )

    pq.write_table(
        pa.table({"o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                  "o_totalprice": pa.array([5.0, 5.0, 5.0, 5.0])}),
        tmp_path / "orders.parquet",
    )
    g = order_value_gini(str(tmp_path)).to_pandas().iloc[0]
    assert g["gini"] == 0.0
    pq.write_table(
        pa.table({"o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                  "o_totalprice": pa.array([0.01, 0.01, 0.01, 1000.0])}),
        tmp_path / "orders.parquet",
    )
    g2 = order_value_gini(str(tmp_path)).to_pandas().iloc[0]
    assert 0.7 < g2["gini"] < 0.75  # ≈ (n-1)/n·(1-eps) at n=4


def test_user_hour_entropy_bot_vs_human(ray_session, tmp_path):
    """Single-hour bot -> entropy 0; uniform 4-hour human -> ln(4)."""
    import pyarrow.parquet as pq

    base = np.datetime64("2025-06-02T00:00:00", "us")
    ts, uid = [], []
    for i in range(8):
        ts.append(base + np.timedelta64(3, "h"))  # bot: always hour 3
        uid.append(1)
    for h in range(4):
        ts.append(base + np.timedelta64(h, "h"))
        uid.append(2)
    pq.write_table(
        pa.table({"ts": pa.array(np.array(ts, "datetime64[us]")),
                  "user_id": pa.array(uid, pa.int64())}),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        user_hour_entropy,
    )

    got = user_hour_entropy(str(tmp_path)).to_pandas().set_index("user_id")
    assert got.loc[1, "hour_entropy"] == 0.0
    assert abs(got.loc[2, "hour_entropy"] - round(np.log(4), 6)) < 1e-9


def test_survival_km_hand_curve(ray_session, tmp_path):
    """3 signups day0: u1 converts day1 (t=1), u2 converts day3 (t=3),
    u3 never (censored at max day 4, t=4). KM: S(1)=2/3, S(3)=1/3,
    S(4)=1/3 (censor step multiplies by 1)."""
    import pyarrow.parquet as pq

    base = np.datetime64("2025-06-02T10:00:00", "us")
    day = np.timedelta64(1, "D")
    rows = [
        (base, 1, "signup"), (base + day, 1, "purchase"),
        (base, 2, "signup"), (base + 3 * day, 2, "purchase"),
        (base, 3, "signup"),
        (base + 4 * day, 9, "click"),  # sets global max day; 9 not signed up
        (base - day, 1, "purchase"),   # pre-signup purchase must be ignored
    ]
    ts, uid, et = zip(*rows)
    pq.write_table(
        pa.table({"ts": pa.array(np.array(ts, "datetime64[us]")),
                  "user_id": pa.array(uid, pa.int64()),
                  "event_type": pa.array(et, pa.string())}),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import survival_km

    got = survival_km(str(tmp_path)).to_pandas()
    assert got["t_days"].tolist() == [1, 3, 4]
    assert got["n_risk"].tolist() == [3, 2, 1]
    assert got["n_events"].tolist() == [1, 1, 0]
    assert abs(got["survival"].iloc[0] - round(2 / 3, 6)) < 1e-9
    assert abs(got["survival"].iloc[1] - round(1 / 3, 6)) < 2e-6
    assert got["survival"].iloc[2] == got["survival"].iloc[1]


def test_markov_stationary_two_state(ray_session, tmp_path):
    """Two-state chain a->b always, b->a always: period-2 — after 8
    (even) iterations from uniform, pi stays (0.5, 0.5) exactly."""
    import pyarrow.parquet as pq

    base = np.datetime64("2025-06-02T10:00:00", "us")
    seq = ["a", "b"] * 6
    ts = [base + np.timedelta64(i, "m") for i in range(len(seq))]
    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(len(seq)), pa.int64()),
             "ts": pa.array(np.array(ts, "datetime64[us]")),
             "user_id": pa.array([1] * len(seq), pa.int64()),
             "event_type": pa.array(seq, pa.string())}
        ),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        markov_stationary,
    )

    got = markov_stationary(str(tmp_path)).to_pandas()
    assert sorted(got["event_type"]) == ["a", "b"]
    assert (got["stationary_prob"] == 0.5).all()


def test_customer_order_gaps_median(ray_session, tmp_path):
    """c1 orders on days 0,10,12,40 -> gaps [10,2,28], median 10 (odd);
    c2 days 0,4,10,16 -> gaps [4,6,6], sorted [4,6,6] median 6; c3 one
    order -> absent."""
    import pyarrow.parquet as pq

    base = np.datetime64("2025-01-01", "us")
    day = np.timedelta64(1, "D")
    rows = [(1, 0), (1, 10), (1, 12), (1, 40),
            (2, 0), (2, 4), (2, 10), (2, 16), (3, 5)]
    ck = [r[0] for r in rows]
    dt = [base + r[1] * day for r in rows]
    pq.write_table(
        pa.table({"o_custkey": pa.array(ck, pa.int64()),
                  "o_orderdate": pa.array(np.array(dt, "datetime64[us]"))}),
        tmp_path / "orders.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        customer_order_gaps,
    )

    got = customer_order_gaps(str(tmp_path)).to_pandas().set_index("o_custkey")
    assert 3 not in got.index
    assert got.loc[1, "n_orders"] == 4 and got.loc[1, "median_gap"] == 10.0
    assert got.loc[2, "n_orders"] == 4 and got.loc[2, "median_gap"] == 6.0


def test_cohort_ltv_curve(ray_session, tmp_path):
    """2 users cohort week0 (u1 buys 10.00 at offset 0 and 5.00 at
    offset 2; u2 never buys), 1 user cohort week1 buys 2.00 at offset 0:
    week0 rows (0: cum 1000c, ltv 500c/user), (2: cum 1500c, 750c);
    week1 (0: cum 200c, 200c)."""
    import pyarrow.parquet as pq

    base = np.datetime64("2025-06-02T10:00:00", "us")
    wk = np.timedelta64(7, "D")
    rows = [
        (base, 1, "purchase", 10.0),
        (base + 2 * wk, 1, "purchase", 5.0),
        (base, 2, "view", 0.0),
        (base + wk, 3, "purchase", 2.0),
    ]
    ts, uid, et, val = zip(*rows)
    pq.write_table(
        pa.table({"ts": pa.array(np.array(ts, "datetime64[us]")),
                  "user_id": pa.array(uid, pa.int64()),
                  "event_type": pa.array(et, pa.string()),
                  "value": pa.array(val)}),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import cohort_ltv

    got = cohort_ltv(str(tmp_path)).to_pandas()
    w0 = got[got["cohort_week"] == got["cohort_week"].min()]
    assert w0["cum_cents"].tolist() == [1000, 1500]
    assert w0["ltv_per_user"].tolist() == [500.0, 750.0]
    w1 = got[got["cohort_week"] == got["cohort_week"].max()]
    assert w1["cum_cents"].tolist() == [200]
    assert w1["ltv_per_user"].tolist() == [200.0]


def test_returns_rate_by_brand(ray_session, tmp_path):
    """Brand A: 2 lines, 1 'R' -> 0.5; brand B: 1 line, 0 -> 0.0."""
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"p_partkey": pa.array([1, 2], pa.int64()),
                  "p_brand": pa.array(["A", "B"], pa.string())}),
        tmp_path / "part.parquet",
    )
    pq.write_table(
        pa.table({"l_partkey": pa.array([1, 1, 2], pa.int64()),
                  "l_returnflag": pa.array(["R", "N", "N"], pa.string())}),
        tmp_path / "lineitem.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        returns_rate_by_brand,
    )

    got = returns_rate_by_brand(str(tmp_path)).to_pandas().set_index("p_brand")
    assert got.loc["A", "n_lines"] == 2 and got.loc["A", "return_rate"] == 0.5
    assert got.loc["B", "return_rate"] == 0.0


def test_degree_quantiles_interpolation(ray_session, tmp_path):
    """Co-purchase degrees from a 4-clique basket: all degrees 3 ->
    every quantile is exactly 3.0."""
    import pyarrow.parquet as pq

    ok = [10] * 4
    pk = [1, 2, 3, 4]
    pq.write_table(
        pa.table({"l_orderkey": pa.array(ok * 2, pa.int64()),
                  "l_partkey": pa.array(pk + pk, pa.int64())}),
        tmp_path / "lineitem.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        degree_quantiles,
    )

    got = degree_quantiles(str(tmp_path)).to_pandas()
    assert (got["n_vertices"] == 4).all()
    assert (got["value"] == 3.0).all()


def test_events_acf_period2(ray_session, tmp_path):
    """Alternating daily counts 1,3,1,3,...: acf(1) strongly negative,
    acf(2) exactly +1 (perfect period-2 correlation)."""
    import pyarrow.parquet as pq

    base = np.datetime64("2025-01-01T00:00:00", "us")
    ts = []
    for d in range(10):
        reps = 1 if d % 2 == 0 else 3
        for r in range(reps):
            ts.append(base + np.timedelta64(d, "D") + np.timedelta64(r, "m"))
    pq.write_table(
        pa.table({"ts": pa.array(np.array(ts, "datetime64[us]"))}),
        tmp_path / "events.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_acf

    got = events_acf(str(tmp_path), max_lag=2).to_pandas().set_index("lag")
    assert got.loc[1, "acf"] == -1.0
    assert got.loc[2, "acf"] == 1.0
