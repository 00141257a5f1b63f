"""HyperLogLog sketch ops — approximate COUNT DISTINCT at 100 TB scale.

The exact distinct path (``distinct_users_daily``) shuffles every distinct
key; at web scale the standard answer is a mergeable sketch whose shuffle
traffic is O(groups × m) regardless of cardinality. This is the classic
HyperLogLog of Flajolet et al. 2007 ("HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm"), built Ray-Data-first:

* ``hll_registers_daily`` — the sketch itself. Each ``map_batches`` call
  folds its batch into at most ``groups × 2^b`` partial registers (the
  pre-shuffle combine), a single ``groupby(day, bucket).max`` merges them
  (register merge IS elementwise max — associative, order-free), and the
  result is pure integers. Because the item hash is ``md5_lower64``
  ≡ DuckDB ``md5_number_lower`` (functions/hashing.py), every register is
  bit-reproducible by an ANSI-SQL oracle: bucket = top ``b`` bits, and
  rho = CLZ of the low ``64-b`` bits + 1 replayed with ``length(bin(x))``.
* ``approx_distinct_users_daily`` — the estimator over those registers
  (harmonic mean + the small-range linear-counting correction). Registers
  are ≤ groups × 2^b rows, so the fold is a tiny exact ``map_groups``;
  accuracy (≈ 1.04/√m relative error) is pytest-asserted against the
  exact distinct count, and the estimate is a pure function of the
  registers → deterministic at any partition count or batch size.

Reference anchor: the reference's aggregator surface (src/SItypes/
SIAgg.h:12-38) folds per-worker partials into one global value; an HLL
register vector is exactly such a partial with max as the fold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import md5_lower64
from ..sources.tables import read_table

__all__ = [
    "quantile_sketch_events",
    "hll_registers_daily",
    "approx_distinct_users_daily",
    "hll_estimate",
]

HLL_B = 8  # 2^8 = 256 registers: ~6.5% relative standard error
_M = 1 << HLL_B
_LOW_BITS = np.uint64(64 - HLL_B)
_LOW_MASK = np.uint64((1 << (64 - HLL_B)) - 1)
_US_PER_DAY = 86_400_000_000


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 → 0). Exact — no float log2,
    which mis-rounds near powers of two above 2^53."""
    v = x.copy()
    bl = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        v[big] >>= np.uint64(s)
    return bl + (v > 0)


def _hll_fold(day: np.ndarray, h: np.ndarray):
    """(day, bucket, rho) partials folded to max-per-(day, bucket)."""
    if len(h) == 0:
        z = np.array([], dtype=np.int64)
        return z, z, z
    bucket = (h >> _LOW_BITS).astype(np.int64)
    low = h & _LOW_MASK
    rho = (int(_LOW_BITS) + 1 - _bit_length_u64(low)).astype(np.int64)
    key = day * _M + bucket  # days are small positive ints — no overflow
    order = np.lexsort((rho, key))
    key, rho = key[order], rho[order]
    last = np.concatenate([key[1:] != key[:-1], [True]])  # max rho per key
    return key[last] // _M, key[last] % _M, rho[last]


def hll_registers_daily(sf_dir: str):
    """→ (day:int64 epoch-days, bucket, register) — the merged HLL sketch
    of distinct ``user_id`` per day over the events log. Bit-exact vs SQL."""
    from ray.data.aggregate import Max

    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def _partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        day = ts // _US_PER_DAY
        uid = t["user_id"].to_numpy()
        h = md5_lower64(uid.astype(str))
        d, b, r = _hll_fold(day, h)
        return pa.table({"day": d, "bucket": b, "register": r})

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["day", "bucket"])
        .aggregate(Max("register", alias_name="register"))
    )


# alpha_256 of Flajolet et al. 2007: 0.7213 / (1 + 1.079/m)
_ALPHA_M = 0.7213 / (1.0 + 1.079 / _M)


def hll_estimate(registers: np.ndarray) -> float:
    """Standard HLL estimator over a dense m-register vector (int64).

    Harmonic mean with the small-range linear-counting correction; the
    large-range (2^32) correction is obsolete with 64-bit hashes.
    """
    m = float(_M)
    est = _ALPHA_M * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int(np.count_nonzero(registers == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct_users_daily(sf_dir: str):
    """→ (day:int64 epoch-days, approx_distinct:float64) — HLL cardinality
    estimate per day; a pure function of ``hll_registers_daily``.

    Rounded half-away to 4 decimals: the raw estimate's ``2^-register``
    harmonic sum and ``ln`` drift a ulp between numpy and DuckDB libm
    (measured: 11/30 days at sf0.01), and 4 decimals is ~10 orders of
    magnitude above that drift — so the SQL-oracle replay of the
    estimator over the (already hash-checked) registers is bit-exact."""
    from ..functions.rounding import round_half_away

    def _estimate(g: pa.Table) -> pa.Table:
        day = g["day"].to_numpy()
        regs = np.zeros(_M, dtype=np.int64)
        regs[g["bucket"].to_numpy()] = g["register"].to_numpy()
        return pa.table(
            {
                "day": day[:1],
                "approx_distinct": np.array(
                    [round_half_away(hll_estimate(regs), 4)], dtype=np.float64
                ),
            }
        )

    return (
        hll_registers_daily(sf_dir)
        .groupby("day")
        .map_groups(_estimate, batch_format="pyarrow")
    )


def quantile_sketch_events(sf_dir: str, k: int = 256, qs: tuple = (0.5, 0.95)):
    """Mergeable BOTTOM-K quantile sketch per event type →
    (event_type, quantile, n_sample, value_est): quantiles estimated from
    the k events with the smallest md5 hash of their event_id — a
    deterministic uniform sample (the hash is independent of value), so
    unlike randomized reservoirs the sketch is bit-reproducible at any
    parallelism AND SQL-oracle-checkable (the oracle reconstructs the
    identical sample with the same md5 ordering). Bottom-k sketches merge
    by union + re-cut, which is exactly the per-batch combiner here.

    Scale shape: each batch ships ≤ k rows per type it saw (the combiner),
    one tiny groupby per type re-cuts and interpolates — the event stream
    never reaches a single worker. Estimation error is the classic
    sampling bound (~1/√k quantile deviation), pinned by a pytest against
    the exact distributed quantiles.
    """
    from ..functions.hashing import md5_lower64
    from ..functions.rounding import round_half_away
    from ..sources.tables import read_table

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def _bottomk(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy().astype(np.int64)
        typ = t["event_type"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy()
        # keep the hash UNSIGNED: the SQL oracle orders by the uint64
        # md5_number_lower, and an int64 view would flip half the order
        h = md5_lower64(eid.astype(str))
        tkey, tinv = np.unique(typ, return_inverse=True)
        order = np.lexsort((eid, h, tinv))
        ti = tinv[order]
        new_t = np.concatenate([[True], ti[1:] != ti[:-1]])
        pos = np.arange(len(ti)) - np.flatnonzero(new_t)[np.cumsum(new_t) - 1]
        keep = pos < k
        sel = order[keep]
        return pa.table(
            {
                "event_type": pa.array(list(typ[sel]), pa.string()),
                "h": h[sel],
                "event_id": eid[sel],
                "value": val[sel],
            }
        )

    def _finish(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        eid = g["event_id"].to_numpy()
        val = g["value"].to_numpy()
        order = np.lexsort((eid, h))[:k]  # merge = union + re-cut
        sample = np.sort(val[order])
        n = len(sample)
        out_q, out_v = [], []
        for q in qs:
            p = q * (n - 1)
            i0 = int(np.floor(p))
            i1 = min(i0 + 1, n - 1)
            f = p - np.floor(p)
            out_q.append(q)
            out_v.append(sample[i0] + (sample[i1] - sample[i0]) * f)
        return pa.table(
            {
                "event_type": pa.array([g["event_type"][0].as_py()] * len(qs)),
                "quantile": np.asarray(out_q, np.float64),
                "n_sample": np.full(len(qs), n, np.int64),
                "value_est": round_half_away(np.asarray(out_v), 6),
            }
        )

    return (
        ds.map_batches(_bottomk, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(_finish, batch_format="pyarrow")
    )


def kmv_overlap_daily(sf_dir: str, k: int = 64):
    """KMV (bottom-k / k-minimum-values) set-overlap sketch between the
    user sets of CONSECUTIVE days (Beyer et al., SIGMOD 2007) — estimate
    AND exact side by side → (day, est_union, est_inter, exact_union,
    exact_inter) per (day, day+1) pair, day = the earlier day.

    The estimator: per day keep the k smallest md5(user_id) hashes (a
    DETERMINISTIC uniform sample — merge = union + re-cut, the mergeable-
    sketch property); for a pair, rank the distinct union of the two
    sketches by (h, user) — if it holds ≤ k rows both sketches were exact
    (est = the truncation-free counts); else θ = h_k/2⁶⁴ and
    |A∪B| ≈ (k−1)/θ, |A∩B| ≈ (both-days count among the k smallest)/k ·
    (k−1)/θ. Every input to the two float divisions is an exact integer
    and the hash is ``md5_lower64`` ≡ DuckDB ``md5_number_lower``, so the
    SQL oracle replays the ENTIRE sketch — sampling, θ, ρ — bit-exactly
    (the quantile_sketch_events property, extended to a two-set
    estimator), while the exact columns price its error in the same row.

    Scale shape: per-batch (day, user) dedup + per-day bottom-k partials
    (≤ k rows per day per batch — the combiner), ONE day groupby re-cut;
    the folded sketch table is ≤ days×k rows (driver-safe at any corpus
    size; days is bounded). Exact counts: the distinct_users_daily
    pushed-down-dedup shuffle, plus one user-keyed groupby emitting
    consecutive-day co-presence partials."""
    from ..functions.rounding import round_half_away

    TWO64 = float(1 << 64)
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def _bottomk(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        user = t["user_id"].to_numpy().astype(np.int64)
        order = np.lexsort((user, day))
        d_s, u_s = day[order], user[order]
        first = np.ones(len(d_s), bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (u_s[1:] != u_s[:-1])
        d_u, u_u = d_s[first], u_s[first]
        h = md5_lower64(u_u.astype(str))
        order2 = np.lexsort((u_u, h, d_u))
        d2 = d_u[order2]
        new_d = np.concatenate([[True], d2[1:] != d2[:-1]])
        pos = np.arange(len(d2)) - np.flatnonzero(new_d)[np.cumsum(new_d) - 1]
        keep = pos < k
        sel = order2[keep]
        return pa.table(
            {"day": d_u[sel], "h": h[sel], "user_id": u_u[sel]}
        )

    def _recut(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        u = g["user_id"].to_numpy()
        order = np.lexsort((u, h))
        first = np.ones(len(u), bool)
        first[1:] = u[order][1:] != u[order][:-1]
        sel = order[first][:k]  # distinct users, k smallest hashes
        return g.take(pa.array(np.sort(sel)))

    sketch = (
        ds.map_batches(_bottomk, batch_format="pyarrow")
        .groupby("day")
        .map_groups(_recut, batch_format="pyarrow")
        .to_pandas()  # ≤ days×k rows
    )

    # exact per-day distinct counts + consecutive-day intersections, both
    # over the SAME pushed-down-dedup shuffle of (day, user) pairs
    def _dedup(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        user = t["user_id"].to_numpy().astype(np.int64)
        order = np.lexsort((user, day))
        d_s, u_s = day[order], user[order]
        first = np.ones(len(d_s), bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (u_s[1:] != u_s[:-1])
        return pa.table({"day": d_s[first], "user_id": u_s[first]})

    def _user_days(g: pa.Table) -> pa.Table:
        days = np.unique(g["day"].to_numpy())
        nxt = days[np.isin(days + 1, days)]  # (d, d+1) co-presence
        return pa.table(
            {
                "day": np.concatenate([days, nxt]),
                "n": np.concatenate(
                    [np.ones(len(days), np.int64),
                     np.zeros(len(nxt), np.int64)]
                ),
                "inter": np.concatenate(
                    [np.zeros(len(days), np.int64),
                     np.ones(len(nxt), np.int64)]
                ),
            }
        )

    from ray.data.aggregate import Sum

    exact = (
        ds.map_batches(_dedup, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(_user_days, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"), Sum("inter", alias_name="inter"))
        .to_pandas()
        .set_index("day")  # 30ish rows
        .sort_index()
    )

    out_rows = []
    by_day = {int(d): g for d, g in sketch.groupby("day")}
    for d in sorted(by_day):
        if d + 1 not in by_day:
            continue
        a, b = by_day[d], by_day[d + 1]
        users = np.concatenate(
            [a["user_id"].to_numpy(), b["user_id"].to_numpy()]
        ).astype(np.int64)
        hs = np.concatenate([a["h"].to_numpy(), b["h"].to_numpy()]).astype(
            np.uint64
        )
        both = np.isin(users, a["user_id"].to_numpy()) & np.isin(
            users, b["user_id"].to_numpy()
        )
        order = np.lexsort((users, hs))
        u_o, h_o, b_o = users[order], hs[order], both[order]
        first = np.ones(len(u_o), bool)
        first[1:] = u_o[1:] != u_o[:-1]
        u_o, h_o, b_o = u_o[first], h_o[first], b_o[first]
        m = len(u_o)
        if m <= k:
            est_u, est_i = float(m), float(int(b_o.sum()))
        else:
            theta = float(h_o[k - 1]) / TWO64
            est_u = (k - 1) / theta
            est_i = int(b_o[:k].sum()) / k * ((k - 1) / theta)
        n_d = int(exact.loc[d, "n"])
        n_d1 = int(exact.loc[d + 1, "n"])
        ex_i = int(exact.loc[d, "inter"])
        out_rows.append(
            (
                d,
                float(round_half_away(est_u, 6)),
                float(round_half_away(est_i, 6)),
                n_d + n_d1 - ex_i,
                ex_i,
            )
        )
    return pa.table(
        {
            "day": pa.array([r[0] for r in out_rows], pa.int64()),
            "est_union": pa.array([r[1] for r in out_rows], pa.float64()),
            "est_inter": pa.array([r[2] for r in out_rows], pa.float64()),
            "exact_union": pa.array([r[3] for r in out_rows], pa.int64()),
            "exact_inter": pa.array([r[4] for r in out_rows], pa.int64()),
        }
    )
