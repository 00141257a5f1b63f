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
