"""Randomized pandas-replay parity for the window-function family: three
seeded random event tables (ties, singleton users, duplicate timestamps)
checked against independent pandas window replays in one Ray session."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from subgraph_isomorphism_pregel_ray.pipelines.relational import (
    events_cumsum,
    events_ntile,
    user_first_last,
)


def _random_events(seed: int, tmp_path):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 120))
    ts = np.datetime64("2024-01-01", "us") + rng.integers(
        0, 50, n
    ) * np.timedelta64(60_000_000, "us")  # coarse -> duplicate timestamps
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, 9, n).astype(np.int64),
            "value": np.round(rng.uniform(-5, 50, n), 2),
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    return df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)


@pytest.mark.parametrize("seed", [3, 17, 92])
def test_window_family_matches_pandas_replay(ray_session, tmp_path, seed):
    d = tmp_path / f"s{seed}"
    d.mkdir()
    df = _random_events(seed, d)

    # cumsum: exact int cents running sum per user
    got = events_cumsum(str(d)).to_pandas().set_index("event_id")["cum_value"]
    cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    want = (
        pd.Series(cents).groupby(df["user_id"].values).cumsum().to_numpy() / 100.0
    )
    for eid, w in zip(df["event_id"], want):
        assert got.loc[eid] == w, ("cumsum", seed, eid)

    # ntile: SQL sizing replay
    got_t = events_ntile(str(d), k=4).to_pandas().set_index("event_id")["tile"]
    for uid, grp in df.groupby("user_id"):
        n = len(grp)
        small, big = n // 4, n % 4
        for p, eid in enumerate(grp["event_id"]):
            cut = big * (small + 1)
            tile = p // (small + 1) + 1 if p < cut else big + (p - cut) // max(small, 1) + 1
            assert got_t.loc[eid] == tile, ("ntile", seed, eid)

    # first/last value per user
    got_fl = user_first_last(str(d)).to_pandas().set_index("user_id")
    for uid, grp in df.groupby("user_id"):
        assert got_fl.loc[uid, "first_value"] == grp["value"].iloc[0]
        assert got_fl.loc[uid, "last_value"] == grp["value"].iloc[-1]
        assert got_fl.loc[uid, "n_events"] == len(grp)
