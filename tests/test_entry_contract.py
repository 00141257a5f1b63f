"""Mirror of the driver's correctness gate: every ``queries()`` entry runs at
sf0.001 and, where ``oracle_sql()`` provides SQL, must match DuckDB on
row-count, schema (column names) and order-insensitive values."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype(np.uint64).view(np.int64)
        if str(df[c].dtype) in ("int32", "int16"):
            df[c] = df[c].astype(np.int64)
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as entry_mod

    return entry_mod


def test_entry_smoke(contract):
    res = _to_pandas(contract.entry())
    assert len(res) > 0
    assert set(res.columns) == {"vid", "pr"}


def test_oracle_queries_match(contract, con):
    qs = contract.queries()
    sqls = contract.oracle_sql()
    failures = []
    for name, sql in sqls.items():
        got = _canon(_to_pandas(qs[name](SF)))
        exp = _canon(con.sql(sql).df())
        if list(got.columns) != list(exp.columns):
            failures.append(f"{name}: columns {list(got.columns)} != {list(exp.columns)}")
            continue
        if len(got) != len(exp):
            failures.append(f"{name}: rows {len(got)} != {len(exp)}")
            continue
        for c in got.columns:
            a, e = got[c].to_numpy(), exp[c].to_numpy()
            if a.dtype.kind == "f":
                ok = np.allclose(a, e.astype(np.float64), atol=1e-9, equal_nan=True)
            else:
                ok = np.array_equal(a, e)
            if not ok:
                failures.append(f"{name}: column {c} values differ")
                break
    assert not failures, "\n".join(failures)


def test_rows_only_queries_run(contract):
    qs = contract.queries()
    sqls = contract.oracle_sql()
    for name, fn in qs.items():
        if name in sqls:
            continue
        df = _to_pandas(fn(SF))
        assert df is not None, name
