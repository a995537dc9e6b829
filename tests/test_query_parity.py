"""Driver-gate replica: every queries() entry vs its oracle_sql() via
DuckDB at sf0.001 — row count, schema (column names), and
order-insensitive value equality."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import os as _os

SF_DIR = _os.environ.get("GRAFT_PARITY_SF", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _query_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as e

    mine = _normalize(_to_pandas(e.queries()[name](SF_DIR)))
    theirs = _normalize(con.execute(e.oracle_sql()[name]).df())
    assert list(mine.columns) == list(theirs.columns), f"{name}: column names differ"
    assert len(mine) == len(theirs), f"{name}: row count {len(mine)} != {len(theirs)}"
    for c in mine.columns:
        a, b = mine[c], theirs[c]
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            an, bn = a.astype(float), b.astype(float)
            assert an.isna().equals(bn.isna()), f"{name}.{c}: null mask differs"
            np.testing.assert_allclose(
                an.fillna(0).to_numpy(), bn.fillna(0).to_numpy(), rtol=0, atol=0,
                err_msg=f"{name}.{c}",
            )
        elif np.issubdtype(a.dtype, np.datetime64) or np.issubdtype(b.dtype, np.datetime64):
            assert (
                a.astype("datetime64[us]").tolist() == b.astype("datetime64[us]").tolist()
            ), f"{name}.{c}"
        else:
            assert a.tolist() == b.tolist(), f"{name}.{c}: values differ"


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as e

    sql = e.oracle_sql()
    for name, fn in e.queries().items():
        if name in sql:
            continue
        res = _to_pandas(fn(SF_DIR))
        assert len(res) >= 0, name


def test_entry_runs(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = _to_pandas(res.limit(10) if hasattr(res, "limit") else res)
    assert len(df) > 0
