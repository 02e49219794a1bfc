"""Driver-style parity check: every queries() entry with an oracle_sql()
entry must match DuckDB on the same tables (row count + order-insensitive
values), at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


ORACLE_KEYS = sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(con, name):
    ray_fn = E.queries()[name]
    got = _normalize(_to_pandas(ray_fn(SF_DIR)))
    want = _normalize(con.execute(E.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def test_every_oracle_has_query():
    q = E.queries()
    for name in ORACLE_KEYS:
        assert name in q


def test_rows_only_queries_run():
    """Entries without an oracle still run and return >= 0 rows."""
    q = E.queries()
    rows_only = set(q) - set(ORACLE_KEYS)
    assert rows_only  # at least some non-SQL ops exist
    for name in sorted(rows_only):
        df = _to_pandas(q[name](SF_DIR))
        assert df is not None and len(df) >= 0, name


def test_entry_runs():
    res = _to_pandas(E.entry())
    assert len(res) > 0
    assert set(res.columns) == {"query", "doc_id", "score"}
    # stable across invocations (deterministic corpus + engine)
    res2 = _to_pandas(E.entry())
    pd.testing.assert_frame_equal(res.reset_index(drop=True),
                                  res2.reset_index(drop=True))
