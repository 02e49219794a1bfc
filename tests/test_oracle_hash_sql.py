"""The DuckDB-SQL hash kernels (oracle_hash_sql) must be bit-exact vs
the numpy kernels (hashing.py) — they are the independent oracles for
the fingerprints and dedup_simhash driver checks."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from ee_outliers_ray.hashing import (
    combine_sequences,
    hash_string_array,
    simhash_from_tokens,
)
from ee_outliers_ray.oracle_hash_sql import (
    _MAX_DOC_TOKS,
    _MAX_TOK_LEN,
    fingerprint_sql,
    simhash_pairs_sql,
    simhash_sql,
)
from ee_outliers_ray.tokenizer import tokenize_column

ADVERSARIAL = [
    "hello world foo",
    "a",
    "",
    "   ",
    "zz9 zz9 zz9 zz9",
    "the quick brown fox jumps over the lazy dog",
    "x" * 60 + " yy",                    # near the _MAX_TOK_LEN bound
    "123456789012345 abc 000",
    "UPPER Case MiXeD",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 3,
    "!@#$%^&*()",                        # no tokens at all
    "0",
    "same same same",
]


def _con(texts):
    con = duckdb.connect()
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    con.register("documents", tbl)
    return con


def _np_tok(texts):
    toks = tokenize_column(pa.array(texts))
    th = hash_string_array(toks.flatten())
    off = toks.offsets.to_numpy().astype(np.int64)
    return th, off


def test_fingerprint_sql_bit_exact():
    con = _con(ADVERSARIAL)
    got = con.execute(f"SELECT * FROM ({fingerprint_sql()}) ORDER BY doc_id").fetch_df()
    th, off = _np_tok(ADVERSARIAL)
    exp = combine_sequences(th, off).view(np.int64)
    assert (got["fingerprint"].to_numpy() == exp).all()


def test_simhash_sql_bit_exact():
    con = _con(ADVERSARIAL)
    got = con.execute(f"SELECT * FROM ({simhash_sql()}) ORDER BY doc_id").fetch_df()
    th, off = _np_tok(ADVERSARIAL)
    exp = simhash_from_tokens(th, off).view(np.int64)
    assert (got["simhash"].to_numpy() == exp).all()


def test_simhash_pairs_sql_matches_exhaustive():
    texts = ["alpha beta gamma delta"] * 3 + \
            ["alpha beta gamma delta epsilon"] + \
            ["totally different content here"] + [""] * 2
    con = _con(texts)
    got = con.execute(simhash_pairs_sql(max_hamming=3) +
                      " ORDER BY id_a, id_b").fetch_df()
    th, off = _np_tok(texts)
    sh = simhash_from_tokens(th, off)
    exp = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            h = int(bin(int(sh[i]) ^ int(sh[j])).count("1"))
            if h <= 3:
                exp.append((i, j, h))
    assert list(map(tuple, got.to_numpy())) == exp
    assert len(exp) >= 4  # the identical trio + the two empties


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_testdata_within_power_table_bounds(sf_dir):
    """Tokens longer than the embedded power tables would silently drop
    from the SQL joins — assert the corpora stay inside the bounds."""
    con = duckdb.connect()
    mx = con.execute(f"""
        SELECT max(len(t)) AS a, max(n) AS b FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t,
                 len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n
          FROM '{sf_dir}/documents.parquet')""").fetchone()
    assert mx[0] <= _MAX_TOK_LEN and mx[1] <= _MAX_DOC_TOKS


def test_fingerprint_sql_on_testdata_matches_pipeline():
    """End-to-end: SQL oracle == Ray pipeline on real testdata rows."""
    import pandas as pd

    from ee_outliers_ray import pipelines as P

    sf = "/root/testdata/sf0.001"
    ray_df = P.fingerprints(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf}/documents.parquet'")
    sql_df = con.execute(f"SELECT * FROM ({fingerprint_sql()}) ORDER BY doc_id").fetch_df()
    pd.testing.assert_series_equal(
        ray_df["fingerprint"].astype(np.int64),
        sql_df["fingerprint"].astype(np.int64), check_names=False)


def test_simhash_pairs_sql_on_testdata_matches_pipeline():
    import pandas as pd

    from ee_outliers_ray import pipelines as P

    sf = "/root/testdata/sf0.001"
    ray_df = P.dedup_simhash(sf)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    ray_df = ray_df[["id_a", "id_b", "hamming"]] \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf}/documents.parquet'")
    sql_df = con.execute(simhash_pairs_sql(max_hamming=3) +
                         " ORDER BY id_a, id_b").fetch_df()
    pd.testing.assert_frame_equal(
        ray_df.astype(np.int64), sql_df.astype(np.int64))
