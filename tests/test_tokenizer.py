import duckdb
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ee_outliers_ray.tokenizer import token_counts_column, tokenize, tokenize_column

CASES = [
    "Hello WORLD-42 foo",
    "",
    "   ",
    "a",
    "the quick... brown_fox! 123abc",
    "...leading and trailing...",
    "UPPER lower MiXeD",
    "unicode café naïve ß",
    "5468697320697320612074657374",
    "VGhpcyBpcyBhIHRleHQ=",
    "http://www.dance.com/",
]


def test_tokenize_basic():
    assert tokenize("Hello WORLD-42 foo") == ["hello", "world", "42", "foo"]
    assert tokenize("") == []
    assert tokenize("...") == []


def test_vectorized_matches_python():
    col = pa.array(CASES)
    out = tokenize_column(col)
    for i, case in enumerate(CASES):
        assert out[i].as_py() == tokenize(case), case


def test_null_handling():
    col = pa.array(["a b", None, "c"])
    out = tokenize_column(col)
    assert out[0].as_py() == ["a", "b"]
    assert out[1].as_py() == []
    assert out[2].as_py() == ["c"]


def test_token_counts():
    col = pa.array(CASES)
    counts = token_counts_column(col)
    assert list(counts) == [len(tokenize(c)) for c in CASES]


def test_matches_duckdb_oracle():
    con = duckdb.connect()
    for case in CASES:
        (got,) = con.execute(
            "select regexp_extract_all(lower(?), '[a-z0-9]+')", [case]
        ).fetchone()
        assert got == tokenize(case), case


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=20))
def test_vectorized_matches_python_property(texts):
    out = tokenize_column(pa.array(texts, type=pa.string()))
    for i, t in enumerate(texts):
        assert out[i].as_py() == tokenize(t)
