"""chunk_documents semantics: fixed-size contiguous chunks, partial-last
handling, empty docs, and the oracle-aligned space-joined text."""

import pyarrow as pa
import ray.data

from ee_outliers_ray.textstats import chunk_documents


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string())}))


def test_chunk_basic_and_partial():
    out = chunk_documents(_ds([(1, "a b c d e"), (2, "x y")]),
                          chunk_size=2).to_pandas()
    got = list(out.itertuples(index=False, name=None))
    assert got == [
        (1, 0, 2, "a b"), (1, 1, 2, "c d"), (1, 2, 1, "e"),
        (2, 0, 2, "x y"),
    ]


def test_chunk_min_tokens_drops_short_tail():
    out = chunk_documents(_ds([(1, "a b c d e")]), chunk_size=2,
                          min_tokens=2).to_pandas()
    assert list(out["chunk_id"]) == [0, 1]
    assert list(out["chunk_text"]) == ["a b", "c d"]


def test_chunk_empty_and_exact_multiple():
    out = chunk_documents(_ds([(1, ""), (2, "a b c d"), (3, "   ")]),
                          chunk_size=2).to_pandas()
    assert list(out["doc_id"]) == [2, 2]
    assert list(out["n_chunk_tokens"]) == [2, 2]


def test_chunk_tokenizer_contract():
    # chunk text is over the TOKENIZED stream (lowercased [a-z0-9]+)
    out = chunk_documents(_ds([(1, "Hello, World! FOO-bar")]),
                          chunk_size=3).to_pandas()
    assert list(out["chunk_text"]) == ["hello world foo", "bar"]
