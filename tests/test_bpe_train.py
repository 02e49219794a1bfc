"""BPE tokenizer training: the engine's vectorized merge loop is pinned
against an independently coded dict-based reference (the textbook
Sennrich et al. 2016 algorithm over a word-frequency table), plus
determinism / parallelism-independence and the new source-mix /
stratified-sample oracleable entries' engine-side invariants."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from ee_outliers_ray.textstats import bpe_train, word_counts

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# independent reference: dict-of-symbol-tuples BPE (no numpy, no sharing
# with the engine beyond the tokenizer contract)
# ---------------------------------------------------------------------------

def _ref_bpe(word_count: dict, num_merges: int):
    vocab = {tuple(w): c for w, c in word_count.items()}
    merges = []
    for rank in range(num_merges):
        pairs: dict = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        # NOTE: overlapping occurrences all count here (e.g. 'aaa' for
        # pair (a, a) contributes 2) — mirroring the engine's adjacent
        # count; the MERGE step below is leftmost-non-overlapping.
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p[0] + " " + p[1]))
        if pairs[best] < 2:
            break
        merges.append((rank, best[0], best[1], pairs[best]))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and (syms[i], syms[i + 1]) == best):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return pd.DataFrame(merges,
                        columns=["rank", "left", "right", "pair_count"])


def _ref_from_texts(texts, num_merges):
    import re
    wc: dict = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            wc[w] = wc.get(w, 0) + 1
    return _ref_bpe(wc, num_merges)


def test_bpe_matches_reference_on_testdata():
    import pyarrow.parquet as pq
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    want = _ref_from_texts(texts, 25)
    got = bpe_train(ray.data.read_parquet(f"{SF}/documents.parquet",
                                          columns=["text"]), num_merges=25)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("texts,n", [
    # overlap runs: pair (a, a) over 'aaaa aaa'
    (["aaaa aaa aaaa", "aaa aa"], 4),
    # tie-break: 'ab' and 'cd' tie at 2 -> lexicographically smaller wins
    (["ab ab cd cd"], 3),
    # merged symbols pair up in later rounds
    (["abcd abcd abcd", "abce abce"], 6),
    # single repeated char word
    (["zzzzzz zzzzzz"], 5),
])
def test_bpe_matches_reference_synthetic(texts, n):
    ds = ray.data.from_items([{"text": t} for t in texts])
    got = bpe_train(ds, num_merges=n)
    want = _ref_from_texts(texts, n)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bpe_parallelism_independent():
    """Same corpus through 1 block vs many blocks -> identical merges."""
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    one = ray.data.from_arrow(tbl)
    many = ray.data.from_arrow(tbl).repartition(13)
    a = bpe_train(one, num_merges=15)
    b = bpe_train(many, num_merges=15)
    pd.testing.assert_frame_equal(a, b)


def test_word_counts_prune_and_guard():
    ds = ray.data.from_items([{"text": "aa bb aa cc aa bb"}])
    w, c = word_counts(ds)
    assert dict(zip(w.tolist(), c.tolist())) == {"aa": 3, "bb": 2, "cc": 1}
    w2, c2 = word_counts(ds, min_count=2)
    assert dict(zip(w2.tolist(), c2.tolist())) == {"aa": 3, "bb": 2}
    with pytest.raises(ValueError, match="max_vocab_rows"):
        word_counts(ds, max_vocab_rows=1)


def test_new_ops_schema_stable_when_empty():
    import pyarrow as pa

    from ee_outliers_ray.textstats import mix_stats, stratified_sample
    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
        "source": pa.array([], type=pa.string()),
        "lang": pa.array([], type=pa.string())}))
    m = mix_stats(empty)
    assert list(m.columns) == ["source", "lang", "n_docs", "n_tokens",
                               "mean_tokens", "token_share"]
    assert len(m) == 0
    s = stratified_sample(empty, cap=5)
    assert s.count() == 0
    assert s.schema().names == ["doc_id", "source"]
    b = bpe_train(empty)
    assert list(b.columns) == ["rank", "left", "right", "pair_count"]
    assert len(b) == 0


def test_stratified_sample_respects_cap_semantics():
    """Sources at/under the cap keep every row; others keep the mix64
    subset — recomputed here independently."""
    from ee_outliers_ray import pipelines as P
    from ee_outliers_ray.hashing import mix64

    got = P.stratified_sample(SF).to_pandas()
    import pyarrow.parquet as pq
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "source"]).to_pandas()
    n_by_src = df.groupby("source")["doc_id"].count()
    h = mix64(df["doc_id"].to_numpy().astype(np.int64).view(np.uint64))
    n = n_by_src[df["source"]].to_numpy()
    keep = (n <= P.STRAT_CAP) | (
        h.astype(np.float64)
        < (float(P.STRAT_CAP) / n.astype(np.float64)) * 2.0 ** 64)
    want = df[keep].reset_index(drop=True)
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # and it actually downsamples at least one over-cap source
    assert len(got) < len(df)
