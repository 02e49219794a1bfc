"""minimum_should_match BM25 (query/engine.min_match_topk) against an
independent pure-Python oracle, plus its boundary contracts:
min_match=1 == pure OR, min_match=len(terms) == the AND set
(intersect_terms), absent terms can never satisfy the floor."""

import math
import os
import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from ee_outliers_ray.corpus import generate_pages
from ee_outliers_ray.index.build import build_index
from ee_outliers_ray.query.engine import intersect_terms, min_match_topk
from ee_outliers_ray.query.reader import IndexReader

K1, B = 1.2, 0.75
TOKEN_RE = re.compile(r"[a-z0-9]+")


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages"))
    generate_pages(d, total_rows=500, num_files=3, seed=7)
    return d


@pytest.fixture(scope="module")
def index_dir(corpus_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    build_index(corpus_dir, d, num_buckets=8, doc_range_size=128,
                batch_size=200)
    return d


@pytest.fixture(scope="module")
def docs(corpus_dir):
    out = {}
    for f in sorted(os.listdir(corpus_dir)):
        t = pq.read_table(os.path.join(corpus_dir, f))
        for doc_id, html in zip(t["doc_id"].to_pylist(),
                                t["html"].to_pylist()):
            text = html.decode().split("<p>", 1)[1].split("</p>", 1)[0]
            out[doc_id] = TOKEN_RE.findall(text.lower())
    return out


def _oracle(docs, terms, m, k):
    """Slow truth: per-doc distinct-match count + BM25 sum over matched
    terms in ascending term order (the determinism contract)."""
    tset = sorted(set(terms))
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    dfs = {t: sum(1 for v in docs.values() if t in v) for t in tset}
    rows = []
    for d, toks in docs.items():
        s, nm = 0.0, 0
        for t in tset:
            tf = toks.count(t)
            if tf == 0 or dfs[t] == 0:
                continue
            nm += 1
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            dl = len(toks)
            s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
        if nm >= m:
            rows.append((d, nm, s))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return rows[:k]


TERMS4 = ("the", "crawl", "engine", "w0042")


@pytest.mark.parametrize("terms,m", [
    (TERMS4, 1),
    (TERMS4, 2),
    (TERMS4, 3),
    (TERMS4, 4),
    (("the", "data"), 1),
    (("the", "data"), 2),
])
def test_min_match_vs_oracle(index_dir, docs, terms, m):
    reader = IndexReader(index_dir)
    d, nm, s = min_match_topk(reader, terms, m, k=15)
    truth = _oracle(docs, terms, m, 15)
    assert d.tolist() == [r[0] for r in truth]
    assert nm.tolist() == [r[1] for r in truth]
    assert np.allclose(s, [r[2] for r in truth], rtol=0, atol=1e-9)


def test_min_match_full_and_equals_intersection(index_dir):
    """m = len(terms) selects exactly the AND set (top-k of it)."""
    reader = IndexReader(index_dir)
    terms = ("the", "data")
    d, nm, _ = min_match_topk(reader, terms, len(terms), k=10**9)
    inter = intersect_terms(reader, terms)
    assert sorted(d.tolist()) == inter.tolist()
    assert (nm == len(terms)).all()


def test_min_match_searcher_equals_standalone(index_dir):
    """TaatSearcher.min_match_topk (cached-weight serving path) must be
    identical to the standalone reader function — cold, warm (weight
    cache hit), and result-cache repeat."""
    from ee_outliers_ray.query.engine import TaatSearcher

    reader = IndexReader(index_dir)
    searcher = TaatSearcher(reader)
    for terms, m in [(TERMS4, 1), (TERMS4, 2), (TERMS4, 4),
                     (("the", "data"), 2), (("zzz",), 1)]:
        d, nm, s = min_match_topk(reader, terms, m, k=12)
        want = list(zip(d.tolist(), nm.tolist(), s.tolist()))
        assert searcher.min_match_topk(terms, m, k=12) == want   # cold
        assert searcher.min_match_topk(terms, m, k=12) == want   # cached
    # plain topk through the same searcher stays unaffected by the
    # min_match cache entries
    assert searcher.topk("the data", k=5) == \
        TaatSearcher(reader).topk("the data", k=5)


@pytest.mark.parametrize("terms,m", [(TERMS4, 1), (TERMS4, 2),
                                     (TERMS4, 4), (("the", "data"), 2)])
def test_min_match_dense_equals_sparse(index_dir, terms, m):
    """The dense accumulator path and the sorted-union path of the
    shared kernel must be bit-identical — both forced explicitly on the
    same weight vectors."""
    from ee_outliers_ray.query.bm25 import idf, term_weight
    from ee_outliers_ray.query.engine import _min_match_from_vecs

    reader = IndexReader(index_dir)
    vecs = []
    for t in sorted(set(terms)):
        dec = reader.postings_decoded(t)
        if dec is None or not len(dec[0]):
            continue
        ids, tfs = dec
        vecs.append((ids, term_weight(tfs, reader.doclens[ids],
                                      idf(reader.n_docs, len(ids)),
                                      reader.avgdl)))
    sparse = _min_match_from_vecs(vecs, m, 15, n_docs=None)
    dense = _min_match_from_vecs(vecs, m, 15,
                                 n_docs=len(reader.doclens))
    assert sum(len(v[0]) for v in vecs) * 16 >= len(reader.doclens)
    for a, b in zip(sparse, dense):
        assert a.tolist() == b.tolist()


def test_min_match_absent_terms(index_dir, docs):
    reader = IndexReader(index_dir)
    # an absent clause can never count toward the floor
    d1, nm1, s1 = min_match_topk(reader, ("the", "zzzmissing"), 1, k=10)
    d2, nm2, s2 = min_match_topk(reader, ("the",), 1, k=10)
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()
    # floor above the number of present terms -> schema-stable empty
    d, nm, s = min_match_topk(reader, ("the", "zzzmissing"), 2, k=10)
    assert len(d) == len(nm) == len(s) == 0
    assert d.dtype == np.int64 and nm.dtype == np.int64
    assert s.dtype == np.float64
    # min_match < 1 coerces to 1 (pure OR), never matches-everything
    d0, _, _ = min_match_topk(reader, ("w0042",), 0, k=10**9)
    dflr, _, _ = min_match_topk(reader, ("w0042",), 1, k=10**9)
    assert d0.tolist() == dflr.tolist()


def test_more_like_this_edges(ray_session):
    """Absent source doc -> schema-stable empty; present source is never
    in its own result; every hit matches >= min_match of the selected
    terms.  (Value correctness is driver-checked by the SQL oracle in
    test_oracle_parity.)"""
    import numpy as np

    from ee_outliers_ray.pipelines import more_like_this

    sf = "/root/testdata/sf0.001"
    out = more_like_this(sf, doc_id=10**9)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_matched", "score"]
    assert out["doc_id"].dtype == np.int64
    assert out["score"].dtype == np.float64
    res = more_like_this(sf, doc_id=7, min_match=2, k=10)
    assert len(res) > 0
    assert (res["doc_id"] != 7).all()
    assert (res["n_matched"] >= 2).all()
