"""Per-partition resume + hierarchical merge scope."""

import json
import os
import shutil

import pytest

from ee_outliers_ray.corpus import generate_pages
from ee_outliers_ray.index.build import build_index
from ee_outliers_ray.query.engine import taat_topk
from ee_outliers_ray.query.reader import IndexReader


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_r"))
    generate_pages(d, total_rows=400, num_files=2, seed=42)
    return d


def test_hierarchical_merge_scope_equivalent(corpus, tmp_path):
    d1 = str(tmp_path / "flat")
    d2 = str(tmp_path / "hier")
    build_index(corpus, d1, num_buckets=4, doc_range_size=64, batch_size=100)
    build_index(corpus, d2, num_buckets=4, doc_range_size=64, batch_size=100,
                merge_scope="bucket_rng")
    r1, r2 = IndexReader(d1), IndexReader(d2)
    for q in ["the data", "w0042", "search engine crawl", "the w0100"]:
        assert taat_topk(r1, q, 10) == taat_topk(r2, q, 10), q
    # hierarchical layout really has multiple rows per term
    import glob

    import pyarrow.parquet as pq

    n_rows_flat = sum(pq.read_metadata(p).num_rows for p in glob.glob(
        os.path.join(d1, "segments", "**", "*.parquet"), recursive=True))
    n_rows_hier = sum(pq.read_metadata(p).num_rows for p in glob.glob(
        os.path.join(d2, "segments", "**", "*.parquet"), recursive=True))
    assert n_rows_hier > n_rows_flat


def test_per_bucket_resume_skip(corpus, tmp_path):
    d = str(tmp_path / "idx")
    build_index(corpus, d, num_buckets=4, batch_size=100)
    with open(os.path.join(d, "segments.manifest.json")) as f:
        m1 = json.load(f)
    assert all(not b["skipped"] for b in m1["buckets"])
    before = taat_topk(IndexReader(d), "the data", 5)

    # kill ONE bucket's segment + the stage manifests; rebuild must only
    # redo that bucket (others report skipped=True) without re-tokenizing
    shutil.rmtree(os.path.join(d, "segments", "bucket=2"))
    os.remove(os.path.join(d, "segments.manifest.json"))
    os.remove(os.path.join(d, "stats.json"))
    build_index(corpus, d, num_buckets=4, batch_size=100)
    with open(os.path.join(d, "segments.manifest.json")) as f:
        m2 = json.load(f)
    skipped = {b["bucket"]: b["skipped"] for b in m2["buckets"]}
    assert skipped == {0: True, 1: True, 2: False, 3: True}
    assert taat_topk(IndexReader(d), "the data", 5) == before


def test_manifest_lineage_metrics(corpus, tmp_path):
    d = str(tmp_path / "idx2")
    build_index(corpus, d, num_buckets=4, batch_size=100)
    with open(os.path.join(d, "segments.manifest.json")) as f:
        m = json.load(f)
    assert len(m["buckets"]) == 4
    for b in m["buckets"]:
        assert b["n_terms"] >= 0 and b["n_postings"] > 0
        assert b["n_bytes"] > 0 and b["wall_s"] >= 0
