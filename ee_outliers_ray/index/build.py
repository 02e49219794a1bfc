"""Inverted-index build: SPIMI actors -> two-level groupby shuffle ->
compressed block-max posting segments, with per-partition manifests.

Reference analogue: this work lived inside Elasticsearch/Lucene and was
invisible to /root/reference (SURVEY.md §2.4 ST5); the batch-accumulate
precedent is the analyzers' eval-batch dicts
(/root/reference/app/analyzers/terms.py:75-101).

Pipeline (all Ray Data; doc_id dense, assigned at corpus generation):

  read_parquet(pages, columns=[doc_id, html|text])
    -> map_batches(HtmlExtract, actor pool)            # when html input
    -> map_batches(SpimiTokenize, actor pool)          # postings rows
         (term, doc_id, tf, dl, bucket, rng)           # + doclens side files
    -> groupby(bucket, rng).map_groups(encode L1 runs) # level-1: skew-proof
    -> write runs/  (parquet, partitioned by bucket)   # checkpoint boundary:
                                                       # resume skips re-tokenize
    -> read runs -> groupby(bucket).map_groups(concat) # level-2 tiered merge
    -> write segments/ (partitioned by bucket, term-sorted)
  stats.json: N, total_len, avgdl, config, throughput metrics

Skew handling: the level-1 key is (term_bucket, doc_range).  A Zipf-hot
term (stopword) is split across all doc-ranges, so no single level-1 group
exceeds ``doc_range_size`` postings per term; the level-2 merge
concatenates each term's runs **in doc-range order** — a metadata-level
byte concat (codec.concat_runs), never a re-decode.  This is the
"heavy-hitter term splitting + log-structured tiered merge" of the north
star, applied uniformly (no hot-term detection needed).
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..extract import HtmlExtract
from ..tokenizer import tokenize_column
from .codec import EncodedRun, concat_runs, encode_postings

DEFAULT_NUM_BUCKETS = 32
DEFAULT_DOC_RANGE_SIZE = 1 << 20  # 1M docs per level-1 range


def term_bucket_of(terms: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic (process-independent) term -> bucket via crc32."""
    return np.fromiter(
        (zlib.crc32(t.encode()) % num_buckets for t in terms),
        dtype=np.int32,
        count=len(terms),
    )


class SpimiTokenize:
    """Actor-pool stage: (doc_id, text) -> posting rows; doclens side files.

    State built once per actor (`__init__`): output dir handles.  Per batch
    (`__call__`): vectorized tokenize, per-(doc, term) tf via a single
    ``np.unique`` over composed int64 keys, bucket ids computed only for
    the batch-local dictionary (small) and gathered — no per-posting Python.

    Doclens are written as side parquet files named by the batch's min
    doc_id — deterministic and idempotent under task retry (same batch ->
    same file, atomic tmp+rename).
    """

    def __init__(self, doclens_dir: str, num_buckets: int, doc_range_size: int):
        self.doclens_dir = doclens_dir
        self.num_buckets = num_buckets
        self.doc_range_size = doc_range_size
        os.makedirs(doclens_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = tokenize_column(batch["text"])
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        dls = (offsets[1:] - offsets[:-1]).astype(np.int64)

        # side output: doclens for every doc in the batch (incl. dl=0)
        self._write_doclens(doc_ids, dls)

        flat = toks.flatten()
        n_tok = len(flat)
        if n_tok == 0:
            return pa.table({
                "term": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "tf": pa.array([], type=pa.int32()),
                "dl": pa.array([], type=pa.int32()),
                "bucket": pa.array([], type=pa.int32()),
                "rng": pa.array([], type=pa.int32()),
            })
        enc = flat.dictionary_encode()
        term_ids = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictionary = enc.dictionary
        n_terms = len(dictionary)
        doc_idx = np.repeat(np.arange(len(doc_ids), dtype=np.int64), offsets[1:] - offsets[:-1])

        keys = doc_idx * n_terms + term_ids
        uniq, tf = np.unique(keys, return_counts=True)
        u_doc = uniq // n_terms
        u_term = (uniq % n_terms).astype(np.int64)

        dict_np = np.asarray(dictionary.to_pandas(), dtype=object)
        bucket_per_dict = term_bucket_of(dict_np, self.num_buckets)

        out_doc = doc_ids[u_doc]
        return pa.table({
            "term": dictionary.take(pa.array(u_term)),
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "tf": pa.array(tf.astype(np.int32)),
            "dl": pa.array(dls[u_doc].astype(np.int32)),
            "bucket": pa.array(bucket_per_dict[u_term]),
            "rng": pa.array((out_doc // self.doc_range_size).astype(np.int32)),
        })

    def _write_doclens(self, doc_ids: np.ndarray, dls: np.ndarray) -> None:
        if len(doc_ids) == 0:
            return
        name = f"doclens-{int(doc_ids.min()):014d}.parquet"
        path = os.path.join(self.doclens_dir, name)
        if os.path.exists(path):
            return
        t = pa.table({"doc_id": pa.array(doc_ids), "dl": pa.array(dls)})
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(t, tmp)
        os.rename(tmp, path)


def _run_to_row(term: str, bucket: int, rng: int, run: EncodedRun) -> dict:
    return {
        "term": term,
        "bucket": bucket,
        "rng": rng,
        "df": run.n_postings,
        "payload": run.payload,
        "block_len": run.block_len.tolist(),
        "block_offset": run.block_offset.tolist(),
        "block_first_doc": run.block_first_doc.tolist(),
        "block_last_doc": run.block_last_doc.tolist(),
        "block_max_tf": run.block_max_tf.tolist(),
        "block_min_dl": run.block_min_dl.tolist(),
    }


def _row_to_run(row) -> EncodedRun:
    return EncodedRun(
        payload=row["payload"],
        block_len=np.asarray(row["block_len"], dtype=np.int32),
        block_offset=np.asarray(row["block_offset"], dtype=np.int64),
        block_first_doc=np.asarray(row["block_first_doc"], dtype=np.int64),
        block_last_doc=np.asarray(row["block_last_doc"], dtype=np.int64),
        block_max_tf=np.asarray(row["block_max_tf"], dtype=np.int32),
        block_min_dl=np.asarray(row["block_min_dl"], dtype=np.int32),
    )


_RUN_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("bucket", pa.int32()),
    ("rng", pa.int32()),
    ("df", pa.int64()),
    ("payload", pa.binary()),
    ("block_len", pa.list_(pa.int32())),
    ("block_offset", pa.list_(pa.int64())),
    ("block_first_doc", pa.list_(pa.int64())),
    ("block_last_doc", pa.list_(pa.int64())),
    ("block_max_tf", pa.list_(pa.int32())),
    ("block_min_dl", pa.list_(pa.int32())),
])


def _encode_l1_group(group: pa.Table) -> pa.Table:
    """Level-1: all postings of one (bucket, rng) -> one encoded run per term."""
    if group.num_rows == 0:
        return _RUN_SCHEMA.empty_table()
    bucket = int(group["bucket"][0].as_py())
    rng = int(group["rng"][0].as_py())
    df = pd.DataFrame({
        "term": group["term"].to_pandas(),
        "doc_id": group["doc_id"].to_numpy(zero_copy_only=False),
        "tf": group["tf"].to_numpy(zero_copy_only=False),
        "dl": group["dl"].to_numpy(zero_copy_only=False),
    })
    df.sort_values(["term", "doc_id"], inplace=True, kind="stable")
    terms = df["term"].to_numpy()
    doc_ids = df["doc_id"].to_numpy(dtype=np.int64)
    tfs = df["tf"].to_numpy(dtype=np.int64)
    dls = df["dl"].to_numpy(dtype=np.int64)
    # term boundaries
    change = np.empty(len(terms), dtype=bool)
    change[0] = True
    change[1:] = terms[1:] != terms[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(terms))
    rows = []
    for s, e in zip(starts, ends):
        run = encode_postings(doc_ids[s:e], tfs[s:e], dls[s:e])
        rows.append(_run_to_row(terms[s], bucket, rng, run))
    return pa.Table.from_pylist(rows, schema=_RUN_SCHEMA)


def _merge_bucket_group(group: pa.Table) -> pa.Table:
    """Level-2: all runs of one bucket -> one merged run per term, term-sorted."""
    if group.num_rows == 0:
        return _RUN_SCHEMA.empty_table()
    bucket = int(group["bucket"][0].as_py())
    rows = group.sort_by([("term", "ascending"), ("rng", "ascending")]).to_pylist()
    out = []
    i = 0
    while i < len(rows):
        j = i
        while j < len(rows) and rows[j]["term"] == rows[i]["term"]:
            j += 1
        merged = concat_runs([_row_to_run(r) for r in rows[i:j]])
        out.append(_run_to_row(rows[i]["term"], bucket, 0, merged))
        i = j
    return pa.Table.from_pylist(out, schema=_RUN_SCHEMA)


def build_index(pages_path: str, index_dir: str, *,
                num_buckets: int = DEFAULT_NUM_BUCKETS,
                doc_range_size: int = DEFAULT_DOC_RANGE_SIZE,
                from_html: bool = True,
                batch_size: int = 2048,
                concurrency: int | tuple | None = None,
                overwrite: bool = False) -> dict:
    """Build the full index under ``index_dir``.  Returns the stats manifest.

    Resumable: if ``runs/`` has a manifest but ``segments/`` does not, the
    build restarts from the compressed runs without re-tokenizing
    (SURVEY §7.5.8); if ``segments/`` has a manifest the build is a no-op.
    """
    import ray.data

    t0 = time.time()
    runs_dir = os.path.join(index_dir, "runs")
    segments_dir = os.path.join(index_dir, "segments")
    doclens_dir = os.path.join(index_dir, "doclens")
    stats_path = os.path.join(index_dir, "stats.json")
    runs_manifest = os.path.join(index_dir, "runs.manifest.json")
    seg_manifest = os.path.join(index_dir, "segments.manifest.json")
    os.makedirs(index_dir, exist_ok=True)

    if overwrite:
        for p in (runs_manifest, seg_manifest, stats_path):
            if os.path.exists(p):
                os.remove(p)
        import shutil
        for d in (runs_dir, segments_dir, doclens_dir):
            shutil.rmtree(d, ignore_errors=True)

    if os.path.exists(seg_manifest):
        with open(stats_path) as f:
            return json.load(f)

    if concurrency is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, ncpu - 1))

    n_docs_total = 0
    if not os.path.exists(runs_manifest):
        cols = ["doc_id", "html"] if from_html else ["doc_id", "text"]
        ds = ray.data.read_parquet(pages_path, columns=cols)
        if from_html:
            ds = ds.map_batches(HtmlExtract, batch_format="pyarrow",
                                batch_size=batch_size, concurrency=concurrency)
        postings = ds.map_batches(
            SpimiTokenize,
            fn_constructor_kwargs={
                "doclens_dir": doclens_dir,
                "num_buckets": num_buckets,
                "doc_range_size": doc_range_size,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
        runs = postings.groupby(["bucket", "rng"]).map_groups(
            _encode_l1_group, batch_format="pyarrow")
        runs.write_parquet(runs_dir)
        t_runs = time.time()
        with open(runs_manifest + ".tmp", "w") as f:
            json.dump({"pages_path": pages_path, "num_buckets": num_buckets,
                       "doc_range_size": doc_range_size,
                       "wall_s": t_runs - t0}, f)
        os.rename(runs_manifest + ".tmp", runs_manifest)

    t1 = time.time()
    runs_ds = ray.data.read_parquet(runs_dir)
    segs = runs_ds.groupby("bucket").map_groups(_merge_bucket_group,
                                                batch_format="pyarrow")
    segs.write_parquet(segments_dir, partition_cols=["bucket"])
    t2 = time.time()

    # corpus stats from the doclens sidecar (dedup-safe: doc_id is unique
    # per file by construction; duplicate files impossible due to
    # deterministic naming)
    dl_tbl = pq.read_table(doclens_dir, columns=["doc_id", "dl"])
    dl_pd = dl_tbl.to_pandas().drop_duplicates("doc_id")
    n_docs_total = int(len(dl_pd))
    total_len = int(dl_pd["dl"].sum())
    stats = {
        "n_docs": n_docs_total,
        "total_len": total_len,
        "avgdl": (total_len / n_docs_total) if n_docs_total else 0.0,
        "num_buckets": num_buckets,
        "doc_range_size": doc_range_size,
        "pages_path": pages_path,
        "wall_s_total": time.time() - t0,
        "wall_s_merge": t2 - t1,
        "build_docs_per_s": n_docs_total / max(1e-9, time.time() - t0),
    }
    with open(stats_path + ".tmp", "w") as f:
        json.dump(stats, f, indent=1)
    os.rename(stats_path + ".tmp", stats_path)
    with open(seg_manifest + ".tmp", "w") as f:
        json.dump({"segments_dir": segments_dir, "wall_s": t2 - t1}, f)
    os.rename(seg_manifest + ".tmp", seg_manifest)
    return stats
