"""Inverted-index build: shuffle-free SPIMI encode actors -> one groupby
shuffle over *compressed runs* -> tiered merge into block-max posting
segments, with per-partition manifests.

Reference analogue: this work lived inside Elasticsearch/Lucene and was
invisible to /root/reference (SURVEY.md §2.4 ST5); the batch-accumulate
precedent is the analyzers' eval-batch dicts
(/root/reference/app/analyzers/terms.py:75-101).

Pipeline (all Ray Data; doc_id dense, assigned at corpus generation):

  read_parquet(pages, columns=[doc_id, html|text])
    -> map_batches(HtmlExtract, actor pool)        # when html input
    -> map_batches(SpimiEncode, actor pool)        # classic SPIMI: tokenize,
         per-(doc,term) tf, sort, delta+bitpack -> one COMPRESSED run row
         per (term, batch); doclens side files
    -> write runs/                                 # checkpoint boundary:
                                                   # resume skips re-tokenize
    -> read runs -> groupby(bucket).map_groups     # tiered merge: concat
         (order runs by first_doc, byte-concat)    # doc-disjoint runs
    -> write segments/ (partitioned by bucket, term-sorted)
  stats.json: N, total_len, avgdl, config, throughput metrics

Why runs shuffle, not postings shuffle: raw postings are ~50x more rows
than run rows (one row per (term, batch) instead of per (term, doc)), and
runs are already delta+bitpacked — the all-to-all exchange moves
compressed bytes.  Measured on 1M docs this cut the build's shuffle from
the dominant cost to noise.

Skew handling: a Zipf-hot term's postings arrive as many doc-disjoint
runs (one per batch) that merge by metadata-level byte concat
(codec.concat_runs) — never a re-decode, never a single giant group of
raw postings.  At 10^12 docs the merge groupby key gains the run's
``rng`` (doc-range) column already emitted here, making the merge
hierarchical per (bucket, doc-range) with bounded group payload; the
query reader already concats multiple segment rows per term in first_doc
order, so both layouts read identically.
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..extract import HtmlExtract
from ..tokenizer import tokenize_column
from .codec import EncodedRun, concat_runs, encode_postings, pack_words

DEFAULT_NUM_BUCKETS = 32
DEFAULT_DOC_RANGE_SIZE = 1 << 20  # doc-range granularity recorded on runs


def term_bucket_of(terms: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic (process-independent) term -> bucket via crc32."""
    return np.fromiter(
        (zlib.crc32(t.encode()) % num_buckets for t in terms),
        dtype=np.int32,
        count=len(terms),
    )


def term_bucket_of_arrow(dictionary: pa.Array, num_buckets: int) -> np.ndarray:
    """``term_bucket_of`` for an Arrow string array without leaving
    numpy: vectorized crc32 straight off the Arrow byte buffers
    (bit-identical to zlib.crc32, so the segment bucket LAYOUT is
    unchanged — readers keep computing buckets with zlib.crc32)."""
    from ..hashing import crc32_segments, string_bytes

    data, offsets = string_bytes(dictionary)
    return (crc32_segments(data, offsets)
            % np.uint32(num_buckets)).astype(np.int32)


_RUN_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("bucket", pa.int32()),
    ("rng", pa.int32()),
    ("first_doc", pa.int64()),
    ("df", pa.int64()),
    ("payload", pa.binary()),
    ("block_len", pa.list_(pa.int32())),
    ("block_offset", pa.list_(pa.int64())),
    ("block_first_doc", pa.list_(pa.int64())),
    ("block_last_doc", pa.list_(pa.int64())),
    ("block_max_tf", pa.list_(pa.int32())),
    ("block_min_dl", pa.list_(pa.int32())),
])

_RUN_SCHEMA_POS = _RUN_SCHEMA.append(pa.field("positions", pa.list_(pa.int32())))

# the non-positional projection of a segment row: readers serving
# phrase-free queries pass this as ``columns=`` so a positional index's
# position payloads (BASELINE.md: ~2/3 of a positional segment's bytes)
# never leave disk on the BM25 / boolean read path
RUN_BASE_COLUMNS = [f.name for f in _RUN_SCHEMA]


def _run_to_row(term: str, bucket: int, rng: int, run: EncodedRun) -> dict:
    return {
        "term": term,
        "bucket": bucket,
        "rng": rng,
        "first_doc": int(run.block_first_doc[0]),
        "df": run.n_postings,
        "payload": run.payload,
        "block_len": run.block_len.tolist(),
        "block_offset": run.block_offset.tolist(),
        "block_first_doc": run.block_first_doc.tolist(),
        "block_last_doc": run.block_last_doc.tolist(),
        "block_max_tf": run.block_max_tf.tolist(),
        "block_min_dl": run.block_min_dl.tolist(),
    }


def write_segment_table(table: pa.Table, path: str,
                        target_bytes: int = 4 << 20,
                        max_rows: int = 256) -> None:
    """Write a (term-sorted) segment table with SIZE-AWARE row groups: a
    new row group starts when the accumulated payload bytes would exceed
    ``target_bytes`` or the row count ``max_rows``.  Terms are sorted,
    so each row group carries a tight term min/max — the reader's
    per-term predicate-pushdown read then decodes only the matching row
    group(s) instead of the whole bucket file.  A hot term's multi-MB
    payload forms (roughly) its own group; the old fixed
    row_group_size=4096 made one giant group whose EVERY payload was
    decompressed for EVERY term lookup — O(bucket bytes) read
    amplification per query term at web-scale vocabularies."""
    import pyarrow.compute as pc

    if table.num_rows == 0:
        pq.write_table(table, path)
        return
    sizes = pc.binary_length(table["payload"]).to_numpy(
        zero_copy_only=False).astype(np.int64)
    cuts = [0]
    acc = rows = 0
    for i, s in enumerate(sizes.tolist()):
        if rows and (acc + s > target_bytes or rows >= max_rows):
            cuts.append(i)
            acc = rows = 0
        acc += s
        rows += 1
    cuts.append(table.num_rows)
    with pq.ParquetWriter(path, table.schema) as w:
        for lo, hi in zip(cuts[:-1], cuts[1:]):
            w.write_table(table.slice(lo, hi - lo))


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


def spimi_encode_batch(batch: pa.Table, *, doclens_dir: str,
                       num_buckets: int, doc_range_size: int,
                       from_html: bool = False,
                       store_positions: bool = False) -> pa.Table:
    """SPIMI stage body: (doc_id, text|html) batch -> compressed posting
    runs, one run per (term, batch).

    Vectorized tokenize, per-(doc, term) tf via one ``np.unique`` over
    composed int64 keys, then per-term delta+bitpack encode.  Runs of the
    same term from different batches are doc-disjoint, so the merge can
    byte-concat them ordered by ``first_doc``.

    Runs as STATELESS map_batches tasks, not an actor pool: the stage
    holds no per-worker state (the extract pattern is a constant, numpy
    kernels are module-level), and measured on 1M docs the task pool was
    ~2x faster than an actor pool at 8 CPUs (better pipelining, no pool
    startup/rebalance cost).  ``SpimiEncode`` below keeps the actor-pool
    form for callers that do want amortized state.

    Doclens are written as side parquet files named by the batch's min
    doc_id — deterministic and idempotent under task retry.
    """
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(doc_ids) > 1 and not (doc_ids[1:] >= doc_ids[:-1]).all():
        # a batch may span non-adjacent blocks; keep runs doc-sorted
        batch = batch.take(pa.array(np.argsort(doc_ids, kind="stable")))
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    # split at doc_id discontinuities (a batch spanning non-adjacent files)
    # so every emitted run covers a CONTIGUOUS doc interval: runs of a term
    # then never interleave and the merge is always a metadata-level byte
    # concat, never a decode+re-encode.  False splits on sparse ids only
    # cost extra (still-correct) runs.
    if len(doc_ids) > 1:
        jumps = np.flatnonzero(np.diff(doc_ids) > _CONTIG_GAP) + 1
        if len(jumps):
            parts = []
            lo = 0
            for hi in list(jumps) + [len(doc_ids)]:
                parts.append(_encode_part(batch.slice(lo, hi - lo), doclens_dir,
                                          num_buckets, doc_range_size, from_html,
                                          store_positions))
                lo = hi
            return pa.concat_tables(parts).sort_by(
                [("bucket", "ascending"), ("term", "ascending")])
    return _encode_part(batch, doclens_dir, num_buckets, doc_range_size,
                        from_html, store_positions)


_CONTIG_GAP = 4096


def _encode_part(batch: pa.Table, doclens_dir: str, num_buckets: int,
                 doc_range_size: int, from_html: bool = False,
                 store_positions: bool = False) -> pa.Table:
    """Encode one doc-contiguous batch slice into run rows."""
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = None
    if from_html:
        from ..tokenizer import tokenize_html_column

        # fused path: tokenize inside the html buffer (no text column
        # materialized); None -> non-ASCII payload, extract then tokenize
        toks = tokenize_html_column(batch["html"])
        if toks is None:
            batch = _EXTRACT(batch)
    if toks is None:
        toks = tokenize_column(batch["text"])
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    dls = (offsets[1:] - offsets[:-1]).astype(np.int64)
    _write_doclens(doclens_dir, doc_ids, dls)

    flat = toks.flatten()
    if len(flat) == 0:
        return (_RUN_SCHEMA_POS if store_positions
                else _RUN_SCHEMA).empty_table()
    enc = flat.dictionary_encode()
    n_rows = len(doc_ids)
    term_ids = enc.indices.to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(n_rows), offsets[1:] - offsets[:-1])
    # (term, doc) tf counts, sorted by (term_id, doc_idx) by key order;
    # int32 keys when they fit (halves the sort's memory traffic — the
    # unique() over composed keys is the hottest array in the stage)
    n_terms = len(enc.dictionary)
    if n_terms * n_rows < (1 << 31):
        keys = term_ids.astype(np.int32) * np.int32(n_rows) + \
            doc_idx.astype(np.int32)
    else:
        keys = term_ids.astype(np.int64) * n_rows + doc_idx
    uniq, tf = np.unique(keys, return_counts=True)
    uniq = uniq.astype(np.int64)
    u_term = (uniq // n_rows).astype(np.int64)
    u_doc = (uniq % n_rows).astype(np.int64)
    out_doc = doc_ids[u_doc]
    out_dl = dls[u_doc]

    bucket_per_dict = term_bucket_of_arrow(enc.dictionary, num_buckets)

    positions_sorted = None
    if store_positions:
        # token offset within its document, sorted to align with the
        # (term, doc) posting stream: lexsort primary=term, then doc,
        # then in-doc position (ascending)
        counts = (offsets[1:] - offsets[:-1])
        tok_pos = (np.arange(len(term_ids), dtype=np.int64)
                   - np.repeat(offsets[:-1], counts))
        order = np.lexsort((tok_pos, doc_idx, term_ids))
        positions_sorted = tok_pos[order].astype(np.int32)
    out = _encode_terms_vectorized(u_term, out_doc, tf, out_dl,
                                   enc.dictionary, bucket_per_dict,
                                   doc_range_size,
                                   positions=positions_sorted)
    # cluster by bucket so the per-bucket merge can prune row groups
    # (runs are written with small row groups; the merge reads only the
    # groups whose bucket-stat range matches)
    return out.sort_by([("bucket", "ascending"), ("term", "ascending")])


def _bit_widths(v: np.ndarray) -> np.ndarray:
    """Vectorized bit_length (>=1) via frexp (exact below 2^53)."""
    _, e = np.frexp(np.maximum(v, 1).astype(np.float64))
    return e.astype(np.int64)


def _encode_terms_vectorized(u_term: np.ndarray, doc: np.ndarray,
                             tf: np.ndarray, dl: np.ndarray,
                             dictionary, bucket_per_dict: np.ndarray,
                             doc_range_size: int,
                             block_size: int = 128,
                             positions: np.ndarray | None = None) -> pa.Table:
    """Encode ALL terms' posting runs of one batch in a handful of numpy
    passes (no per-term Python): block segmentation, per-block widths via
    reduceat, grouped bit-packing (blocks sharing (len, width) pack in
    one batched np.packbits), and direct Arrow array assembly — the
    payload buffer IS the Binary column's data buffer, sliced per term.
    Byte layout identical to codec.encode_postings (tested)."""
    n = len(u_term)
    # term boundaries
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = u_term[1:] != u_term[:-1]
    t_starts = np.flatnonzero(change)
    t_counts = np.diff(np.append(t_starts, n))

    # block segmentation within each term
    pos_in_term = np.arange(n, dtype=np.int64) - np.repeat(t_starts, t_counts)
    b_bound = change | (pos_in_term % block_size == 0)
    b_starts = np.flatnonzero(b_bound)
    nb = len(b_starts)
    b_len = np.diff(np.append(b_starts, n)).astype(np.int64)
    b_ends = b_starts + b_len

    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = 0
    np.subtract(doc[1:], doc[:-1], out=deltas[1:])
    deltas[b_starts] = 0
    tfm1 = tf.astype(np.int64) - 1

    b_first = doc[b_starts]
    b_last = doc[b_ends - 1]
    b_maxd = np.maximum.reduceat(deltas, b_starts)
    b_maxtf = np.maximum.reduceat(tfm1, b_starts)
    b_mindl = np.minimum.reduceat(dl, b_starts)
    wd = _bit_widths(b_maxd)
    wt = _bit_widths(b_maxtf)

    nd = (b_len * wd + 7) // 8
    nt = (b_len * wt + 7) // 8
    blen = 2 + nd + nt
    boffs = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(blen, out=boffs[1:])
    buf = np.zeros(int(boffs[-1]), dtype=np.uint8)
    buf[boffs[:-1]] = wd
    buf[boffs[:-1] + 1] = wt

    def pack(values: np.ndarray, widths: np.ndarray, data_off: np.ndarray):
        # group blocks by (length, width) and pack each group in one
        # shot; ONE argsort finds all groups (a per-key flatnonzero scan
        # was O(groups x blocks) — hundreds of full passes per batch)
        shape_key = (b_len << 8) | widths
        order = np.argsort(shape_key, kind="stable")
        sk = shape_key[order]
        g_starts = np.flatnonzero(
            np.concatenate([[True], sk[1:] != sk[:-1]]))
        g_ends = np.append(g_starts[1:], len(order))
        for gs, ge in zip(g_starts, g_ends):
            sel = order[gs:ge]
            L = int(b_len[sel[0]])
            w = int(widths[sel[0]])
            k = len(sel)
            gather = b_starts[sel][:, None] + np.arange(L, dtype=np.int64)
            vals = values[gather].astype(np.uint64)          # (k, L)
            nbytes = (L * w + 7) // 8
            if 4 <= w <= 57:
                # the ONE shared word-lane kernel (codec.pack_words)
                packed = pack_words(vals, w)
            else:
                bits = ((vals[:, :, None] >> np.arange(w, dtype=np.uint64))
                        & 1).astype(np.uint8).reshape(k, L * w)
                pad = (-bits.shape[1]) % 8
                if pad:
                    bits = np.concatenate(
                        [bits, np.zeros((k, pad), dtype=np.uint8)], axis=1)
                packed = np.packbits(bits.reshape(k, nbytes, 8)[:, :, ::-1],
                                     axis=2).reshape(k, nbytes)
            tgt = data_off[sel][:, None] + np.arange(nbytes, dtype=np.int64)
            buf[tgt.reshape(-1)] = packed.reshape(-1)

    pack(deltas, wd, boffs[:-1] + 2)
    pack(tfm1, wt, boffs[:-1] + 2 + nd)

    # runs: per-term slices over blocks / bytes
    term_of_block = u_term[b_starts]
    tb_change = np.empty(nb, dtype=bool)
    tb_change[0] = True
    tb_change[1:] = term_of_block[1:] != term_of_block[:-1]
    r_bstarts = np.flatnonzero(tb_change)          # first block of each run
    r_bcounts = np.diff(np.append(r_bstarts, nb))
    run_term = term_of_block[r_bstarts]
    run_byte_start = boffs[r_bstarts]
    run_byte_end = boffs[np.append(r_bstarts[1:], nb)]

    payload_offsets = np.zeros(len(r_bstarts) + 1, dtype=np.int32)
    payload_offsets[1:] = run_byte_end.astype(np.int32)
    # py_buffer wraps the numpy arrays zero-copy (no .tobytes() copies)
    payload = pa.BinaryArray.from_buffers(
        pa.binary(), len(r_bstarts),
        [None, pa.py_buffer(payload_offsets), pa.py_buffer(buf)])

    rel_block_offset = boffs[:-1] - np.repeat(run_byte_start, r_bcounts)
    list_off = np.zeros(len(r_bstarts) + 1, dtype=np.int64)
    np.cumsum(r_bcounts, out=list_off[1:])
    loff = pa.array(list_off, type=pa.int64())

    def lst(arr, typ):
        return pa.ListArray.from_arrays(loff, pa.array(arr.astype(typ)))

    run_df = np.add.reduceat(b_len, r_bstarts)
    cols = {
        "term": dictionary.take(pa.array(run_term)),
        "bucket": pa.array(bucket_per_dict[run_term], type=pa.int32()),
        "rng": pa.array((b_first[r_bstarts] // doc_range_size).astype(np.int32)),
        "first_doc": pa.array(b_first[r_bstarts], type=pa.int64()),
        "df": pa.array(run_df, type=pa.int64()),
        "payload": payload,
        "block_len": lst(b_len, np.int32),
        "block_offset": lst(rel_block_offset, np.int64),
        "block_first_doc": lst(b_first, np.int64),
        "block_last_doc": lst(b_last, np.int64),
        "block_max_tf": lst(b_maxtf + 1, np.int32),
        "block_min_dl": lst(b_mindl, np.int32),
    }
    if positions is None:
        return pa.table(cols).cast(_RUN_SCHEMA)
    # flat in-doc positions aligned with the (term, doc) posting stream;
    # per-run slice boundaries = cumulative tf at each run's posting range
    cum_tf = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tf, out=cum_tf[1:])
    # run r covers postings [t_starts[r], t_starts[r+1]) (one run per term
    # within a batch part), so its positions slice is the cumulative-tf
    # range at those boundaries
    pos_off = np.zeros(len(r_bstarts) + 1, dtype=np.int64)
    pos_off[:-1] = cum_tf[t_starts]
    pos_off[-1] = cum_tf[-1]
    cols["positions"] = pa.ListArray.from_arrays(
        pa.array(pos_off, type=pa.int64()),
        pa.array(positions.astype(np.int32)))
    return pa.table(cols).cast(_RUN_SCHEMA_POS)


_EXTRACT = HtmlExtract()


def _write_doclens(doclens_dir: str, doc_ids: np.ndarray, dls: np.ndarray) -> None:
    if len(doc_ids) == 0:
        return
    os.makedirs(doclens_dir, exist_ok=True)
    name = f"doclens-{int(doc_ids.min()):014d}.parquet"
    path = os.path.join(doclens_dir, name)
    if os.path.exists(path):
        return
    t = pa.table({"doc_id": pa.array(doc_ids), "dl": pa.array(dls)})
    tmp = path + f".tmp{os.getpid()}"
    pq.write_table(t, tmp)
    os.rename(tmp, path)


class SpimiEncode:
    """Actor-pool form of ``spimi_encode_batch`` (state amortized per
    actor) — used when callers want an explicit pool; ``build_index``
    uses the stateless task form."""

    def __init__(self, doclens_dir: str, num_buckets: int, doc_range_size: int,
                 from_html: bool = False):
        self.kw = dict(doclens_dir=doclens_dir, num_buckets=num_buckets,
                       doc_range_size=doc_range_size, from_html=from_html)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return spimi_encode_batch(batch, **self.kw)


def _merge_bucket_group(group: pa.Table, scope: str = "bucket") -> pa.Table:
    """Tiered merge: all runs of one bucket -> one merged run per term,
    term-sorted output; per-term runs byte-concatenated in first_doc
    order.

    Vectorized over the flattened Arrow arrays: block metadata lists are
    concatenated wholesale (child arrays are already in row order after
    the sort), block byte-offsets are shifted by each run's payload base
    via one repeat+add, and per-term payloads are joined as buffers.  A
    per-term Python fallback (decode, merge, re-encode) only triggers for
    the rare interleaved-range case.
    """
    has_pos = "positions" in group.column_names
    if group.num_rows == 0:
        return (_RUN_SCHEMA_POS if has_pos else _RUN_SCHEMA).empty_table()
    group = group.sort_by([("term", "ascending"), ("rng", "ascending"),
                           ("first_doc", "ascending")])
    bucket = int(group["bucket"][0].as_py())
    n = group.num_rows
    rng_col = group["rng"].to_numpy(zero_copy_only=False) \
        if scope == "bucket_rng" else None

    term_arr = group["term"]
    if isinstance(term_arr, pa.ChunkedArray):
        term_arr = term_arr.combine_chunks()
    terms = np.asarray(term_arr.to_pandas(), dtype=object)
    df = group["df"].to_numpy(zero_copy_only=False).astype(np.int64)

    payload_col = group["payload"]
    if isinstance(payload_col, pa.ChunkedArray):
        payload_col = payload_col.combine_chunks()
    payloads = payload_col.to_pylist()  # list of bytes (buffer views)
    pay_len = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)

    def flat(col_name, dtype):
        col = group[col_name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        values = col.values.to_numpy(zero_copy_only=False).astype(dtype)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        return values, offs

    pos_vals = pos_off = None
    if has_pos:
        pos_vals, pos_off = flat("positions", np.int32)
    bl_len, l_off = flat("block_len", np.int32)
    bl_offset, _ = flat("block_offset", np.int64)
    bl_first, _ = flat("block_first_doc", np.int64)
    bl_last, _ = flat("block_last_doc", np.int64)
    bl_maxtf, _ = flat("block_max_tf", np.int32)
    bl_mindl, _ = flat("block_min_dl", np.int32)
    blocks_per_row = l_off[1:] - l_off[:-1]

    # merge-group boundaries: per term, or per (term, doc-range) when
    # the hierarchical scope is requested (bounded groups at 10^12-doc
    # scale; the reader concats the resulting per-range segment rows)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = terms[1:] != terms[:-1]
    if rng_col is not None:
        change[1:] |= rng_col[1:] != rng_col[:-1]
    t_starts = np.flatnonzero(change)
    t_ends = np.append(t_starts[1:], n)

    # payload byte base per row, restarting at each term group
    pay_cum = np.concatenate([[0], np.cumsum(pay_len)[:-1]])
    group_base = np.repeat(pay_cum[t_starts], t_ends - t_starts)
    row_base = pay_cum - group_base                       # per-row shift
    shifted_offsets = bl_offset + np.repeat(row_base, blocks_per_row)

    # chainability per term: every run's last doc < next run's first doc
    row_first = group["first_doc"].to_numpy(zero_copy_only=False)
    row_last = bl_last[l_off[1:] - 1]                     # last block's last doc
    ok_pair = np.empty(n, dtype=bool)
    ok_pair[0] = True
    ok_pair[1:] = (row_last[:-1] < row_first[1:]) | change[1:]
    chainable_term = np.logical_and.reduceat(ok_pair if n else ok_pair,
                                             t_starts)

    out_rows = []
    l_cum = l_off  # list offsets into flattened block arrays
    for ti, (s, e) in enumerate(zip(t_starts, t_ends)):
        fs, fe = l_cum[s], l_cum[e]
        out_rng = int(rng_col[s]) if rng_col is not None else 0
        if chainable_term[ti]:
            row = {
                "term": terms[s],
                "bucket": bucket,
                "rng": out_rng,
                "first_doc": int(row_first[s]),
                "df": int(df[s:e].sum()),
                "payload": b"".join(payloads[s:e]),
                "block_len": bl_len[fs:fe].tolist(),
                "block_offset": shifted_offsets[fs:fe].tolist(),
                "block_first_doc": bl_first[fs:fe].tolist(),
                "block_last_doc": bl_last[fs:fe].tolist(),
                "block_max_tf": bl_maxtf[fs:fe].tolist(),
                "block_min_dl": bl_mindl[fs:fe].tolist(),
            }
            if has_pos:
                # runs' positions concatenate in the same order as their
                # postings (per-run flat slices are contiguous post-sort)
                row["positions"] = pos_vals[pos_off[s]:pos_off[e]].tolist()
            out_rows.append(row)
        else:
            # rare fallback: interleaved ranges -> decode, merge, re-encode
            from .codec import decode_run

            runs = [
                EncodedRun(
                    payload=payloads[k],
                    block_len=bl_len[l_cum[k]:l_cum[k + 1]],
                    block_offset=bl_offset[l_cum[k]:l_cum[k + 1]],
                    block_first_doc=bl_first[l_cum[k]:l_cum[k + 1]],
                    block_last_doc=bl_last[l_cum[k]:l_cum[k + 1]],
                    block_max_tf=bl_maxtf[l_cum[k]:l_cum[k + 1]],
                    block_min_dl=bl_mindl[l_cum[k]:l_cum[k + 1]],
                )
                for k in range(s, e)
            ]
            parts = [decode_run(r) for r in runs]
            d = np.concatenate([p[0] for p in parts])
            t = np.concatenate([p[1] for p in parts])
            dls = np.concatenate([
                np.repeat(r.block_min_dl, r.block_len) for r in runs])
            order = np.argsort(d, kind="stable")
            merged = encode_postings(d[order], t[order], dls[order])
            row = _run_to_row(terms[s], bucket, out_rng, merged)
            if has_pos:
                # reorder per-posting position lists to the merged doc order
                cum = np.zeros(len(t) + 1, dtype=np.int64)
                np.cumsum(t, out=cum[1:])
                flat_pos = pos_vals[pos_off[s]:pos_off[e]]
                row["positions"] = np.concatenate(
                    [flat_pos[cum[k]:cum[k + 1]] for k in order]).tolist()                     if len(order) else []
            out_rows.append(row)
    return pa.Table.from_pylist(
        out_rows, schema=_RUN_SCHEMA_POS if has_pos else _RUN_SCHEMA)


def build_index(pages_path: str, index_dir: str, *,
                num_buckets: int = DEFAULT_NUM_BUCKETS,
                doc_range_size: int = DEFAULT_DOC_RANGE_SIZE,
                from_html: bool = True,
                batch_size: int = 8192,
                concurrency: int | tuple | None = None,
                merge_scope: str = "bucket",
                merge_parts: int = 1,
                store_positions: bool = False,
                overwrite: bool = False) -> dict:
    """Build the full index under ``index_dir``.  Returns the stats manifest.

    Resumable: if ``runs/`` has a manifest but ``segments/`` does not, the
    build restarts from the compressed runs without re-tokenizing
    (SURVEY §7.5.8); if ``segments/`` has a manifest the build is a no-op.

    ``merge_parts > 1`` is the hierarchical-merge scale path: each
    bucket's merge splits into that many tasks, each covering a
    contiguous doc-range (``rng``) interval and writing its own
    ``part-<i>.parquet`` — so per-task input stays bounded at 10^12-doc
    scale instead of one task swallowing a whole bucket.  Part files are
    doc-disjoint per term by construction; the reader already concats a
    term's segment rows across files in first_doc order, so query
    results are bit-identical to a single-part merge (pytest-verified).
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
        import shutil
        for p in (runs_manifest, seg_manifest, stats_path):
            if os.path.exists(p):
                os.remove(p)
        for d in (runs_dir, segments_dir, doclens_dir):
            shutil.rmtree(d, ignore_errors=True)

    if os.path.exists(seg_manifest):
        with open(stats_path) as f:
            return json.load(f)

    if not os.path.exists(runs_manifest):
        cols = ["doc_id", "html"] if from_html else ["doc_id", "text"]
        ds = ray.data.read_parquet(pages_path, columns=cols)
        from functools import partial

        runs = ds.map_batches(
            partial(spimi_encode_batch,
                    doclens_dir=doclens_dir,
                    num_buckets=num_buckets,
                    doc_range_size=doc_range_size,
                    from_html=from_html,
                    store_positions=store_positions),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        runs.write_parquet(runs_dir, row_group_size=512)
        t_runs = time.time()
        with open(runs_manifest + ".tmp", "w") as f:
            json.dump({"pages_path": pages_path, "num_buckets": num_buckets,
                       "doc_range_size": doc_range_size,
                       "wall_s": t_runs - t0}, f)
        os.rename(runs_manifest + ".tmp", runs_manifest)

    # tiered merge WITHOUT an all-to-all: the runs write already clustered
    # rows by bucket (sorted + small row groups), so one task per bucket
    # reads just its slice.  The row-group -> bucket map is computed ONCE
    # on the driver from parquet footers and shipped to the tasks — per-
    # task footer scans of every runs file were the merge's serial cost.
    # This replaces a sort-shuffle whose scheduling overhead dominated the
    # merge at small block sizes; at multi-node scale the same layout
    # works because runs live in shared storage and each merge task pulls
    # only its row groups.
    t1 = time.time()
    import glob as _glob

    run_files = sorted(_glob.glob(os.path.join(runs_dir, "*.parquet")))
    rg_map: dict[int, list[tuple[int, int]]] = {b: [] for b in range(num_buckets)}
    rg_rng: dict[tuple[int, int], tuple[int, int]] = {}
    max_rng = 0
    for fi, f in enumerate(run_files):
        md = pq.read_metadata(f)
        sch = md.schema.to_arrow_schema()
        bucket_ci = sch.get_field_index("bucket")
        rng_ci = sch.get_field_index("rng")
        for gi in range(md.num_row_groups):
            st = md.row_group(gi).column(bucket_ci).statistics
            for b in range(int(st.min), int(st.max) + 1):
                rg_map[b].append((fi, gi))
            rst = md.row_group(gi).column(rng_ci).statistics
            rg_rng[(fi, gi)] = (int(rst.min), int(rst.max))
            max_rng = max(max_rng, int(rst.max))

    # doc-range intervals for the hierarchical merge: each (bucket, part)
    # task covers a contiguous rng interval, so per-task input is
    # ~1/merge_parts of the bucket and part outputs are doc-disjoint
    n_parts = max(1, min(int(merge_parts), max_rng + 1))
    bounds = np.linspace(0, max_rng + 1, n_parts + 1).astype(np.int64)
    part_ranges = [(int(bounds[i]), int(bounds[i + 1]) - 1)
                   for i in range(n_parts)]

    _MANIFEST_SCHEMA = pa.schema([
        ("bucket", pa.int32()), ("part", pa.int32()),
        ("n_terms", pa.int64()),
        ("n_postings", pa.int64()), ("n_bytes", pa.int64()),
        ("skipped", pa.bool_()), ("wall_s", pa.float64()),
    ])

    def _merge_bucket_task(batch: pa.Table) -> pa.Table:
        """One task per (bucket, doc-range part): read the row groups
        overlapping its rng interval, merge, write the part file
        ATOMICALLY (tmp+rename, skip when present) — the per-partition
        resume unit — and return a lineage/metrics row."""
        import pyarrow.compute as pc

        rows = []
        for r in batch.to_pylist():
            b, pi = int(r["bucket_id"]), int(r["part_id"])
            rlo, rhi = int(r["rng_lo"]), int(r["rng_hi"])
            tb0 = time.time()
            seg_dir = os.path.join(segments_dir, f"bucket={b}")
            fname = "segment.parquet" if n_parts == 1 \
                else f"part-{pi:05d}.parquet"
            seg_path = os.path.join(seg_dir, fname)
            if os.path.exists(seg_path):
                md = pq.read_metadata(seg_path)
                rows.append({"bucket": b, "part": pi,
                             "n_terms": md.num_rows,
                             "n_postings": -1, "n_bytes": -1,
                             "skipped": True, "wall_s": 0.0})
                continue
            groups: dict[int, list[int]] = {}
            for fi, gi in rg_map[b]:
                lo, hi = rg_rng[(fi, gi)]
                if hi < rlo or lo > rhi:
                    continue
                groups.setdefault(fi, []).append(gi)
            parts = []
            for fi, gis in groups.items():
                t = pq.ParquetFile(run_files[fi]).read_row_groups(gis)
                mask = pc.equal(t["bucket"], b)
                if n_parts > 1:
                    mask = pc.and_(mask, pc.and_(
                        pc.greater_equal(t["rng"], rlo),
                        pc.less_equal(t["rng"], rhi)))
                parts.append(t.filter(mask))
            m = _merge_bucket_group(pa.concat_tables(parts), merge_scope) \
                if parts else (_RUN_SCHEMA_POS if store_positions
                               else _RUN_SCHEMA).empty_table()
            os.makedirs(seg_dir, exist_ok=True)
            tmp = seg_path + f".tmp{os.getpid()}"
            write_segment_table(m, tmp)
            os.rename(tmp, seg_path)
            rows.append({
                "bucket": b, "part": pi, "n_terms": m.num_rows,
                "n_postings": int(pc.sum(m["df"]).as_py() or 0),
                "n_bytes": int(pc.sum(pc.binary_length(m["payload"]))
                               .as_py() or 0),
                "skipped": False, "wall_s": round(time.time() - tb0, 4),
            })
        return pa.Table.from_pylist(rows, schema=_MANIFEST_SCHEMA)

    items = [{"bucket_id": b, "part_id": pi, "rng_lo": lo, "rng_hi": hi}
             for b in range(num_buckets)
             for pi, (lo, hi) in enumerate(part_ranges)]
    buckets_ds = ray.data.from_items(items, override_num_blocks=len(items))
    manifest_rows = buckets_ds.map_batches(
        _merge_bucket_task, batch_size=1,
        batch_format="pyarrow").to_pandas().to_dict("records")
    t2 = time.time()

    # corpus stats from the doclens sidecar, computed distributed: one Ray
    # task per file group returns (min_doc, max_doc, n, sum_dl); when the
    # files' doc intervals are pairwise disjoint (the normal case — docs
    # are unique per file) the totals are exact with no dedup.  Retried /
    # re-sliced tasks can produce overlapping files; that rare case falls
    # back to a full read + numpy dedup.
    import glob as _glob

    import ray as _ray

    t_stats0 = time.time()
    dl_files = sorted(_glob.glob(os.path.join(doclens_dir, "*.parquet")))

    @_ray.remote
    def _dl_partial(paths: list) -> list:
        out = []
        for p in paths:
            t = pq.read_table(p, columns=["doc_id", "dl"])
            d = t["doc_id"].to_numpy(zero_copy_only=False)
            out.append((int(d.min()), int(d.max()), len(d),
                        int(t["dl"].to_numpy(zero_copy_only=False).sum())))
        return out

    chunk = max(1, len(dl_files) // 32)
    parts = [p for ref in [
        _dl_partial.remote(dl_files[i:i + chunk])
        for i in range(0, len(dl_files), chunk)
    ] for p in _ray.get(ref)]
    parts.sort()
    disjoint = all(parts[i][1] < parts[i + 1][0] for i in range(len(parts) - 1))
    if disjoint:
        n_docs_total = sum(p[2] for p in parts)
        total_len = sum(p[3] for p in parts)
    else:
        dl_tbl = pq.read_table(doclens_dir, columns=["doc_id", "dl"])
        doc_np = dl_tbl["doc_id"].to_numpy(zero_copy_only=False)
        dl_np = dl_tbl["dl"].to_numpy(zero_copy_only=False)
        _, first_idx = np.unique(doc_np, return_index=True)
        n_docs_total = int(len(first_idx))
        total_len = int(dl_np[first_idx].sum())
    stats = {
        "n_docs": n_docs_total,
        "total_len": total_len,
        "avgdl": (total_len / n_docs_total) if n_docs_total else 0.0,
        "num_buckets": num_buckets,
        "doc_range_size": doc_range_size,
        "store_positions": store_positions,
        "pages_path": pages_path,
        "wall_s_total": time.time() - t0,
        "wall_s_merge": t2 - t1,
        "wall_s_stats": time.time() - t_stats0,
        "build_docs_per_s": n_docs_total / max(1e-9, time.time() - t0),
    }
    with open(stats_path + ".tmp", "w") as f:
        json.dump(stats, f, indent=1)
    os.rename(stats_path + ".tmp", stats_path)
    with open(seg_manifest + ".tmp", "w") as f:
        json.dump({"segments_dir": segments_dir, "wall_s": t2 - t1,
                   "buckets": manifest_rows}, f, indent=1)
    os.rename(seg_manifest + ".tmp", seg_manifest)
    return stats


def append_to_index(new_pages_path, index_dir: str, *,
                    from_html: bool = True,
                    batch_size: int = 8192,
                    merge_scope: str = "bucket") -> dict:
    """Incrementally index an APPEND batch (new docs with ids beyond the
    existing corpus) into an existing index — the log-structured update
    path: tokenize+encode ONLY the new documents into additional run
    files, then re-run the per-bucket tiered merge over old+new runs
    (byte concat of doc-disjoint runs; old documents are never
    re-tokenized).  Stats and segments refresh; the runs checkpoint stays
    the source of truth.
    """
    import glob as _glob

    import ray.data

    stats_path = os.path.join(index_dir, "stats.json")
    with open(stats_path) as f:
        old_stats = json.load(f)
    num_buckets = old_stats["num_buckets"]
    doc_range_size = old_stats["doc_range_size"]
    # positional indexes must append positional runs — mixed run schemas
    # would crash the per-bucket merge (flag persisted at build time)
    store_positions = old_stats.get("store_positions", False)

    # append-only contract: new doc ids must lie beyond every existing id
    dl_files = sorted(_glob.glob(os.path.join(index_dir, "doclens", "*.parquet")))
    max_existing = -1
    for fpath in dl_files[-4:]:  # files are named by min doc_id, sorted
        d = pq.read_table(fpath, columns=["doc_id"])["doc_id"]
        max_existing = max(max_existing, int(d[len(d) - 1].as_py()))
    if isinstance(new_pages_path, str) and os.path.isfile(new_pages_path):
        new_files = [new_pages_path]
    elif isinstance(new_pages_path, str):
        new_files = sorted(_glob.glob(os.path.join(new_pages_path,
                                                   "*.parquet")))
    else:
        new_files = list(new_pages_path)
    new_min = None
    for fpath in new_files:
        d = pq.read_table(fpath, columns=["doc_id"])["doc_id"]
        mn = min(int(x) for x in d.to_pylist())
        new_min = mn if new_min is None else min(new_min, mn)
    if new_min is None or new_min <= max_existing:
        raise ValueError(
            f"append requires new doc_ids > {max_existing}; got min {new_min}")

    from functools import partial

    cols = ["doc_id", "html"] if from_html else ["doc_id", "text"]
    ds = ray.data.read_parquet(new_pages_path, columns=cols)
    runs = ds.map_batches(
        partial(spimi_encode_batch,
                doclens_dir=os.path.join(index_dir, "doclens"),
                num_buckets=num_buckets,
                doc_range_size=doc_range_size,
                from_html=from_html,
                store_positions=store_positions),
        batch_format="pyarrow", batch_size=batch_size)
    # additional run files land next to the existing ones (unique names)
    runs.write_parquet(os.path.join(index_dir, "runs"), row_group_size=512)

    # lineage: record the appended source paths so key-based upsert
    # resolution (mutate.resolve_doc_ids_by_key) can scan docs that
    # entered via append, not just the original pages_path
    with open(os.path.join(index_dir, "appends.jsonl"), "a") as f:
        f.write(json.dumps({"paths": (
            [new_pages_path] if isinstance(new_pages_path, str)
            else list(new_pages_path))}) + "\n")

    # invalidate merge outputs; the build resumes FROM RUNS (manifest kept)
    import shutil

    shutil.rmtree(os.path.join(index_dir, "segments"), ignore_errors=True)
    for p in ("segments.manifest.json", "stats.json"):
        fp = os.path.join(index_dir, p)
        if os.path.exists(fp):
            os.remove(fp)
    return build_index(old_stats["pages_path"], index_dir,
                       num_buckets=num_buckets,
                       doc_range_size=doc_range_size,
                       from_html=from_html, batch_size=batch_size,
                       merge_scope=merge_scope,
                       store_positions=store_positions)
