"""Similarity search over an embedding column (list<float>).

- ``cosine_topk``: brute-force cosine top-k — per-batch numpy matmul
  against a broadcast query matrix (the exact baseline).
- ``IvfIndex``: IVF-style coarse quantizer (seeded k-means on a sample)
  — the scale path: assign each vector to its nearest centroid at build
  time (one pass), probe only the closest ``nprobe`` centroid partitions
  at query time.
- ``embedding_near_dups``: cosine near-duplicate pairs via random
  hyperplane LSH banding + exact verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .functions import duck_round


def _batch_mat(b: pa.Table, col: str) -> np.ndarray:
    return np.array(b[col].to_pylist(), dtype=np.float64)


def _norm(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def cosine_topk(ds, query_vec: np.ndarray, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                round_to: int = 6):
    """Exact brute-force cosine top-k, streaming: per-batch similarity +
    per-batch candidate pruning, global top-k via sort+limit on the tiny
    candidate set."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)

    def sim(b: pa.Table) -> pa.Table:
        m = _norm(_batch_mat(b, vec_col))
        s = m @ q
        # per-batch prune to k candidates — global top-k is within the
        # union of per-batch top-ks
        if len(s) > k:
            keep = np.argpartition(-s, k - 1)[:k * 2]
        else:
            keep = np.arange(len(s))
        ids = b[id_col].to_numpy(zero_copy_only=False)[keep]
        return pa.table({id_col: pa.array(ids),
                         "cosine": pa.array(duck_round(s[keep], round_to))})

    cand = ds.map_batches(sim, batch_format="pyarrow")
    return cand.sort(["cosine", id_col], descending=[True, False]).limit(k)


class IvfIndex:
    """IVF coarse index: k-means centroids fit on a driver-side sample
    (seeded, deterministic), vectors assigned by one distributed pass."""

    def __init__(self, n_lists: int = 16, seed: int = 11, iters: int = 10):
        self.n_lists = n_lists
        self.seed = seed
        self.iters = iters
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IvfIndex":
        rng = np.random.default_rng(self.seed)
        x = _norm(np.asarray(sample, dtype=np.float64))
        c = x[rng.choice(len(x), size=min(self.n_lists, len(x)), replace=False)]
        for _ in range(self.iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(len(c)):
                members = x[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
            c = _norm(c)
        self.centroids = c
        return self

    def assign_column(self, ds, vec_col: str = "embedding"):
        cents = self.centroids

        def f(b: pa.Table) -> pa.Table:
            m = _norm(_batch_mat(b, vec_col))
            lst = np.argmax(m @ cents.T, axis=1)
            return b.append_column("ivf_list", pa.array(lst.astype(np.int32)))

        return ds.map_batches(f, batch_format="pyarrow")

    def probe_topk(self, assigned_ds, query_vec: np.ndarray, k: int = 10,
                   nprobe: int = 4, vec_col: str = "embedding",
                   id_col: str = "vec_id"):
        q = np.asarray(query_vec, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)
        order = np.argsort(-(self.centroids @ q))
        probe = set(int(x) for x in order[:nprobe])

        def f(b: pa.Table) -> pa.Table:
            mask = pa.array([int(v) in probe
                             for v in b["ivf_list"].to_pylist()])
            return b.filter(mask)

        filtered = assigned_ds.map_batches(f, batch_format="pyarrow")
        return cosine_topk(filtered, query_vec, k=k, vec_col=vec_col,
                           id_col=id_col)


def embedding_near_dups(ds, *, threshold: float = 0.95, n_planes: int = 64,
                        bands: int = 4, seed: int = 13,
                        vec_col: str = "embedding", id_col: str = "vec_id"):
    """Cosine near-dup pairs: random-hyperplane signatures -> band buckets
    -> exact cosine verify inside each bucket group."""
    rng = np.random.default_rng(seed)
    width = n_planes // bands

    class Signer:
        def __init__(self, planes):
            self.planes = planes

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _norm(_batch_mat(b, vec_col))
            bits = (m @ self.planes.T) > 0
            rows_id, rows_band, rows_val, rows_vec = [], [], [], []
            ids = b[id_col].to_pylist()
            vecs = b[vec_col].to_pylist()
            for bi in range(bands):
                chunk = bits[:, bi * width:(bi + 1) * width]
                vals = chunk @ (1 << np.arange(width))
                rows_id.extend(ids)
                rows_band.extend([bi] * len(ids))
                rows_val.extend(vals.tolist())
                rows_vec.extend(vecs)
            return pa.table({
                id_col: pa.array(rows_id, type=pa.int64()),
                "band_id": pa.array(rows_band, type=pa.int32()),
                "band_val": pa.array(rows_val, type=pa.int64()),
                vec_col: pa.array(rows_vec, type=pa.list_(pa.float32())),
            })

    planes = rng.standard_normal(
        (n_planes, _first_dim(ds, vec_col)))
    from .dedup import distinct_pairs, filter_crowded_buckets

    buckets = filter_crowded_buckets(
        ds.map_batches(Signer, fn_constructor_kwargs={"planes": planes},
                       batch_format="pyarrow", concurrency=2),
        ["band_id", "band_val"])

    thr = threshold

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 "cosine": pd.Series(dtype=np.float64)})
        m = _norm(np.array(g[vec_col].tolist(), dtype=np.float64))
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= thr
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "cosine": duck_round(sims[ia, ib][keep], 6)})

    cand = buckets.groupby(["band_id", "band_val"]).map_groups(
        pairs, batch_format="pandas")
    return distinct_pairs(cand, extra_max_col="cosine")


def _first_dim(ds, vec_col: str) -> int:
    row = ds.take(1)[0]
    return len(row[vec_col])
