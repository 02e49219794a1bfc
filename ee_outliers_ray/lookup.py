"""Sharded key->value lookup built from a Dataset — the distributed
stand-in for "broadcast the whole table to every task".

Used by verification stages that need per-key payloads (shingle sets,
embedding vectors) for a *candidate* subset of the corpus: the payload
lives sharded across actors (hash-partitioned by key), and consumers
fetch batches of keys with one RPC per shard.  Nothing is materialized
on the driver except actor handles.

The reference keeps equivalent state inside Elasticsearch (doc lookup by
_id); here it is explicit Ray state (SURVEY §2.9 extension surface).
"""

from __future__ import annotations

import numpy as np
import ray


@ray.remote(num_cpus=0.25)
class _LookupShard:
    def __init__(self):
        self._d: dict = {}

    def put_many(self, keys, values) -> int:
        self._d.update(zip(keys, values))
        return len(self._d)

    def get_many(self, keys) -> list:
        d = self._d
        return [d.get(k) for k in keys]

    def size(self) -> int:
        return len(self._d)


class ShardedStore:
    """Hash-sharded distributed dict.

    ``build(ds, make_kv)``: consume a Dataset; each map task computes
    (keys, values) for its batch and pushes them straight to the owning
    shards — the driver never sees the data.
    """

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self.shards = [_LookupShard.remote() for _ in range(num_shards)]

    def _shard_of(self, keys: np.ndarray) -> np.ndarray:
        return (keys.astype(np.int64) % self.num_shards).astype(np.int64)

    def build(self, ds, make_kv, batch_format: str = "pyarrow") -> "ShardedStore":
        shards = self.shards
        n = self.num_shards

        def push(b):
            keys, values = make_kv(b)
            keys = np.asarray(keys, dtype=np.int64)
            sh = keys % n
            refs = []
            for s in range(n):
                m = sh == s
                if m.any():
                    idx = np.flatnonzero(m)
                    refs.append(shards[s].put_many.remote(
                        keys[idx].tolist(), [values[i] for i in idx]))
            ray.get(refs)
            import pyarrow as pa
            return pa.table({"n": pa.array([len(keys)], type=pa.int64())})

        ds.map_batches(push, batch_format=batch_format).count()
        return self

    def get_many(self, keys: np.ndarray) -> dict:
        """Fetch values for an array of int keys; one RPC per shard."""
        keys = np.asarray(keys, dtype=np.int64)
        uniq = np.unique(keys)
        sh = uniq % self.num_shards
        refs, key_groups = [], []
        for s in range(self.num_shards):
            m = sh == s
            if m.any():
                ks = uniq[m]
                key_groups.append(ks)
                refs.append(self.shards[s].get_many.remote(ks.tolist()))
        out: dict = {}
        for ks, vals in zip(key_groups, ray.get(refs)):
            out.update(zip(ks.tolist(), vals))
        return out
