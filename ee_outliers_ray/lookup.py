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


def auto_shards(cap: int = 8) -> int:
    """Shard count sized to the cluster: ~1 shard per 4 CPUs, floor 2,
    capped.  At 0.25 CPU per shard actor the store reserves at most
    1/16 of cluster CPU, so a store (or two overlapping ones — e.g. a
    just-released pipeline's actors lingering through distributed ref-
    counting GC) can never starve the map tasks that feed or query it
    on a small cluster."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return max(2, min(cap, cpus // 4))


@ray.remote(num_cpus=0.25)
class _LookupShard:
    def __init__(self):
        self._d: dict = {}

    def put_many(self, keys, values) -> int:
        self._d.update(zip(keys, values))
        return len(self._d)

    def append_many(self, keys, values) -> int:
        """List-append semantics: multiple pushes for one key accumulate
        (enrichment entry rows).  Arrival order across parallel pushers
        is nondeterministic — consumers must sort the lists."""
        d = self._d
        for k, v in zip(keys, values):
            d.setdefault(k, []).append(v)
        return len(d)

    def get_many(self, keys) -> list:
        d = self._d
        return [d.get(k) for k in keys]

    def get_packed(self, keys):
        """For 1-D numpy-array values: ONE concatenated buffer + lengths
        + presence mask per request.  Serializing one big array is far
        cheaper than pickling thousands of ~1 KB arrays individually —
        the per-RPC cost that dominated the dedup verify stage."""
        d = self._d
        vals = [d.get(k) for k in keys]
        present = np.fromiter((v is not None for v in vals), dtype=bool,
                              count=len(vals))
        lens = np.fromiter((0 if v is None else len(v) for v in vals),
                           dtype=np.int64, count=len(vals))
        nonempty = [v for v in vals if v is not None and len(v)]
        flat = np.concatenate(nonempty) if nonempty else np.zeros(0)
        return present, lens, flat

    def size(self) -> int:
        return len(self._d)


class ShardedStore:
    """Hash-sharded distributed dict.

    ``build(ds, make_kv)``: consume a Dataset; each map task computes
    (keys, values) for its batch and pushes them straight to the owning
    shards — the driver never sees the data.
    """

    DEFAULT_SHARDS = 8

    def __init__(self, num_shards: int | None = None):
        if num_shards is None:
            num_shards = auto_shards()
        self.num_shards = num_shards
        self.shards = [_LookupShard.remote() for _ in range(num_shards)]

    def shutdown(self) -> None:
        """Kill the shard actors now instead of waiting for distributed
        ref-counting GC — call once every consumer of the store has
        materialized (a lingering pool's reserved CPUs can stall the
        next pipeline's store build on a small cluster)."""
        for a in self.shards:
            ray.kill(a)
        self.shards = []

    def _shard_of(self, keys: np.ndarray) -> np.ndarray:
        return (keys.astype(np.int64) % self.num_shards).astype(np.int64)

    def build(self, ds, make_kv, batch_format: str = "pyarrow",
              append: bool = False) -> "ShardedStore":
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
                    method = (shards[s].append_many if append
                              else shards[s].put_many)
                    refs.append(method.remote(
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

    def get_array_segments(self, keys: np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray,
                                      np.ndarray, np.ndarray]:
        """For stores whose values are 1-D numpy arrays: fetch the UNIQUE
        keys as (uids_sorted, flat_concat, offsets, present) — exactly
        the packed layout the vectorized verify kernels consume, moved
        as one buffer per shard RPC instead of per-key pickles."""
        keys = np.asarray(keys, dtype=np.int64)
        uniq = np.unique(keys)
        sh = uniq % self.num_shards
        refs, masks = [], []
        for s in range(self.num_shards):
            m = sh == s
            if m.any():
                masks.append(m)
                refs.append(self.shards[s].get_packed.remote(
                    uniq[m].tolist()))
        present = np.zeros(len(uniq), dtype=bool)
        lens = np.zeros(len(uniq), dtype=np.int64)
        flats: list = [None] * len(masks)
        for i, (m, res) in enumerate(zip(masks, ray.get(refs))):
            p, ln, fl = res
            present[m] = p
            lens[m] = ln
            flats[i] = (np.flatnonzero(m), ln, fl)
        offsets = np.zeros(len(uniq) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        total = int(offsets[-1])
        dtype = next((fl.dtype for _, _, fl in flats if len(fl)), np.uint64)
        flat = np.empty(total, dtype=dtype)
        for idx, ln, fl in flats:
            # scatter this shard's concatenated values into the global
            # uid-ordered layout (vectorized grouped-arange positions)
            if not len(fl):
                continue
            ln = np.asarray(ln, dtype=np.int64)
            local_starts = np.zeros(len(ln), dtype=np.int64)
            np.cumsum(ln[:-1], out=local_starts[1:])
            pos = (np.arange(len(fl), dtype=np.int64)
                   - np.repeat(local_starts, ln)
                   + np.repeat(offsets[idx], ln))
            flat[pos] = fl
        return uniq, flat, offsets, present
