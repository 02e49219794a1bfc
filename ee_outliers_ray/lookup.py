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


def _segment_gather(flat: np.ndarray, starts: np.ndarray,
                    lens: np.ndarray) -> np.ndarray:
    """Concatenate variable-length segments flat[starts[i]:starts[i]+
    lens[i]] in order — one vectorized gather, no per-segment Python.
    Preserves intra-segment order (the dedup sorted-shingle invariant)."""
    total = int(lens.sum())
    if total == 0:
        return flat[:0]
    out_starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=out_starts[1:])
    pos = (np.arange(total, dtype=np.int64)
           - np.repeat(out_starts, lens) + np.repeat(starts, lens))
    return flat[pos]


@ray.remote(num_cpus=0.25)
class _LookupShard:
    def __init__(self):
        self._d: dict = {}
        # array mode: raw (keys, flat, lens) pushes, consolidated lazily
        # into (sorted keys, flat-in-key-order, offsets) on first read
        self._chunks: list = []
        self._cons: tuple | None = None

    def put_many(self, keys, values) -> int:
        self._d.update(zip(keys, values))
        return len(self._d)

    def put_arrays(self, keys, flat, lens) -> int:
        """Array-value push: ONE (keys, concatenated values, lengths)
        buffer triple per RPC — no per-key Python on either side.  The
        vectorized replacement for put_many(list-of-small-arrays), which
        cost a dict insert + array pickle per key and dominated the
        store build at 10^6 keys."""
        self._chunks.append((np.asarray(keys, dtype=np.int64), flat,
                             np.asarray(lens, dtype=np.int64)))
        self._cons = None
        return len(keys)

    def _consolidate(self) -> tuple:
        if self._cons is None:
            ks = np.concatenate([c[0] for c in self._chunks])
            fl = np.concatenate([c[1] for c in self._chunks])
            ln = np.concatenate([c[2] for c in self._chunks])
            starts = np.zeros(len(ks), dtype=np.int64)
            np.cumsum(ln[:-1], out=starts[1:])
            order = np.argsort(ks, kind="stable")
            # last-write-wins on duplicate keys (dict parity): stable
            # sort keeps push order within equal keys, keep each run's
            # final occurrence
            ks_s = ks[order]
            keep = np.ones(len(ks_s), dtype=bool)
            keep[:-1] = ks_s[1:] != ks_s[:-1]
            order, ks_s = order[keep], ks_s[keep]
            lens_o = ln[order]
            off = np.zeros(len(order) + 1, dtype=np.int64)
            np.cumsum(lens_o, out=off[1:])
            self._cons = (ks_s, _segment_gather(fl, starts[order], lens_o),
                          off)
            self._chunks = []
        return self._cons

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
        the per-RPC cost that dominated the dedup verify stage.

        Array-mode stores (put_arrays) answer with searchsorted + one
        vectorized segment gather — zero per-key Python; dict-mode
        stores (put_many) keep the original per-key path."""
        if self._chunks or self._cons is not None:
            ks, fl, off = self._consolidate()
            keys = np.asarray(keys, dtype=np.int64)
            if len(ks):
                i = np.minimum(np.searchsorted(ks, keys), len(ks) - 1)
                present = ks[i] == keys
            else:
                i = np.zeros(len(keys), dtype=np.int64)
                present = np.zeros(len(keys), dtype=bool)
            lens = np.where(present, off[i + 1] - off[i], 0) \
                .astype(np.int64)
            pi = np.flatnonzero(present)
            flat = _segment_gather(fl, off[i[pi]], lens[pi])
            return present, lens, flat
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
        if self._chunks or self._cons is not None:
            return len(self._consolidate()[0])
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
        """``make_kv`` returns either ``(keys, values)`` (dict mode,
        arbitrary Python values) or ``(keys, flat, lens)`` (array mode:
        one concatenated 1-D value buffer + per-key lengths — fully
        vectorized through push AND fetch, the form every numpy-array
        consumer should use)."""
        shards = self.shards
        n = self.num_shards

        def push(b):
            kv = make_kv(b)
            keys = np.asarray(kv[0], dtype=np.int64)
            sh = keys % n
            refs = []
            if len(kv) == 3:
                flat, lens = kv[1], np.asarray(kv[2], dtype=np.int64)
                starts = np.zeros(len(keys), dtype=np.int64)
                np.cumsum(lens[:-1], out=starts[1:])
                for s in range(n):
                    m = sh == s
                    if m.any():
                        refs.append(shards[s].put_arrays.remote(
                            keys[m],
                            _segment_gather(flat, starts[m], lens[m]),
                            lens[m]))
            else:
                values = kv[1]
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
