"""simplequery analyzer as a Ray Data plan (reference
/root/reference/app/analyzers/simplequery.py).

The reference delegates matching to an ES ``query_string`` filter and
excludes docs already tagged by the same model via a ``must_not``
anti-join on its own enrichment (simplequery.py:26-56 — SURVEY §2.2 Q8);
the anti-join is the engine's incremental re-run semantics.

Here: match = either a boolean full-text query evaluated against the
inverted index (doc_id semi-join back to the corpus) or an arbitrary
Arrow predicate; exclusion = broadcast anti-join against a checkpoint
set of already-tagged doc ids.
"""

from __future__ import annotations


def simplequery_model(ds, *, match_doc_ids=None, predicate=None,
                      already_tagged: set | None = None,
                      id_col: str = "doc_id",
                      model_name: str = "simplequery",
                      model_type: str = "simplequery"):
    """Filter ``ds`` to outlier rows and tag them.

    ``match_doc_ids``: set/array of ids matching a full-text query (from
    ``query.search`` over the index); ``predicate``: fn(pa.Table) ->
    BooleanArray for direct column predicates.  Exactly one must be given.
    ``already_tagged``: ids previously tagged by this (model_name,
    model_type) — excluded, mirroring Q8.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if (match_doc_ids is None) == (predicate is None):
        raise ValueError("provide exactly one of match_doc_ids / predicate")
    tagged = frozenset(already_tagged or ())
    ids = frozenset(int(x) for x in match_doc_ids) if match_doc_ids is not None else None

    def _f(batch: pa.Table) -> pa.Table:
        if ids is not None:
            col = batch[id_col].to_numpy(zero_copy_only=False)
            keep = pa.array([int(x) in ids and int(x) not in tagged for x in col])
        else:
            keep = predicate(batch)
            if tagged:
                col = batch[id_col].to_numpy(zero_copy_only=False)
                not_tagged = pa.array([int(x) not in tagged for x in col])
                keep = pc.and_(keep, not_tagged)
        sub = batch.filter(keep)
        n = sub.num_rows
        sub = sub.append_column("model_name", pa.array([model_name] * n))
        sub = sub.append_column("model_type", pa.array([model_type] * n))
        return sub

    return ds.map_batches(_f, batch_format="pyarrow")
