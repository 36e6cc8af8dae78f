"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa
import ray


def dataset_to_table(ds) -> pa.Table:
    """Materialize a SMALL Dataset to one Arrow table (results, manifests —
    never corpus-scale data).

    Collects block refs via ``iter_internal_ref_bundles`` instead of
    ``to_arrow_refs``: the latter fetches the schema with
    ``schema(fetch_if_missing=True)``, which RE-EXECUTES the whole plan
    (``limit(1)``) when block schemas were empty/mixed — running any
    side-effecting write stage a second time."""
    if isinstance(ds, pa.Table):
        return ds
    from ray.data.block import BlockAccessor

    refs = [
        br
        for bundle in ds.iter_internal_ref_bundles()
        for br in bundle.block_refs
    ]
    blocks = [BlockAccessor.for_block(b).to_arrow() for b in ray.get(refs)]
    tables = [t for t in blocks if t.num_rows > 0]
    if not tables:
        return blocks[0] if blocks else pa.table({})
    return pa.concat_tables(tables, promote_options="default")
