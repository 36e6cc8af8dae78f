"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa
import ray


def dataset_to_table(ds) -> pa.Table:
    """Materialize a SMALL Dataset to one Arrow table (results, manifests —
    never corpus-scale data)."""
    if isinstance(ds, pa.Table):
        return ds
    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows > 0]
    if not tables:
        return ray.get(refs[0]) if refs else pa.table({})
    return pa.concat_tables(tables, promote_options="default")
