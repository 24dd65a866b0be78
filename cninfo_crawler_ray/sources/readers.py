"""Metadata-clean parquet → Dataset readers.

pyarrow-16 schemas that carry ANY metadata (e.g. the b'pandas' blob that
pandas-written parquet embeds) are unhashable; every bundle out of a
ReadParquet operator whose schema carries it defeats Ray's schema-dedup
fast path and logs "Failed to hash the schemas" per concat (VERDICT r02
§1). Stripping in a downstream map is too late — the read operator's own
bundles already tripped the check — so these helpers push an explicit
metadata-free schema into ``read_parquet`` itself.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def clean_schema(path: str, columns: list[str] | None = None) -> pa.Schema:
    """Footer-only read of one file's Arrow schema, metadata stripped and
    (optionally) projected to ``columns`` in the given order."""
    full = pq.ParquetFile(path).schema_arrow.remove_metadata()
    if columns is None:
        return full
    return pa.schema([full.field(c) for c in columns])


def read_parquet_clean(
    paths: str | list[str],
    *,
    columns: list[str] | None = None,
    **kwargs,
) -> rd.Dataset:
    """``rd.read_parquet`` that always emits metadata-free block schemas.

    The schema is probed from the first path's footer — callers pass
    homogeneous file sets (one table, or one sink's shards)."""
    first = paths[0] if isinstance(paths, list) else paths
    schema = clean_schema(first, columns)
    return rd.read_parquet(paths, columns=columns, schema=schema, **kwargs)
