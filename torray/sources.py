"""Source-format surface beyond Parquet: CSV and JSONL readers that
produce the SAME Arrow schema a ``read_parquet`` of the equivalent
table would — so every operator in the engine runs unchanged on any of
the three formats.

Why a wrapper at all: Ray's ``read_csv`` / ``read_json`` infer types
PER FILE (a CSV shard whose ``value`` column happens to be all-int
infers int64 while its neighbor infers double; an empty string column
infers null), and timestamps round-trip as strings.  At 100 TB the
inputs are thousands of shards and per-shard inference drift poisons
every downstream shuffle with mixed schemas.  The fix is one explicit
target schema applied as a vectorized per-batch cast — zero-copy when
the inferred type already matches, an Arrow C++ cast kernel when not,
and a hard error (never a silent coercion) when a value doesn't fit.

Reference parity: the reference engine reads its pages/urls state from
MySQL tables (``/root/reference/TorSpider.py`` DB loop); the engine-
world mapping is columnar files of the same rows, and this module is
the "any format in" half of that contract (the Parquet path is the
default everywhere else in the repo).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["read_csv", "read_jsonl", "read_orc", "normalize_to_schema"]


def normalize_to_schema(ds, schema: pa.Schema):
    """Cast every batch of ``ds`` to ``schema`` (column order included).

    One stateless vectorized ``map_batches`` — Arrow's cast is
    zero-copy for already-matching columns, so on a well-typed input
    this costs nothing.  Unknown columns in the batch are dropped;
    columns missing from the batch raise (a silently-null column is a
    data bug, not a default).  String→timestamp casts accept ISO-8601,
    which is what ``write_csv``/``write_json`` emit."""

    names = list(schema.names)

    def cast(batch: pa.Table) -> pa.Table:
        missing = [n for n in names if n not in batch.column_names]
        if missing:
            raise ValueError(
                f"normalize_to_schema: input lacks columns {missing}")
        cols = []
        for name in names:
            col = batch.column(name)
            target = schema.field(name).type
            if col.type != target:
                col = col.cast(target)
            cols.append(col)
        return pa.table(dict(zip(names, cols)))

    return ds.map_batches(cast, batch_format="pyarrow")


def read_csv(paths, *, schema: pa.Schema, columns=None, **kwargs):
    """CSV source with an enforced output schema (see module
    docstring).  ``columns`` prunes at the read (only the named
    columns are parsed and shipped); the schema is then applied to the
    pruned set."""
    import ray.data

    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
        from pyarrow import csv as pacsv

        kwargs.setdefault(
            "convert_options",
            pacsv.ConvertOptions(include_columns=list(columns)))
    ds = ray.data.read_csv(paths, **kwargs)
    return normalize_to_schema(ds, schema)


def read_orc(paths, *, schema: pa.Schema | None = None, columns=None):
    """ORC source (Ray 2.49 ships no native reader; pyarrow.orc does
    the decode).  The FILE is the parallel unit — one read task per
    file via ``read_binary_files``, decoded worker-side with stripe-
    level column projection (``columns`` never deserializes the other
    columns, same contract as the Parquet path).  ORC carries its own
    types, so ``schema`` is optional and applied only as the usual
    drift guard."""
    import ray.data

    if isinstance(paths, str):
        import os as _os

        if _os.path.isdir(paths):
            paths = sorted(
                _os.path.join(paths, f) for f in _os.listdir(paths)
                if f.endswith(".orc"))
        else:
            paths = [paths]
    cols = list(columns) if columns is not None else None

    def decode(batch: pa.Table) -> pa.Table:
        import io

        from pyarrow import orc

        tables = []
        for blob in batch.column("bytes"):
            f = orc.ORCFile(io.BytesIO(blob.as_py()))
            tables.append(f.read(columns=cols))
        return pa.concat_tables(tables)

    ds = ray.data.read_binary_files(paths).map_batches(
        decode, batch_format="pyarrow")
    if schema is not None:
        if cols is not None:
            schema = pa.schema([schema.field(c) for c in cols])
        ds = normalize_to_schema(ds, schema)
    return ds


def read_jsonl(paths, *, schema: pa.Schema, columns=None, **kwargs):
    """JSON-lines source with an enforced output schema.  Projection
    happens right after parse (JSONL can't skip fields at parse time
    the way CSV/Parquet can — documented cost of the format)."""
    import ray.data

    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    ds = ray.data.read_json(paths, **kwargs)
    return normalize_to_schema(ds, schema)
