"""CSV / JSONL source parity: the same rows read through any format
produce the identical Arrow schema and values as the Parquet read, so
every operator runs unchanged on any of the three."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_exports(tmp_path_factory):
    """Export the events table to CSV and JSONL under /tmp once."""
    import duckdb

    d = tmp_path_factory.mktemp("srcfmt")
    con = duckdb.connect()
    src = os.path.join(SF, "events.parquet")
    csv = str(d / "events.csv")
    jsonl = str(d / "events.jsonl")
    con.execute(f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{csv}' (HEADER, DELIMITER ',')")
    con.execute(f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{jsonl}' (FORMAT JSON)")
    return {"csv": csv, "jsonl": jsonl, "parquet": src}


def _canon(df):
    df = df.sort_values("event_id").reset_index(drop=True)
    return df[sorted(df.columns)]


def test_csv_jsonl_match_parquet(ray_session, events_exports):
    import ray

    from torray.sources import read_csv, read_jsonl

    schema = pq.read_schema(events_exports["parquet"])
    want = _canon(ray.data.read_parquet(
        events_exports["parquet"]).to_pandas())

    got_csv = _canon(read_csv(events_exports["csv"],
                              schema=schema).to_pandas())
    got_jsonl = _canon(read_jsonl(events_exports["jsonl"],
                                  schema=schema).to_pandas())
    for got, tag in ((got_csv, "csv"), (got_jsonl, "jsonl")):
        assert list(got.columns) == list(want.columns), tag
        assert len(got) == len(want), tag
        for c in want.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if a.dtype.kind == "f":
                assert np.allclose(a, b, rtol=0, atol=0,
                                   equal_nan=True), (tag, c)
            else:
                assert (a == b).all(), (tag, c)


def test_projection_and_schema_enforcement(ray_session, events_exports):
    import ray

    from torray.sources import normalize_to_schema, read_csv

    schema = pq.read_schema(events_exports["parquet"])
    pruned = read_csv(events_exports["csv"], schema=schema,
                      columns=["event_id", "value"])
    df = pruned.to_pandas()
    assert list(df.columns) == ["event_id", "value"]
    assert df["event_id"].dtype.kind == "i"

    # an operator runs unchanged on the CSV-sourced dataset
    from torray.ops.sketch import group_standardize

    full = read_csv(events_exports["csv"], schema=schema)
    z = group_standardize(full, "event_type", "value").to_pandas()
    assert len(z) == len(df)

    # missing column errors loudly, never silently nulls
    bad_schema = schema.append(pa.field("nope", pa.int64()))
    ds = ray.data.read_csv(events_exports["csv"])
    with pytest.raises(Exception, match="nope"):
        normalize_to_schema(ds, bad_schema).materialize()
