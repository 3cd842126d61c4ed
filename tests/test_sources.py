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


# ---------------------------------------------------------------------------
# WARC source/sink
# ---------------------------------------------------------------------------


def _pages_table():
    # payloads deliberately contain CRLF-CRLF and non-ascii: framing is
    # Content-Length based, so neither may confuse the parser
    return pa.table({
        "url": [f"http://h{i % 3}.onion/p/{i}" for i in range(50)],
        "warc_ts": pa.array(
            [1_600_000_000_000_000 + 31_337 * i + (i % 7)
             for i in range(50)], pa.timestamp("us")),
        "html": pa.array(
            [f"<html>\r\n\r\n<body>p{i} é中</body></html>"
             .encode() for i in range(50)], pa.large_binary()),
    })


def test_warc_roundtrip_bytes():
    from torray.warc import parse_warc_bytes, warc_bytes_from_table

    t = _pages_table()
    for compress in (False, True):
        data = warc_bytes_from_table(t, compress=compress)
        back = parse_warc_bytes(data)
        assert back.column("url").to_pylist() == t.column("url").to_pylist()
        assert (back.column("warc_ts").to_pylist()
                == t.column("warc_ts").to_pylist())
        assert (back.column("html").to_pylist()
                == t.column("html").to_pylist())
    # writer is deterministic byte-for-byte (resumable-sink contract)
    assert (warc_bytes_from_table(t, compress=True)
            == warc_bytes_from_table(t, compress=True))


def test_warc_dataset_roundtrip(ray_session, tmp_path):
    import ray

    from torray.warc import read_warc, write_warc

    t = _pages_table()
    ds = ray.data.from_arrow(t).repartition(4)
    out = str(tmp_path / "warc")
    manifest = write_warc(ds, out, compress=True)
    assert sum(m["records"] for m in manifest) == t.num_rows
    paths = sorted(m["path"] for m in manifest)
    assert len(paths) == len(set(paths)) >= 2

    back = read_warc(paths).to_pandas().sort_values(
        "url", kind="mergesort").reset_index(drop=True)
    want = t.to_pandas().sort_values(
        "url", kind="mergesort").reset_index(drop=True)
    assert (back["url"] == want["url"]).all()
    assert (back["warc_ts"] == want["warc_ts"]).all()
    assert all(a == b for a, b in zip(back["html"], want["html"]))

    # resume: rewriting the same dataset skips existing segments
    mtimes = {p: os.path.getmtime(p) for p in paths}
    manifest2 = write_warc(ds, out, compress=True)
    assert sorted(m["path"] for m in manifest2) == paths
    assert all(os.path.getmtime(p) == mtimes[p] for p in paths)


def test_warc_skips_non_response_records():
    from torray.warc import parse_warc_bytes, warc_bytes_from_table

    t = _pages_table().slice(0, 3)
    data = warc_bytes_from_table(t)
    req = (b"WARC/1.0\r\n"
           b"WARC-Type: request\r\n"
           b"WARC-Target-URI: http://h0.onion/ignored\r\n"
           b"WARC-Date: 2020-09-13T12:26:40Z\r\n"
           b"WARC-Record-ID: <urn:uuid:deadbeef>\r\n"
           b"Content-Type: application/http; msgtype=request\r\n"
           b"Content-Length: 18\r\n\r\n"
           b"GET / HTTP/1.1\r\n\r\n" + b"\r\n\r\n")
    back = parse_warc_bytes(data + req)
    assert back.num_rows == 3
    assert "ignored" not in " ".join(back.column("url").to_pylist())


def test_orc_matches_parquet(ray_session, tmp_path, events_exports):
    import ray
    from pyarrow import orc

    from torray.sources import read_orc

    src = pq.read_table(events_exports["parquet"])
    # two shards to exercise the per-file fan-out
    orc.write_table(src.slice(0, src.num_rows // 2),
                    str(tmp_path / "a.orc"))
    orc.write_table(src.slice(src.num_rows // 2),
                    str(tmp_path / "b.orc"))

    got = _canon(read_orc(str(tmp_path)).to_pandas())
    want = _canon(ray.data.read_parquet(
        events_exports["parquet"]).to_pandas())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in want.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b, rtol=0, atol=0, equal_nan=True), c
        else:
            assert (a == b).all(), c

    pruned = read_orc(str(tmp_path), columns=["event_id", "value"])
    df = pruned.to_pandas()
    assert list(df.columns) == ["event_id", "value"]
    assert len(df) == len(want)
