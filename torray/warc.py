"""WARC (ISO 28500 / WARC/1.0) source and sink — the wire format of
Common-Crawl-style web archives, mapped onto the engine's canonical
pages shape ``(url: string, warc_ts: timestamp[us], html: binary)``.

Scale model: the FILE is the parallel unit, exactly as in Common Crawl
(thousands of ~1 GB ``*.warc.gz`` segments).  ``read_warc`` fans one
Ray task per file via ``read_binary_files``; record framing inside a
file is inherently sequential (each record's ``Content-Length`` header
is the only way to find the next record), so the per-file parser is a
single linear pass over the buffer with O(records) Python overhead and
O(bytes) total memcpy — there is nothing to vectorize across records,
and parallelism comes from file count, which at 100 TB is ~10^5 files.

Writer determinism: record ids derive from md5(url|timestamp), dates
are emitted with microseconds, and the record order is the row order of
the block — the same table always produces byte-identical WARC output
(needed for the resumable-sink contract and for test roundtrips).

Reference parity: the reference stores fetched pages in a MySQL
``pages`` table (/root/reference/TorSpider.py DB loop); the engine
world's equivalent durable page capture is WARC segments, which this
module reads back into the exact Arrow schema the crawl pipeline
consumes.
"""

from __future__ import annotations

import gzip
import hashlib
import shutil
import io
import os
import zlib

import numpy as np
import pyarrow as pa

__all__ = ["warc_bytes_from_table", "parse_warc_bytes", "read_warc",
           "write_warc"]

_CRLF = b"\r\n"
_EPOCH = np.datetime64("1970-01-01T00:00:00", "us")


def _fmt_date(ts_us: int) -> str:
    """WARC-Date with microseconds (WARC 1.1 allows fractional seconds;
    readers that only know 1.0 parse the prefix)."""
    dt = _EPOCH + np.timedelta64(int(ts_us), "us")
    s = np.datetime_as_string(dt, unit="us")
    return s + "Z"


def warc_bytes_from_table(table: pa.Table, *, compress: bool = False,
                          filename: str = "segment.warc") -> bytes:
    """Frame a pages table as one WARC file (bytes).

    Expects columns ``url`` (string), ``warc_ts`` (timestamp), ``html``
    (binary or string).  Emits a ``warcinfo`` record followed by one
    ``response`` record per row whose HTTP block is a minimal 200
    response carrying the html payload.  ``compress=True`` gzips the
    whole file (readable by both this parser and standard tools).
    """
    url = table.column("url").to_pylist()
    ts = table.column("warc_ts").cast(pa.timestamp("us")).cast(pa.int64())
    ts = ts.to_numpy(zero_copy_only=False)
    html_col = table.column("html")
    if pa.types.is_string(html_col.type) or pa.types.is_large_string(
            html_col.type):
        html_col = html_col.cast(pa.large_binary())
    html = html_col.to_pylist()

    out: list[bytes] = []
    info_body = (b"software: torray\r\nformat: WARC File Format 1.0\r\n")
    out.append(
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Filename: " + filename.encode() + _CRLF +
        b"WARC-Record-ID: <urn:uuid:" +
        hashlib.md5(filename.encode()).hexdigest().encode() + b">\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: " + str(len(info_body)).encode() + _CRLF +
        _CRLF + info_body + _CRLF + _CRLF)
    for u, t, h in zip(url, ts, html):
        payload = h if h is not None else b""
        http = (b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                b"Content-Length: " + str(len(payload)).encode() + _CRLF +
                _CRLF + payload)
        rid = hashlib.md5((u + "|" + str(int(t))).encode()).hexdigest()
        out.append(
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + u.encode() + _CRLF +
            b"WARC-Date: " + _fmt_date(int(t)).encode() + _CRLF +
            b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + _CRLF +
            _CRLF + http + _CRLF + _CRLF)
    data = b"".join(out)
    if compress:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", filename="", mtime=0) \
                as gz:
            gz.write(data)
        data = buf.getvalue()
    return data


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a gzip file that may be a concatenation of members
    (Common Crawl gzips each record separately)."""
    chunks = []
    d = zlib.decompressobj(wbits=31)
    buf = data
    while buf:
        chunks.append(d.decompress(buf))
        buf = d.unused_data
        if buf:
            d = zlib.decompressobj(wbits=31)
        elif not d.eof:
            chunks.append(d.flush())
            break
    return b"".join(chunks)


def parse_warc_bytes(data: bytes) -> pa.Table:
    """One linear pass over a WARC file: ``response`` records become
    rows of ``(url, warc_ts, html)``; every other record type
    (warcinfo, request, metadata) is skipped by Content-Length framing
    without inspecting its block."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    urls: list[str] = []
    dates: list[str] = []
    htmls: list[bytes] = []
    pos, n = 0, len(data)
    while pos < n:
        if data.startswith(_CRLF, pos):  # tolerate stray blank lines
            pos += 2
            continue
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        header = data[pos:hdr_end].decode("utf-8", "replace")
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"parse_warc_bytes: expected WARC version line at byte "
                f"{pos}, got {lines[0][:40]!r}")
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields["content-length"])
        block = data[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if data.startswith(b"\r\n\r\n", pos):
            pos += 4
        if fields.get("warc-type") == "response":
            http_end = block.find(b"\r\n\r\n")
            payload = block[http_end + 4:] if http_end >= 0 else b""
            urls.append(fields.get("warc-target-uri", ""))
            dates.append(fields.get("warc-date", "").rstrip("Z"))
            htmls.append(payload)
    ts = pa.array(dates, pa.string()).cast(pa.timestamp("us"))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": ts,
        "html": pa.array(htmls, pa.large_binary()),
    })


def read_warc(paths):
    """WARC source: one Ray read task per file, one parse call per
    file's bytes — the Common-Crawl parallel unit.  Returns a Dataset
    of ``(url, warc_ts, html)``."""
    import ray.data

    if not isinstance(paths, str) and not list(paths):
        # nothing written (empty input corpus) -> empty pages table
        return ray.data.from_arrow(parse_warc_bytes(b""))
    ds = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [parse_warc_bytes(b.as_py())
                  for b in batch.column("bytes")]
        good = [t for t in tables if t.num_rows]
        if not good:
            return parse_warc_bytes(b"")
        return pa.concat_tables(good)

    return ds.map_batches(parse, batch_format="pyarrow")


def write_warc(ds, out_dir: str, *, compress: bool = False,
               as_dataset: bool = False):
    """WARC sink: one segment file per input block, named by the
    content hash of its first row (deterministic, resumable — an
    existing segment file of the same name is the same bytes and is
    skipped).

    The manifest is STREAMED to ``out_dir/_manifest.parquet`` (one
    row per segment, written by Ray — never folded on the driver).
    Returns the manifest ``[{path, records}, ...]`` as a driver list
    by default (fine for bounded jobs), or — ``as_dataset=True``, the
    100 TB path where segments number ~10^5-10^6 — as the manifest
    Dataset read back from the parquet, so no file list ever
    materializes driver-side."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "records": pa.array([], pa.int64())})
        key = hashlib.md5(
            (batch.column("url")[0].as_py() + "|" +
             str(batch.num_rows)).encode()).hexdigest()[:16]
        name = f"segment-{key}{ext}"
        path = os.path.join(out_dir, name)
        if not os.path.exists(path):
            data = warc_bytes_from_table(batch, compress=compress,
                                         filename=name)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "records": pa.array([batch.num_rows], pa.int64())})

    manifest = ds.map_batches(write_block, batch_format="pyarrow")
    mdir = os.path.join(out_dir, "_manifest.parquet")
    shutil.rmtree(mdir, ignore_errors=True)
    manifest.write_parquet(mdir)  # executes the sink; streamed rows
    import ray.data
    out = ray.data.read_parquet(mdir)
    if as_dataset:
        return out
    return [r for r in out.take_all()]
