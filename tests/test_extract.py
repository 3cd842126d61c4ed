"""Differential test: the batched extract stage vs the oracle scan,
page-by-page over the synthetic web (every page type + offline urls)."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from torray.extract import SCAN_SCHEMA, scan_batch
from torray.synth import SynthWeb

from oracle_sim import sim_scan

SCAN_DATE = "2026-01-01"
NODE = "node-test"


@pytest.fixture(scope="module")
def web():
    return SynthWeb(num_pages=600, num_hosts=24, seed=42)


@pytest.fixture(scope="module")
def pages(web):
    table = web.table()
    return dict(zip(table.column("url").to_pylist(),
                    table.column("html").to_pylist()))


def _rows_of(table: pa.Table) -> dict[str, dict]:
    rows = table.to_pylist()
    return {r["url"]: r for r in rows}


def test_scan_batch_matches_oracle_over_whole_web(ref, web, pages):
    urls = sorted(pages)
    batch = pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array([pages[u] for u in urls], pa.binary()),
    })
    got = _rows_of(scan_batch(batch, scan_date=SCAN_DATE, node=NODE))

    n_dropped = 0
    kinds_seen = set()
    for url in urls:
        expected = sim_scan(ref, url, True, pages[url], "", SCAN_DATE, NODE)
        if expected is None:
            assert url not in got, url
            n_dropped += 1
            continue
        row = got[url]
        for field in ("url", "scan_date", "last_node", "online", "fault",
                      "redirect", "title", "hash"):
            assert row[field] == expected[field], (url, field, row[field],
                                                  expected[field])
        assert row["new_urls"] == expected["new_urls"], url
        assert json.loads(row["form_dicts"]) == expected["form_dicts"], url
        kinds_seen.add((expected["fault"] or "")[:6] or
                       ("online" if expected["online"] else "offline?"))
    assert n_dropped > 0, "synthetic web must include silently-dropped pages"
    # The corpus really covered the taxonomy.
    faults = {r["fault"] for r in got.values()}
    assert any(f and f.startswith("type: ") for f in faults)
    assert any(f and f.isdigit() and f.startswith("3") for f in faults)
    assert any(f and f in ("404", "500", "403") for f in faults)
    assert "Bad SSL" in faults and "redirect" in faults
    assert "memory error" in faults
    assert "invalid schema" not in faults  # only reachable via frontier


def test_scan_batch_offline_and_schema_paths(ref, web):
    cases = [
        ("http://deadbeefdeadbeef.onion/p0.html", False, None, ""),
        ("ftp://" + web.host(0) + ".onion/pub/x", False, None, ""),
        ("http:///no-netloc", False, None, ""),
        ("https://" + web.host(1) + ".onion/gone.html", False, None, ""),
    ]
    batch = pa.table({
        "url": pa.array([c[0] for c in cases], pa.string()),
        "html": pa.array([c[2] for c in cases], pa.binary()),
        "present": pa.array([c[1] for c in cases], pa.bool_()),
        "last_hash": pa.array([c[3] for c in cases], pa.string()),
    })
    got = _rows_of(scan_batch(batch, scan_date=SCAN_DATE, node=NODE))
    for url, present, html, last_hash in cases:
        expected = sim_scan(ref, url, present, html, last_hash, SCAN_DATE, NODE)
        row = got[url]
        for field in ("online", "fault", "redirect", "title", "hash"):
            assert row[field] == expected[field], (url, field)
        assert row["new_urls"] == expected["new_urls"]
    assert got["ftp://" + web.host(0) + ".onion/pub/x"]["fault"] == "invalid schema"
    assert got["http:///no-netloc"]["fault"] == "invalid url"


def test_scan_batch_change_detection(ref, web, pages):
    """last_hash == current hash -> title+online only (M9)."""
    from torray.parse import page_hash

    url = web.url_of(0, 0)
    html = pages[url]
    current = page_hash(html)
    batch = pa.table({
        "url": pa.array([url, url], pa.string()),
        "html": pa.array([html, html], pa.binary()),
        "last_hash": pa.array([current, "stale"], pa.string()),
    })
    table = scan_batch(batch, scan_date=SCAN_DATE, node=NODE)
    unchanged, changed = table.to_pylist()
    expected_unchanged = sim_scan(ref, url, True, html, current, SCAN_DATE, NODE)
    assert unchanged["hash"] is None and unchanged["new_urls"] == []
    assert unchanged["title"] == expected_unchanged["title"]
    assert unchanged["online"] is True
    assert changed["hash"] == current and changed["new_urls"] != []


def test_scan_schema_stable(web, pages):
    urls = sorted(pages)[:10]
    batch = pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array([pages[u] for u in urls], pa.binary()),
    })
    out = scan_batch(batch, scan_date=SCAN_DATE, node=NODE)
    assert out.schema == SCAN_SCHEMA


def test_scan_dataset_matches_batch(ray_session, tmp_path, web, pages):
    """The Ray map_batches path produces exactly the driver-side rows."""
    import pyarrow.parquet as pq
    import ray

    from torray.extract import scan_pages_dataset

    pq.write_table(web.table(), str(tmp_path / "pages.parquet"))
    ds = ray.data.read_parquet(str(tmp_path / "pages.parquet"))
    got = _rows_of(pa.Table.from_pandas(
        scan_pages_dataset(ds, scan_date=SCAN_DATE, node=NODE).to_pandas(),
        preserve_index=False,
    ))

    urls = sorted(pages)
    batch = pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array([pages[u] for u in urls], pa.binary()),
    })
    expected = _rows_of(scan_batch(batch, scan_date=SCAN_DATE, node=NODE))
    assert set(got) == set(expected)
    for url in expected:
        for field in SCAN_SCHEMA.names:
            assert got[url][field] == expected[url][field], (url, field)


def test_custom_extractors_extension_point(ref, web, pages):
    """SURVEY.md §2.10: user extractors run beside the built-ins on
    content pages, null elsewhere."""
    import re

    def word_count(text, url):
        return len(re.findall(r"\w+", text))

    def host_echo(text, url):
        from urllib.parse import urlsplit
        return urlsplit(url)[1]

    urls = sorted(pages)
    batch = pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array([pages[u] for u in urls], pa.binary()),
    })
    out = scan_batch(batch, scan_date=SCAN_DATE, node=NODE,
                     extractors=(("n_words", word_count, pa.int64()),
                                 ("echo_host", host_echo, pa.string())))
    rows = out.to_pylist()
    parsed = [r for r in rows if r["hash"] is not None]
    unparsed = [r for r in rows if r["hash"] is None]
    assert parsed and unparsed
    assert all(r["n_words"] is not None and r["echo_host"] == r["host"]
               for r in parsed)
    assert all(r["n_words"] is None and r["echo_host"] is None
               for r in unparsed)


def test_scan_frontier_join_matches_bucket_semantics(ray_session, tmp_path,
                                                     web, pages):
    """Fetch-as-join (J1 Dataset.join mapping) == direct scan for
    present urls, offline path for absent ones."""
    import pyarrow.parquet as pq
    import ray

    from torray.extract import scan_frontier_join

    pq.write_table(web.table(), str(tmp_path / "pages.parquet"))
    present_urls = sorted(pages)[:50]
    absent_urls = ["http://absenthost%d.onion/x.html" % i for i in range(5)]
    frontier = pa.table({
        "url": pa.array(present_urls + absent_urls, pa.string()),
        "last_hash": pa.array([""] * 55, pa.string()),
    })
    out = scan_frontier_join(
        ray.data.from_arrow(frontier),
        ray.data.read_parquet(str(tmp_path / "pages.parquet")),
        scan_date=SCAN_DATE, node=NODE, num_partitions=4,
    )
    got = _rows_of(pa.Table.from_pandas(out.to_pandas(),
                                        preserve_index=False))
    direct = _rows_of(scan_batch(pa.table({
        "url": pa.array(present_urls, pa.string()),
        "html": pa.array([pages[u] for u in present_urls], pa.binary()),
    }), scan_date=SCAN_DATE, node=NODE))
    for url in direct:
        for field in ("online", "fault", "title", "hash"):
            assert got[url][field] == direct[url][field], (url, field)
        assert list(got[url]["new_urls"]) == list(direct[url]["new_urls"])
    for url in absent_urls:
        assert got[url]["online"] is False and got[url]["fault"] is None


from hypothesis import given, settings, strategies as st


@settings(max_examples=250, deadline=None)
@given(
    scheme=st.sampled_from(["http", "https", "ftp", "wss"]),
    hostkind=st.sampled_from(["abc123def456ghij.onion", "ex.com", ""]),
    path=st.sampled_from(["/", "/p1.html", "/img.png", "/a/b.pdf", ""]),
    present=st.booleans(),
    directive=st.sampled_from(
        [""] + [f"<!--web status={s}-->" for s in
                (200, 201, 301, 404, 408, 299, 600)]
        + ["<!--web status=302 location=/x-->",
           "<!--web status=301 location=page2.html-->",
           "<!--web status=303-->",
           "<!--web exc=timeout-->", "<!--web exc=ssl-->",
           "<!--web exc=chunked-->", "<!--web exc=memory-->",
           "<!--web exc=conn-->", "<!--web exc=not_implemented-->",
           "<!--web exc=too_many_redirects-->",
           "<!--web content-type=image/png-->",
           "<!--web content-type=none-->",
           "<!--web bogus",  # malformed directive -> plain content
           ]),
    body=st.sampled_from(
        ["", "<html><title>T</title><a href='/x'>l</a></html>",
         "<a href='o.onion/p'>x</a><form><input type=text name=n></form>",
         "<title>A</title><title>B</title>"]),
    null_html=st.booleans(),
    last_hash_mode=st.sampled_from(["", "match", "stale"]),
)
def test_scan_page_fuzz_vs_oracle(ref, scheme, hostkind, path, present,
                                  directive, body, null_html,
                                  last_hash_mode):
    from torray.fetch import scan_page
    from torray.parse import page_hash

    from oracle_sim import sim_scan

    url = f"{scheme}://{hostkind}{path}"
    html = None if null_html else (directive + body).encode()
    if last_hash_mode == "match" and html is not None:
        last_hash = page_hash(html)
    elif last_hash_mode == "stale":
        last_hash = "deadbeef"
    else:
        last_hash = ""
    got = scan_page(url, present, html, last_hash, "2026-01-01", "fz")
    expected = sim_scan(ref, url, present, html, last_hash, "2026-01-01", "fz")
    if expected is None:
        assert got is None
        return
    assert got is not None
    for field in ("url", "online", "fault", "redirect", "title", "hash",
                  "scan_date", "last_node"):
        assert getattr(got, field) == expected[field], field
    assert got.new_urls == expected["new_urls"]
    assert got.form_dicts == expected["form_dicts"]
