"""End-to-end crawl conformance: the distributed Ray engine vs the
single-threaded oracle simulator (SURVEY.md §5.3).

Asserts, for the same synthetic web + seed list + politeness budget:
- identical crawl order (round-by-round schedule),
- identical final URL-seen set,
- byte-identical per-url extracted content (title / sorted links /
  canonical form JSON / hash) and every scan-result field,
- identical leftover frontier when the round cap bites,
- checkpoint resume converging to the uninterrupted run's state.
"""

from __future__ import annotations

import json

import pyarrow.parquet as pq
import pytest

from torray.crawl import CrawlConfig, Crawler
from torray.synth import SynthWeb

from oracle_sim import sim_crawl

SCAN_DATE = "2026-02-02"
NODE = "node-e2e"


@pytest.fixture(scope="module")
def web(tmp_path_factory):
    web = SynthWeb(num_pages=400, num_hosts=16, seed=42)
    root = tmp_path_factory.mktemp("web")
    pq.write_table(web.table(), str(root / "pages.parquet"))
    web.pages_path = str(root / "pages.parquet")
    table = web.table()
    web.pages_dict = dict(zip(table.column("url").to_pylist(),
                              table.column("html").to_pylist()))
    return web


def _run_engine(web, tmp_path, **overrides):
    cfg = CrawlConfig(
        pages_path=web.pages_path,
        workdir=str(tmp_path),
        seeds=web.seeds(3),
        budget=5,
        max_rounds=12,
        scan_date=SCAN_DATE,
        node=NODE,
        num_shards=4,
        num_buckets=8,
    )
    for k, v in overrides.items():
        setattr(cfg, k, v)
    crawler = Crawler(cfg)
    summary = crawler.run()
    return crawler, summary, cfg


def _engine_log(crawler):
    rows = crawler.crawl_log().to_pandas()
    # BFS rounds order by (host, round_entered, host_seq); recrawl rows
    # carry (-1, -1) there, so url breaks ties exactly as the spec's
    # (host, url) recrawl order requires.
    rows = rows.sort_values(
        ["round", "host", "round_entered", "host_seq", "url"],
        kind="mergesort").reset_index(drop=True)
    return list(zip(rows["round"].tolist(), rows["url"].tolist()))


def _engine_results(crawler):
    rows = crawler.scan_results().to_pandas()
    return {(r["round"], r["url"]): r for _, r in rows.iterrows()}


def _compare(crawler, summary, sim, max_rounds_hit=False):
    sim_results, sim_log, sim_seen, sim_leftover = sim

    # 1. Crawl ordering.
    engine_log = _engine_log(crawler)
    assert engine_log == sim_log

    # 2. Final seen set.
    snapshot = crawler.seen_snapshot()
    assert set(snapshot.column("url").to_pylist()) == sim_seen

    # 3. Per-scan byte equality. Sim results are in scan order and the
    # log pairs rounds with urls in the same order.
    engine_rows = _engine_results(crawler)
    reported_log = []
    idx = 0
    for rnd, url in sim_log:
        # Skip sim entries that produced no report (dropped results).
        if idx < len(sim_results) and sim_results[idx]["url"] == url:
            expected = sim_results[idx]
            idx += 1
        else:
            assert (rnd, url) not in engine_rows
            continue
        row = engine_rows[(rnd, url)]
        for f in ("online", "fault", "redirect", "title", "hash",
                  "scan_date", "last_node"):
            assert row[f] == expected[f], (url, f, row[f], expected[f])
        assert list(row["new_urls"]) == expected["new_urls"], url
        assert json.loads(row["form_dicts"]) == expected["form_dicts"], url
    assert idx == len(sim_results)

    # 4. Leftover frontier parity.
    if max_rounds_hit:
        import glob
        import os
        import pyarrow.parquet as pq2

        last = max(int(p.rsplit("=", 1)[1]) for p in
                   glob.glob(os.path.join(crawler.ckpt, "round=*")))
        files = glob.glob(os.path.join(
            crawler.ckpt, f"round={last:04d}", "frontier", "*.parquet"))
        leftover = set()
        for f in files:
            leftover |= set(pq2.read_table(f, columns=["url"])
                            .column("url").to_pylist())
        assert leftover == set(sim_leftover)


def test_crawl_conformance_basic(ray_session, ref, web, tmp_path):
    # Force every round through the distributed path (the default
    # threshold would run these small rounds driver-local; the other
    # tests cover that path), with a tiny scan_chunk so the sub-shard
    # fan-out path is exercised under full conformance.
    crawler, summary, cfg = _run_engine(web, tmp_path,
                                        small_round_threshold=0,
                                        scan_chunk=8)
    sim = sim_crawl(ref, web.pages_dict, cfg.seeds, cfg.budget,
                    cfg.max_rounds, SCAN_DATE, NODE)
    _compare(crawler, summary, sim, max_rounds_hit=True)
    assert summary["seen"] == len(sim[2])


def test_crawl_conformance_robots(ray_session, ref, web, tmp_path):
    crawler, summary, cfg = _run_engine(web, tmp_path, respect_robots=True,
                                        max_rounds=8)
    sim = sim_crawl(ref, web.pages_dict, cfg.seeds, cfg.budget,
                    cfg.max_rounds, SCAN_DATE, NODE, respect_robots=True)
    _compare(crawler, summary, sim, max_rounds_hit=True)
    # Robots actually suppressed something.
    snapshot = crawler.seen_snapshot()
    import pyarrow.compute as pc
    assert snapshot.filter(pc.field("first_round") == -1).num_rows > 0


def test_crawl_conformance_recrawl(ray_session, ref, web, tmp_path):
    crawler, summary, cfg = _run_engine(web, tmp_path, recrawl=True,
                                        max_rounds=6, budget=50)
    sim = sim_crawl(ref, web.pages_dict, cfg.seeds, cfg.budget,
                    cfg.max_rounds, SCAN_DATE, NODE, recrawl=True)
    sim_results, sim_log, sim_seen, _ = sim

    engine_rows = _engine_results(crawler)
    # Recrawl entries: same (round, url) keyspace; change-detection rows
    # must carry hash=None.
    recrawl_round = max(r for r, _ in engine_rows.keys())
    sim_recrawl = [r for r in sim_results
                   if any(lg == (recrawl_round, r["url"]) for lg in sim_log
                          )]
    assert any(k[0] == recrawl_round for k in engine_rows)
    n_unchanged = sum(
        1 for k, row in engine_rows.items()
        if k[0] == recrawl_round and row["hash"] is None and row["online"])
    assert n_unchanged > 0
    _compare(crawler, summary, sim)


def test_crawl_resume(ray_session, ref, web, tmp_path):
    full_dir = tmp_path / "full"
    part_dir = tmp_path / "part"
    crawler_full, _, cfg = _run_engine(web, full_dir, max_rounds=6)

    # Interrupted run: stop after 3 rounds, then resume to 6.
    crawler_a, _, _ = _run_engine(web, part_dir, max_rounds=3)
    crawler_b, _, _ = _run_engine(web, part_dir, max_rounds=6)

    assert _engine_log(crawler_b) == _engine_log(crawler_full)
    full_rows = _engine_results(crawler_full)
    resumed_rows = _engine_results(crawler_b)
    assert set(full_rows) == set(resumed_rows)
    assert (set(crawler_b.seen_snapshot().column("url").to_pylist())
            == set(crawler_full.seen_snapshot().column("url").to_pylist()))


def test_partitioning_invariance(ray_session, web, tmp_path):
    """Results must be identical under different shard/bucket counts and
    execution paths — the schedule spec never references partitioning."""
    a, _, _ = _run_engine(web, tmp_path / "a", max_rounds=5,
                          num_shards=2, num_buckets=3,
                          small_round_threshold=0)
    b, _, _ = _run_engine(web, tmp_path / "b", max_rounds=5,
                          num_shards=7, num_buckets=5,
                          small_round_threshold=10**9)
    assert _engine_log(a) == _engine_log(b)
    ra, rb = _engine_results(a), _engine_results(b)
    assert set(ra) == set(rb)
    for k in ra:
        assert ra[k]["hash"] == rb[k]["hash"]
        assert list(ra[k]["new_urls"]) == list(rb[k]["new_urls"])
    assert (set(a.seen_snapshot().column("url").to_pylist())
            == set(b.seen_snapshot().column("url").to_pylist()))
    # Analytics folds must also be layout-invariant (domain_status
    # replays per-host scans by the schedule key, not arrival order).
    from torray.stats import domain_status

    da = domain_status(a.scan_results()).to_pandas().sort_values(
        "host").reset_index(drop=True)
    db = domain_status(b.scan_results()).to_pandas().sort_values(
        "host").reset_index(drop=True)
    assert da.equals(db)


def test_stop_sentinel_graceful(ray_session, web, tmp_path):
    """A STOP file in the workdir halts at a round boundary; removing it
    resumes exactly where the crawl left off (reference 'sleep' file
    semantics, TorSpider.py:109-114)."""
    import os

    wd = tmp_path / "wd"
    a, summary_a, cfg = _run_engine(web, wd, max_rounds=2)
    open(os.path.join(str(wd), "STOP"), "w").close()
    b_crawler, summary_b, _ = _run_engine(web, wd, max_rounds=6)
    assert summary_b.get("stopped") is True
    assert summary_b["rounds"] == 2  # no extra round ran
    os.unlink(os.path.join(str(wd), "STOP"))
    c_crawler, summary_c, _ = _run_engine(web, wd, max_rounds=6)
    assert "stopped" not in summary_c

    full, _, _ = _run_engine(web, tmp_path / "full", max_rounds=6)
    assert _engine_log(c_crawler) == _engine_log(full)


def test_spider_cfg_bootstrap_and_precedence(tmp_path, monkeypatch):
    """First run writes a default config file and exits (reference
    TorSpider.py:423-444); precedence is defaults < file < env
    (TorSpider.py:450-467)."""
    from torray.__main__ import main

    cfgf = tmp_path / "spider.cfg"
    rc = main(["crawl", "--pages", "x", "--workdir", str(tmp_path / "wd"),
               "--seeds", "http://a.onion/", "--config", str(cfgf)])
    assert rc == 0
    assert cfgf.exists()
    text = cfgf.read_text()
    assert "[TorSpider]" in text and "Budget" in text

    cfgf.write_text("[TorSpider]\nBudget = 3\nMaxRounds = 7\n"
                    "Node = filenode\nRespectRobots = True\n"
                    "[PARTITIONING]\nNumShards = 5\n")
    cfg = CrawlConfig(pages_path="x", workdir="w", seeds=[])
    cfg.apply_file(str(cfgf))
    assert (cfg.budget, cfg.max_rounds, cfg.node, cfg.num_shards) == \
        (3, 7, "filenode", 5)
    assert cfg.respect_robots is True
    assert cfg.num_buckets == 16  # untouched key keeps its default

    monkeypatch.setenv("TORRAY_BUDGET", "5")
    monkeypatch.setenv("TORRAY_NODE", "envnode")
    cfg.apply_env()
    assert cfg.budget == 5 and cfg.node == "envnode"
    assert cfg.max_rounds == 7  # env without the var keeps file value

    with pytest.raises(ValueError):
        CrawlConfig(pages_path="x", workdir="w", seeds=[]).apply_file(
            str(tmp_path / "missing.cfg"))


def test_requeue_no_fault_urls(ray_session, ref, tmp_path):
    """A url answering a no-fault status (503) is rescanned once per
    round until max_retries is exhausted — and the engine agrees with
    the oracle on the whole schedule (TorSpider.py:168 re-serve
    semantics, rendered as bounded requeue)."""
    import pyarrow as pa

    busy = "http://busy777aaaaaaaaaaaaaaaa.onion/"
    home = "http://hub777aaaaaaaaaaaaaaaaa.onion/"
    pages = {
        home: (f'<html><a href="{busy}">b</a>'
               f'<a href="{home}two">t</a></html>').encode(),
        busy: b"<!--web status=503--><html>busy</html>",
        home + "two": b"<html>two</html>",
    }
    table = pa.table({
        "url": pa.array(list(pages), pa.string()),
        "warc_ts": pa.array(["2026"] * len(pages), pa.string()),
        "html": pa.array(list(pages.values()), pa.binary()),
        "text": pa.array([""] * len(pages), pa.string()),
        "lang": pa.array(["en"] * len(pages), pa.string()),
    })
    pq.write_table(table, str(tmp_path / "pages.parquet"))

    for max_retries, sub in ((3, "a"), (0, "b")):
        cfg = CrawlConfig(
            pages_path=str(tmp_path / "pages.parquet"),
            workdir=str(tmp_path / sub), seeds=[home], budget=5,
            max_rounds=10, scan_date=SCAN_DATE, node=NODE,
            num_shards=2, num_buckets=2, max_retries=max_retries,
            small_round_threshold=0)
        crawler = Crawler(cfg)
        summary = crawler.run()
        sim = sim_crawl(ref, pages, [home], 5, 10, SCAN_DATE, NODE,
                        max_retries=max_retries)
        _compare(crawler, summary, sim)
        log = _engine_log(crawler)
        busy_scans = [r for r, u in log if u == busy]
        # Scanned once + one requeue per allowed retry, in consecutive
        # rounds.
        assert busy_scans == list(range(1, 2 + max_retries))


def test_count_where_dsl(ray_session, web, tmp_path):
    import ray

    from torray.stats import count_where

    import pyarrow.parquet as pq2

    pq2.write_table(web.table(), str(tmp_path / "p.parquet"))
    from torray.extract import scan_pages_dataset

    scan = scan_pages_dataset(ray.data.read_parquet(str(tmp_path / "p.parquet")),
                              scan_date=SCAN_DATE, node=NODE).materialize()
    df = scan.to_pandas()
    assert count_where(scan, "online", "eq", True) == int(df["online"].sum())
    assert count_where(scan, "online", "ne", True) == int((~df["online"]).sum())
    assert count_where(scan, "hash", "has") == int(df["hash"].notna().sum())
    with pytest.raises(ValueError):
        count_where(scan, "online", "gt", 1)


def test_count_where_semijoin_matches_duckdb(ray_session):
    """`has` with a second Dataset = the urls ⋉ domains relationship
    count (SpiderStats.py:117-143), checked against a DuckDB EXISTS."""
    import duckdb
    import pyarrow as pa
    import ray

    from torray.stats import count_where

    left = pa.table({
        "host": pa.array(["a", "b", "c", "a", None, "d", "b"], pa.string()),
        "x": pa.array(range(7), pa.int64()),
    })
    right = pa.table({
        "domain": pa.array(["a", "b", "b", "e"], pa.string()),
    })
    got = count_where(ray.data.from_arrow(left), "host", "has",
                      other_ds=ray.data.from_arrow(right),
                      other_col="domain")
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    expected = con.execute(
        "SELECT count(*) FROM l WHERE EXISTS "
        "(SELECT 1 FROM r WHERE r.domain = l.host)").fetchone()[0]
    assert got == expected == 4


def test_stats_cli_report(ray_session, tmp_path, monkeypatch, capsys):
    """`python -m torray stats` prints the SpiderStats-shaped report
    (reference SpiderStats.py:148-170) and its numbers match the
    machine-readable dict (--json) exactly."""
    import json as _json

    import pyarrow.parquet as pq
    import ray

    from torray.__main__ import main
    from torray.crawl import CrawlConfig, Crawler
    from torray.synth import SynthWeb

    web = SynthWeb(150, 8, seed=42)
    pq.write_table(web.table(), str(tmp_path / "pages.parquet"))
    cfg = CrawlConfig(pages_path=str(tmp_path / "pages.parquet"),
                      workdir=str(tmp_path / "wd"), seeds=web.seeds(2),
                      budget=6, max_rounds=4, num_shards=2, num_buckets=4)
    Crawler(cfg).run()

    # main() owns a Ray session in real use; under the shared test
    # session its init is a no-op and its shutdown must be too.
    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    args = ["stats", "--workdir", str(tmp_path / "wd"),
            "--pages", str(tmp_path / "pages.parquet")]
    assert main(args + ["--json"]) == 0
    d = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert main(args) == 0
    out = capsys.readouterr().out

    assert "Results:" in out and "Table Stats:" in out
    assert f"Total Onions: {d['total_onions']:,}" in out
    assert f"Total Urls: {d['url_count']:,}" in out
    assert f"Total Pages: {d['page_count']:,}" in out
    assert f"Total Forms: {d['form_count']:,}" in out
    assert f"Total Links: {d['link_count']:,}" in out
    assert ("scanned {:,} ({:.2%})".format(
        d["url_count_scanned"], d["scan_coverage"])) in out
    assert d["total_onions"] >= d["onion_count"] >= 0
    assert d["remaining_onions"] >= 0
    assert d["url_count"] >= d["url_count_scanned"] > 0


def test_corpus_from_crawl_end_to_end(ray_session, web, tmp_path):
    """Discover-then-curate: crawl the synthetic web, feed the seen
    snapshot + pages table into the curation chain; every output url
    was crawled, exact-dup texts collapse to one keeper, ids are
    stable url hashes."""
    import hashlib

    import ray

    from torray.pipelines import corpus_from_crawl

    crawler, summary, _ = _run_engine(web, tmp_path)
    assert summary["seen"] > 0
    pages = ray.data.read_parquet(web.pages_path)
    out = corpus_from_crawl(
        pages, crawler.seen_snapshot_ds(),
        langs=None, min_quality=0.0,
        near_dup_threshold=0.95).to_pandas()

    assert len(out) > 0
    seen_urls = set(crawler.seen_snapshot().column("url").to_pylist())
    assert set(out["url"]) <= seen_urls
    # ids are the documented stable hash of the url
    for u, did in zip(out["url"].head(20), out["doc_id"].head(20)):
        assert did == int.from_bytes(
            hashlib.md5(u.encode()).digest()[:8], "big") >> 1
    # exact dedup happened: survivors' texts are unique
    table = pages.to_pandas().set_index("url")["text"]
    texts = [table[u] for u in out["url"]]
    assert len(texts) == len(set(texts))
    assert set(out["split"]) <= {"train", "test"}


def test_query_cli(ray_session, tmp_path, capsys):
    """`python -m torray query` lists the driver-contract pipelines
    and runs one to parquet — the user-facing entry to every
    SURVEY-§2 operator without writing code."""
    import json as _json

    import pyarrow.parquet as pq

    from torray.__main__ import main

    rc = main(["query", "--list"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "docs_by_lang\tsql-checked" in out
    assert "crawl_bfs\tsql-checked" in out  # r5 golden promotion
    assert "crawl_corpus\trows-only" in out

    dest = str(tmp_path / "out.parquet")
    rc = main(["query", "events_by_type",
               "--sf-dir", "/root/testdata/sf0.001", "--out", dest])
    assert rc == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == 5
    assert pq.read_table(dest).num_rows == 5

    assert main(["query", "no_such_query"]) == 2


def test_sitemap_seed_expansion(tmp_path, ray_session):
    import datetime

    import pyarrow as pa

    from torray.synth import PAGES_SCHEMA

    ts = datetime.datetime(2026, 1, 1)

    def page(url, html):
        return {"url": url, "warc_ts": ts,
                "html": html if isinstance(html, bytes)
                else html.encode(), "text": "", "lang": "en"}

    host = "http://seedhost.onion"
    idx = (f"<sitemapindex><sitemap><loc>{host}/maps/a.xml</loc>"
           f"</sitemap><sitemap><loc>{host}/maps/a.xml</loc>"
           f"</sitemap></sitemapindex>")  # duplicate child = cycle-safe
    child = (f"<urlset><url><loc>{host}/p1</loc></url>"
             f"<url><loc>{host}/p2</loc></url></urlset>")
    rows = [
        page(f"{host}/sitemap.xml", idx),
        page(f"{host}/maps/a.xml", child),
        page(f"{host}/p1", "<html><title>P1</title></html>"),
        page(f"{host}/p2",
             f'<html><a href="{host}/p3">x</a></html>'),
        page(f"{host}/p3", "<html><title>P3</title></html>"),
    ]
    rows.sort(key=lambda r: r["url"])
    table = pa.Table.from_arrays(
        [pa.array([r["url"] for r in rows], pa.string()),
         pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
         pa.array([r["html"] for r in rows], pa.binary()),
         pa.array([r["text"] for r in rows], pa.string()),
         pa.array([r["lang"] for r in rows], pa.string())],
        schema=PAGES_SCHEMA)
    pq.write_table(table, str(tmp_path / "pages.parquet"))

    cfg = CrawlConfig(
        pages_path=str(tmp_path / "pages.parquet"),
        workdir=str(tmp_path / "w"),
        seeds=[],
        seed_sitemaps=[f"{host}/sitemap.xml"],
        budget=5, max_rounds=4, scan_date=SCAN_DATE, node=NODE,
        num_shards=2, num_buckets=2)
    crawler = Crawler(cfg)
    crawler.run()
    scanned = set(crawler.scan_results().to_pandas()["url"])
    # sitemap-listed pages seeded round 0; link discovery continues
    assert {f"{host}/p1", f"{host}/p2", f"{host}/p3"} <= scanned
    # the sitemap files themselves are not seeds
    assert f"{host}/sitemap.xml" not in scanned
