"""Unit tests for the frontier state machines (no Ray needed):
cuckoo filter properties, seen-shard protocol, robots parsing,
politeness selection."""

from __future__ import annotations

import pyarrow as pa

from torray.frontier import (
    CuckooFilter,
    SeenShardState,
    parse_robots,
    split_budget,
)
from torray.pagestore import stable_hash


def test_cuckoo_no_false_negatives():
    f = CuckooFilter(1 << 12)
    hashes = [stable_hash(f"url-{i}") for i in range(3000)]
    for h in hashes:
        assert f.add_hash(h) or True  # may fail near capacity; checked below
    misses = [h for h in hashes if not f.may_contain_hash(h)]
    # add_hash returning False means "full"; the shard grows+rebuilds in
    # that case. For items reported inserted there must be NO false
    # negatives — verify via a fresh, adequately-sized filter.
    g = CuckooFilter(1 << 13)
    inserted = [h for h in hashes if g.add_hash(h)]
    assert len(inserted) == len(hashes)
    assert all(g.may_contain_hash(h) for h in inserted)


def test_cuckoo_false_positive_rate_reasonable():
    g = CuckooFilter(1 << 13)
    for i in range(4000):
        g.add_hash(stable_hash(f"member-{i}"))
    fp = sum(g.may_contain_hash(stable_hash(f"other-{i}"))
             for i in range(10000))
    assert fp / 10000 < 0.05  # 16-bit fingerprints, 4-slot buckets


def test_seen_shard_first_wins_and_sequencing():
    s = SeenShardState(0)
    accepted = s.offer(
        [("http://a.onion/1", "a.onion", "/1"),
         ("http://a.onion/2", "a.onion", "/2"),
         ("http://b.onion/1", "b.onion", "/1")], round_entered=1)
    assert accepted == [("http://a.onion/1", "a.onion", 0),
                        ("http://a.onion/2", "a.onion", 1),
                        ("http://b.onion/1", "b.onion", 0)]
    # Re-offers are rejected; new round restarts per-host seqs.
    accepted2 = s.offer(
        [("http://a.onion/1", "a.onion", "/1"),
         ("http://a.onion/3", "a.onion", "/3")], round_entered=2)
    assert accepted2 == [("http://a.onion/3", "a.onion", 0)]
    assert s.count() == 4


def test_seen_shard_buffer_finalize_order_independent():
    def run(order):
        s = SeenShardState(0)
        rows = [
            ("http://h.onion/x", "h.onion", "/x", ("p1", 0, 0, "http://h.onion/x")),
            ("http://h.onion/y", "h.onion", "/y", ("p0", 0, 0, "http://h.onion/y")),
            ("http://h.onion/x", "h.onion", "/x", ("p0", 0, 1, "http://h.onion/x")),
        ]
        for i in order:
            s.buffer([rows[i]])
        return s.finalize(3)

    a = run([0, 1, 2])
    b = run([2, 1, 0])
    c = run([1, 2, 0])
    assert a == b == c
    # 'y' has the smaller first-wins key (p0,0,0) -> host_seq 0.
    assert a == [("http://h.onion/y", "h.onion", 0),
                 ("http://h.onion/x", "h.onion", 1)]


def test_seen_shard_robots_suppression_and_delta():
    s = SeenShardState(0, robots={"h.onion": ["/private/"]})
    accepted = s.offer(
        [("http://h.onion/ok", "h.onion", "/ok"),
         ("http://h.onion/private/x", "h.onion", "/private/x")],
        round_entered=1)
    assert [a[0] for a in accepted] == ["http://h.onion/ok"]
    snap = s.snapshot()
    rows = {r["url"]: r for r in snap.to_pylist()}
    assert rows["http://h.onion/private/x"]["first_round"] == -1
    assert rows["http://h.onion/ok"]["first_round"] == 1
    delta = s.drain_delta()
    assert delta.num_rows == 2
    assert s.drain_delta().num_rows == 0  # drained


def test_seen_shard_restore_roundtrip():
    s = SeenShardState(3)
    s.offer([(f"http://h{i}.onion/", f"h{i}.onion", "/") for i in range(50)],
            round_entered=2)
    snap = s.snapshot()
    t = SeenShardState(3)
    t.restore(snap)
    assert t.count() == s.count()
    assert t.snapshot().equals(snap)
    # Restored state rejects known urls.
    assert t.offer([("http://h1.onion/", "h1.onion", "/")], 5) == []


def test_parse_robots():
    body = (b"# comment\nUser-agent: *\nDisallow: /private/\n"
            b"Disallow:\nDisallow: /tmp # inline\nAllow: /public\n")
    assert parse_robots(body) == ["/private/", "/tmp"]
    assert parse_robots(b"") == []


def test_split_budget_per_host_ordering():
    t = pa.table({
        "url": pa.array([f"u{i}" for i in range(6)]),
        "host": pa.array(["a", "a", "a", "b", "b", "b"]),
        "last_hash": pa.array([""] * 6),
        "round_entered": pa.array([1, 0, 0, 2, 2, 2], pa.int32()),
        "host_seq": pa.array([0, 5, 1, 2, 0, 1], pa.int64()),
    })
    selected, deferred = split_budget(t, 2)
    sel = sorted(selected.column("url").to_pylist())
    # host a: (0,1)=u2,(0,5)=u1 selected; (1,0)=u0 deferred.
    # host b: (2,0)=u4,(2,1)=u5 selected; (2,2)=u3 deferred.
    assert sel == ["u1", "u2", "u4", "u5"]
    assert sorted(deferred.column("url").to_pylist()) == ["u0", "u3"]


def test_split_budget_empty():
    t = pa.table({"url": pa.array([], pa.string()),
                  "host": pa.array([], pa.string()),
                  "last_hash": pa.array([], pa.string()),
                  "round_entered": pa.array([], pa.int32()),
                  "host_seq": pa.array([], pa.int64())})
    s, d = split_budget(t, 3)
    assert s.num_rows == 0 and d.num_rows == 0


def test_seen_shard_spill_equivalence(tmp_path):
    """A shard with a tiny in-heap cap + Parquet spill behaves
    identically to the all-in-heap shard: same accept decisions, same
    membership, same count, same snapshot rows."""
    from torray.frontier import SeenShardState

    plain = SeenShardState(0)
    spilled = SeenShardState(0, max_inheap=7, spill_dir=str(tmp_path))

    rounds = [
        [(f"http://h{i % 5}a.onion/p{i}", f"h{i % 5}a.onion", f"/p{i}")
         for i in range(r * 9, r * 9 + 9)]
        for r in range(6)
    ]
    # Re-offer every earlier url too: dedup must hold across spills.
    for rnd, batch in enumerate(rounds):
        earlier = [item for b in rounds[:rnd] for item in b[:3]]
        payload = sorted(batch + earlier)
        a = plain.offer(list(payload), rnd)
        b = spilled.offer(list(payload), rnd)
        assert a == b, rnd
        plain.drain_delta()
        spilled.drain_delta()  # spill point

    assert spilled.spill is not None and spilled.spill.runs, \
        "cap was never exceeded — test misconfigured"
    assert plain.count() == spilled.count()
    snap_a = plain.snapshot().sort_by("url")
    snap_b = spilled.snapshot().sort_by("url")
    assert snap_a.equals(snap_b)
    # Membership through the run-probe path.
    for b in rounds:
        for url, _h, _p in b:
            assert spilled._is_seen(url)
    assert not spilled._is_seen("http://neverseen.onion/")


def test_crawl_with_seen_spill_matches_default(ray_session, tmp_path):
    """Engine-level: a crawl with an aggressive spill threshold produces
    the identical schedule, results, and seen set as the default."""
    import pyarrow.parquet as pq

    from torray.crawl import CrawlConfig, Crawler
    from torray.synth import SynthWeb

    web = SynthWeb(250, 10, seed=7)
    pq.write_table(web.table(), str(tmp_path / "pages.parquet"))

    def run(sub, threshold):
        cfg = CrawlConfig(
            pages_path=str(tmp_path / "pages.parquet"),
            workdir=str(tmp_path / sub), seeds=web.seeds(2), budget=5,
            max_rounds=8, num_shards=2, num_buckets=4,
            seen_spill_threshold=threshold, small_round_threshold=0)
        c = Crawler(cfg)
        c.run()
        log = c.crawl_log().to_pandas().sort_values(
            ["round", "host", "round_entered", "host_seq", "url"],
            kind="mergesort")
        return (list(zip(log["round"], log["url"])),
                set(c.seen_snapshot().column("url").to_pylist()))

    log_a, seen_a = run("plain", None)
    log_b, seen_b = run("spill", 10)
    assert log_a == log_b
    assert seen_a == seen_b


def test_crawl_resume_with_seen_spill(ray_session, tmp_path):
    """Checkpoint resume rebuilds spilled shards correctly: an
    interrupted spill-mode crawl converges to the uninterrupted run."""
    import pyarrow.parquet as pq

    from torray.crawl import CrawlConfig, Crawler
    from torray.synth import SynthWeb

    web = SynthWeb(250, 10, seed=7)
    pq.write_table(web.table(), str(tmp_path / "pages.parquet"))

    def mk(sub, max_rounds):
        cfg = CrawlConfig(
            pages_path=str(tmp_path / "pages.parquet"),
            workdir=str(tmp_path / sub), seeds=web.seeds(2), budget=5,
            max_rounds=max_rounds, num_shards=2, num_buckets=4,
            seen_spill_threshold=10, small_round_threshold=0)
        c = Crawler(cfg)
        c.run()
        return c

    full = mk("full", 7)
    mk("part", 3)
    resumed = mk("part", 7)

    def log_of(c):
        df = c.crawl_log().to_pandas().sort_values(
            ["round", "host", "round_entered", "host_seq", "url"],
            kind="mergesort")
        return list(zip(df["round"], df["url"]))

    assert log_of(resumed) == log_of(full)
    assert (set(resumed.seen_snapshot().column("url").to_pylist())
            == set(full.seen_snapshot().column("url").to_pylist()))


def test_spill_survives_filter_growth(tmp_path):
    """Regression: when the cuckoo filter saturates and rebuilds AFTER
    part of the seen set has spilled, spilled fingerprints must survive
    the rebuild — a heap-only rebuild re-accepts every spilled url
    (caught as 30% duplicate re-scans in a fat-crawl bench)."""
    from torray.frontier import CuckooFilter, SeenShardState

    s = SeenShardState(0, max_inheap=500, spill_dir=str(tmp_path))
    s.filter = CuckooFilter(1 << 10)  # small start -> forced growth

    n = 6000
    all_urls = []
    for rnd in range(6):
        batch = [(f"http://g{i % 7}.onion/page{i}", f"g{i % 7}.onion",
                  f"/page{i}")
                 for i in range(rnd * 1000, rnd * 1000 + 1000)]
        accepted = s.offer(sorted(batch), rnd)
        assert len(accepted) == 1000
        all_urls.extend(u for u, _h, _p in batch)
        s.drain_delta()  # spill point (heap cap 500 < 1000/round)

    assert s.spill.runs, "nothing spilled — test misconfigured"
    assert s.filter.capacity >= n, "filter never grew"
    # Every url — heap or spilled — must still be seen: zero re-accepts.
    re_offer = sorted((u, f"g{i % 7}.onion", "/x")
                      for i, u in enumerate(all_urls))
    assert s.offer(re_offer, 99) == []
    assert s.count() == n


def test_contains_many_matches_contains(tmp_path):
    """The batched spill probe equals the per-url probe."""
    from torray.frontier import _SpillRuns

    runs = _SpillRuns(str(tmp_path), 1)
    runs.spill({f"http://a.onion/{i:04d}": (0, i) for i in range(0, 900, 2)})
    runs.spill({f"http://a.onion/{i:04d}": (1, i) for i in range(901, 1800, 3)})
    queries = [f"http://a.onion/{i:04d}" for i in range(-5, 1810)] + [
        "http://zzz.onion/", ""]
    got = runs.contains_many(queries)
    expected = {q for q in queries if runs.contains(q)}
    assert got == expected
    assert runs.contains_many([]) == set()
