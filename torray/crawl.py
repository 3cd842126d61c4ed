"""The crawl engine: a round-based BFS over the page table, expressed
as Ray Data pipelines with checkpointed frontier + seen-set state.

Per round k (SURVEY.md §3 target lifecycle):

    frontier_k  --groupby(host)-->  politeness selection (budget/host)
    selected    --groupby(bucket)-> fetch-as-lookup + extract (fused:
                                    html bytes never leave the task)
    scan_results_k  --write-->      ckpt/round=k/scan_results
    explode new_urls -> candidates --groupby(shard)-> seen-shard offer
                                    (first-wins dedup, robots, dense
                                    per-host sequencing)
    frontier_{k+1} = deferred ∪ accepted  --write--> ckpt checkpoints

All shuffles move only narrow url/host columns.  Every ordering
decision is deterministic (the schedule spec in tests/oracle_sim.py's
docstring); the conformance tests compare crawl order, final seen set,
and per-row extracted bytes against the single-threaded oracle built
on the reference libs.

Checkpoint layout (resume = restore shards from seen deltas, continue
at the first round without a _SUCCESS marker):

    workdir/pagestore/...                 one-time bucketed page index
    workdir/ckpt/round=NNNN/frontier/     frontier ENTERING round N
    workdir/ckpt/round=NNNN/crawl_log/    items selected in round N
    workdir/ckpt/round=NNNN/scan_results/
    workdir/ckpt/round=NNNN/seen_delta/   per-shard newly-seen urls
    workdir/ckpt/round=NNNN/metrics.json  per-round lineage + metrics
    workdir/ckpt/round=NNNN/_SUCCESS
"""

from __future__ import annotations

import glob
import json
import os
import time
from dataclasses import dataclass, field
from urllib.parse import urlsplit

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from torray.extract import scan_batch
from torray.frontier import (
    FRONTIER_SCHEMA,
    make_seen_shards,
    parse_robots,
    select_step,
)
from torray.pagestore import PageStore, bucket_of, stable_hash
from torray.urlnorm import host_of

__all__ = ["CrawlConfig", "Crawler"]


@dataclass
class CrawlConfig:
    pages_path: str
    workdir: str
    seeds: list[str]
    budget: int = 8
    max_rounds: int = 100
    scan_date: str = "2026-01-01"
    node: str = "torray"
    respect_robots: bool = False
    recrawl: bool = False
    num_shards: int = 8
    num_buckets: int = 16
    extra: dict = field(default_factory=dict)


def _round_dir(ckpt: str, rnd: int) -> str:
    return os.path.join(ckpt, f"round={rnd:04d}")


def _explode_links(batch: pa.Table, num_shards: int) -> pa.Table:
    """scan_results batch -> candidate rows (vectorized explode of the
    new_urls list column; parent key columns repeated by list length)."""
    import numpy as np

    links = batch.column("new_urls")
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    lengths = pc.list_value_length(links).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    flat = links.flatten().to_pylist()
    parent_idx = np.repeat(np.arange(len(batch)), lengths)

    hosts, paths, shards = [], [], []
    for url in flat:
        parts = urlsplit(url)
        hosts.append(parts[1])
        paths.append(parts[2])
        shards.append(stable_hash(parts[1]) % num_shards)

    def rep(col):
        return pc.take(batch.column(col), pa.array(parent_idx))

    return pa.Table.from_arrays(
        [
            pa.array(flat, pa.string()),
            pa.array(hosts, pa.string()),
            pa.array(paths, pa.string()),
            pa.array(shards, pa.int32()),
            rep("host"),
            rep("round_entered"),
            rep("host_seq"),
        ],
        names=["url", "host", "path", "shard",
               "parent_host", "parent_round", "parent_seq"],
    )


def _accepted_table(rows: list[tuple[str, str, int]], rnd: int) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.string()),
            pa.array([r[1] for r in rows], pa.string()),
            pa.array([""] * len(rows), pa.string()),
            pa.array([rnd] * len(rows), pa.int32()),
            pa.array([r[2] for r in rows], pa.int64()),
        ],
        schema=FRONTIER_SCHEMA,
    )


class Crawler:
    """Drives the round loop.  Ray must already be initialised by the
    caller (driver contract: this class never calls ray.init)."""

    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.ckpt = os.path.join(cfg.workdir, "ckpt")
        os.makedirs(self.ckpt, exist_ok=True)
        store_root = os.path.join(cfg.workdir, "pagestore")
        if os.path.exists(os.path.join(store_root, "_torray_meta.json")):
            self.store = PageStore(store_root)
        else:
            self.store = PageStore.build(cfg.pages_path, store_root,
                                         cfg.num_buckets)
        robots = None
        if cfg.respect_robots:
            robots = {h: parse_robots(b)
                      for h, b in self.store.robots_bodies().items()}
        self.shards = make_seen_shards(cfg.num_shards, robots)
        self.metrics: list[dict] = []

    # -- checkpoint helpers ---------------------------------------------

    def _completed_rounds(self) -> list[int]:
        out = []
        for path in sorted(glob.glob(os.path.join(self.ckpt, "round=*"))):
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                out.append(int(path.rsplit("=", 1)[1]))
        return sorted(out)

    def _restore_shards(self, upto_round: int) -> None:
        import ray

        refs = []
        for rnd in range(upto_round + 1):
            delta_dir = os.path.join(_round_dir(self.ckpt, rnd), "seen_delta")
            for f in sorted(glob.glob(os.path.join(delta_dir, "shard=*.parquet"))):
                shard_id = int(os.path.basename(f)[6:-8])
                refs.append(self.shards[shard_id].restore.remote(pq.read_table(f)))
        ray.get(refs)

    def _write_seen_delta(self, rnd: int) -> None:
        import ray

        delta_dir = os.path.join(_round_dir(self.ckpt, rnd), "seen_delta")
        os.makedirs(delta_dir, exist_ok=True)
        tables = ray.get([s.drain_delta.remote() for s in self.shards])
        for i, table in enumerate(tables):
            if table.num_rows:
                pq.write_table(table, os.path.join(delta_dir, f"shard={i}.parquet"))

    # -- round stages ---------------------------------------------------

    def _init_frontier(self) -> None:
        """Round-0 frontier from the seed list (F2 ordering: list order
        defines per-host seq)."""
        import ray

        cfg = self.cfg
        by_shard: dict[int, list] = {}
        order: dict[str, int] = {}
        for url in cfg.seeds:
            host = host_of(url)
            path = urlsplit(url)[2]
            sid = stable_hash(host) % cfg.num_shards
            by_shard.setdefault(sid, []).append((url, host, path))
        accepted: list[tuple[str, str, int]] = []
        results = ray.get([
            self.shards[sid].add_seeds.remote(items)
            for sid, items in sorted(by_shard.items())
        ])
        for rows in results:
            accepted.extend(rows)
        table = _accepted_table(accepted, 0)
        frontier_dir = os.path.join(_round_dir(self.ckpt, 0), "frontier")
        os.makedirs(frontier_dir, exist_ok=True)
        pq.write_table(table, os.path.join(frontier_dir, "part-0.parquet"))

    def _fetch_extract_fn(self, rnd: int):
        store = self.store
        cfg = self.cfg

        def fetch_extract(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return group
            bucket = group.column("bucket")[0].as_py()
            urls = group.column("url").to_pylist()
            pages = store.lookup(bucket, urls)
            batch = pa.Table.from_arrays(
                [
                    group.column("url"),
                    pa.array([pages.get(u) for u in urls], pa.binary()),
                    pa.array([u in pages for u in urls], pa.bool_()),
                    group.column("last_hash"),
                    group.column("round_entered"),
                    group.column("host_seq"),
                ],
                names=["url", "html", "present", "last_hash",
                       "round_entered", "host_seq"],
            )
            out = scan_batch(batch, scan_date=cfg.scan_date, node=cfg.node,
                             carry_cols=("round_entered", "host_seq"))
            return out.append_column(
                "round", pa.array([rnd] * out.num_rows, pa.int32()))

        return fetch_extract

    def _offer_fn(self, rnd: int):
        shards = self.shards

        def offer(group: pa.Table) -> pa.Table:
            import ray

            if group.num_rows == 0:
                return _accepted_table([], rnd + 1)
            shard_id = group.column("shard")[0].as_py()
            rows = list(zip(
                group.column("url").to_pylist(),
                group.column("host").to_pylist(),
                group.column("path").to_pylist(),
                group.column("parent_host").to_pylist(),
                group.column("parent_round").to_pylist(),
                group.column("parent_seq").to_pylist(),
            ))
            # First-wins per url by (parent_host, parent_round,
            # parent_seq, url), then one serial offer per shard in
            # first-wins-key order.
            best: dict[str, tuple] = {}
            for url, host, path, phost, pround, pseq in rows:
                key = (phost, pround, pseq, url)
                if url not in best or key < best[url][0]:
                    best[url] = (key, host, path)
            ordered = sorted(best.items(), key=lambda kv: kv[1][0])
            payload = [(url, meta[1], meta[2]) for url, meta in ordered]
            accepted = ray.get(
                shards[shard_id].offer.remote(payload, rnd + 1))
            return _accepted_table(accepted, rnd + 1)

        return offer

    # -- the loop -------------------------------------------------------

    def run(self) -> dict:
        import ray

        cfg = self.cfg
        done = self._completed_rounds()
        recrawl_done = False
        bfs_done = False
        if done:
            self._restore_shards(done[-1])
            rnd = done[-1] + 1
            with open(os.path.join(_round_dir(self.ckpt, done[-1]),
                                   "metrics.json")) as f:
                last = json.load(f)
            if last.get("mode") == "recrawl":
                recrawl_done = True
                rnd = done[-1]
            elif last.get("frontier_out", 1) == 0:
                # BFS already drained: nothing to resume (prevents a
                # finished checkpoint from advancing one empty round per
                # re-run).
                bfs_done = True
        else:
            self._init_frontier()
            rnd = 0

        while not recrawl_done and not bfs_done and rnd < cfg.max_rounds:
            stats = self._run_round(rnd)
            self.metrics.append(stats)
            if stats["frontier_out"] == 0:
                rnd += 1
                break
            rnd += 1

        summary = {"rounds": rnd, "recrawl": recrawl_done}
        if cfg.recrawl and not recrawl_done:
            self._run_recrawl(rnd)
            summary["recrawl"] = True
            summary["rounds"] = rnd + 1
        seen_total = sum(ray.get([s.count.remote() for s in self.shards]))
        summary["seen"] = seen_total
        summary["metrics"] = self.metrics
        return summary

    def _run_round(self, rnd: int) -> dict:
        import ray

        cfg = self.cfg
        t0 = time.monotonic()
        rdir = _round_dir(self.ckpt, rnd)
        frontier = ray.data.read_parquet(os.path.join(rdir, "frontier"))
        frontier_in = frontier.count()
        if frontier_in == 0:
            stats = {"round": rnd, "frontier_in": 0, "selected": 0,
                     "deferred": 0, "results": 0, "accepted": 0,
                     "frontier_out": 0, "wall_s": 0.0}
            with open(os.path.join(rdir, "metrics.json"), "w") as f:
                json.dump(stats, f)
            with open(os.path.join(rdir, "_SUCCESS"), "w") as f:
                f.write("")
            return stats

        budget = cfg.budget
        tagged = frontier.groupby("host").map_groups(
            lambda g: select_step(g, budget), batch_format="pyarrow",
        ).materialize()

        selected = tagged.filter(expr="selected == True").drop_columns(["selected"])
        deferred = tagged.filter(expr="selected == False").drop_columns(["selected"])

        # Crawl log: what round k actually scheduled.
        log_dir = os.path.join(rdir, "crawl_log")
        selected.select_columns(
            ["url", "host", "round_entered", "host_seq"]
        ).map_batches(
            lambda t: t.append_column("round", pa.array([rnd] * t.num_rows, pa.int32())),
            batch_format="pyarrow",
        ).write_parquet(log_dir)

        num_buckets = self.store.num_buckets

        def add_bucket(t: pa.Table) -> pa.Table:
            buckets = [bucket_of(h, num_buckets)
                       for h in t.column("host").to_pylist()]
            return t.append_column("bucket", pa.array(buckets, pa.int32()))

        scan = (
            selected.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(self._fetch_extract_fn(rnd), batch_format="pyarrow")
            .materialize()
        )
        scan.write_parquet(os.path.join(rdir, "scan_results"))

        num_shards = cfg.num_shards
        candidates = scan.map_batches(
            lambda t: _explode_links(t, num_shards), batch_format="pyarrow",
        ).materialize()
        if candidates.count():
            accepted = candidates.groupby("shard").map_groups(
                self._offer_fn(rnd), batch_format="pyarrow",
            ).materialize()
            n_accepted = accepted.count()
        else:
            accepted, n_accepted = None, 0
        n_deferred = deferred.count()
        if n_accepted and n_deferred:
            nxt = deferred.select_columns(FRONTIER_SCHEMA.names).union(
                accepted.select_columns(FRONTIER_SCHEMA.names))
        elif n_accepted:
            nxt = accepted.select_columns(FRONTIER_SCHEMA.names)
        else:
            nxt = deferred.select_columns(FRONTIER_SCHEMA.names)
        nxt_dir = os.path.join(_round_dir(self.ckpt, rnd + 1), "frontier")
        if n_accepted or n_deferred:
            nxt.write_parquet(nxt_dir)
        else:
            os.makedirs(nxt_dir, exist_ok=True)
            pq.write_table(FRONTIER_SCHEMA.empty_table(),
                           os.path.join(nxt_dir, "part-0.parquet"))

        self._write_seen_delta(rnd)

        stats = {
            "round": rnd,
            "frontier_in": frontier_in,
            "selected": frontier_in - n_deferred,
            "deferred": n_deferred,
            "results": scan.count(),
            "accepted": n_accepted,
            "frontier_out": n_accepted + n_deferred,
            "wall_s": round(time.monotonic() - t0, 3),
        }
        with open(os.path.join(rdir, "metrics.json"), "w") as f:
            json.dump(stats, f)
        with open(os.path.join(rdir, "_SUCCESS"), "w") as f:
            f.write("")
        return stats

    def _run_recrawl(self, rnd: int) -> dict:
        """One full rescan of every (non-suppressed) seen url carrying
        its recorded content hash — the M9 change-detection pass."""
        import ray

        cfg = self.cfg
        t0 = time.monotonic()
        rdir = _round_dir(self.ckpt, rnd)

        snaps = ray.get([s.snapshot.remote() for s in self.shards])
        seen = pa.concat_tables([t for t in snaps if t.num_rows])
        seen = seen.filter(pc.field("first_round") >= 0)

        hash_files = glob.glob(os.path.join(
            self.ckpt, "round=*", "scan_results", "*.parquet"))
        parts = [pq.read_table(f, columns=["url", "hash"]) for f in hash_files]
        hashes = pa.concat_tables(parts) if parts else None
        if hashes is not None:
            hashes = hashes.filter(pc.field("hash").is_valid())

        seen_ds = ray.data.from_arrow(seen.select(["url"]))
        if hashes is not None and hashes.num_rows:
            hash_ds = ray.data.from_arrow(hashes)
            joined = seen_ds.join(hash_ds, "left_outer",
                                  num_partitions=cfg.num_shards, on=("url",))
        else:
            joined = seen_ds.map_batches(
                lambda t: t.append_column("hash", pa.nulls(t.num_rows, pa.string())),
                batch_format="pyarrow")

        num_buckets = self.store.num_buckets

        def to_frontier(t: pa.Table) -> pa.Table:
            urls = t.column("url").to_pylist()
            hosts = [host_of(u) for u in urls]
            hs = t.column("hash").to_pylist()
            return pa.Table.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(hosts, pa.string()),
                    pa.array([h if h else "" for h in hs], pa.string()),
                    pa.array([-1] * len(urls), pa.int32()),
                    pa.array([-1] * len(urls), pa.int64()),
                    pa.array([bucket_of(h, num_buckets) for h in hosts],
                             pa.int32()),
                ],
                names=["url", "host", "last_hash", "round_entered",
                       "host_seq", "bucket"],
            )

        frontier = joined.map_batches(to_frontier, batch_format="pyarrow")
        frontier.select_columns(
            ["url", "host", "round_entered", "host_seq"]
        ).map_batches(
            lambda t: t.append_column("round", pa.array([rnd] * t.num_rows, pa.int32())),
            batch_format="pyarrow",
        ).write_parquet(os.path.join(rdir, "crawl_log"))

        scan = (
            frontier.groupby("bucket")
            .map_groups(self._fetch_extract_fn(rnd), batch_format="pyarrow")
        )
        scan.write_parquet(os.path.join(rdir, "scan_results"))

        stats = {"round": rnd, "mode": "recrawl",
                 "wall_s": round(time.monotonic() - t0, 3)}
        with open(os.path.join(rdir, "metrics.json"), "w") as f:
            json.dump(stats, f)
        with open(os.path.join(rdir, "_SUCCESS"), "w") as f:
            f.write("")
        self.metrics.append(stats)
        return stats

    # -- results access -------------------------------------------------

    def scan_results(self):
        """All rounds' scan results as one Dataset."""
        import ray

        return ray.data.read_parquet(sorted(glob.glob(
            os.path.join(self.ckpt, "round=*", "scan_results", "*.parquet"))))

    def crawl_log(self):
        import ray

        return ray.data.read_parquet(sorted(glob.glob(
            os.path.join(self.ckpt, "round=*", "crawl_log", "*.parquet"))))

    def seen_snapshot(self) -> pa.Table:
        import ray

        snaps = ray.get([s.snapshot.remote() for s in self.shards])
        tables = [t for t in snaps if t.num_rows]
        if not tables:
            from torray.frontier import SEEN_SNAPSHOT_SCHEMA
            return SEEN_SNAPSHOT_SCHEMA.empty_table()
        return pa.concat_tables(tables)
