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
    accepted_table,
    make_seen_shards,
    parse_robots,
    split_budget,
)
from torray.pagestore import PageStore, bucket_of, stable_hash
from torray.urlnorm import hash_mod_dict, host_of, hosts_paths_arrays

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
    # Sitemap URLs to expand into extra round-0 seeds: each is looked
    # up in the page store and parsed (sitemaps.org urlset /
    # sitemapindex subset, ops.policy.parse_sitemap); index files
    # recurse up to 4 levels.  Expansion order is deterministic
    # (listing order, then in-file order), so the F2 per-host seq
    # contract extends unchanged.
    seed_sitemaps: list[str] = field(default_factory=list)
    # Retryable (no-fault-status) scans re-enter the next round's
    # frontier up to this many times — the engine's deterministic
    # rendering of the reference backend re-serving no_fault_codes urls
    # (TorSpider.py:168); the reference retries forever, bounded only
    # by the daemon's lifetime, so a cap is the batch-world analogue.
    max_retries: int = 3
    # Sub-shard scan fan-out: a shard whose selected set exceeds
    # ~1.5x this many rows scans in nested tasks of this size, so scan
    # parallelism follows data volume, not shard count.  None (default)
    # sizes the chunk per round from the cluster CPU count (targeting
    # ~2 chunks per core per round); 0 disables; >0 pins it.
    scan_chunk: int | None = None
    # Bounded-memory seen set: when set, a shard whose in-heap exact
    # layer exceeds this many urls spills it to sorted Parquet runs at
    # the round boundary (workdir/seen_spill); membership then probes
    # cuckoo -> heap -> runs.  None keeps everything in-heap.
    seen_spill_threshold: int | None = None
    # Rounds at or below this many frontier items run driver-local
    # (plain Arrow + the same shard actors): early BFS rounds are tiny,
    # and a Ray Data pipeline's fixed scheduling cost per stage would
    # dominate them.  Rounds above it run the distributed path.  Set 0
    # to force every round distributed (conformance tests do).
    small_round_threshold: int = 2048
    extra: dict = field(default_factory=dict)

    # -- spider.cfg parity (reference TorSpider.py:423-475) -------------

    @staticmethod
    def write_default_file(path: str) -> None:
        """First-run bootstrap: write a default config file for the user
        to edit — the reference's write-spider.cfg-and-exit path
        (``TorSpider.py:423-444``)."""
        import configparser

        cp = configparser.RawConfigParser()
        cp.optionxform = lambda option: option
        cp["TorSpider"] = {
            "Node": "torray",
            "Budget": "8",
            "MaxRounds": "100",
            "MaxRetries": "3",
            "RespectRobots": "False",
            "ScanDate": "2026-01-01",
        }
        cp["PARTITIONING"] = {
            "NumShards": "8",
            "NumBuckets": "16",
        }
        with open(path, "w") as f:
            cp.write(f)

    def apply_file(self, path: str) -> "CrawlConfig":
        """Apply a spider.cfg-style file (configparser).  Precedence is
        file < CLI flags < env — env beats file exactly as the
        reference resolves API settings (``TorSpider.py:450-467``)."""
        import configparser

        cp = configparser.ConfigParser()
        if not cp.read(path):
            raise ValueError(f"could not parse config file {path!r}")
        spider = cp["TorSpider"] if "TorSpider" in cp else {}
        if "Node" in spider:
            self.node = spider["Node"]
        if "ScanDate" in spider:
            self.scan_date = spider["ScanDate"]
        for key, attr in (("Budget", "budget"),
                          ("MaxRounds", "max_rounds"),
                          ("MaxRetries", "max_retries")):
            if key in spider:
                setattr(self, attr, int(spider[key]))
        if "RespectRobots" in spider:
            self.respect_robots = cp["TorSpider"].getboolean("RespectRobots")
        part = cp["PARTITIONING"] if "PARTITIONING" in cp else {}
        for key, attr in (("NumShards", "num_shards"),
                          ("NumBuckets", "num_buckets")):
            if key in part:
                setattr(self, attr, int(part[key]))
        return self

    def apply_env(self) -> "CrawlConfig":
        """Environment-variable overrides, mirroring the reference's
        config precedence (env beats file — ``/root/reference/
        TorSpider.py:450-467``).  Recognized: TORRAY_NODE,
        TORRAY_BUDGET, TORRAY_MAX_ROUNDS, TORRAY_NUM_SHARDS,
        TORRAY_NUM_BUCKETS, TORRAY_RESPECT_ROBOTS."""
        env = os.environ
        if env.get("TORRAY_NODE"):
            self.node = env["TORRAY_NODE"]
        for key, attr in (("TORRAY_BUDGET", "budget"),
                          ("TORRAY_MAX_ROUNDS", "max_rounds"),
                          ("TORRAY_NUM_SHARDS", "num_shards"),
                          ("TORRAY_NUM_BUCKETS", "num_buckets"),
                          ("TORRAY_MAX_RETRIES", "max_retries"),
                          ("TORRAY_SCAN_CHUNK", "scan_chunk")):
            if env.get(key):
                setattr(self, attr, int(env[key]))
        if env.get("TORRAY_RESPECT_ROBOTS"):
            self.respect_robots = env["TORRAY_RESPECT_ROBOTS"].lower() in (
                "1", "true", "yes")
        return self


def _round_dir(ckpt: str, rnd: int) -> str:
    return os.path.join(ckpt, f"round={rnd:04d}")


def _explode_links(batch: pa.Table, num_shards: int) -> pa.Table:
    """scan_results batch -> candidate rows (vectorized explode of the
    new_urls list column; parent key columns repeated by list length).

    Host/path extraction is one ``pc.extract_regex`` pass and the
    shard hash is computed once per DISTINCT host (dictionary-encoded)
    — no per-candidate Python in this per-round hot path."""
    import numpy as np

    links = batch.column("new_urls")
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    lengths = pc.list_value_length(links).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    flat = links.flatten()
    parent_idx = np.repeat(np.arange(len(batch)), lengths)

    hosts, paths = hosts_paths_arrays(flat)
    shards = hash_mod_dict(hosts, num_shards, stable_hash)

    def rep(col):
        if col not in batch.column_names:
            # Parent-key columns are absent in frontier-less scans (the
            # whole-table mode); zeros keep the candidate schema stable.
            typ = pa.int32() if col == "round_entered" else pa.int64()
            return pa.array([0] * len(parent_idx), typ)
        return pc.take(batch.column(col), pa.array(parent_idx))

    return pa.Table.from_arrays(
        [
            flat.cast(pa.string()),
            hosts,
            paths,
            shards,
            rep("host"),
            rep("round_entered"),
            rep("host_seq"),
        ],
        names=["url", "host", "path", "shard",
               "parent_host", "parent_round", "parent_seq"],
    )


def _requeue_table(scan: pa.Table, rnd: int, max_retries: int) -> pa.Table:
    """Rows of a scan output (with carried retries/last_hash and the
    emit_retry marker) that re-enter round rnd+1, as a FRONTIER_SCHEMA
    table.  Retryable = no-fault-status outcome with retries left."""
    mask = pc.and_(scan.column("retry"),
                   pc.less(scan.column("retries"), max_retries))
    req = scan.filter(mask)
    return pa.Table.from_arrays(
        [
            req.column("url").combine_chunks(),
            req.column("host").combine_chunks(),
            req.column("last_hash").combine_chunks(),
            pa.array([rnd + 1] * req.num_rows, pa.int32()),
            req.column("host_seq").combine_chunks(),
            pc.add(req.column("retries"), 1).cast(pa.int32()).combine_chunks(),
        ],
        schema=FRONTIER_SCHEMA,
    )


_SCAN_CARRY = ("round_entered", "host_seq", "retries", "last_hash")


def _scan_selected_impl(selected: pa.Table, shard_id: int, chunk_id: int,
                        rnd: int, nxt_dir: str, rdir: str, store,
                        shard_actors, num_shards: int, num_buckets: int,
                        scan_date: str, node: str,
                        max_retries: int) -> dict:
    """Scan one chunk of a shard's selected frontier: bucketed page
    lookup, fused scan, write this chunk's scan-results / retry files
    (deterministic names -> retry-idempotent), push pre-deduped
    candidates to the target seen-shard actors.  Runs inline for small
    shards and as a nested Ray task for fat ones (sub-shard fan-out:
    scan parallelism scales with rows, not with the shard count)."""
    import ray

    t0 = time.monotonic()
    urls = selected.column("url").to_pylist()
    hosts = selected.column("host").to_pylist()
    by_bucket: dict[int, list[str]] = {}
    for u, h in zip(urls, hosts):
        by_bucket.setdefault(bucket_of(h, num_buckets), []).append(u)
    pages: dict[str, bytes | None] = {}
    for b, bucket_urls in sorted(by_bucket.items()):
        pages.update(store.lookup(b, bucket_urls))
    t_lookup = time.monotonic() - t0

    batch_in = pa.Table.from_arrays(
        [
            selected.column("url"),
            pa.array([pages.get(u) for u in urls], pa.binary()),
            pa.array([u in pages for u in urls], pa.bool_()),
            selected.column("last_hash"),
            selected.column("round_entered"),
            selected.column("host_seq"),
            selected.column("retries"),
        ],
        names=["url", "html", "present", "last_hash",
               "round_entered", "host_seq", "retries"],
    )
    t1 = time.monotonic()
    scan = scan_batch(batch_in, scan_date=scan_date, node=node,
                      carry_cols=_SCAN_CARRY, emit_retry=True)
    t_parse = time.monotonic() - t1
    requeue = _requeue_table(scan, rnd, max_retries)
    if requeue.num_rows:
        pq.write_table(requeue, os.path.join(
            nxt_dir,
            f"shard-{shard_id:05d}-retry-{chunk_id:03d}.parquet"))
    scan = scan.drop_columns(["retry", "retries", "last_hash"])
    scan = scan.append_column(
        "round", pa.array([rnd] * scan.num_rows, pa.int32()))
    pq.write_table(scan, os.path.join(
        rdir, "scan_results",
        f"shard-{shard_id:05d}-{chunk_id:03d}.parquet"))

    import numpy as np

    cand = _explode_links(scan, num_shards)
    pushes = []
    if cand.num_rows:
        # Vectorized local first-wins per url (cross-task winners are
        # re-resolved by the actor's finalize), then one Arrow-table
        # push per target shard — no per-candidate Python tuples.
        urls = np.asarray(cand.column("url").to_pylist())
        phost = np.asarray(cand.column("parent_host").to_pylist())
        pround = cand.column("parent_round").to_numpy(zero_copy_only=False)
        pseq = cand.column("parent_seq").to_numpy(zero_copy_only=False)
        order = np.lexsort((pseq, pround, phost, urls))
        su = urls[order]
        keep = order[np.r_[True, su[1:] != su[:-1]]]
        kept = cand.take(pa.array(np.sort(keep), pa.int64()))
        shards_np = kept.column("shard").to_numpy(zero_copy_only=False)
        for t in np.unique(shards_np):
            sub = kept.filter(pa.array(shards_np == t)).drop_columns(
                ["shard"])
            # Tagged with the scan round: the pipelined loop overlaps
            # round k's finalize with round k+1's scans, so this push
            # may race a finalize on the target actor — the tag keeps
            # it in round rnd's bin (see SeenShardState.buffer_table).
            pushes.append(
                shard_actors[int(t)].buffer_table.remote(sub, rnd))
    if pushes:
        ray.get(pushes)
    return {"results": scan.num_rows, "requeued": requeue.num_rows,
            "t_lookup": round(t_lookup, 3), "t_parse": round(t_parse, 3),
            "t_rest": round(time.monotonic() - t0 - t_lookup - t_parse, 3)}


_SCAN_CHUNK_TASK = None


def _scan_chunk_task():
    global _SCAN_CHUNK_TASK
    if _SCAN_CHUNK_TASK is None:
        import ray

        _SCAN_CHUNK_TASK = ray.remote(num_cpus=1)(_scan_selected_impl)
    return _SCAN_CHUNK_TASK


def _process_shard_impl(shard_id: int, rnd: int, frontier_dir: str,
                        nxt_dir: str, rdir: str, store, shard_actors,
                        num_shards: int, num_buckets: int, budget: int,
                        scan_date: str, node: str, max_retries: int,
                        scan_chunk: int, accepted=None) -> dict:
    """One shard's share of a distributed round (see
    ``Crawler._run_round_sharded``): read own frontier files, politeness
    selection, write crawl-log / deferred shards, then scan — inline
    when the selected set is small, else fanned out over nested Ray
    tasks in ``scan_chunk``-row slices sorted by bucket (sub-shard
    parallelism; a blocked parent task releases its CPU while waiting).
    Runs as a plain Ray task: the round is a fixed fan-out of
    side-effecting workers, which raw tasks dispatch with less
    per-round overhead than a Dataset execution.

    ``accepted``: in the pipelined round loop the previous round's
    accepted frontier arrives as an in-memory table (an ObjectRef on
    this shard's own node — the actor produced it there), NOT as a
    parquet file: its checkpoint write is still in flight, overlapped
    with this scan.  Deferred/retry files were written by the
    previous round's scan tasks (complete before that round's
    barrier), so they are read from disk as usual; the accepted file
    is EXCLUDED from the glob to avoid double counting when the
    overlapped write has already landed."""
    import numpy as np
    import ray

    my_node = ray.get_runtime_context().get_node_id()
    files = sorted(glob.glob(os.path.join(
        frontier_dir, f"shard-{shard_id:05d}-*.parquet")))
    tables = []
    if accepted is not None:
        files = [f for f in files if not f.endswith("-accepted.parquet")]
        if accepted.num_rows:
            tables.append(accepted)
    if not files and not tables:
        return {"shard": shard_id, "frontier": 0, "selected": 0,
                "deferred": 0, "results": 0, "requeued": 0, "chunks": 0,
                "t_lookup": 0.0, "t_parse": 0.0, "t_rest": 0.0,
                "node_id": my_node}
    frontier = pa.concat_tables(
        tables + [pq.read_table(f) for f in files])
    selected, deferred = split_budget(frontier, budget)

    log = selected.select(
        ["url", "host", "round_entered", "host_seq"]).append_column(
        "round", pa.array([rnd] * selected.num_rows, pa.int32()))
    pq.write_table(log, os.path.join(
        rdir, "crawl_log", f"shard-{shard_id:05d}.parquet"))
    if deferred.num_rows:
        pq.write_table(
            deferred.select(FRONTIER_SCHEMA.names),
            os.path.join(nxt_dir, f"shard-{shard_id:05d}-deferred.parquet"))

    scan_args = (rnd, nxt_dir, rdir, store, shard_actors, num_shards,
                 num_buckets, scan_date, node, max_retries)
    if scan_chunk and selected.num_rows > scan_chunk * 3 // 2:
        # Sub-shard fan-out: bucket-sort the selected rows and cut
        # chunks ON BUCKET BOUNDARIES (greedy fill to ~scan_chunk rows)
        # so every store bucket is decoded by exactly ONE chunk task —
        # mid-bucket cuts would multiply each bucket's Parquet decode
        # by the number of chunks that touch it.
        buckets = np.array([bucket_of(h, num_buckets)
                            for h in selected.column("host").to_pylist()])
        order = np.argsort(buckets, kind="stable")
        ordered = selected.take(pa.array(order, pa.int64()))
        b_sorted = buckets[order]
        n = len(b_sorted)
        bounds = np.flatnonzero(
            np.r_[True, b_sorted[1:] != b_sorted[:-1]]).tolist() + [n]
        slices: list[tuple[int, int]] = []
        start = 0
        for i in range(len(bounds) - 1):
            if bounds[i + 1] - start >= scan_chunk:
                slices.append((start, bounds[i + 1]))
                start = bounds[i + 1]
        if start < n:
            slices.append((start, n))
        task = _scan_chunk_task()
        chunk_refs = [
            task.remote(ordered.slice(lo, hi - lo), shard_id,
                        ci, *scan_args)
            for ci, (lo, hi) in enumerate(slices)
        ]
        chunk_stats = ray.get(chunk_refs)
    else:
        chunk_stats = [_scan_selected_impl(selected, shard_id, 0,
                                           *scan_args)]
    out = {"shard": shard_id, "frontier": frontier.num_rows,
           "selected": selected.num_rows, "deferred": deferred.num_rows,
           "results": sum(c["results"] for c in chunk_stats),
           "requeued": sum(c["requeued"] for c in chunk_stats),
           "chunks": len(chunk_stats), "node_id": my_node}
    for key in ("t_lookup", "t_parse", "t_rest"):
        out[key] = round(sum(c[key] for c in chunk_stats), 3)
    return out


def _frontier_count(rdir: str) -> int:
    """Frontier size from Parquet footers only (no Ray execution)."""
    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(rdir, "frontier", "*.parquet")))


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
        # Startup sanity gate — the fetch layer's analogue of the
        # reference's Tor-connectivity check (TorSpider.py:479-498):
        # the page store must be present and readable before spiders
        # wake.
        if not glob.glob(os.path.join(store_root, "**", "*.parquet"),
                         recursive=True):
            raise RuntimeError(
                f"page store at {store_root} contains no parquet — "
                f"pages_path {cfg.pages_path!r} empty or unreadable?")
        robots = None
        if cfg.respect_robots:
            robots = {h: parse_robots(b)
                      for h, b in self.store.robots_bodies().items()}
        self.shards = make_seen_shards(
            cfg.num_shards, robots,
            max_inheap=cfg.seen_spill_threshold,
            spill_dir=(os.path.join(cfg.workdir, "seen_spill")
                       if cfg.seen_spill_threshold else None))
        self.metrics: list[dict] = []
        self._shard_task = None  # lazily-created ray.remote wrapper
        self._shard_nodes = None  # actor node ids (placement pinning)
        self._pending_round = None  # pipelined round awaiting settle

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

    def _write_frontier_shards(self, table: pa.Table, out_dir: str,
                               tag: str) -> None:
        """Write a frontier table as one file per (non-empty) shard —
        the on-disk partitioning every round relies on: shard k's task
        reads only ``shard-k-*.parquet`` (whole hosts per shard)."""
        import numpy as np

        os.makedirs(out_dir, exist_ok=True)
        if table.num_rows == 0:
            return
        shards = hash_mod_dict(
            table.column("host"), self.cfg.num_shards,
            stable_hash).to_numpy(zero_copy_only=False)
        for k in sorted(set(shards.tolist())):
            part = table.filter(pa.array(shards == k))
            pq.write_table(part, os.path.join(
                out_dir, f"shard-{k:05d}-{tag}.parquet"))

    def _expand_sitemaps(self, sitemap_urls: list[str],
                         max_depth: int = 4) -> list[str]:
        """Expand sitemap URLs into seed URLs via page-store lookups:
        <url> entries become seeds, <sitemap> index entries recurse
        (bounded depth, seen-set on sitemap urls so index cycles
        terminate).  Order is deterministic — BFS over the listing
        order with in-file order preserved."""
        from torray.ops.policy import parse_sitemap

        seeds: list[str] = []
        seen: set[str] = set()
        frontier = list(sitemap_urls)
        for _ in range(max_depth):
            if not frontier:
                break
            nxt: list[str] = []
            for sm_url in frontier:
                if sm_url in seen:
                    continue
                seen.add(sm_url)
                bucket = bucket_of(host_of(sm_url),
                                   self.cfg.num_buckets)
                body = self.store.lookup(bucket, [sm_url]).get(sm_url)
                if body is None:
                    continue
                for loc, _lastmod, is_index in parse_sitemap(body):
                    if is_index:
                        nxt.append(loc)
                    else:
                        seeds.append(loc)
            frontier = nxt
        return seeds

    def _init_frontier(self) -> None:
        """Round-0 frontier from the seed list (F2 ordering: list order
        defines per-host seq)."""
        import ray

        cfg = self.cfg
        seeds = list(cfg.seeds)
        if cfg.seed_sitemaps:
            seeds.extend(self._expand_sitemaps(cfg.seed_sitemaps))
        by_shard: dict[int, list] = {}
        for url in seeds:
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
        self._write_frontier_shards(
            accepted_table(accepted, 0),
            os.path.join(_round_dir(self.ckpt, 0), "frontier"), "seed")

    def _fetch_extract_fn(self, rnd: int, write_dirs: bool = False):
        """Per-bucket fetch + extract.  With ``write_dirs`` the task also
        writes its scan-results and crawl-log shards itself (file name
        keyed by bucket id -> retries overwrite, idempotent), which
        fuses the whole fetch->extract->explode->offer chain into ONE
        streaming execution instead of materialize+write passes."""
        store = self.store
        cfg = self.cfg
        rdir = _round_dir(self.ckpt, rnd)

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
            out = out.append_column(
                "round", pa.array([rnd] * out.num_rows, pa.int32()))
            if write_dirs:
                log = group.select(["url", "host", "round_entered",
                                    "host_seq"]).append_column(
                    "round", pa.array([rnd] * group.num_rows, pa.int32()))
                pq.write_table(log, os.path.join(
                    rdir, "crawl_log", f"bucket-{bucket}.parquet"))
                pq.write_table(out, os.path.join(
                    rdir, "scan_results", f"bucket-{bucket}.parquet"))
            return out

        return fetch_extract

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

        stop_sentinel = os.path.join(cfg.workdir, "STOP")
        known_in = None  # previous round's frontier_out, saves footer reads
        while not recrawl_done and not bfs_done and rnd < cfg.max_rounds:
            if os.path.exists(stop_sentinel):
                # Graceful shutdown at a round boundary — the analogue
                # of the reference's 'sleep' sentinel file
                # (TorSpider.py:109-114); state is checkpointed, so a
                # later run resumes exactly here.
                self._settle_pending()
                summary = {"rounds": rnd, "recrawl": False,
                           "stopped": True,
                           "seen": sum(ray.get(
                               [s.count.remote() for s in self.shards])),
                           "metrics": self.metrics}
                return summary
            stats = self._run_round(rnd, known_in)
            known_in = stats["frontier_out"]
            self.metrics.append(stats)
            if stats["frontier_out"] == 0:
                rnd += 1
                break
            rnd += 1

        self._settle_pending()
        summary = {"rounds": rnd, "recrawl": recrawl_done}
        if cfg.recrawl and not recrawl_done:
            self._run_recrawl(rnd)
            summary["recrawl"] = True
            summary["rounds"] = rnd + 1
        seen_total = sum(ray.get([s.count.remote() for s in self.shards]))
        summary["seen"] = seen_total
        summary["metrics"] = self.metrics
        return summary

    def _run_round(self, rnd: int, known_in: int | None = None) -> dict:
        cfg = self.cfg
        rdir = _round_dir(self.ckpt, rnd)
        frontier_in = known_in if known_in is not None else _frontier_count(rdir)
        if frontier_in == 0:
            self._settle_pending()
            stats = {"round": rnd, "frontier_in": 0, "selected": 0,
                     "deferred": 0, "results": 0, "accepted": 0,
                     "requeued": 0, "frontier_out": 0, "wall_s": 0.0}
            with open(os.path.join(rdir, "metrics.json"), "w") as f:
                json.dump(stats, f)
            with open(os.path.join(rdir, "_SUCCESS"), "w") as f:
                f.write("")
            return stats

        if frontier_in <= cfg.small_round_threshold:
            # The local path reads this round's frontier (incl. the
            # accepted file) from DISK and offers synchronously —
            # settle the pipelined predecessor first.
            self._settle_pending()
            return self._run_round_local(rnd, frontier_in)
        return self._run_round_sharded(rnd, frontier_in)

    def _run_round_sharded(self, rnd: int, frontier_in: int) -> dict:
        """Distributed round, co-partitioned end to end on ONE key.

        The frontier is already on disk as one file set per seen-shard
        (whole hosts per shard), so the round is a fixed fan-out of one
        plain Ray task per shard (see ``_process_shard_impl`` — the one
        spot raw tasks beat the Dataset API: a bounded side-effecting
        fan-out with no data-plane output): each task reads its shard's
        frontier, runs politeness selection, looks pages up in the
        bucketed store (url row-group pruning), scans them, writes its
        crawl-log / scan-results / deferred-frontier shards itself
        (deterministic names -> retry-idempotent), and pushes link
        candidates straight to the target seen-shard actors.  The
        candidate 'shuffle' is actor mailbox delivery; determinism is
        restored inside ``finalize`` by a full first-wins-key sort, so
        no sort-exchange is needed anywhere.  After the barrier each
        actor finalizes: dedup, robots, per-host sequencing, and writes
        its own accepted-frontier shard file for round k+1.
        """
        import ray

        cfg = self.cfg
        t0 = time.monotonic()
        rdir = _round_dir(self.ckpt, rnd)
        for sub in ("crawl_log", "scan_results"):
            os.makedirs(os.path.join(rdir, sub), exist_ok=True)
        nxt_dir = os.path.join(_round_dir(self.ckpt, rnd + 1), "frontier")
        os.makedirs(nxt_dir, exist_ok=True)

        store = self.store
        shard_actors = self.shards
        num_shards = cfg.num_shards
        num_buckets = store.num_buckets
        budget = cfg.budget
        scan_date, node = cfg.scan_date, cfg.node
        frontier_dir = os.path.join(rdir, "frontier")

        scan_chunk = cfg.scan_chunk
        if scan_chunk is None:
            # Auto: ~2 chunks per core per round keeps every CPU busy
            # without flooding the scheduler; floor bounds the per-task
            # fixed cost on small rounds.
            cpus = int(ray.cluster_resources().get("CPU", 8) or 8)
            scan_chunk = max(512, -(-frontier_in // (2 * cpus)))

        # Pipelined handoff: if the previous round was sharded, its
        # accepted frontier rides in as per-shard object refs (the
        # checkpoint parquet write is still in flight, overlapped
        # with this round's scans).
        accepted_refs = None
        if (self._pending_round is not None
                and self._pending_round["rnd"] == rnd - 1):
            accepted_refs = self._pending_round["accepted_refs"]

        if self._shard_task is None:
            self._shard_task = ray.remote(num_cpus=1)(_process_shard_impl)
        if self._shard_nodes is None:
            # One-time placement probe: which node owns each seen
            # shard (actors are SPREAD across the cluster).  Each
            # round's shard task is then pinned to its actor's node
            # with SOFT NodeAffinity — frontier reads, seen offers
            # and finalize writes stay node-local; only the
            # candidate pushes to OTHER shards cross the wire (the
            # co-partitioned shuffle, irreducible by placement).
            # Soft: a busy/dead node falls back to normal scheduling
            # rather than stalling the round.
            self._shard_nodes = ray.get(
                [s.get_node_id.remote() for s in shard_actors])
        from ray.util.scheduling_strategies import (
            NodeAffinitySchedulingStrategy,
        )
        row_refs = [
            self._shard_task.options(
                scheduling_strategy=NodeAffinitySchedulingStrategy(
                    node_id=self._shard_nodes[k], soft=True)).remote(
                k, rnd, frontier_dir, nxt_dir, rdir, store, shard_actors,
                num_shards, num_buckets, budget, scan_date, node,
                cfg.max_retries, scan_chunk,
                accepted_refs[k] if accepted_refs is not None else None)
            for k in range(num_shards)
        ]
        # Settle the PREVIOUS round now that this round's scans are
        # launched: wait out its overlapped checkpoint writes and
        # stamp its metrics/_SUCCESS — all while the scans run, so
        # the writes cost zero critical-path time.
        self._settle_pending()
        rows = ray.get(row_refs)
        t_scan = time.monotonic() - t0
        n_selected = sum(r["selected"] for r in rows)
        n_deferred = sum(r["deferred"] for r in rows)
        n_results = sum(r["results"] for r in rows)
        n_requeued = sum(r["requeued"] for r in rows)

        delta_dir = os.path.join(rdir, "seen_delta")
        os.makedirs(delta_dir, exist_ok=True)
        # Round boundary, split: finalize_round is the COMPUTE half
        # (deterministic first-wins offer — the next round's true
        # dependency); the accepted tables and checkpoint writes are
        # launched behind it and settled during round rnd+1's scans.
        accepted_counts = ray.get([
            shard_actors[k].finalize_round.remote(rnd + 1, rnd)
            for k in range(num_shards)
        ])
        n_accepted = sum(accepted_counts)
        next_accepted = [a.pending_accepted.remote()
                         for a in shard_actors]
        ckpt_refs = [
            shard_actors[k].checkpoint_round.remote(
                os.path.join(nxt_dir, f"shard-{k:05d}-accepted.parquet"),
                os.path.join(delta_dir, f"shard={k}.parquet"))
            for k in range(num_shards)
        ]

        stats = {
            "round": rnd,
            "frontier_in": frontier_in,
            "selected": n_selected,
            "deferred": n_deferred,
            "results": n_results,
            "accepted": n_accepted,
            "requeued": n_requeued,
            "frontier_out": n_accepted + n_deferred + n_requeued,
            "wall_s": round(time.monotonic() - t0, 3),
            "scan_s": round(t_scan, 3),
            "finalize_s": round(time.monotonic() - t0 - t_scan, 3),
            "scan_chunk": scan_chunk,
            # Aggregate worker-side phase time (sums of parallel work —
            # divide by effective parallelism to relate to wall).
            "t_lookup": round(sum(r["t_lookup"] for r in rows), 3),
            "t_parse": round(sum(r["t_parse"] for r in rows), 3),
            "t_rest": round(sum(r["t_rest"] for r in rows), 3),
            "chunks": sum(r["chunks"] for r in rows),
            # Placement evidence: how many shard tasks landed on
            # their seen-shard actor's node (soft affinity can miss
            # under load; 100% on an idle cluster).
            "placement_hits": sum(
                1 for k, r in enumerate(rows)
                if r.get("node_id") == self._shard_nodes[k]),
            "path": "sharded",
        }
        # Defer this round's metrics/_SUCCESS behind its checkpoint
        # refs; settled while round rnd+1 scans (or at run() exit).
        self._pending_round = {
            "rnd": rnd, "rdir": rdir, "stats": stats,
            "accepted_refs": next_accepted, "ckpt_refs": ckpt_refs}
        return stats

    def _settle_pending(self) -> None:
        """Complete a pipelined round's deferred durability: wait out
        its overlapped checkpoint writes, then stamp metrics.json and
        _SUCCESS.  The marker-implies-durable resume invariant is
        preserved because the marker is written strictly after the
        writes land; a crash before settling simply re-runs the round
        (deterministic, idempotent file names)."""
        p = self._pending_round
        if p is None:
            return
        self._pending_round = None
        import ray

        ray.get(p["ckpt_refs"])
        with open(os.path.join(p["rdir"], "metrics.json"), "w") as f:
            json.dump(p["stats"], f)
        with open(os.path.join(p["rdir"], "_SUCCESS"), "w") as f:
            f.write("")

    def _run_round_local(self, rnd: int, frontier_in: int) -> dict:
        """Driver-local round: identical schedule spec, plain Arrow +
        the same shard actors, zero Ray Data executions.  Early BFS
        rounds are a handful of urls; per-stage distributed scheduling
        cost would dwarf the work (and at 10^10 scale the fat rounds —
        where throughput matters — take the distributed path above)."""
        import ray

        cfg = self.cfg
        t0 = time.monotonic()
        rdir = _round_dir(self.ckpt, rnd)
        files = sorted(glob.glob(os.path.join(rdir, "frontier", "*.parquet")))
        frontier = pa.concat_tables([pq.read_table(f) for f in files])

        # Politeness selection (the one shared implementation).
        selected, deferred = split_budget(frontier, cfg.budget)

        log_dir = os.path.join(rdir, "crawl_log")
        os.makedirs(log_dir, exist_ok=True)
        log = selected.select(["url", "host", "round_entered", "host_seq"])
        log = log.append_column(
            "round", pa.array([rnd] * log.num_rows, pa.int32()))
        pq.write_table(log, os.path.join(log_dir, "part-0.parquet"))

        # Fetch-as-lookup per bucket, then one batched scan.
        urls = selected.column("url").to_pylist()
        sel_hosts = selected.column("host").to_pylist()
        by_bucket: dict[int, list[str]] = {}
        for u, h in zip(urls, sel_hosts):
            by_bucket.setdefault(bucket_of(h, self.store.num_buckets),
                                 []).append(u)
        pages: dict[str, bytes | None] = {}
        for b, bucket_urls in sorted(by_bucket.items()):
            pages.update(self.store.lookup(b, bucket_urls))
        batch = pa.Table.from_arrays(
            [
                selected.column("url"),
                pa.array([pages.get(u) for u in urls], pa.binary()),
                pa.array([u in pages for u in urls], pa.bool_()),
                selected.column("last_hash"),
                selected.column("round_entered"),
                selected.column("host_seq"),
                selected.column("retries"),
            ],
            names=["url", "html", "present", "last_hash",
                   "round_entered", "host_seq", "retries"],
        )
        scan = scan_batch(batch, scan_date=cfg.scan_date, node=cfg.node,
                          carry_cols=_SCAN_CARRY, emit_retry=True)
        requeue = _requeue_table(scan, rnd, cfg.max_retries)
        scan = scan.drop_columns(["retry", "retries", "last_hash"])
        scan = scan.append_column(
            "round", pa.array([rnd] * scan.num_rows, pa.int32()))
        scan_dir = os.path.join(rdir, "scan_results")
        os.makedirs(scan_dir, exist_ok=True)
        pq.write_table(scan, os.path.join(scan_dir, "part-0.parquet"))

        # Candidates -> first-wins -> shard offers (same actors).
        cand = _explode_links(scan, cfg.num_shards)
        by_shard: dict[int, dict[str, tuple]] = {}
        for url, host, path, shard, phost, pround, pseq in zip(
                cand.column("url").to_pylist(),
                cand.column("host").to_pylist(),
                cand.column("path").to_pylist(),
                cand.column("shard").to_pylist(),
                cand.column("parent_host").to_pylist(),
                cand.column("parent_round").to_pylist(),
                cand.column("parent_seq").to_pylist()):
            key = (phost, pround, pseq, url)
            best = by_shard.setdefault(shard, {})
            if url not in best or key < best[url][0]:
                best[url] = (key, host, path)
        offers = []
        for shard_id in sorted(by_shard):
            ordered = sorted(by_shard[shard_id].items(),
                             key=lambda kv: kv[1][0])
            payload = [(u, meta[1], meta[2]) for u, meta in ordered]
            offers.append(self.shards[shard_id].offer.remote(payload, rnd + 1))
        accepted: list[tuple[str, str, int]] = []
        for rows in ray.get(offers):
            accepted.extend(rows)
        n_accepted = len(accepted)
        n_deferred = deferred.num_rows

        nxt = pa.concat_tables([
            deferred.select(FRONTIER_SCHEMA.names),
            requeue,
            accepted_table(accepted, rnd + 1),
        ])
        self._write_frontier_shards(
            nxt, os.path.join(_round_dir(self.ckpt, rnd + 1), "frontier"),
            "local")

        self._write_seen_delta(rnd)

        stats = {
            "round": rnd,
            "frontier_in": frontier_in,
            "selected": int(selected.num_rows),
            "deferred": n_deferred,
            "results": int(scan.num_rows),
            "accepted": n_accepted,
            "requeued": int(requeue.num_rows),
            "frontier_out": n_accepted + n_deferred + requeue.num_rows,
            "wall_s": round(time.monotonic() - t0, 3),
            "path": "local",
        }
        with open(os.path.join(rdir, "metrics.json"), "w") as f:
            json.dump(stats, f)
        with open(os.path.join(rdir, "_SUCCESS"), "w") as f:
            f.write("")
        return stats

    def _run_recrawl(self, rnd: int) -> dict:
        """One full rescan of every (non-suppressed) seen url carrying
        its recorded content hash — the M9 change-detection pass.

        Everything is a Dataset over Parquet: the seen side streams
        from per-shard snapshot files, the hash side streams from the
        rounds' scan-result files with only (url, hash, round) read,
        and latest-hash resolution + the join are Dataset shuffles.
        Nothing global ever lands on the driver."""
        import ray

        cfg = self.cfg
        t0 = time.monotonic()
        rdir = _round_dir(self.ckpt, rnd)

        seen_ds = (self.seen_snapshot_ds()
                   .filter(expr="first_round >= 0")
                   .select_columns(["url"]))

        hash_files = sorted(glob.glob(os.path.join(
            self.ckpt, "round=*", "scan_results", "*.parquet")))
        if hash_files:
            hash_ds = ray.data.read_parquet(
                hash_files, columns=["url", "hash", "round"]).map_batches(
                lambda t: t.filter(pc.field("hash").is_valid()),
                batch_format="pyarrow")

            def latest(group: pa.Table) -> pa.Table:
                # Keep the hash of the greatest round per url (requeue /
                # repeat scans can record several).
                import numpy as np

                rounds = group.column("round").to_numpy(zero_copy_only=False)
                i = int(np.argmax(rounds))
                return group.select(["url", "hash"]).slice(i, 1)

            hash_ds = hash_ds.groupby("url").map_groups(
                latest, batch_format="pyarrow")
            from torray.ops.join import safe_join

            joined = safe_join(seen_ds, hash_ds, "left_outer",
                               cfg.num_shards, on=("url",))
        else:
            joined = seen_ds.map_batches(
                lambda t: t.append_column("hash", pa.nulls(t.num_rows, pa.string())),
                batch_format="pyarrow")

        num_buckets = self.store.num_buckets

        def to_frontier(t: pa.Table) -> pa.Table:
            urls = t.column("url")
            if isinstance(urls, pa.ChunkedArray):
                urls = urls.combine_chunks()
            hosts, _ = hosts_paths_arrays(urls)
            hashes = t.column("hash")
            return pa.Table.from_arrays(
                [
                    urls,
                    hosts,
                    pc.if_else(hashes.is_valid(), hashes,
                               pa.scalar("", pa.string())).combine_chunks(),
                    pa.array([-1] * t.num_rows, pa.int32()),
                    pa.array([-1] * t.num_rows, pa.int64()),
                    hash_mod_dict(hosts, num_buckets, stable_hash),
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

    def _snapshot_files(self) -> list[str]:
        """Have every shard actor write its seen snapshot to Parquet
        (actor-side writes — per-shard state never transits the driver)
        and return the file list."""
        import ray

        snap_dir = os.path.join(self.cfg.workdir, "seen_snapshot")
        os.makedirs(snap_dir, exist_ok=True)
        ray.get([
            s.snapshot_to_parquet.remote(
                os.path.join(snap_dir, f"shard={i}.parquet"))
            for i, s in enumerate(self.shards)
        ])
        return sorted(glob.glob(os.path.join(snap_dir, "shard=*.parquet")))

    def seen_snapshot_ds(self):
        """The global URL-seen snapshot as a streaming Dataset over
        per-shard Parquet files — the scale path every consumer
        (crawl_counts, crawl_seen, recrawl) reads; no shard's state is
        ever assembled whole in any one process."""
        import ray

        files = self._snapshot_files()
        if not files:
            from torray.frontier import SEEN_SNAPSHOT_SCHEMA
            return ray.data.from_arrow(SEEN_SNAPSHOT_SCHEMA.empty_table())
        return ray.data.read_parquet(files)

    def seen_snapshot(self) -> pa.Table:
        """Whole seen snapshot as ONE Arrow table — a test/CLI
        convenience over the same per-shard Parquet files; unbounded at
        crawl scale, use :meth:`seen_snapshot_ds` anywhere real."""
        files = self._snapshot_files()
        if not files:
            from torray.frontier import SEEN_SNAPSHOT_SCHEMA
            return SEEN_SNAPSHOT_SCHEMA.empty_table()
        return pa.concat_tables([pq.read_table(f) for f in files])
