"""Frontier state: the sharded URL-seen set (cuckoo filter + exact
set), robots politeness rules, and per-round frontier selection.

This is the engine's only custom distributed state (SURVEY.md §2.3
T3/T4, §7 "hard parts") — everything else is stateless Dataset
transforms.  Design:

- The URL space is sharded by ``stable_hash(host) % num_shards`` so
  ALL candidates for a host land on one shard: per-host dedup,
  robots suppression, and dense per-host sequencing are then purely
  local, serial, and deterministic (the actor mailbox serializes).
- Each shard holds a cuckoo filter for O(1) fast-negative membership
  (the 10^10-scale story: ~2 bytes/key fingerprints vs ~100 bytes/key
  exact) IN FRONT OF an exact set that guarantees zero false-positive
  drops.  With ``seen_spill_threshold`` set the exact layer is
  BOUNDED-MEMORY: it spills to url-sorted Parquet runs at round
  boundaries and confirms rare filter-positives via a cached row-group
  probe (the 10^10-url configuration); by default it is an in-heap
  set.  Either way it is snapshotted per round (FIXTURES.md F5) for
  resume and for the final-seen-set oracle comparison.
- Politeness: each host contributes at most ``budget`` frontier items
  per round, in (round_entered, host_seq, url) order; the remainder
  defers.
  This is the deterministic replacement for the reference backend's
  ``next`` endpoint (``/root/reference/TorSpider.py:120``), per
  BASELINE.json's north_rule.
- robots.txt (north_rule): a host's ``Disallow`` prefixes (User-agent *
  simplification) suppress candidate urls at frontier-entry: they are
  marked seen (never re-considered) but never scheduled.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from torray.pagestore import stable_hash

__all__ = [
    "CuckooFilter",
    "SeenShardState",
    "make_seen_shards",
    "parse_robots",
    "select_step",
    "SEEN_SNAPSHOT_SCHEMA",
    "FRONTIER_SCHEMA",
]

FRONTIER_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("host", pa.string()),
    ("last_hash", pa.string()),
    ("round_entered", pa.int32()),
    ("host_seq", pa.int64()),
    # Requeue counter for retryable (no-fault-status) scans; fresh
    # candidates enter at 0.
    ("retries", pa.int32()),
])

SEEN_SNAPSHOT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("shard", pa.int32()),
    ("first_round", pa.int32()),
    ("first_seq", pa.int64()),
])


class CuckooFilter:
    """Bucketized cuckoo filter (Fan et al., CoNEXT'14 — public
    algorithm): 4-slot buckets, 16-bit fingerprints, partial-key
    cuckoo kicking.  ~2.1 bytes/key at 95% load.  Used as the
    fast-negative membership layer of a seen shard; rebuilt from the
    exact layer if insertion ever fails (never lossy)."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int = 1 << 16):
        size = 1
        while size * self.SLOTS < capacity:
            size <<= 1
        self._num_buckets = size
        self._table = np.zeros((size, self.SLOTS), dtype=np.uint16)

    def _fingerprint(self, h: int) -> int:
        fp = (h >> 40) & 0xFFFF
        return fp if fp != 0 else 1

    def _index(self, h: int) -> int:
        return h & (self._num_buckets - 1)

    def _alt_index(self, idx: int, fp: int) -> int:
        # Partial-key displacement: i2 = i1 xor hash(fp).
        return (idx ^ (fp * 0x5BD1E995)) & (self._num_buckets - 1)

    def add_hash(self, h: int) -> bool:
        fp = self._fingerprint(h)
        idx = self._index(h)
        for i in (idx, self._alt_index(idx, fp)):
            row = self._table[i]
            for s in range(self.SLOTS):
                if row[s] == 0:
                    row[s] = fp
                    return True
        # Kick loop.
        i = idx if (h & 1) else self._alt_index(idx, fp)
        for _ in range(self.MAX_KICKS):
            s = fp % self.SLOTS
            fp, self._table[i][s] = int(self._table[i][s]), fp
            i = self._alt_index(i, fp)
            row = self._table[i]
            for s in range(self.SLOTS):
                if row[s] == 0:
                    row[s] = fp
                    return True
        return False  # full: caller grows + rebuilds

    def may_contain_hash(self, h: int) -> bool:
        fp = self._fingerprint(h)
        idx = self._index(h)
        if fp in self._table[idx]:
            return True
        return fp in self._table[self._alt_index(idx, fp)]

    @property
    def capacity(self) -> int:
        return self._num_buckets * self.SLOTS


def accepted_table(rows: list[tuple[str, str, int]], rnd: int) -> pa.Table:
    """(url, host, host_seq) accepted rows -> FRONTIER_SCHEMA table."""
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.string()),
            pa.array([r[1] for r in rows], pa.string()),
            pa.array([""] * len(rows), pa.string()),
            pa.array([rnd] * len(rows), pa.int32()),
            pa.array([r[2] for r in rows], pa.int64()),
            pa.array([0] * len(rows), pa.int32()),
        ],
        schema=FRONTIER_SCHEMA,
    )


def parse_robots(body: bytes) -> list[str]:
    """Disallow prefixes (all agents folded together; empty prefixes —
    'allow all' per the robots spec — dropped)."""
    prefixes = []
    for line in body.decode("utf-8", "replace").splitlines():
        line = line.split("#", 1)[0].strip()
        if line.lower().startswith("disallow:"):
            prefix = line.split(":", 1)[1].strip()
            if prefix:
                prefixes.append(prefix)
    return prefixes


class _SpillRuns:
    """Sorted on-disk runs of (url, first_round, first_seq) rows — the
    exact seen layer's spill store.  Each run is one url-sorted Parquet
    file with small row groups; the run/row-group url boundaries are
    recorded at write time (never trusted from possibly-truncated
    Parquet string statistics), so a membership probe is: run range
    check -> bisect to ONE row group -> decode (LRU-cached) -> binary
    search.  The cuckoo filter in front keeps the common negative case
    off this path entirely."""

    ROW_GROUP = 512
    CACHE_SLOTS = 16

    def __init__(self, spill_dir: str, shard_id: int):
        import collections
        import glob as _glob
        import os

        self.dir = spill_dir
        self.shard_id = shard_id
        # per run: (path, rg_first_urls, rg_last_urls, num_rows)
        self.runs: list[tuple[str, list[str], list[str], int]] = []
        self._cache: "collections.OrderedDict" = collections.OrderedDict()
        # Runs are process-private working state (durability lives in
        # the round checkpoints): clear any stale files from a previous
        # process so indices never alias.
        for stale in _glob.glob(os.path.join(
                spill_dir, f"shard={shard_id}-run=*.parquet")):
            os.unlink(stale)

    def spill(self, meta: dict[str, tuple[int, int]]) -> None:
        import os

        import pyarrow.parquet as _pq

        urls = sorted(meta)
        if not urls:
            return
        os.makedirs(self.dir, exist_ok=True)
        path = os.path.join(
            self.dir, f"shard={self.shard_id}-run={len(self.runs):04d}.parquet")
        table = pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array([meta[u][0] for u in urls], pa.int32()),
                pa.array([meta[u][1] for u in urls], pa.int64()),
            ],
            names=["url", "first_round", "first_seq"],
        )
        _pq.write_table(table, path, row_group_size=self.ROW_GROUP)
        firsts = [urls[i] for i in range(0, len(urls), self.ROW_GROUP)]
        lasts = [urls[min(i + self.ROW_GROUP, len(urls)) - 1]
                 for i in range(0, len(urls), self.ROW_GROUP)]
        self.runs.append((path, firsts, lasts, len(urls)))

    def _file(self, run_idx: int):
        # ParquetFile handles cached per run: reopening per row-group
        # probe re-parses the footer every time.
        import pyarrow.parquet as _pq

        if not hasattr(self, "_handles"):
            self._handles: dict[int, _pq.ParquetFile] = {}
        pf = self._handles.get(run_idx)
        if pf is None:
            pf = _pq.ParquetFile(self.runs[run_idx][0])
            self._handles[run_idx] = pf
        return pf

    def _row_group(self, run_idx: int, rg: int) -> list[str]:
        key = (run_idx, rg)
        cached = self._cache.get(key)
        if cached is not None:
            self._cache.move_to_end(key)
            return cached
        urls = self._file(run_idx).read_row_group(
            rg, columns=["url"]).column("url").to_pylist()
        self._cache[key] = urls
        if len(self._cache) > self.CACHE_SLOTS:
            self._cache.popitem(last=False)
        return urls

    def contains(self, url: str) -> bool:
        import bisect

        for run_idx in range(len(self.runs) - 1, -1, -1):
            _path, firsts, lasts, _n = self.runs[run_idx]
            if not firsts or url < firsts[0] or url > lasts[-1]:
                continue
            rg = bisect.bisect_right(firsts, url) - 1
            if rg < 0 or url > lasts[rg]:
                continue
            urls = self._row_group(run_idx, rg)
            i = bisect.bisect_left(urls, url)
            if i < len(urls) and urls[i] == url:
                return True
        return False

    def contains_many(self, urls: list[str]) -> set[str]:
        """Batched membership: the subset of ``urls`` present in any
        run.  One sorted pass per run — queries are routed to row
        groups with two searchsorted calls and every needed row group
        is decoded exactly ONCE, instead of a bisect+decode per url
        (random-order per-url probes thrash the row-group cache as
        soon as the spilled set outgrows it — measured 2x crawl
        slowdown at 10^5 urls/shard before this batch path)."""
        import numpy as np

        hits: set[str] = set()
        if not self.runs or not urls:
            return hits
        q_list = sorted(set(urls))
        # Dense regime (spilled set comparable to the probe set — the
        # fat-crawl shape): one whole-run decode + Arrow is_in hash
        # probe per run beats row-group routing (a few large C calls
        # instead of hundreds of small reads).  Sparse regime (runs
        # vastly larger than the probe set — the 10^10-url shape):
        # route to row groups so IO stays proportional to the probe
        # set, not the spilled population.
        if self.num_rows() <= max(64_000, 4 * len(q_list)):
            qa = pa.array(q_list, pa.string())
            mask = np.zeros(len(q_list), bool)
            for run_idx in range(len(self.runs)):
                run_urls = self._file(run_idx).read(
                    columns=["url"]).column("url")
                import pyarrow.compute as _pc

                mask |= _pc.is_in(qa, value_set=run_urls).to_numpy(
                    zero_copy_only=False)
            hits.update(u for u, m in zip(q_list, mask) if m)
            return hits
        # Fixed-width numpy unicode arrays: searchsorted / equality run
        # as C comparisons (object arrays fall back to Python-level
        # compares — ~10x slower at 10^5 probes per round).
        q = np.asarray(q_list)
        for run_idx, (_path, firsts, lasts, _n) in enumerate(self.runs):
            if not firsts:
                continue
            lo = int(np.searchsorted(q, firsts[0], side="left"))
            hi = int(np.searchsorted(q, lasts[-1], side="right"))
            if lo >= hi:
                continue
            sub = q[lo:hi]
            firsts_arr = np.asarray(firsts)
            lasts_arr = np.asarray(lasts)
            rg = np.searchsorted(firsts_arr, sub, side="right") - 1
            valid = rg >= 0
            valid &= sub <= lasts_arr[np.clip(rg, 0, None)]
            for g in np.unique(rg[valid]):
                rows = np.asarray(self._row_group(run_idx, int(g)))
                qs = sub[valid & (rg == g)]
                pos = np.searchsorted(rows, qs, side="left")
                inb = pos < len(rows)
                found = inb & (rows[np.clip(pos, 0, len(rows) - 1)] == qs)
                hits.update(qs[found].tolist())
        return hits

    def num_rows(self) -> int:
        return sum(n for _p, _f, _l, n in self.runs)

    def iter_url_groups(self):
        """Stream spilled urls one row group at a time (bounded memory)
        — the cuckoo-filter rebuild path."""
        import pyarrow.parquet as _pq

        for path, firsts, _lasts, _n in self.runs:
            pf = _pq.ParquetFile(path)
            for rg in range(pf.num_row_groups):
                yield pf.read_row_group(
                    rg, columns=["url"]).column("url").to_pylist()

    def all_rows(self) -> pa.Table | None:
        import pyarrow.parquet as _pq

        if not self.runs:
            return None
        return pa.concat_tables(
            [_pq.read_table(p) for p, _f, _l, _n in self.runs])


class SeenShardState:
    """The state machine of one seen shard.  Kept separate from the Ray
    actor wrapper so the logic is unit-testable in-process; the actor
    below is a thin shell.

    With ``max_inheap``/``spill_dir`` set, the exact layer spills to
    sorted Parquet runs at round boundaries once the in-heap set
    exceeds the cap — the bounded-memory configuration for 10^10-url
    shards.  The cuckoo filter always covers the full url population
    (its ~2 bytes/key IS the in-memory budget at scale)."""

    def __init__(self, shard_id: int, robots: dict[str, list[str]] | None = None,
                 max_inheap: int | None = None,
                 spill_dir: str | None = None):
        self.shard_id = shard_id
        self.robots = robots or {}
        self.seen: set[str] = set()
        self.filter = CuckooFilter(1 << 16)
        # url -> (first_round, first_seq); suppressed urls get (-1, -1).
        self.first_meta: dict[str, tuple[int, int]] = {}
        # Newly-seen urls since the last drain (the per-round incremental
        # snapshot — full-set rewrites per round would not scale).
        self.delta: list[tuple[str, int, int]] = []
        self.max_inheap = max_inheap
        self.spill = (_SpillRuns(spill_dir, shard_id)
                      if max_inheap and spill_dir else None)

    # -- membership -----------------------------------------------------

    def _total_seen(self) -> int:
        return len(self.seen) + (self.spill.num_rows()
                                 if self.spill is not None else 0)

    def _grow_filter(self) -> None:
        """Rebuild the cuckoo filter over the WHOLE seen population —
        heap AND spilled runs.  (Rebuilding from the heap alone would
        silently drop every spilled fingerprint the moment the filter
        saturates, and the resulting false negatives re-accept seen
        urls — a correctness bug this method had until a fat-crawl
        bench caught 30% re-scans.)  Spilled urls stream in one row
        group at a time; on an unlucky rebuild failure the capacity
        doubles and the rebuild restarts."""
        need = self._total_seen()
        cap = self.filter.capacity * 2
        while cap * 0.90 < need:
            cap <<= 1
        while True:
            new = CuckooFilter(cap)
            ok = all(new.add_hash(stable_hash(url)) for url in self.seen)
            if ok and self.spill is not None:
                for group in self.spill.iter_url_groups():
                    if not all(new.add_hash(stable_hash(u))
                               for u in group):
                        ok = False
                        break
            if ok:
                self.filter = new
                return
            cap <<= 1

    def _mark(self, url: str) -> None:
        self.seen.add(url)
        if not self.filter.add_hash(stable_hash(url)):
            self._grow_filter()
        if self._total_seen() > self.filter.capacity * 0.95:
            self._grow_filter()

    def _is_seen(self, url: str) -> bool:
        # Cuckoo fast-negative first; exact set confirms positives.
        if not self.filter.may_contain_hash(stable_hash(url)):
            return False
        if url in self.seen:
            return True
        return self.spill is not None and self.spill.contains(url)

    def _spill_hits(self, urls: list[str]) -> set[str]:
        """Batched spill-layer membership for an upcoming offer pass:
        only cuckoo-positive urls missing from the heap are probed, in
        one sorted sweep (see ``_SpillRuns.contains_many``)."""
        if self.spill is None:
            return set()
        cand = [u for u in urls
                if u not in self.seen
                and self.filter.may_contain_hash(stable_hash(u))]
        return self.spill.contains_many(cand)

    def _disallowed(self, host: str, path: str) -> bool:
        rules = self.robots.get(host)
        if not rules:
            return False
        return any(path.startswith(r) for r in rules)

    # -- protocol -------------------------------------------------------

    def add_seeds(self, items: list[tuple[str, str, int]]) -> list[tuple[str, str, int]]:
        """Seed insertion: items = (url, host, path) in seed order.
        Returns accepted (url, host, host_seq)."""
        out = []
        counters: dict[str, int] = {}
        spill_hits = self._spill_hits([it[0] for it in items])
        for url, host, path in items:
            # Heap + pre-batched spill hits cover membership exactly
            # (the cuckoo negative-reject already ran in _spill_hits).
            if url in self.seen or url in spill_hits:
                continue
            self._mark(url)
            if self._disallowed(host, path):
                self.first_meta[url] = (-1, -1)
                self.delta.append((url, -1, -1))
                continue
            seq = counters.get(host, 0)
            counters[host] = seq + 1
            self.first_meta[url] = (0, seq)
            self.delta.append((url, 0, seq))
            out.append((url, host, seq))
        return out

    def offer(self, rows: list[tuple[str, str, str]], round_entered: int
              ) -> list[tuple[str, str, int]]:
        """Candidate insertion for one round.  ``rows`` = (url, host,
        path) PRE-SORTED by the first-wins key, already deduped per url.
        Returns accepted (url, host, host_seq) — per-host dense seqs in
        arrival order.  Serial per shard => deterministic."""
        out = []
        counters: dict[str, int] = {}
        spill_hits = self._spill_hits([r[0] for r in rows])
        for url, host, path in rows:
            if url in self.seen or url in spill_hits:
                continue
            self._mark(url)
            if self._disallowed(host, path):
                self.first_meta[url] = (-1, -1)
                self.delta.append((url, -1, -1))
                continue
            seq = counters.get(host, 0)
            counters[host] = seq + 1
            self.first_meta[url] = (round_entered, seq)
            self.delta.append((url, round_entered, seq))
            out.append((url, host, seq))
        return out

    # -- buffered-exchange protocol (the shuffle-free candidate path) --

    def buffer(self, rows: list[tuple]) -> int:
        """Buffer candidate rows (url, host, path, key) pushed directly
        by fetch tasks — the candidate 'shuffle' is actor mailbox
        delivery instead of a sort exchange.  Arrival order is
        arbitrary; determinism is restored in :meth:`finalize` by a
        full sort on the first-wins key.  (At 10^10 scale this buffer
        spills per shard; here it is in-heap.)"""
        if not hasattr(self, "_buffer"):
            self._buffer: list[tuple] = []
        self._buffer.extend(rows)
        return len(self._buffer)

    def buffer_table(self, table: pa.Table, round_tag: int = -1) -> int:
        """Arrow-table variant of :meth:`buffer` — columns (url, host,
        path, parent_host, parent_round, parent_seq).  Pushing Arrow
        through the actor mailbox skips per-candidate Python tuple
        pickling (the old hot spot on fat rounds).

        ``round_tag`` labels the SCAN ROUND that discovered these
        candidates.  The pipelined round loop overlaps round k's
        finalize/checkpoint with round k+1's scans, so a k+1 push can
        reach this actor before (or while) round k finalizes — the
        tag keeps each round's candidates in their own bin so
        ``finalize(.., from_round=k)`` can never drain a k+1
        candidate one round early (the ordering contract).  The
        default tag (-1) preserves the untagged legacy behavior:
        drained by any finalize."""
        if not hasattr(self, "_tbl_buffers"):
            self._tbl_buffers: dict[int, list[pa.Table]] = {}
        self._tbl_buffers.setdefault(round_tag, []).append(table)
        return table.num_rows

    def finalize(self, round_entered: int,
                 from_round: int | None = None
                 ) -> list[tuple[str, str, int]]:
        """Sort buffered candidates by first-wins key, dedup per url,
        run the offer protocol, clear the buffers, return accepted
        (url, host, host_seq).  Deterministic regardless of buffer
        arrival order; idempotent against double-buffered duplicates
        (task retries) because first-wins dedup collapses them.
        The sort+dedup is vectorized (lexsort + boundary mask).

        ``from_round`` drains ONLY that scan round's tagged bin (plus
        the untagged legacy bin); ``None`` drains everything — only
        correct when no later round's pushes can be in flight."""
        bins = getattr(self, "_tbl_buffers", {})
        if from_round is None:
            tables = [t for k in sorted(bins) for t in bins[k]]
            self._tbl_buffers = {}
        else:
            tables = bins.pop(-1, []) + bins.pop(from_round, [])
        buffered = getattr(self, "_buffer", [])
        self._buffer = []
        if buffered:
            # Legacy tuple form (url, host, path, (phost, pround, pseq,
            # url)) -> the same columnar shape.
            tables.append(pa.table({
                "url": pa.array([r[0] for r in buffered], pa.string()),
                "host": pa.array([r[1] for r in buffered], pa.string()),
                "path": pa.array([r[2] for r in buffered], pa.string()),
                "parent_host": pa.array([r[3][0] for r in buffered],
                                        pa.string()),
                "parent_round": pa.array([r[3][1] for r in buffered],
                                         pa.int32()),
                "parent_seq": pa.array([r[3][2] for r in buffered],
                                       pa.int64()),
            }))
        if not tables:
            return []
        cols = ["url", "host", "path", "parent_host", "parent_round",
                "parent_seq"]
        cand = pa.concat_tables([t.select(cols) for t in tables],
                                promote_options="permissive")
        urls_py = cand.column("url").to_pylist()
        urls = np.asarray(urls_py)
        phost = np.asarray(cand.column("parent_host").to_pylist())
        pround = cand.column("parent_round").to_numpy(zero_copy_only=False)
        pseq = cand.column("parent_seq").to_numpy(zero_copy_only=False)
        # Group by url with the first-wins key (phost, pround, pseq)
        # ascending inside each group -> boundary mask keeps the winner.
        order = np.lexsort((pseq, pround, phost, urls))
        su = urls[order]
        keep = order[np.r_[True, su[1:] != su[:-1]]]
        # Offer order = first-wins key order across urls.
        k = keep[np.lexsort((urls[keep], pseq[keep], pround[keep],
                             phost[keep]))]
        hosts = cand.column("host").to_pylist()
        paths = cand.column("path").to_pylist()
        payload = [(urls_py[i], hosts[i], paths[i]) for i in k]
        return self.offer(payload, round_entered)

    def drain_delta(self) -> pa.Table:
        """Newly-seen urls since the last drain, as a snapshot-schema
        table; clears the buffer.  Round boundary = the spill point:
        every in-heap url has complete first_meta here, so the whole
        heap can move to a sorted run when over the cap."""
        if (self.spill is not None
                and len(self.seen) > self.max_inheap):
            self.spill.spill({u: self.first_meta[u] for u in self.seen})
            self.seen.clear()
            self.first_meta.clear()
        rows = self.delta
        self.delta = []
        return pa.Table.from_arrays(
            [
                pa.array([r[0] for r in rows], pa.string()),
                pa.array([self.shard_id] * len(rows), pa.int32()),
                pa.array([r[1] for r in rows], pa.int32()),
                pa.array([r[2] for r in rows], pa.int64()),
            ],
            schema=SEEN_SNAPSHOT_SCHEMA,
        )

    def snapshot(self) -> pa.Table:
        urls = sorted(self.seen)
        meta = [self.first_meta.get(u, (-1, -1)) for u in urls]
        heap = pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array([self.shard_id] * len(urls), pa.int32()),
                pa.array([m[0] for m in meta], pa.int32()),
                pa.array([m[1] for m in meta], pa.int64()),
            ],
            schema=SEEN_SNAPSHOT_SCHEMA,
        )
        spilled = self.spill.all_rows() if self.spill is not None else None
        if spilled is None:
            return heap
        spilled = pa.Table.from_arrays(
            [
                spilled.column("url"),
                pa.array([self.shard_id] * spilled.num_rows, pa.int32()),
                spilled.column("first_round"),
                spilled.column("first_seq"),
            ],
            schema=SEEN_SNAPSHOT_SCHEMA,
        )
        return pa.concat_tables([spilled, heap]).sort_by("url")

    def restore(self, table: pa.Table) -> None:
        urls = table.column("url").to_pylist()
        rounds = table.column("first_round").to_pylist()
        seqs = table.column("first_seq").to_pylist()
        for url, rnd, seq in zip(urls, rounds, seqs):
            self._mark(url)
            self.first_meta[url] = (rnd, seq)

    def count(self) -> int:
        n = len(self.seen)
        if self.spill is not None:
            n += self.spill.num_rows()
        return n


def make_seen_shards(num_shards: int, robots: dict[str, list[str]] | None,
                     max_inheap: int | None = None,
                     spill_dir: str | None = None,
                     spread_nodes: bool = True):
    """Spawn the seen-shard actor pool.  Robots rules are pre-split per
    shard so each actor holds only its hosts' rules (at 10^7-host scale
    this split would itself be a Dataset->per-shard write; here it is a
    driver-side dict split).  ``max_inheap``/``spill_dir`` enable the
    bounded-memory exact layer (spill-to-Parquet runs).

    ``spread_nodes`` (default) places the actors with Ray's SPREAD
    strategy so on a multi-node cluster each node owns ~shards/nodes
    of the seen set; the crawl round then pins each shard's scan task
    to its actor's node (soft NodeAffinity — see
    ``Crawler._run_round_sharded``), keeping frontier reads, seen
    offers and finalize writes node-local.  Single-node behavior is
    unchanged (SPREAD on one node is a no-op)."""
    import ray

    robots = robots or {}
    per_shard: list[dict] = [{} for _ in range(num_shards)]
    for host, rules in robots.items():
        per_shard[stable_hash(host) % num_shards][host] = rules

    shard_actor = ray.remote(num_cpus=0)(_SeenShardActor)
    if spread_nodes:
        shard_actor = shard_actor.options(scheduling_strategy="SPREAD")
    return [shard_actor.remote(i, per_shard[i], max_inheap, spill_dir)
            for i in range(num_shards)]


class _SeenShardActor:
    """Thin Ray-actor shell around SeenShardState (num_cpus=0: shards
    are memory-bound bookkeeping, not compute — they must not starve
    the fetch/extract pool of CPU slots)."""

    def __init__(self, shard_id: int, robots: dict[str, list[str]],
                 max_inheap: int | None = None,
                 spill_dir: str | None = None):
        self.state = SeenShardState(shard_id, robots,
                                    max_inheap=max_inheap,
                                    spill_dir=spill_dir)

    def get_node_id(self) -> str:
        """Placement introspection: which node this shard lives on
        (the crawl round pins each shard's scan task here)."""
        import ray
        return ray.get_runtime_context().get_node_id()

    def add_seeds(self, items):
        return self.state.add_seeds(items)

    def offer(self, rows, round_entered):
        return self.state.offer(rows, round_entered)

    def drain_delta(self):
        return self.state.drain_delta()

    def buffer(self, rows):
        return self.state.buffer(rows)

    def buffer_table(self, table, round_tag=-1):
        return self.state.buffer_table(table, round_tag)

    def finalize(self, round_entered, from_round=None):
        return self.state.finalize(round_entered, from_round)

    def finalize_to_parquet(self, round_entered, path, delta_path=None):
        """Finalize and write this shard's accepted frontier file
        directly (no driver transfer); optionally also drains the
        newly-seen delta to ``delta_path`` in the same round-trip.
        Returns the accepted count."""
        import pyarrow.parquet as _pq

        rows = self.state.finalize(round_entered)
        if rows:
            _pq.write_table(accepted_table(rows, round_entered), path)
        if delta_path is not None:
            delta = self.state.drain_delta()
            if delta.num_rows:
                _pq.write_table(delta, delta_path)
        return len(rows)

    # -- pipelined-round protocol (compute / reads / writes split) -----

    def finalize_round(self, round_entered, from_round):
        """COMPUTE half of the round boundary: drain ``from_round``'s
        tagged candidate bin, run the deterministic first-wins offer,
        stash the accepted frontier table + seen delta for
        :meth:`pending_accepted` / :meth:`checkpoint_round`, return
        the accepted count.  No disk I/O — this is the only part of
        the boundary the next round's scans must wait for."""
        rows = self.state.finalize(round_entered, from_round)
        self._pending_accepted = accepted_table(rows, round_entered)
        self._pending_delta = self.state.drain_delta()
        return len(rows)

    def pending_accepted(self):
        """The accepted frontier from the last :meth:`finalize_round`
        — returned as an object-store table so the driver can pass
        the REF straight into the next round's shard task (node-local
        to this actor under the placement pinning) without the
        parquet write/read round trip on the critical path."""
        return self._pending_accepted

    def checkpoint_round(self, path, delta_path):
        """WRITE half of the round boundary (durability only): persist
        the pending accepted frontier + seen delta.  Runs overlapped
        with the next round's scans; the driver settles these refs
        before writing the round's _SUCCESS marker, so the resume
        invariant (marker => all files durable) is unchanged."""
        import pyarrow.parquet as _pq

        if self._pending_accepted.num_rows:
            _pq.write_table(self._pending_accepted, path)
        if delta_path is not None and self._pending_delta.num_rows:
            _pq.write_table(self._pending_delta, delta_path)
        return None

    def snapshot(self):
        return self.state.snapshot()

    def snapshot_to_parquet(self, path):
        """Write this shard's seen snapshot straight to Parquet from the
        actor (no driver transfer — the 10^10-scale snapshot path: the
        global seen set is only ever assembled as a Dataset over these
        per-shard files).  Returns the row count."""
        import pyarrow.parquet as _pq

        table = self.state.snapshot()
        if table.num_rows:
            _pq.write_table(table, path)
        return table.num_rows

    def restore(self, table):
        self.state.restore(table)

    def count(self):
        return self.state.count()


def split_budget(frontier: pa.Table, budget: int) -> tuple[pa.Table, pa.Table]:
    """Politeness selection over a frontier table that contains WHOLE
    hosts (the per-shard invariant): returns (selected, deferred) —
    per host, the first ``budget`` items by (round_entered, host_seq).
    Pure numpy; no Python rows."""
    if frontier.num_rows == 0:
        return frontier, frontier
    hosts = np.asarray(frontier.column("host").to_pylist())
    rounds_e = frontier.column("round_entered").to_numpy(zero_copy_only=False)
    seqs = frontier.column("host_seq").to_numpy(zero_copy_only=False)
    urls = np.asarray(frontier.column("url").to_pylist())
    # url is the final tiebreak: a REQUEUED item keeps its original
    # host_seq and can collide with a fresh item's dense seq in the
    # same (round_entered, host_seq) cell.
    order = np.lexsort((urls, seqs, rounds_e, hosts))
    sorted_hosts = hosts[order]
    starts = np.flatnonzero(np.r_[True, sorted_hosts[1:] != sorted_hosts[:-1]])
    rank = np.arange(len(order)) - np.repeat(
        starts, np.diff(np.r_[starts, len(order)]))
    mask = np.zeros(len(order), dtype=bool)
    mask[order[rank < budget]] = True
    return frontier.filter(pa.array(mask)), frontier.filter(pa.array(~mask))


def select_step(frontier_group: pa.Table, budget: int) -> pa.Table:
    """Politeness selection for ONE host's frontier items: tag the first
    ``budget`` items by (round_entered, host_seq) as selected.  Runs
    inside ``groupby('host').map_groups`` — vectorized, no Python rows.
    """
    rounds = frontier_group.column("round_entered").to_numpy(zero_copy_only=False)
    seqs = frontier_group.column("host_seq").to_numpy(zero_copy_only=False)
    urls = np.asarray(frontier_group.column("url").to_pylist())
    order = np.lexsort((urls, seqs, rounds))
    selected = np.zeros(len(order), dtype=bool)
    selected[order[:budget]] = True
    return frontier_group.append_column("selected", pa.array(selected))
