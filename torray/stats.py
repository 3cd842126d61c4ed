"""Crawl analytics — the SpiderStats surface re-expressed over the
engine's scan-result / seen-set outputs (SURVEY.md §2.5 A1-A6,
reference ``/root/reference/SpiderStats.py:22-146``).

The reference issues filtered COUNT queries against backend tables
(``urls onions pages forms links``); here the same numbers fall out of
Dataset aggregations over the crawl's Parquet outputs.  Per-host fold
semantics follow the backend's documented rule (``TODO.md``: online
=> tries reset, offline => tries += 1).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["crawl_counts", "domain_status", "link_graph", "count_where",
           "change_rates",
           "stats_report"]


def count_where(ds, column: str, op: str, value=None, *,
                other_ds=None, other_col: str | None = None,
                num_partitions: int = 8) -> int:
    """Filtered count with the reference's little filter DSL
    (``count_field``'s ``eq`` / ``ne`` / ``has`` operators,
    ``/root/reference/SpiderStats.py:22-43``): ``eq``/``ne`` compare a
    column to a value; ``has`` with no second Dataset counts non-null
    rows, and with ``other_ds``/``other_col`` counts rows whose key
    EXISTS in the other table — the cross-table relationship filter
    (``urls`` ⋉ ``domains`` via ``has domain_info``,
    ``SpiderStats.py:117-143``), expressed as a distinct-reduce of the
    right side followed by one hash-partitioned inner join; only key
    columns shuffle.  Streams throughout, no materialization."""
    import pyarrow.dataset  # noqa: F401  (pc import at module top)

    if op == "eq":
        expr = f"{column} == {value!r}"
    elif op == "ne":
        expr = f"{column} != {value!r}"
    elif op == "has":
        if other_ds is None:
            return ds.map_batches(
                lambda t: pa.table({"n": pa.array(
                    [int(pc.sum(t.column(column).is_valid().cast(
                        pa.int64())).as_py() or 0)], pa.int64())}),
                batch_format="pyarrow").sum("n")
        key = other_col or column
        distinct = (other_ds.select_columns([key])
                    .groupby(key).count()
                    .map_batches(
                        lambda t: pa.table({column: t.column(key)}),
                        batch_format="pyarrow"))
        left = ds.select_columns([column]).map_batches(
            lambda t: t.filter(t.column(column).is_valid()),
            batch_format="pyarrow")
        from torray.ops.join import safe_join

        return safe_join(left, distinct, "inner", num_partitions,
                         on=(column,)).count()
    else:
        raise ValueError(f"unknown op {op!r} (eq|ne|has)")
    return ds.filter(expr=expr).count()


def crawl_counts(scan_ds, seen_ds) -> dict:
    """The eight SpiderStats numbers (reference SpiderStats.py:67-146):
    total / scanned urls + coverage ratio, domain totals, page / form /
    link totals.  ``seen_ds`` is the seen-snapshot DATASET
    (``Crawler.seen_snapshot_ds``) — counted as a streaming aggregate,
    never assembled whole."""
    import ray.data

    url_count = seen_ds.count()
    scanned = scan_ds.count()

    def partial(batch: pa.Table) -> pa.Table:
        # Most pages have zero forms: decode JSON only for the rows
        # whose canonical form string is non-trivial.
        fd = batch.column("form_dicts")
        forms = fd.filter(pc.and_kleene(
            fd.is_valid(), pc.not_equal(fd, "[]"))).to_pylist()
        links = pc.list_value_length(batch.column("new_urls"))
        return pa.table({
            "pages": pa.array([int(pc.sum(
                batch.column("hash").is_valid().cast(pa.int64())
            ).as_py() or 0)], pa.int64()),
            "forms": pa.array(
                [sum(len(json.loads(f)) for f in forms)], pa.int64()),
            "links": pa.array([int(pc.sum(links).as_py() or 0)], pa.int64()),
            "online": pa.array([int(pc.sum(
                batch.column("online").cast(pa.int64())).as_py() or 0)],
                pa.int64()),
        })

    partials = scan_ds.map_batches(partial, batch_format="pyarrow")
    totals = partials.sum(["pages", "forms", "links", "online"])
    return {
        "url_count": url_count,
        "url_count_scanned": scanned,
        "scan_coverage": (scanned / url_count) if url_count else 0.0,
        "page_count": totals["sum(pages)"],
        "form_count": totals["sum(forms)"],
        "link_count": totals["sum(links)"],
        "online_scans": totals["sum(online)"],
    }


def stats_report(scan_ds, seen_ds) -> tuple[str, dict]:
    """The formatted SpiderStats report (reference
    ``/root/reference/SpiderStats.py:148-170``): the prose block plus
    the table totals, computed from the engine's outputs.

    Field mapping (backend table -> engine surface): urls counts come
    from :func:`crawl_counts`; "active onions" = hosts whose
    :func:`domain_status` fold ends online; "onions pending an initial
    scan" = hosts discovered in the seen set but never scanned.  All
    inputs stream (two Dataset aggregations over narrow host columns);
    returns ``(report_text, numbers_dict)``."""
    from torray.urlnorm import hosts_paths_arrays

    counts = crawl_counts(scan_ds, seen_ds)
    doms = domain_status(scan_ds).select_columns(["host", "online"])

    def fold(t: pa.Table) -> pa.Table:
        return pa.table({
            "onions": pa.array([t.num_rows], pa.int64()),
            "active": pa.array([int(pc.sum(
                t.column("online").cast(pa.int64())).as_py() or 0)],
                pa.int64()),
        })

    dsum = doms.map_batches(fold, batch_format="pyarrow").sum(
        ["onions", "active"])
    scanned_onions = dsum["sum(onions)"]
    active_onions = dsum["sum(active)"]

    def seen_hosts(t: pa.Table) -> pa.Table:
        hosts, _ = hosts_paths_arrays(t.column("url"))
        return pa.table({"host": hosts})

    total_onions = (seen_ds.select_columns(["url"])
                    .map_batches(seen_hosts, batch_format="pyarrow")
                    .groupby("host").count().count())
    remaining_onions = max(0, total_onions - scanned_onions)

    numbers = dict(
        counts,
        onion_count=active_onions,
        total_onions=total_onions,
        remaining_onions=remaining_onions,
    )
    messages = [
        "So far, torray has scanned {:,} ({:.2%}) of the {:,} urls it has",
        "discovered. Of the scanned urls, it found {:,} live scans on"
        " {:,} active onions.  ",
        "There are {:,} onions that are pending an initial scan.\n",
        "Table Stats:\n",
        "Total Onions: {:,}\n",
        "Total Urls: {:,}\n",
        "Total Urls (scanned): {:,}\n",
        "Total Pages: {:,}\n",
        "Total Forms: {:,}\n",
        "Total Links: {:,}",
    ]
    body = " ".join(messages).format(
        numbers["url_count_scanned"], numbers["scan_coverage"],
        numbers["url_count"], numbers["online_scans"], active_onions,
        remaining_onions, total_onions, numbers["url_count"],
        numbers["url_count_scanned"], numbers["page_count"],
        numbers["form_count"], numbers["link_count"])
    text = "–" * 70 + "\nResults:\n" + body
    return text, numbers


def domain_status(scan_ds, num_partitions: int = 64):
    """Per-host status fold (A5, backend-implied semantics): replaying
    scans in round order per host — online resets ``tries``, offline
    increments; ``offline_scans`` counts total offline results;
    ``last_online`` is the last round with an online scan (-1 never).

    Partition RUN-SCAN shape (no Python call per host): hosts hash
    into ``num_partitions`` coarse partitions, ONE groupby on the
    partition id, then one lexsort + segmented numpy fold over every
    host run in the partition — a ``groupby(host).map_groups`` costs
    one interpreter call per host, the measured singleton-group
    pathology at web-host cardinality.  The replay itself needs no
    loop: after the LAST online scan every remaining scan is offline
    by definition, so ``tries`` is just the run length past that
    position (:func:`torray.ops.window._segmented_last_index`)."""
    import numpy as np

    from torray.ops.dedup import fnv1a64_strings
    from torray.ops.window import (_segmented_cumsum,
                                   _segmented_last_index)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__part",
                                       pa.array([], pa.int64()))
        h = fnv1a64_strings(batch.column("host"))
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("__part", pa.array(part, pa.int64()))

    def fold_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "host": pa.array([], pa.string()),
            "online": pa.array([], pa.bool_()),
            "tries": pa.array([], pa.int64()),
            "offline_scans": pa.array([], pa.int64()),
            "last_online_round": pa.array([], pa.int32()),
            "scans": pa.array([], pa.int64()),
        })
        if group.num_rows == 0:
            return empty
        hosts = np.asarray(group.column("host").to_pylist())
        rounds = group.column("round").to_numpy(zero_copy_only=False)
        online = group.column("online").to_numpy(zero_copy_only=False)
        # Replay order is pinned by the full schedule key — (round,
        # round_entered, host_seq, url) — not arrival order, so the
        # fold is invariant to shard/bucket layout even when a host
        # has both online and offline scans in one round.
        res = group.column("round_entered").to_numpy(zero_copy_only=False)
        seqs = group.column("host_seq").to_numpy(zero_copy_only=False)
        urls = np.asarray(group.column("url").to_pylist())
        order = np.lexsort((urls, seqs, res, rounds, hosts))
        hs, rs, ons = hosts[order], rounds[order], online[order]
        new_run = np.concatenate(([True], hs[1:] != hs[:-1]))
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(hs)))
        ends = starts + lens - 1
        run_id = np.cumsum(new_run) - 1
        last_on = _segmented_last_index(ons.astype(bool), run_id)[ends]
        # tries = scans after the last online one (whole run if never
        # online); offline_scans = total offline in the run.
        tries = np.where(last_on >= 0, ends - last_on, lens)
        offline = _segmented_cumsum((~ons.astype(bool)).astype(
            np.int64), starts)[ends]
        last_round = np.where(last_on >= 0,
                              rs[np.clip(last_on, 0, None)], -1)
        return pa.table({
            "host": pa.array(hs[starts], pa.string()),
            "online": pa.array((tries == 0) & (last_on >= 0)),
            "tries": pa.array(tries, pa.int64()),
            "offline_scans": pa.array(offline, pa.int64()),
            "last_online_round": pa.array(last_round.astype(np.int32),
                                          pa.int32()),
            "scans": pa.array(lens, pa.int64()),
        })

    return (scan_ds.select_columns(
        ["host", "round", "online", "round_entered", "host_seq", "url"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(fold_partition, batch_format="pyarrow"))


def link_graph(scan_ds):
    """Host-level link-graph edges with counts (A6): explode new_urls,
    one groupby((src,dst)) shuffle over narrow host pairs."""
    from torray.urlnorm import hosts_paths_arrays

    def edges(batch: pa.Table) -> pa.Table:
        import numpy as np

        links = batch.column("new_urls")
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        lengths = pc.list_value_length(links).to_numpy(zero_copy_only=False)
        lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
        flat = links.flatten()
        src = np.repeat(
            batch.column("host").to_numpy(zero_copy_only=False), lengths)
        dst, _ = hosts_paths_arrays(flat)
        return pa.table({
            "src_host": pa.array(src.tolist(), pa.string()),
            "dst_host": dst,
        })

    return (
        scan_ds.select_columns(["host", "new_urls"])
        .map_batches(edges, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])
        .count()
        .map_batches(
            lambda t: pa.table({
                "src_host": t.column("src_host"),
                "dst_host": t.column("dst_host"),
                "n_links": t.column("count()"),
            }),
            batch_format="pyarrow",
        )
    )


def change_rates(obs_ds, *, url_col: str = "url", ts_col: str = "ts",
                 hash_col: str = "hash", num_partitions: int = 64):
    """Per-URL change statistics from a scan-observation history
    ``(url, ts, hash)`` -> ``(url, n_scans, n_changes, first_ts,
    last_ts)`` — ``n_changes`` counts observations whose hash differs
    from the PREVIOUS observation of the same url in ts order (the
    reference's per-fetch hash comparison, TorSpider.py:293-299,
    folded over history).  This is the recrawl-scheduling input: rank
    urls by change frequency, spend the politeness budget on the
    volatile ones.

    Shape: the standard hashed-partition run-scan (url-hash -> coarse
    partition; ONE lexsort per partition; transitions vectorized with
    a shifted comparison) — no Python per url; ties at equal ts break
    by hash so the count is partition- and order-invariant."""
    import numpy as np

    from torray.ops.window import _hash_col_np

    cols = [url_col, ts_col, hash_col]

    def tag(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        if t.num_rows == 0:
            return t.append_column("__part", pa.array([], pa.int64()))
        u = t.column(url_col).to_numpy(zero_copy_only=False)
        part = (_hash_col_np(u)
                % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "url": pa.array([], pa.string()),
                "n_scans": pa.array([], pa.int64()),
                "n_changes": pa.array([], pa.int64()),
                "first_ts": pa.array([], pa.int64()),
                "last_ts": pa.array([], pa.int64())})
        u = group.column(url_col).to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        h = group.column(hash_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((h, ts, u))
        u, ts, h = u[order], ts[order], h[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], u[1:] != u[:-1])))
        lens = np.diff(np.append(starts, len(u)))
        diff = np.concatenate(([False], h[1:] != h[:-1]))
        diff[starts] = False  # a url's first scan is not a change
        changes = np.add.reduceat(
            diff.astype(np.int64), starts) if len(starts) else \
            np.array([], np.int64)
        ends = np.append(starts[1:], len(u)) - 1
        return pa.table({
            "url": pa.array(u[starts], pa.string()),
            "n_scans": pa.array(lens, pa.int64()),
            "n_changes": pa.array(changes, pa.int64()),
            "first_ts": pa.array(ts[starts], pa.int64()),
            "last_ts": pa.array(ts[ends], pa.int64())})

    return (obs_ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))
