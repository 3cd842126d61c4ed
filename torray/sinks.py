"""Resumable partitioned-Parquet sink.

The output contract for every long job in this engine (the crawl
checkpoints per round/shard the same way — ``torray/crawl.py``): one
DIRECTORY per partition value, one ``_DONE`` marker per partition,
never one giant file.  A re-run lists the markers first and filters
finished partitions out of the INPUT stream — upstream compute for a
finished partition never runs again, which is what makes a 100 TB job
restartable after a mid-run failure for the cost of the remaining
partitions only.

Partition granularity contract: one partition value's rows must fit a
task (the ``groupby().map_groups`` contract used across this repo) —
derive the partition column from input shards or a key-range bucket,
not from a hot raw key.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["write_partitioned", "done_partitions", "compact_parquet",
           "write_sorted_zonemap", "read_zonemap"]

_DONE = "_DONE"


def _part_dir(root: str, col: str, val) -> str:
    return os.path.join(root, f"{col}={val}")


def done_partitions(root: str, partition_col: str) -> set[str]:
    """Partition VALUES (as strings) with a ``_DONE`` marker under
    ``root`` — the resume set."""
    prefix = partition_col + "="
    out = set()
    if not os.path.isdir(root):
        return out
    for name in os.listdir(root):
        if name.startswith(prefix) and os.path.exists(
                os.path.join(root, name, _DONE)):
            out.add(name[len(prefix):])
    return out

def write_partitioned(ds, root: str, partition_col: str, *,
                      skip_done: bool = True,
                      row_group_size: int = 8192) -> dict[str, int]:
    """Write ``ds`` as ``root/<col>=<value>/part.parquet`` + ``_DONE``
    per partition; returns ``{partition_value: rows_written}`` for the
    partitions written THIS run (finished ones are skipped and absent).

    The skip filter runs as a broadcast membership probe inside
    ``map_batches`` BEFORE the partition shuffle, so a resumed run
    neither shuffles nor recomputes finished partitions' rows.  Each
    partition is written inside its ``map_groups`` task (data never
    returns to the driver); the marker lands after a successful write,
    so a task killed mid-write re-runs cleanly next time.
    """
    import ray

    os.makedirs(root, exist_ok=True)
    done = done_partitions(root, partition_col) if skip_done else set()

    if done:
        done_ref = ray.put(done)

        def not_done(t: pa.Table) -> pa.Table:
            d = ray.get(done_ref)
            col = t.column(partition_col)
            mask = pa.array([str(v) not in d for v in col.to_pylist()])
            return t.filter(mask)

        ds = ds.map_batches(not_done, batch_format="pyarrow")

    def write_group(group: pa.Table) -> pa.Table:
        val = str(group.column(partition_col)[0].as_py())
        pdir = _part_dir(root, partition_col, val)
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(group, os.path.join(pdir, "part.parquet"),
                       row_group_size=row_group_size)
        with open(os.path.join(pdir, _DONE), "w") as f:
            f.write(str(group.num_rows))
        return pa.table({
            "partition": pa.array([val], pa.string()),
            "rows": pa.array([group.num_rows], pa.int64())})

    summary = (ds.groupby(partition_col)
               .map_groups(write_group, batch_format="pyarrow"))
    out: dict[str, int] = {}
    for row in summary.take_all():
        out[row["partition"]] = row["rows"]
    return out


def compact_parquet(in_path: str, out_dir: str, *,
                    min_rows_per_file: int = 200_000,
                    max_rows_per_file: int = 400_000,
                    columns=None) -> dict[str, int]:
    """Small-file compaction: rewrite a Parquet dataset (typically the
    many per-shard files a partitioned/resumable job leaves behind)
    into files of ``min_rows_per_file..max_rows_per_file`` rows each.

    Zero shuffle: the read streams blocks and the writer coalesces
    them into target-size files (Ray's ``min_rows_per_file`` /
    ``max_rows_per_file`` contract) — rows never hash-partition, so a
    100 TB compaction moves each byte exactly twice (read + write).
    Row-level content is preserved exactly; global row ORDER is not
    contractual (Parquet datasets are unordered collections).

    Returns ``{"files_before": .., "files_after": .., "rows": ..}``.
    """
    import glob
    import ray

    def _count_files(root: str) -> int:
        if os.path.isfile(root):
            return 1
        return len([p for p in glob.glob(
            os.path.join(root, "**", "*.parquet"), recursive=True)])

    files_before = _count_files(in_path)
    kwargs = {}
    if columns is not None:
        kwargs["columns"] = list(columns)
    ds = ray.data.read_parquet(in_path, **kwargs)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir,
                     min_rows_per_file=min_rows_per_file,
                     max_rows_per_file=max_rows_per_file)
    out = ray.data.read_parquet(out_dir)
    return {"files_before": files_before,
            "files_after": _count_files(out_dir),
            "rows": int(out.count())}


_ZONEMAP = "_zonemap.json"
_ZONEMAP_PQ = "_zonemap.parquet"


def write_sorted_zonemap(ds, out_dir: str, key: str) -> dict:
    """Sort-clustered layout with a file-level zone map: globally
    sort ``ds`` by ``key`` (Ray's native range-partitioned sort —
    the ONE all-to-all this layout ever pays), write one file per
    sorted block, and record each file's exact (min, max) of ``key``
    from its own parquet footer into ``_zonemap.json``.

    This is the storage half of data skipping: after clustering, a
    range predicate touches the few files whose zones overlap instead
    of every footer of a 100 TB dataset — :func:`read_zonemap` does
    the pruning from the ONE small manifest, no per-file round trips.

    Returns the manifest dict ``{"key": key, "zones": [{"file", "lo",
    "hi", "rows"}, ...]}``.
    """
    import glob
    import json

    ds.sort(key).write_parquet(out_dir)
    zones = []
    for path in sorted(glob.glob(os.path.join(out_dir, "*.parquet"))):
        md = pq.read_metadata(path)
        idx = md.schema.names.index(key)
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:  # stats-less file:
                lo = hi = None                    # never prunable
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        zones.append({"file": os.path.basename(path),
                      "lo": lo, "hi": hi, "rows": md.num_rows})
    manifest = {"key": key, "zones": zones}
    with open(os.path.join(out_dir, _ZONEMAP), "w") as f:
        json.dump(manifest, f)
    # Parquet twin of the manifest: the SCALE representation.  At
    # ~10^5-10^6 files the json would be a driver-side fold on every
    # open; read_zonemap switches to a streamed scan over this table
    # above its driver_manifest_limit.
    zt = pa.Table.from_pylist(zones)
    pq.write_table(zt.append_column(
        "key", pa.array([key] * zt.num_rows, pa.string())),
        os.path.join(out_dir, _ZONEMAP_PQ))
    return manifest


def read_zonemap(root: str, lo, hi, *, columns=None,
                 driver_manifest_limit: int = 100_000):
    """Range scan over a :func:`write_sorted_zonemap` layout: prune
    to the files whose [zone lo, zone hi] overlaps [lo, hi] using the
    manifest alone, then read ONLY those files with the residual
    row filter pushed into the fragment scan.  Files without stats
    (``lo is None``) are never pruned.

    Manifest handling is size-gated: up to ``driver_manifest_limit``
    zones the manifest is a driver-side list (one small json read,
    the precise fast path); above it — a 100 TB layout is ~10^5-10^6
    files — the parquet manifest twin is scanned as a DATASET with
    the overlap predicate pushed down, and the pruned zone rows fan
    out to read tasks that open their own files: the file list never
    materializes on the driver.

    Returns ``(dataset, files_read, files_total)`` so callers can
    assert the skipping actually happened."""
    import json

    import ray
    import ray.data
    import pyarrow.dataset as pds

    zpq = os.path.join(root, _ZONEMAP_PQ)
    total = None
    if os.path.exists(zpq):
        total = pq.read_metadata(zpq).num_rows
    if total is not None and total > driver_manifest_limit:
        key = pq.read_table(zpq, columns=["key"]).column(
            "key")[0].as_py()
        overlap = (pds.field("lo").is_null()
                   | ~((pds.field("hi") < lo) | (pds.field("lo") > hi)))
        zones = ray.data.read_parquet(
            zpq, columns=["file"], filter=overlap)
        files_read = zones.count()
        flt = (pds.field(key) >= lo) & (pds.field(key) <= hi)
        if files_read == 0:
            first = pq.read_table(
                zpq, columns=["file"]).column("file")[0].as_py()
            empty = pq.read_schema(
                os.path.join(root, first)).empty_table()
            if columns is not None:
                empty = empty.select(list(columns))
            return ray.data.from_arrow(empty), 0, total

        def read_files(t: pa.Table) -> pa.Table:
            tabs = []
            for name in t.column("file").to_pylist():
                frag = pds.dataset(os.path.join(root, name))
                tabs.append(frag.to_table(
                    filter=flt,
                    columns=list(columns) if columns else None))
            return pa.concat_tables(tabs)

        # one read task per zone-row batch; file names stream from
        # the manifest scan straight into the tasks
        return (zones.map_batches(read_files, batch_format="pyarrow",
                                  batch_size=64),
                files_read, total)

    with open(os.path.join(root, _ZONEMAP)) as f:
        manifest = json.load(f)
    key = manifest["key"]
    keep = [z["file"] for z in manifest["zones"]
            if z["lo"] is None or not (z["hi"] < lo or z["lo"] > hi)]
    total = len(manifest["zones"])
    flt = (pds.field(key) >= lo) & (pds.field(key) <= hi)
    if not keep:
        # empty selection: scan nothing, return a typed empty dataset
        first = os.path.join(root, manifest["zones"][0]["file"])
        empty = pq.read_schema(first).empty_table()
        return ray.data.from_arrow(empty), 0, total
    kwargs = {"filter": flt}
    if columns is not None:
        kwargs["columns"] = list(columns)
    paths = [os.path.join(root, n) for n in keep]
    return ray.data.read_parquet(paths, **kwargs), len(keep), total
