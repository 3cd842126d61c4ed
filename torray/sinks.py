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

__all__ = ["write_partitioned", "done_partitions", "compact_parquet"]

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
