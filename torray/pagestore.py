"""Host-hash-bucketed page index: fetch-as-lookup without re-shuffling
the page table every round.

The pages table is the 100 TB side of the crawl; the frontier is the
narrow side.  Joining them per round with a hash join would re-shuffle
the wide side every round.  Instead the table is bucketed ONCE by
``bucket = stable_hash(host) % num_buckets`` (a single partitioned
write), after which every round's fetch is: route frontier items to
their bucket (narrow shuffle), then each bucket task reads ONLY its
bucket's Parquet with an ``url IN (...)`` filter — row-group pruning
applies because each bucket is written sorted by url.  ``html`` bytes
never enter the object store: the fetch task immediately runs the
extract stage and emits narrow scan results (SURVEY.md §4 "wide binary
rows").

A host's pages and its frontier items land in the same bucket, so the
politeness partitioning and the fetch partitioning share one key
(SURVEY.md §7 "shuffles and their keys").
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from torray.urlnorm import host_of

__all__ = ["stable_hash", "bucket_of", "PageStore"]

# Per-process dataset-handle cache (path -> pads.Dataset): workers are
# reused across crawl rounds, file metadata is immutable once built.
_DATASET_CACHE: dict[str, "pads.Dataset"] = {}


def stable_hash(text: str) -> int:
    """Process-stable 64-bit hash (Python's builtin hash() is salted per
    process, which would break cross-run determinism)."""
    return int.from_bytes(hashlib.sha1(text.encode()).digest()[:8], "big")


def bucket_of(host: str, num_buckets: int) -> int:
    return stable_hash(host) % num_buckets


class PageStore:
    """A bucketed, url-sorted Parquet copy of the pages table."""

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, "_torray_meta.json")) as f:
            meta = json.load(f)
        self.num_buckets = meta["num_buckets"]

    @staticmethod
    def build(pages_path: str, root: str, num_buckets: int) -> "PageStore":
        """One-time bucketing pass (Ray Data): read -> derive bucket ->
        ONE hash shuffle on bucket -> each bucket written as a single
        url-sorted file with small row groups.

        Consolidation matters for the lookup path: a bucket scattered
        over dozens of per-block files costs a dataset-discovery +
        per-file metadata parse on EVERY round's lookup (measured ~8x
        slower than one sorted file), while url-sorted 1k-row groups
        give the ``isin`` filter real min/max pruning.  A bucket-hash
        shuffle is also cheaper than the global url sort it replaces."""
        import ray

        os.makedirs(root, exist_ok=True)

        def add_bucket(batch: pa.Table) -> pa.Table:
            # Vectorized host extraction (RE2 kernel) + one sha1 per
            # DISTINCT host — the same kernels the per-round crawl path
            # uses; the one-time pass over the 100 TB side deserves the
            # same treatment (a per-url Python loop here was measured
            # as the dominant build cost at fat-XL scale).
            from torray.urlnorm import hash_mod_dict, hosts_paths_arrays

            hosts, _ = hosts_paths_arrays(batch.column("url"))
            buckets = hash_mod_dict(hosts, num_buckets, stable_hash)
            return batch.append_column("bucket", buckets)

        def write_bucket(group: pa.Table) -> pa.Table:
            b = group.column("bucket")[0].as_py()
            bdir = os.path.join(root, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            tbl = group.drop_columns(["bucket"]).sort_by("url")
            pq.write_table(tbl, os.path.join(bdir, "part-0.parquet"),
                           row_group_size=1024)
            return pa.table({"bucket": pa.array([b], pa.int32()),
                             "rows": pa.array([group.num_rows], pa.int64())})

        (
            ray.data.read_parquet(pages_path)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(write_bucket, batch_format="pyarrow")
            .count()
        )
        with open(os.path.join(root, "_torray_meta.json"), "w") as f:
            json.dump({"num_buckets": num_buckets, "source": pages_path}, f)
        return PageStore(root)

    def bucket_dir(self, bucket: int) -> str:
        return os.path.join(self.root, f"bucket={bucket}")

    def lookup(self, bucket: int, urls: list[str]) -> dict[str, bytes | None]:
        """url -> html for the requested urls present in this bucket
        (absent urls simply missing from the dict = offline)."""
        path = self.bucket_dir(bucket)
        if not os.path.isdir(path):
            return {}
        dataset = _DATASET_CACHE.get(path)
        if dataset is None:
            # Worker processes persist across rounds; caching the
            # dataset handle amortizes file discovery + footer parsing
            # over the crawl instead of paying it per lookup.
            dataset = pads.dataset(path, format="parquet")
            _DATASET_CACHE[path] = dataset
        table = dataset.to_table(
            columns=["url", "html"],
            filter=pc.field("url").isin(urls),
        )
        return dict(zip(table.column("url").to_pylist(),
                        table.column("html").to_pylist()))

    def robots_bodies(self) -> dict[str, bytes]:
        """host -> robots.txt body, scanning only the url column (plus
        matching html) of each bucket."""
        out: dict[str, bytes] = {}
        dataset = pads.dataset(self.root, format="parquet",
                               partitioning="hive")
        table = dataset.to_table(
            columns=["url", "html"],
            filter=pc.ends_with(pc.field("url"), "/robots.txt"),
        )
        for url, html in zip(table.column("url").to_pylist(),
                             table.column("html").to_pylist()):
            if html is not None:
                out[host_of(url)] = html
        return out
