"""Hostile-input sweep: run every `queries()` entry against adversarial
table shapes and report crashes.

Real extracts of the 100 TB corpus are routinely EMPTY (a filter that
matched nothing) or TINY (a single shard's tail), and tiny extracts
violate FK integrity (an orders slice whose customers live in another
shard).  Every operator must degrade to an empty/small result instead
of crashing.  This sweep builds two fixture dirs:

- ``empty``: every table present with its real schema, zero rows
- ``tiny``:  3 rows per table, keys chosen so FKs dangle

and runs the full query surface over both.  Exit code = number of
failures.

Usage::

    python tools/hostile_sweep.py [--only name1,name2] [--dir /tmp/x]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _schemas(src_dir: str) -> dict:
    out = {}
    for t in TABLES:
        out[t] = pq.read_schema(os.path.join(src_dir, f"{t}.parquet"))
    return out


def build_fixtures(src_dir: str, base: str) -> tuple[str, str]:
    """Write the empty and tiny fixture dirs (idempotent)."""
    schemas = _schemas(src_dir)
    empty_dir = os.path.join(base, "sf_hostile_empty")
    tiny_dir = os.path.join(base, "sf_hostile_tiny")
    os.makedirs(empty_dir, exist_ok=True)
    os.makedirs(tiny_dir, exist_ok=True)
    for t, sch in schemas.items():
        pq.write_table(sch.empty_table(),
                       os.path.join(empty_dir, f"{t}.parquet"))
        # 3 rows sliced from the REAL sf table, but from offsets chosen
        # to break FK chains (row i of each table independently), which
        # is exactly what a per-table shard extract looks like.
        full = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        n = full.num_rows
        if n == 0:
            tiny = full
        else:
            step = max(n // 3, 1)
            idx = [min(i * step + (7 * (len(t) + i)) % step, n - 1)
                   for i in range(min(3, n))]
            tiny = full.take(pa.array(sorted(set(idx)), pa.int64()))
        pq.write_table(tiny, os.path.join(tiny_dir, f"{t}.parquet"))
    return empty_dir, tiny_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--dir", default="/tmp")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry

    empty_dir, tiny_dir = build_fixtures(args.src, args.dir)
    qs = entry.queries()
    names = (args.only.split(",") if args.only else sorted(qs))

    total = fails = 0
    failures: list[tuple[str, str]] = []
    for tag, d in (("empty", empty_dir), ("tiny", tiny_dir)):
        for name in names:
            total += 1
            try:
                out = qs[name](d)
                n = out.count() if hasattr(out, "count") else len(out)
                assert n >= 0
            except Exception as e:  # noqa: BLE001 — sweep must continue
                fails += 1
                msg = f"{type(e).__name__}: {str(e)[:140]}"
                failures.append((f"{tag}:{name}", msg))
                print(f"FAIL {tag}:{name} -> {msg}", flush=True)
    print(f"total {total}, fails {fails}")
    for key, msg in failures:
        print(f"  {key}: {msg.splitlines()[0][:160]}")
    ray.shutdown()
    return fails


if __name__ == "__main__":
    raise SystemExit(min(main(), 125))
