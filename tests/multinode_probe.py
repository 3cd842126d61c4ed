"""Simulated multi-node placement probe (run as a SUBPROCESS by
tests/test_multinode.py — it owns its own Ray cluster and must not
share the pytest session's local Ray).

Builds a 3-node virtual cluster (``ray.cluster_utils.Cluster``), runs
the standard 800-page/30-host crawl with every round FORCED onto the
sharded distributed path, and checks the two claims the 100 TB design
rests on:

1. **Placement**: seen-shard actors SPREAD across nodes, and every
   round's shard task lands on its actor's node (soft NodeAffinity —
   ``placement_hits == num_shards`` per sharded round on an idle
   cluster).
2. **Conformance across topologies**: the final URL-seen snapshot is
   bit-identical to the golden snapshot pinned from single-node runs
   (torray/_crawl_golden.py) — scheduling topology must never leak
   into crawl semantics.

Prints ONE json line {"ok": bool, ...evidence...}; exit code 0 iff ok.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    os.environ.pop("RAY_ADDRESS", None)
    import ray
    from ray.cluster_utils import Cluster

    cluster = Cluster()
    cluster.add_node(num_cpus=2)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    cluster.add_node(num_cpus=2)
    cluster.add_node(num_cpus=2)
    cluster.wait_for_nodes()
    n_nodes = len([n for n in ray.nodes() if n["Alive"]])

    import duckdb

    from torray._crawl_golden import CRAWL_SEEN_SQL
    from torray.crawl import CrawlConfig, Crawler
    from torray.synth import SynthWeb, write_synth_web

    work = tempfile.mkdtemp(prefix="torray_multinode_")
    pages_dir = os.path.join(work, "web")
    write_synth_web(pages_dir, 800, 30, seed=42, use_ray=False)
    web = SynthWeb(800, 30, 42)
    cfg = CrawlConfig(
        pages_path=os.path.join(pages_dir, "pages.parquet"),
        workdir=os.path.join(work, "crawl"),
        seeds=web.seeds(3), budget=6, max_rounds=8,
        num_shards=4, num_buckets=8,
        small_round_threshold=0,  # force the sharded path every round
    )
    crawler = Crawler(cfg)
    crawler.run()

    actor_nodes = ray.get(
        [s.get_node_id.remote() for s in crawler.shards])
    sharded = [m for m in crawler.metrics if m.get("path") == "sharded"]
    hits = [m.get("placement_hits") for m in sharded]

    seen = crawler.seen_snapshot_ds().to_pandas()
    cols = sorted(seen.columns)
    seen = seen[cols].sort_values(cols, kind="mergesort").reset_index(
        drop=True)
    golden = duckdb.connect().execute(CRAWL_SEEN_SQL).df()
    golden = golden[cols].sort_values(cols, kind="mergesort").reset_index(
        drop=True)
    seen_match = (len(seen) == len(golden)
                  and all(seen[c].astype(str).equals(golden[c].astype(str))
                          for c in cols))

    out = {
        "nodes": n_nodes,
        "actor_nodes_distinct": len(set(actor_nodes)),
        "sharded_rounds": len(sharded),
        "placement_hits": hits,
        "num_shards": cfg.num_shards,
        "seen_rows": len(seen),
        "seen_matches_golden": bool(seen_match),
    }
    out["ok"] = bool(
        n_nodes == 3
        and out["actor_nodes_distinct"] >= 2
        and len(sharded) > 0
        and all(h == cfg.num_shards for h in hits)
        and seen_match)
    print(json.dumps(out))
    ray.shutdown()
    cluster.shutdown()
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
