"""Multi-node placement + cross-topology conformance (VERDICT r4 #6).

The whole 100 TB story rests on "the per-round constants are per-node
and shard work stays node-local" — this exercises it on a simulated
3-node cluster.  The probe runs in a SUBPROCESS because it must own
its own Ray cluster (the pytest session holds a single-node local
Ray); see tests/multinode_probe.py for what is asserted.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

def test_multinode_placement_and_conformance():
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    probe = os.path.join(os.path.dirname(__file__),
                         "multinode_probe.py")
    proc = subprocess.run([sys.executable, probe], env=env,
                          capture_output=True, text=True, timeout=570)
    lines = [ln for ln in proc.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert lines, (
        f"probe produced no json; stdout={proc.stdout[-2000:]} "
        f"stderr={proc.stderr[-3000:]}")
    out = json.loads(lines[-1])
    assert out["ok"], out
    # make the individual claims visible in failure output
    assert out["nodes"] == 3
    assert out["actor_nodes_distinct"] >= 2, (
        "SPREAD did not distribute seen-shard actors")
    assert out["sharded_rounds"] > 0
    assert all(h == out["num_shards"] for h in out["placement_hits"]), (
        "a shard task ran off its actor's node on an idle cluster")
    assert out["seen_matches_golden"], (
        "multi-node crawl diverged from the single-node golden seen set")
