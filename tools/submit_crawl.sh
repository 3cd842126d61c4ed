#!/usr/bin/env bash
# Submit the flagship crawl to a running Ray cluster as a Ray Job —
# the north-rule deployment path (`ray job submit` on fixed N-node /
# 4N-node clusters).  The CLI attaches to the cluster via the
# RAY_ADDRESS the job runtime exports (torray/__main__.py:_ray_init);
# nothing in the job re-inits or resizes the cluster.
#
# Usage:
#   RAY_DASHBOARD=http://<head>:8265 \
#   tools/submit_crawl.sh PAGES.parquet WORKDIR seed1 [seed2 ...]
#
# In this sandbox there is no multi-node cluster; the N -> 4N scaling
# criterion is evidenced by `python bench.py --scaling` (identical job
# + input at num_cpus=8 and num_cpus=32 in fresh processes — see
# BASELINE.md "Sandbox evidence protocol").
set -euo pipefail

PAGES=${1:?pages parquet}
WORKDIR=${2:?workdir}
shift 2

exec ray job submit \
  --address "${RAY_DASHBOARD:-http://127.0.0.1:8265}" \
  --working-dir "$(cd "$(dirname "$0")/.." && pwd)" \
  -- python -m torray crawl \
  --pages "$PAGES" --workdir "$WORKDIR" --seeds "$@"
