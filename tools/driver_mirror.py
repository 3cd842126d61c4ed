"""Local mirror of the driver's correctness gate at ANY sf dir
(the driver runs sf0.01; tests/test_queries.py runs sf0.001): run
every ``queries()`` entry, compare SQL-checked ones against their
``oracle_sql()`` via DuckDB with the driver's canonicalization
(sorted columns, sorted rows, dtype-aligned, float tolerance 1e-9).

Usage::

    python tools/driver_mirror.py [--sf-dir /root/testdata/sf0.01]
        [--only name1,name2] [--skip-rows-only]

Exit code = number of failures.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip-rows-only", action="store_true")
    args = ap.parse_args()

    import duckdb
    import numpy as np
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    q, o = entry.queries(), entry.oracle_sql()
    names = args.only.split(",") if args.only else sorted(q)
    fails = 0
    for name in names:
        try:
            res = q[name](args.sf_dir)
            df = (res.to_pandas()
                  if isinstance(res, ray.data.Dataset) else
                  res.to_pandas() if hasattr(res, "to_pandas") and
                  not isinstance(res, pd.DataFrame) else res)
            if name not in o:
                if args.skip_rows_only:
                    continue
                print(f"ok(rows-only) {name}: {len(df)} rows")
                continue
            odf = con.execute(o[name]).df()
            cols = sorted(df.columns)
            if cols != sorted(odf.columns):
                raise AssertionError(
                    f"columns {cols} vs {sorted(odf.columns)}")
            a = (df[cols].sort_values(by=cols, kind="mergesort")
                 .reset_index(drop=True))
            b = (odf[cols].sort_values(by=cols, kind="mergesort")
                 .reset_index(drop=True))
            if len(a) != len(b):
                raise AssertionError(f"rows {len(a)} vs {len(b)}")
            for c in cols:
                av, bv = a[c], b[c]
                if av.dtype.kind == "f" or bv.dtype.kind == "f":
                    an = av.astype(float).to_numpy()
                    bn = bv.astype(float).to_numpy()
                    both_nan = np.isnan(an) & np.isnan(bn)
                    close = np.isclose(an, bn, rtol=0, atol=1e-9,
                                       equal_nan=False)
                    if not (both_nan | close).all():
                        raise AssertionError(f"float col {c} differs")
                else:
                    if not av.astype(str).equals(bv.astype(str)):
                        raise AssertionError(f"col {c} differs")
            print(f"ok(sql) {name}: {len(a)} rows")
        except Exception:
            fails += 1
            print(f"FAIL {name}")
            traceback.print_exc(limit=3)
    print(f"total {len(names)}, fails {fails}")
    ray.shutdown()
    return fails


if __name__ == "__main__":
    sys.exit(main())
