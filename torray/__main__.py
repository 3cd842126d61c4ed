"""CLI entry: run crawls and scans like the reference daemon.

    python -m torray crawl --pages PAGES.parquet --workdir DIR \
        --seeds seed1 seed2 ... [--budget 8] [--max-rounds 100] \
        [--respect-robots] [--recrawl] [--num-shards 8] [--num-buckets 16]
    python -m torray scan --pages PAGES.parquet --out DIR
    python -m torray synth --out DIR --pages 10000 --hosts 200 [--seed 42]
    python -m torray stats --workdir DIR
    python -m torray query --list
    python -m torray query NAME --sf-dir DIR [--out OUT.parquet] [--limit N]

Environment overrides (TORRAY_BUDGET, TORRAY_MAX_ROUNDS, TORRAY_NODE,
TORRAY_NUM_SHARDS, TORRAY_NUM_BUCKETS, TORRAY_RESPECT_ROBOTS) apply on
top of flags, mirroring the reference's env-beats-config precedence
(``/root/reference/TorSpider.py:450-467``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        # Under `ray job submit` the job runtime exports RAY_ADDRESS
        # pointing at the live cluster: attach to it (a cluster owns
        # its own CPU count — num_cpus only applies to a local
        # single-node session).
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {"address": address, "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus and address == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--num-cpus", type=int, default=None)
    parser = argparse.ArgumentParser(prog="torray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_crawl = sub.add_parser("crawl", parents=[common])
    p_crawl.add_argument("--pages", required=True)
    p_crawl.add_argument("--workdir", required=True)
    p_crawl.add_argument("--seeds", nargs="+", required=True)
    # None = "not given on the CLI": lets the precedence chain
    # (defaults < config file < CLI flags < env) see through to the
    # config file, mirroring the reference's spider.cfg handling.
    p_crawl.add_argument("--config", default=None,
                         help="spider.cfg-style file; written with "
                              "defaults and exits on first run")
    p_crawl.add_argument("--budget", type=int, default=None)
    p_crawl.add_argument("--max-rounds", type=int, default=None)
    p_crawl.add_argument("--max-retries", type=int, default=None)
    p_crawl.add_argument("--scan-date", default=None)
    p_crawl.add_argument("--node", default=None)
    p_crawl.add_argument("--respect-robots", action="store_true")
    p_crawl.add_argument("--recrawl", action="store_true")
    p_crawl.add_argument("--num-shards", type=int, default=None)
    p_crawl.add_argument("--num-buckets", type=int, default=None)

    p_scan = sub.add_parser("scan", parents=[common])
    p_scan.add_argument("--pages", required=True)
    p_scan.add_argument("--out", required=True)
    p_scan.add_argument("--scan-date", default="2026-01-01")
    p_scan.add_argument("--node", default="torray")

    p_synth = sub.add_parser("synth", parents=[common])
    p_synth.add_argument("--out", required=True)
    p_synth.add_argument("--pages", type=int, required=True)
    p_synth.add_argument("--hosts", type=int, required=True)
    p_synth.add_argument("--seed", type=int, default=42)

    p_query = sub.add_parser(
        "query", parents=[common],
        help="run any driver-contract pipeline over a tables dir")
    p_query.add_argument("name", nargs="?", default=None)
    p_query.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_query.add_argument("--out", default=None,
                         help="write the result as parquet here "
                              "instead of printing a preview")
    p_query.add_argument("--limit", type=int, default=20)
    p_query.add_argument("--list", action="store_true",
                         help="list available pipelines")

    p_stats = sub.add_parser("stats", parents=[common])
    p_stats.add_argument("--workdir", required=True)
    p_stats.add_argument("--pages", required=True)
    p_stats.add_argument("--json", action="store_true",
                         help="machine-readable dict instead of the "
                              "formatted report")

    args = parser.parse_args(argv)

    if args.cmd == "crawl" and args.config and not os.path.exists(args.config):
        # First-run bootstrap, before any Ray session: write the default
        # config and exit so the user can edit it (the reference's
        # spider.cfg path, TorSpider.py:423-444).
        from torray.crawl import CrawlConfig

        CrawlConfig.write_default_file(args.config)
        print(f"Default configuration stored in {args.config}.")
        print(f"Please edit {args.config} before running torray again.")
        return 0

    _ray_init(args.num_cpus)

    if args.cmd == "crawl":
        from torray.crawl import CrawlConfig, Crawler

        cfg = CrawlConfig(pages_path=args.pages, workdir=args.workdir,
                          seeds=args.seeds, recrawl=args.recrawl)
        if args.config:
            cfg.apply_file(args.config)
        # CLI flags override the file; env (apply_env) overrides both.
        for attr in ("budget", "max_rounds", "max_retries", "scan_date",
                     "node", "num_shards", "num_buckets"):
            val = getattr(args, attr)
            if val is not None:
                setattr(cfg, attr, val)
        if args.respect_robots:
            cfg.respect_robots = True
        cfg.apply_env()
        crawler = Crawler(cfg)
        summary = crawler.run()
        summary.pop("metrics", None)
        print(json.dumps(summary))
    elif args.cmd == "scan":
        import ray

        from torray.extract import scan_pages_dataset

        out = scan_pages_dataset(
            ray.data.read_parquet(args.pages),
            scan_date=args.scan_date, node=args.node)
        out.write_parquet(args.out)
        print(json.dumps({"rows": out.count(), "out": args.out}))
    elif args.cmd == "synth":
        from torray.synth import write_synth_web

        write_synth_web(args.out, args.pages, args.hosts, seed=args.seed)
        print(json.dumps({"out": args.out, "pages": args.pages,
                          "hosts": args.hosts}))
    elif args.cmd == "query":
        import importlib.util

        import torray as _torray

        root = os.path.dirname(os.path.dirname(
            os.path.abspath(_torray.__file__)))
        spec = importlib.util.spec_from_file_location(
            "__ray_entry__", os.path.join(root, "__ray_entry__.py"))
        entry_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry_mod)
        qs = entry_mod.queries()
        sql = entry_mod.oracle_sql()
        if args.list or not args.name:
            for name in sorted(qs):
                tag = "sql-checked" if name in sql else "rows-only"
                print(f"{name}\t{tag}")
            import ray

            ray.shutdown()
            return 0
        if args.name not in qs:
            print(f"unknown query {args.name!r}; "
                  f"use --list", file=sys.stderr)
            return 2
        res = qs[args.name](args.sf_dir)
        import pandas as pd
        import pyarrow as pa_

        import ray
        import ray.data

        if isinstance(res, ray.data.Dataset):
            if args.out:
                res.write_parquet(args.out)
                print(json.dumps({"rows": res.count(),
                                  "out": args.out}))
            else:
                df = res.limit(args.limit).to_pandas()
                print(df.to_string())
        else:
            tbl = (res if isinstance(res, pa_.Table)
                   else pa_.Table.from_pandas(res))
            if args.out:
                import pyarrow.parquet as pq_

                pq_.write_table(tbl, args.out)
                print(json.dumps({"rows": tbl.num_rows,
                                  "out": args.out}))
            else:
                print(tbl.to_pandas().head(args.limit).to_string())
    elif args.cmd == "stats":
        from torray.crawl import CrawlConfig, Crawler
        from torray.stats import stats_report

        cfg = CrawlConfig(pages_path=args.pages, workdir=args.workdir,
                          seeds=[])
        crawler = Crawler(cfg)
        done = crawler._completed_rounds()
        if done:
            crawler._restore_shards(done[-1])
        text, numbers = stats_report(crawler.scan_results(),
                                     crawler.seen_snapshot_ds())
        if args.json:
            print(json.dumps(numbers))
        else:
            # The reference's report surface (SpiderStats.py:148-170).
            print(text)

    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
