"""Crawl-policy operators: robots.txt parsing and longest-prefix URL
policy filtering.

The reference spider fetches everything the backend hands out (no
robots handling anywhere in /root/reference — Tor onion services
rarely publish robots.txt), but a web-scale corpus pipeline MUST
express fetch policy as data: a bounded rule table applied to an
unbounded URL stream.  Semantics follow RFC 9309's core resolution:
the LONGEST matching rule prefix wins, an allow/disallow tie at equal
length resolves to allow, and a URL matching no rule is allowed.

Scale shape: the rule table is the broadcast small side (``ray.put``
once, fetched once per actor/task, never re-shipped per batch); each
batch runs ONE vectorized ``pc.starts_with`` kernel per rule — cost
O(rules x batch) in C, no Python per row.  Rules are applied in
ascending (prefix length, allow) order so the LAST writer per row is
exactly the RFC winner; the URL stream itself never shuffles.

Relation to the crawl engine: ``torray.frontier.parse_robots`` is the
in-loop variant the round scheduler uses (disallow-only, all agents
folded — the conservative semantics a polite crawler wants when it
can't attribute itself); THIS module is the full RFC resolution for
corpus post-processing (audit an already-crawled URL set against a
policy, or pre-filter a seed list per agent).

:func:`parse_robots` is the pure-function companion: a simplified
robots.txt group parser (User-agent / Allow / Disallow, comments,
case-insensitive keys) emitting the (prefix, allow) rule list for one
agent.  Wildcard patterns (``*``/``$``) are intentionally out of
scope — prefix rules are the 99% case and keep the operator
SQL-oracle-able; a wildcard rule raises so policy is never silently
weaker than the file said.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["parse_robots", "robots_mark", "robots_filter",
           "url_templates", "sitemap_entries", "parse_sitemap"]


def parse_robots(text: str, *, agent: str = "*",
                 base: str = "") -> list[tuple[str, bool]]:
    """Parse (simplified) robots.txt into ``[(prefix, allow), ...]``
    for ``agent``: groups are runs of ``User-agent`` lines followed by
    rule lines; a group applies if it names ``agent`` exactly
    (case-insensitive) or ``*``; specific-agent groups override the
    ``*`` group entirely (RFC 9309 §2.2.1) — including a
    specific-agent group with NO rules, which yields an empty rule
    list (allow all), never the ``*`` group's rules.  ``base`` (e.g.
    ``"http://h.onion"``) is prepended to every rule path so the
    output plugs straight into :func:`robots_filter` over full URLs.
    Empty ``Disallow:`` lines are ignored (historic allow-all idiom);
    ``*``/``$`` wildcards raise ``ValueError``.
    """
    star_rules: list[tuple[str, bool]] = []
    mine_rules: list[tuple[str, bool]] = []
    saw_mine = False
    cur_agents: list[str] = []
    in_group_header = True
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_group_header:
                cur_agents = []
                in_group_header = True
            cur_agents.append(val.lower())
            # Track the match at HEADER time, not when a rule is
            # appended: RFC 9309 §2.2.1 says the most specific
            # matched group applies EXCLUSIVELY, so a specific-agent
            # group with zero rules (or only empty Disallow lines)
            # means allow-all for that agent — the '*' group must
            # NOT leak through in that case.
            if val.lower() == agent.lower():
                saw_mine = True
            continue
        if key not in ("allow", "disallow"):
            continue  # crawl-delay / sitemap / unknown keys
        in_group_header = False
        if not val:
            continue  # "Disallow:" (empty) = allow everything
        if "*" in val or val.endswith("$"):
            raise ValueError(
                f"wildcard robots rule not supported: {val!r}")
        rule = (base + val, key == "allow")
        if agent.lower() in cur_agents:
            mine_rules.append(rule)
            saw_mine = True
        elif "*" in cur_agents:
            star_rules.append(rule)
    return mine_rules if saw_mine else star_rules


def robots_mark(ds, rules, *, url_col: str = "url",
                out_col: str = "allowed",
                default_allow: bool = True):
    """Append boolean ``out_col``: the RFC 9309 verdict of ``rules``
    (an iterable of ``(prefix, allow)``) for each row's ``url_col`` —
    longest matching prefix wins, allow wins length ties, no match =
    ``default_allow``.  Rules are broadcast once via ``ray.put`` and
    sorted once per task; each batch is O(rules) C-kernel passes."""
    import ray

    ordered = sorted(
        ((str(p), bool(a)) for p, a in rules),
        key=lambda r: (len(r[0]), r[1]))
    rules_ref = ray.put(ordered)

    def mark(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.bool_()))
        rs = ray.get(rules_ref)
        urls = t.column(url_col)
        verdict = np.full(t.num_rows, default_allow, dtype=bool)
        for prefix, allow in rs:
            m = pc.fill_null(pc.starts_with(urls, pattern=prefix),
                             False).to_numpy(zero_copy_only=False)
            verdict[m.astype(bool)] = allow
        return t.append_column(out_col, pa.array(verdict, pa.bool_()))

    return ds.map_batches(mark, batch_format="pyarrow")


def robots_filter(ds, rules, *, url_col: str = "url",
                  default_allow: bool = True):
    """Keep only rows whose ``url_col`` the ``rules`` allow (see
    :func:`robots_mark`); output schema equals the input schema."""
    marked = robots_mark(ds, rules, url_col=url_col,
                         out_col="__robots_ok",
                         default_allow=default_allow)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(t.column("__robots_ok")).drop_columns(
            ["__robots_ok"])

    return marked.map_batches(keep, batch_format="pyarrow")


def url_templates(ds, *, url_col: str = "url", k: int = 3):
    """Top-``k`` URL path TEMPLATES per host — every digit run
    collapsed to ``N`` after dropping query/fragment — the
    crawl-budget diagnostic (which page generators dominate a site;
    which templates to throttle or prioritize).  Returns
    ``(host, template, n)``; ties at equal count break to the
    lexicographically smaller template.  Rows whose URL has no
    ``scheme://host`` are dropped.

    Scale shape: template + host derivation is three vectorized RE2
    kernels; each block collapses to DISTINCT (host, template, count)
    partials via Arrow C++ ``group_by`` (raw URLs never shuffle);
    ONE narrow groupby-sum folds partials and the per-host cut uses
    ``ops.rank.group_topk``'s pre-cut combiner."""
    from ray.data.aggregate import Sum

    from torray.ops.rank import group_topk

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"host": pa.array([], pa.string()),
                          "template": pa.array([], pa.string()),
                          "__n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t.column(url_col)
        base = pc.replace_substring_regex(u, pattern=r"[?#].*$",
                                          replacement="")
        tmpl = pc.replace_substring_regex(base, pattern="[0-9]+",
                                          replacement="N")
        m = pc.extract_regex(
            base, pattern=r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]+)")
        host = pc.struct_field(m, "host")
        pairs = pa.table({"host": host, "template": tmpl}).filter(
            pc.is_valid(host))
        if pairs.num_rows == 0:
            return empty
        g = pairs.group_by(["host", "template"]).aggregate(
            [([], "count_all")])
        return pa.table({"host": g.column("host"),
                         "template": g.column("template"),
                         "__n": g.column("count_all").cast(pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["host", "template"]).aggregate(Sum("__n")))
    counts = counts.map_batches(
        lambda t: pa.table({"host": t.column("host"),
                            "template": t.column("template"),
                            "n": t.column("sum(__n)").cast(pa.int64())}),
        batch_format="pyarrow")
    return group_topk(counts, "host", "n", k, "template")


_SM_BLOCK_RE = None
_SM_LOC_RE = None
_SM_MOD_RE = None


def _sm_res():
    global _SM_BLOCK_RE, _SM_LOC_RE, _SM_MOD_RE
    if _SM_BLOCK_RE is None:
        import re as _re
        _SM_BLOCK_RE = _re.compile(
            rb"<(url|sitemap)\b[^>]*>(.*?)</\1\s*>",
            _re.IGNORECASE | _re.DOTALL)
        _SM_LOC_RE = _re.compile(rb"<loc\s*>\s*(.*?)\s*</loc\s*>",
                                 _re.IGNORECASE | _re.DOTALL)
        _SM_MOD_RE = _re.compile(
            rb"<lastmod\s*>\s*(.*?)\s*</lastmod\s*>",
            _re.IGNORECASE | _re.DOTALL)
    return _SM_BLOCK_RE, _SM_LOC_RE, _SM_MOD_RE


def parse_sitemap(xml) -> list[tuple[str, str | None, bool]]:
    """Pure sitemap parser: XML bytes/str -> ordered
    ``[(loc, lastmod|None, is_index), ...]`` — the per-page kernel of
    :func:`sitemap_entries`, importable by the crawl engine for seed
    expansion."""
    if xml is None:
        return []
    if isinstance(xml, str):
        xml = xml.encode("utf-8", "replace")
    block_re, loc_re, mod_re = _sm_res()
    out = []
    for m in block_re.finditer(xml):
        body = m.group(2)
        lm = loc_re.search(body)
        if not lm or not lm.group(1):
            continue
        mm = mod_re.search(body)
        out.append((lm.group(1).decode("utf-8", "replace"),
                    (mm.group(1).decode("utf-8", "replace")
                     if mm and mm.group(1) else None),
                    m.group(1).lower() == b"sitemap"))
    return out


def sitemap_entries(ds, *, url_col: str = "url",
                    xml_col: str = "xml"):
    """Parse sitemap XML pages into seed rows ``(sitemap, loc,
    lastmod, is_index)`` — the standing seed-ingestion source a crawl
    round unions into its frontier.  Handles both ``<urlset>`` entry
    blocks (``<url><loc>..</loc><lastmod>..</lastmod></url>``,
    lastmod optional -> null) and ``<sitemapindex>`` child pointers
    (``<sitemap><loc>..</loc></sitemap>``, ``is_index=true`` so the
    driver loop can fetch-and-expand).  CDATA-free subset of the
    sitemaps.org protocol; compiled-regex scans per batch
    (:func:`parse_sitemap` per page), XML bytes never leave the
    block."""

    def extract(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "sitemap": pa.array([], pa.string()),
                "loc": pa.array([], pa.string()),
                "lastmod": pa.array([], pa.string()),
                "is_index": pa.array([], pa.bool_())})
        sm, loc, mod, isx = [], [], [], []
        for u, x in zip(t.column(url_col).to_pylist(),
                        t.column(xml_col).to_pylist()):
            for lc, md, ix in parse_sitemap(x):
                sm.append(u)
                loc.append(lc)
                mod.append(md)
                isx.append(ix)
        return pa.table({"sitemap": pa.array(sm, pa.string()),
                         "loc": pa.array(loc, pa.string()),
                         "lastmod": pa.array(mod, pa.string()),
                         "is_index": pa.array(isx, pa.bool_())})

    return ds.map_batches(extract, batch_format="pyarrow")
