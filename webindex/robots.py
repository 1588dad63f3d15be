"""robots.txt compliance filtering (RFC 9309) — the crawl-side gate.

A web-scale pipeline must drop pages its crawler was not allowed to
fetch. This module parses robots.txt bodies and filters a URL-keyed
Dataset against them:

- :func:`parse_robots` — RFC 9309 group selection (the most specific
  matching ``User-agent`` group wins; ``*`` is the fallback) and rule
  extraction, supporting the full path-pattern grammar: literal
  prefixes, ``*`` wildcards, and the ``$`` end anchor.
- :func:`match_rules` — longest-match-wins precedence; on a tie,
  ``Allow`` wins (RFC 9309 §2.2.2). No matching rule => allowed.
- :func:`robots_filter` — Dataset-level filter: the robots table
  (domain, robots_txt) parses ONCE on the driver (bounded by the
  domain count, the same cache a crawler holds), broadcasts via
  ``ray.put``, and pages stream through a stateless ``map_batches``
  that resolves each url's domain group. Per batch, urls group by
  domain and each domain's few rules apply vectorized over that
  group's paths (one ``str.startswith``/regex pass per rule, never a
  per-url Python rule loop). Above the broadcast bound, shard the
  robots table by ``hash(domain)`` and attach rules with
  ``relational.hash_join_attach`` instead — the filter kernel is the
  same; only the rule-delivery changes.

Rules are compiled to (is_allow, specificity=len(pattern), matcher)
where matcher is a vectorized prefix test for literal patterns and a
compiled anchored regex for patterns with ``*``/``$`` — both engines
of the same precedence semantics, property-tested against a
rule-by-rule reference in tests/test_robots.py.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa


def _norm_agent(s: str) -> str:
    return s.strip().lower()


def parse_robots(text: str, user_agent: str = "webindex"):
    """robots.txt body -> ordered [(is_allow, pattern)] for the agent.

    RFC 9309 group selection: collect groups keyed by their
    ``User-agent`` lines; pick the group whose agent token is the
    LONGEST prefix of ``user_agent``; fall back to the ``*`` group;
    no group => no rules (everything allowed).
    """
    ua = _norm_agent(user_agent)
    groups: dict[str, list] = {}
    cur_agents: list[str] = []
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not last_was_agent:
                cur_agents = []
            cur_agents.append(_norm_agent(val))
            for a in cur_agents:
                groups.setdefault(a, [])
            last_was_agent = True
        elif key in ("allow", "disallow"):
            last_was_agent = False
            if not cur_agents:
                continue  # rule before any user-agent line: ignored
            if not val and key == "disallow":
                continue  # "Disallow:" (empty) = allow all, no rule
            if not val:
                continue
            for a in cur_agents:
                groups.setdefault(a, []).append(
                    (key == "allow", val)
                )
        else:
            # crawl-delay / sitemap / unknown directives end nothing
            last_was_agent = False

    best = None
    for agent, rules in groups.items():
        if agent != "*" and ua.startswith(agent):
            if best is None or len(agent) > len(best):
                best = agent
    if best is not None:
        return groups[best]
    return groups.get("*", [])


def _compile(pattern: str):
    """(specificity, vectorized matcher over a numpy str array)."""
    spec = len(pattern)
    if "*" not in pattern and not pattern.endswith("$"):
        def match(paths: np.ndarray, p=pattern):
            return np.char.startswith(paths, p)
        return spec, match
    # regex path: escape, '*' -> '.*', trailing '$' stays an anchor
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    rx = "^" + rx + ("$" if anchored else "")
    crx = re.compile(rx)

    def match(paths: np.ndarray, crx=crx):
        return np.fromiter(
            (crx.match(p) is not None for p in paths),
            dtype=bool, count=len(paths),
        )
    return spec, match


def compile_rules(rules):
    """[(is_allow, pattern)] -> matchers sorted most-specific-first,
    allow before disallow within equal specificity (so the FIRST
    matching compiled rule is the RFC 9309 verdict)."""
    compiled = []
    for is_allow, pattern in rules:
        spec, match = _compile(pattern)
        compiled.append((spec, 1 if is_allow else 0, match))
    compiled.sort(key=lambda t: (-t[0], -t[1]))
    return compiled


def match_rules(compiled, paths: np.ndarray) -> np.ndarray:
    """Vectorized verdict for each path: True = allowed."""
    n = len(paths)
    allowed = np.ones(n, dtype=bool)
    undecided = np.ones(n, dtype=bool)
    for _, is_allow, match in compiled:
        if not undecided.any():
            break
        idx = np.nonzero(undecided)[0]
        hit = match(paths[idx])
        if not hit.any():
            continue
        hit_idx = idx[hit]
        allowed[hit_idx] = bool(is_allow)
        undecided[hit_idx] = False
    return allowed


def split_url(url: str):
    p = urlsplit(url)
    path = p.path or "/"
    if p.query:
        path = f"{path}?{p.query}"
    return p.netloc.lower(), path


def robots_filter(pages_ds, robots_ds, *, url_col: str = "url",
                  user_agent: str = "webindex",
                  default_allow: bool = True):
    """Filter pages to urls the agent may crawl.

    ``robots_ds``: Dataset/arrow table of (domain, robots_txt). Parsed
    once, broadcast once (``ray.put``); pages stream through a
    stateless map_batches — no shuffle. Unknown domains follow
    ``default_allow`` (a crawler treats a missing robots.txt as
    allow-all; pass False for a closed-world policy).
    """
    import ray

    if isinstance(robots_ds, pa.Table):
        robots_tab = robots_ds
    else:
        robots_tab = pa.Table.from_pandas(robots_ds.to_pandas())
    rules_by_domain = {
        d.lower(): compile_rules(parse_robots(t or "", user_agent))
        for d, t in zip(
            robots_tab.column("domain").to_pylist(),
            robots_tab.column("robots_txt").to_pylist(),
        )
    }
    ref = ray.put(rules_by_domain)

    def keep(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        urls = batch.column(url_col).to_pylist()
        doms = np.empty(len(urls), dtype=object)
        paths = np.empty(len(urls), dtype=object)
        for i, u in enumerate(urls):
            doms[i], paths[i] = split_url(u)
        allowed = np.full(len(urls), default_allow, dtype=bool)
        # group rows by domain; each domain's rules run vectorized
        order = np.argsort(doms, kind="stable")
        sorted_doms = doms[order]
        cuts = np.nonzero(
            np.concatenate(([True], sorted_doms[1:] != sorted_doms[:-1]))
        )[0]
        for s, e in zip(cuts, np.append(cuts[1:], len(order))):
            dom = sorted_doms[s]
            rules = table.get(dom)
            if rules is None:
                continue
            rows = order[s:e]
            allowed[rows] = match_rules(
                rules, paths[rows].astype(str)
            )
        return batch.filter(pa.array(allowed))

    return pages_ds.map_batches(keep, batch_format="pyarrow")
