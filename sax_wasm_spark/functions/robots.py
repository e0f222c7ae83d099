"""robots.txt evaluation (RFC 9309, from scratch) — the enforcement
half of crawl politeness (q44 audits fetch gaps; this decides what may
be fetched at all).

Parser/evaluator scope, per the RFC:

* groups: consecutive ``User-agent`` lines share the following rules;
  matching is case-insensitive substring-free product-token match with
  ``*`` as the catch-all group; a crawler obeys the MOST SPECIFIC
  matching group only (its own token if present, else ``*``);
* rules: ``Allow`` / ``Disallow`` with percent-decoding left to the
  caller, ``*`` wildcards and ``$`` end-anchor inside paths;
* precedence: the longest-match rule wins; on a length tie Allow wins
  (RFC 9309 §2.2.2); empty ``Disallow:`` means allow-all; no matching
  rule means allowed;
* unknown directives and comments (``#``) are ignored; a missing or
  unparseable robots.txt means allow-all (the RFC's unavailable rule
  for 4xx).

Scale shape: robots bodies are a PER-HOST dim table (tiny next to the
url corpus). ``with_robots_allowed`` joins urls to their host's robots
text (broadcast — millions of hosts ≈ a few GB at most, and the join
key is the url_host salting key the pipeline already uses), then a
vectorized pandas UDF COMPILES each distinct robots body once per
Arrow batch (memoized) and evaluates paths against the compiled rule
list — regex-free matching, no per-row Python reparse.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _match(pattern: str, path: str) -> int:
    """RFC 9309 path match: returns the PATTERN length if ``pattern``
    matches a prefix of ``path`` (with ``*`` wildcards and an optional
    ``$`` end anchor), else -1. Pattern length is the specificity used
    for longest-match precedence."""
    anchored = pattern.endswith("$")
    pat = pattern[:-1] if anchored else pattern
    parts = pat.split("*")
    if not path.startswith(parts[0]):
        return -1
    pos = len(parts[0])
    if len(parts) == 1:
        # no wildcard: plain prefix; '$' demands an exact full match
        if anchored and pos != len(path):
            return -1
        return len(pattern)
    # middle parts: greedy sequential find
    for part in parts[1:-1]:
        idx = path.find(part, pos)
        if idx < 0:
            return -1
        pos = idx + len(part)
    last = parts[-1]
    if anchored:
        # the final literal must sit at the very end, at or after pos
        if not path.endswith(last) or len(path) - len(last) < pos:
            return -1
        return len(pattern)
    if last:
        idx = path.find(last, pos)
        if idx < 0:
            return -1
    return len(pattern)


@lru_cache(maxsize=4096)
def compile_robots(body: str | None, user_agent: str = "*") -> tuple:
    """robots.txt body → tuple of (is_allow, pattern) rules for the most
    specific group matching ``user_agent``. Memoized: a crawl evaluates
    millions of urls against thousands of distinct robots bodies."""
    if not body:
        return ()
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    agents_open = False  # consecutive UA lines accumulate into one group
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not agents_open:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents = []
                cur_rules = []
                agents_open = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            agents_open = False
            if cur_agents:
                cur_rules.append((key == "allow", val))
        else:
            agents_open = False  # crawl-delay/sitemap/etc close the UA run
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    star_rules: list[tuple[bool, str]] | None = None
    best: list[tuple[bool, str]] | None = None
    best_len = -1
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if star_rules is None:
                    star_rules = rules
            elif a and a in ua and len(a) > best_len:
                best = rules
                best_len = len(a)
    chosen = best if best is not None else star_rules
    return tuple(chosen) if chosen else ()


def robots_allowed(rules: tuple, path: str) -> bool:
    """Longest-match evaluation; Allow wins ties; no match → allowed."""
    best_len = -1
    best_allow = True
    for is_allow, pattern in rules:
        if not pattern:
            continue  # empty 'Disallow:'/'Allow:' carries no rule
        m = _match(pattern, path)
        if m < 0:
            continue
        if m > best_len or (m == best_len and is_allow and not best_allow):
            best_len = m
            best_allow = is_allow
    return best_allow if best_len >= 0 else True


@lru_cache(maxsize=4096)
def crawl_delay(body: str | None, user_agent: str = "*") -> float | None:
    """``Crawl-delay`` seconds declared for the most specific group
    matching ``user_agent`` (a de-facto extension most crawlers honor;
    not part of RFC 9309's normative rules). None when absent/invalid —
    callers fall back to their politeness default. Pairs with q44's
    fetch-gap audit: the audit measures actual gaps, this supplies each
    host's declared minimum."""
    if not body:
        return None
    ua = user_agent.lower()
    groups: list[tuple[list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_delay: float | None = None
    agents_open = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not agents_open:
                if cur_agents:
                    groups.append((cur_agents, cur_delay))
                cur_agents = []
                cur_delay = None
                agents_open = True
            cur_agents.append(val.lower())
        else:
            agents_open = False
            if key == "crawl-delay" and cur_agents:
                try:
                    cur_delay = float(val)
                except ValueError:
                    pass
    if cur_agents:
        groups.append((cur_agents, cur_delay))

    star: float | None = None
    best: float | None = None
    best_len = -1
    for agents, delay in groups:
        for a in agents:
            if a == "*":
                if star is None:
                    star = delay
            elif a and a in ua and len(a) > best_len:
                best = delay
                best_len = len(a)
    return best if best_len >= 0 else star


def url_path(col: str | Column) -> Column:
    """Path+query of a url (the robots match target): everything from
    the first '/' after the authority; '/' when absent."""
    rest = F.regexp_replace(col, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
    return F.when(rest == "", F.lit("/")).otherwise(rest)


def with_robots_allowed(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    robots_col: str = "robots_txt",
    user_agent: str = "*",
    out_col: str = "robots_allowed",
) -> DataFrame:
    """urls(…, url) × robots(host, robots_txt) → urls + boolean
    ``out_col``. The robots side is broadcast (per-host dim table);
    evaluation is a vectorized pandas UDF over (robots body, path) with
    per-body compilation memoized."""
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    from .url import url_host  # noqa: PLC0415

    @pandas_udf("boolean")
    def allowed(bodies: pd.Series, paths: pd.Series) -> pd.Series:
        out = []
        for body, path in zip(bodies, paths):
            # left-join misses arrive as None/NaN → allow-all per RFC
            rules = compile_robots(
                body if isinstance(body, str) else None, user_agent
            )
            out.append(robots_allowed(rules, path if path else "/"))
        return pd.Series(out)

    joined = urls.withColumn("_host", url_host(F.col(url_col))).join(
        F.broadcast(robots.withColumnRenamed(host_col, "_host")),
        "_host",
        "left",
    )
    return (
        joined.withColumn(
            out_col, allowed(F.col(robots_col), url_path(F.col(url_col)))
        )
        .drop("_host", robots_col)
    )
