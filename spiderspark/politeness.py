"""Per-host politeness token buckets + robots.txt gating (SURVEY.md §2 J3/J9,
M4) — the Spark re-expression of the reference's per-server rate-limit /
thread semantics (BASELINE.json:6).

Token semantics (pinned; tests/oracle_crawler.py implements the identical
arithmetic — deterministic, a pure function of batch_id, never wall-clock):

  avail_b   = min(capacity, tokens_{b-1} + refill_rate)    # refill at round start
  delay_cap = floor(round_seconds / crawl_delay)  if crawl_delay > 0 else ∞
  budget_b  = max(0, min(floor(avail_b), delay_cap))       # URLs host may get
  tokens_b  = avail_b - scheduled_b                         # persisted

Hosts without a host_state row use the default policy (tokens=0,
capacity=refill=default_budget) — so round 1 budget = default_budget.

Robots gating is pure JVM: the per-host rule array rides a broadcast join and
longest-prefix-match runs in Spark higher-order functions (filter/aggregate
over the array) — no Python, no explode-shuffle (SURVEY.md §2.3 J9 chose the
broadcast variant).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .canon import crawl_delay_series, parse_robots_series


@dataclass(frozen=True)
class HostPolicy:
    default_budget: float = 10.0  # capacity AND refill for unknown hosts
    round_seconds: float = 60.0   # politeness-window length of one batch


_RULES_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("allow", T.BooleanType(), False),
            T.StructField("prefix", T.StringType(), False),
        ]
    )
)


@F.pandas_udf(_RULES_TYPE)
def robots_rules_udf(bodies: pd.Series) -> pd.Series:
    # host-granularity (small dim) — off the per-URL hot path by construction
    return parse_robots_series(bodies).map(
        lambda rules: [{"allow": a, "prefix": p} for a, p in rules]
    )


@F.pandas_udf(T.DoubleType())
def crawl_delay_udf(bodies: pd.Series) -> pd.Series:
    return crawl_delay_series(bodies)


def init_host_state(robots: DataFrame, policy: HostPolicy) -> DataFrame:
    """Build host_state from a robots corpus (host, body)."""
    return robots.select(
        F.col("host"),
        F.lit(0.0).alias("tokens"),
        F.lit(policy.default_budget).alias("capacity"),
        F.lit(policy.default_budget).alias("refill_rate"),
        crawl_delay_udf("body").alias("crawl_delay"),
        F.lit(True).alias("robots_fetched"),
        robots_rules_udf("body").alias("robots_rules"),
    )


def join_host_state(frontier: DataFrame, host_state: DataFrame, policy: HostPolicy) -> DataFrame:
    """J3: broadcast the small host dimension onto frontier candidates and
    compute avail/budget columns. host_state is tiny relative to the
    frontier (hosts ≪ URLs), so this never shuffles the big side."""
    hs = host_state.select(
        "host", "tokens", "capacity", "refill_rate", "crawl_delay", "robots_rules"
    )
    joined = frontier.join(F.broadcast(hs), "host", "left")
    avail = F.least(
        F.coalesce(F.col("capacity"), F.lit(policy.default_budget)),
        F.coalesce(F.col("tokens"), F.lit(0.0))
        + F.coalesce(F.col("refill_rate"), F.lit(policy.default_budget)),
    )
    delay_cap = F.when(
        F.coalesce(F.col("crawl_delay"), F.lit(0.0)) > 0,
        F.floor(F.lit(policy.round_seconds) / F.col("crawl_delay")),
    ).otherwise(F.lit(2**62))
    budget = F.greatest(F.least(F.floor(avail), delay_cap), F.lit(0)).cast("long")
    return joined.withColumn("avail", avail).withColumn("host_budget", budget)


# longest-prefix-match over the rule array, entirely in Spark SQL HOFs:
# tie → allow, no match / no rules → allow (mirrors canon.robots_allowed).
_ALLOWED_EXPR = """
coalesce(
  aggregate(
    filter(robots_rules, r -> startswith(_path, r.prefix)),
    named_struct('allow', true, 'len', -1),
    (acc, r) -> IF(length(r.prefix) > acc.len OR (length(r.prefix) = acc.len AND r.allow),
                   named_struct('allow', r.allow, 'len', length(r.prefix)),
                   acc)
  ).allow,
  true)
"""


def robots_gate(candidates: DataFrame) -> DataFrame:
    """P5/J9: drop robots-disallowed URLs. Expects robots_rules column
    (from join_host_state); matches on everything after the origin."""
    with_path = candidates.withColumn(
        "_path",
        F.regexp_replace(F.col("url_norm"), r"^[a-z][a-z0-9+.\-]*://[^/]*", ""),
    )
    return (
        with_path.withColumn("_allowed", F.expr(_ALLOWED_EXPR))
        .filter(F.col("_allowed"))
        .drop("_path", "_allowed")
    )


def insertion_gate(frontier: DataFrame, host_state: DataFrame) -> DataFrame:
    """J9 at frontier-INSERTION time: drop robots-disallowed rows before
    they enter frontier state. Robots is static per crawl, so a disallowed
    URL can never be scheduled — keeping it would leak state (it would be
    re-bloom-filtered, re-anti-joined and re-gated every round, forever).
    Broadcast join on the small host dimension; preserves the input's
    partitioning and order (map-only)."""
    cols = frontier.columns
    hs = host_state.select("host", "robots_rules")
    joined = frontier.join(F.broadcast(hs), "host", "left")
    return robots_gate(joined).select(*cols)


def update_host_state(
    host_state: DataFrame,
    scheduled_counts: DataFrame,  # (host, scheduled:long)
    policy: HostPolicy,
) -> DataFrame:
    """Persist tokens_b = avail_b - scheduled_b; create rows for new hosts.

    Outer-join of two host-sized tables — tiny; broadcast-friendly.
    """
    hs = host_state.alias("hs")
    sc = scheduled_counts.alias("sc")
    joined = hs.join(sc, F.col("hs.host") == F.col("sc.host"), "full_outer")
    host = F.coalesce(F.col("hs.host"), F.col("sc.host"))
    cap = F.coalesce(F.col("hs.capacity"), F.lit(policy.default_budget))
    refill = F.coalesce(F.col("hs.refill_rate"), F.lit(policy.default_budget))
    avail = F.least(cap, F.coalesce(F.col("hs.tokens"), F.lit(0.0)) + refill)
    spent = F.coalesce(F.col("sc.scheduled"), F.lit(0)).cast("double")
    return joined.select(
        host.alias("host"),
        (avail - spent).alias("tokens"),
        cap.alias("capacity"),
        refill.alias("refill_rate"),
        F.coalesce(F.col("hs.crawl_delay"), F.lit(0.0)).alias("crawl_delay"),
        F.coalesce(F.col("hs.robots_fetched"), F.lit(False)).alias("robots_fetched"),
        F.col("hs.robots_rules").alias("robots_rules"),
    )
