"""Single-threaded pure-python crawl oracle (SURVEY.md §5.1).

Obviously-correct dictionary-and-list implementation of the pinned crawl
semantics. The Spark engine must reproduce, for the same seeds + pages +
robots + politeness budget:

- the exact per-round schedule order: (priority, depth, discovered_batch,
  url_hash) ascending, ranks 1..n (BASELINE.json:14 "crawl ordering");
- the exact final URL-seen set (as a sorted-hash digest);
- byte-identical extracted text per url (BASELINE.json:6,15).

It shares the pinned pure kernels (canonicalize / extract_text /
extract_outlinks / robots / xxhash64) with the engine — the semantics live
in ONE place; this module contributes only the sequential control flow.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field

from spiderspark.canon import (
    canonicalize,
    extract_outlinks,
    extract_text,
    host_of,
    parse_robots,
    robots_allowed,
)
from spiderspark.hashing import xxhash64_int

MAX_URL_LEN = 2048


@dataclass
class OracleConfig:
    default_budget: float = 10.0
    round_seconds: float = 60.0
    max_depth: int = 64
    max_attempts: int = 2


@dataclass
class HostState:
    tokens: float = 0.0
    capacity: float = 10.0
    refill: float = 10.0
    crawl_delay: float = 0.0
    rules: list = field(default_factory=list)


@dataclass(frozen=True)
class Item:
    url: str
    url_norm: str
    url_hash: int
    host: str
    priority: float
    depth: int
    discovered_batch: int
    attempt: int = 0

    @property
    def order_key(self):
        return (self.priority, self.depth, self.discovered_batch, self.url_hash)

    @property
    def dedup_key(self):
        # mirror of frontier.dedup_within_batch: min struct over
        # (priority, depth, discovered_batch, url, …, attempt)
        return (self.priority, self.depth, self.discovered_batch, self.url,
                self.attempt)


def _make_item(
    url: str, priority: float, depth: int, batch: int, attempt: int = 0
) -> Item | None:
    norm = canonicalize(url)
    if not norm or not norm.startswith("http") or len(norm) > MAX_URL_LEN:
        return None
    host = host_of(norm)
    if not host:
        return None
    return Item(
        url, norm, xxhash64_int(norm), host, float(priority), depth, batch, attempt
    )


def _dedup(items: list[Item]) -> list[Item]:
    best: dict[int, Item] = {}
    for it in items:
        cur = best.get(it.url_hash)
        if cur is None or it.dedup_key < cur.dedup_key:
            best[it.url_hash] = it
    return list(best.values())


class OracleCrawler:
    def __init__(self, seeds, pages, robots=None, config: OracleConfig | None = None):
        """seeds: [(url, priority)]; pages: {url: html_bytes} (urls assumed
        canonical-form, as the synthetic corpus generates them);
        robots: {host: body}."""
        self.config = config or OracleConfig()
        self.pages = {
            xxhash64_int(canonicalize(u)): html for u, html in pages.items()
        }
        self.hosts: dict[str, HostState] = {}
        for host, body in (robots or {}).items():
            rules, delay = parse_robots(body)
            self.hosts[host] = HostState(
                capacity=self.config.default_budget,
                refill=self.config.default_budget,
                crawl_delay=delay,
                rules=rules,
            )
        self.seen: set[int] = set()
        self.batch_id = 0
        self.frontier: list[Item] = _dedup(
            [
                it
                for u, p in seeds
                if (it := _make_item(u, p, 0, 0)) is not None
                and self._insertion_allowed(it)
            ]
        )
        self.texts: dict[str, str] = {}  # url_norm -> extracted text

    def _insertion_allowed(self, it: Item) -> bool:
        """Mirror of politeness.insertion_gate: robots-disallowed URLs are
        dropped at frontier-insertion time (robots is static per crawl, so
        they could never be scheduled — keeping them would leak state)."""
        hs = self.hosts.get(it.host)
        if hs is None:
            return True
        return robots_allowed(_path_of(it.url_norm), hs.rules)

    def _host_view(self, host: str) -> HostState:
        """Read-only view: unknown hosts get the default policy but are NOT
        persisted (mirrors politeness.join_host_state's coalesce defaults —
        host_state only gains rows for hosts that actually schedule)."""
        return self.hosts.get(host) or HostState(
            capacity=self.config.default_budget,
            refill=self.config.default_budget,
        )

    def run_round(self) -> list[Item]:
        """One round; returns the schedule in its deterministic total order."""
        self.batch_id += 1
        cfg = self.config

        # dedup against seen (invariant: frontier already disjoint; re-check)
        candidates = [it for it in self.frontier if it.url_hash not in self.seen]

        # per-host budget (pinned token arithmetic) + robots gate + top-k
        by_host: dict[str, list[Item]] = {}
        for it in candidates:
            by_host.setdefault(it.host, []).append(it)

        scheduled: list[Item] = []
        avail_memo: dict[str, float] = {}
        for host, items in by_host.items():
            hs = self._host_view(host)
            avail = min(hs.capacity, hs.tokens + hs.refill)
            avail_memo[host] = avail
            if hs.crawl_delay > 0:
                delay_cap = math.floor(cfg.round_seconds / hs.crawl_delay)
            else:
                delay_cap = float("inf")
            budget = max(0, min(math.floor(avail), delay_cap))
            if budget <= 0:
                continue
            allowed = [
                it for it in items if robots_allowed(_path_of(it.url_norm), hs.rules)
            ]
            allowed.sort(key=lambda it: it.order_key)
            scheduled.extend(allowed[: int(budget)])

        scheduled.sort(key=lambda it: it.order_key)

        # fetch + extract + discover + retry (reference re-queues failures)
        discovered: list[Item] = []
        requeued: list[Item] = []
        done_hashes: set[int] = set()
        for it in scheduled:
            html = self.pages.get(it.url_hash)
            if html is None:
                if it.attempt + 1 >= cfg.max_attempts:
                    done_hashes.add(it.url_hash)
                else:
                    requeued.append(
                        Item(it.url, it.url_norm, it.url_hash, it.host,
                             it.priority, it.depth, self.batch_id,
                             it.attempt + 1)
                    )
                continue
            done_hashes.add(it.url_hash)
            self.texts[it.url_norm] = extract_text(html)
            if it.depth < cfg.max_depth:
                for link in extract_outlinks(html, it.url):
                    child = _make_item(link, it.priority, it.depth + 1, self.batch_id)
                    if child is not None and self._insertion_allowed(child):
                        discovered.append(child)

        # state update — mirrors crawl.crawl_round steps 8-10 exactly
        sched_hashes = {it.url_hash for it in scheduled}
        self.seen |= done_hashes
        remaining = [it for it in self.frontier if it.url_hash not in sched_hashes]
        merged = _dedup(remaining + discovered + requeued)
        self.frontier = [it for it in merged if it.url_hash not in self.seen]

        counts: dict[str, int] = {}
        for it in scheduled:
            counts[it.host] = counts.get(it.host, 0) + 1
        # mirrors politeness.update_host_state (full outer join semantics):
        # every pre-existing host refills; scheduled hosts spend; hosts that
        # scheduled but had no row get one with default policy
        for host in set(self.hosts) | set(counts):
            hs = self.hosts.get(host)
            if hs is None:
                hs = HostState(
                    capacity=cfg.default_budget, refill=cfg.default_budget
                )
                self.hosts[host] = hs
            avail = avail_memo.get(host, min(hs.capacity, hs.tokens + hs.refill))
            hs.tokens = avail - counts.get(host, 0)
        return scheduled

    def run(self, rounds: int) -> list[list[Item]]:
        return [self.run_round() for _ in range(rounds)]

    def seen_digest(self) -> str:
        payload = ",".join(str(h) for h in sorted(self.seen))
        return hashlib.sha256(payload.encode()).hexdigest()


def _path_of(url_norm: str) -> str:
    """Everything after the origin — same regex semantics as
    politeness.robots_gate."""
    rest = url_norm.split("://", 1)[1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"


def schedule_hashes(schedule: list[Item]) -> list[int]:
    return [it.url_hash for it in schedule]
