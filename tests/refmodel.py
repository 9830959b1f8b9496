"""Sequential reference model — the executable crawl-round spec.

This is the golden-fixture generator mandated by SURVEY.md §5.2: a pure
single-threaded Python model of the reference's Queue/Scheduler semantics
(FIFO bounded channel, ``/root/reference/queue_memory.go:12-58``; worker
loop ``crawler.go:119-144``; glob dispatch ``crawler.go:239-252``; URL
resolution ``request.go:104-117`` + ``html_utils.go:93-106``; Text
whitespace contract ``html_utils.go:37-45``) with the driver-mandated
politeness + URL-seen overlay pinned below. The Spark engine
(crawl_spark/plans/engine.py) must reproduce its transcript exactly.

PINNED ROUND SPEC v1 (shared by refmodel and engine)
====================================================
Logical clock: round r covers [r, r+1) seconds. State: frontier rows
(url, url_canon, host, priority, depth, round_added, seq, callbacks,
referer, deadline, raw), seen set of url_canon (URLs *ever enqueued*),
host_state: host -> next_time (default 0.0).

FIFO order key: (priority asc, round_added asc, seq asc) — priority 0 is
most urgent; within a priority class this is exactly the reference's FIFO
channel order.

Scheduling a URL (seed index i at round 0: seq=i; link at round r from
batch position b (1-based), link position p (0-based, spanning matched
follow-handlers in dispatch order): seq = b * SEQ_STRIDE + p,
round_added = r + 1):
  canon = canonicalize(url, referer); canon None -> error "invalid_url"
  (seeds) / silent skip (links, matching html_utils.go:100-102 silent
  skip). canon in seen -> dropped, counted `deduped`. Else added to seen
  and to the frontier.

Round r:
 1. expire:   rows with deadline <= r are dropped, counted `expired`
              (nsq/nsqcrawl/queue.go:90-94 deadline drop).
 2. robots:   rows whose URL path has any robots.disallow prefix of its
              host (string prefix match) are dropped permanently, error
              "robots_denied".
 3. budget:   d = robots.crawl_delay(host) (absent -> 0.0).
              s = max(next_time(host), r).
              budget = unlimited if d <= 0 else max(0, ceil((r+1-s)/d)).
 4. host rank: within each host order rows by the FIFO key; keep the
              first `budget` rows.
 5. global cap: order the survivors by the FIFO key; batch = first
              `batch_cap` rows; batch_pos = 1-based rank in this order.
              Everything not selected (steps 3-5) stays in the frontier,
              counted `deferred_by_politeness`.
 6. fetch:    look up pages[url_canon]. Miss -> error "fetch_miss".
              `fetched` counts hits. Host clock: for every host with k>0
              batch rows (hits+misses) and d > 0:
              next_time = max(next_time, r) + k * d.
 7. extract + dispatch: per batch row (hits only, raw=False), parse html
              once; handlers = registry.get_handlers(callbacks); for each
              handler: record (url_canon, handler.name, text via
              handler.text_selector — Text() contract); if handler.follow:
              links via handler.link_selector (NodeResolveURL semantics),
              scheduled in document order with callbacks =
              handler.out_callbacks or parent callbacks, priority =
              parent priority, depth = parent depth + 1.
 8. next round with frontier = deferred + newly scheduled.
Run ends when the frontier is empty or max_rounds is reached.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from crawl_spark.functions.hashing import url_hash64, murmur3_32
from crawl_spark.functions.htmldom import extract_links, parse_html, sel_text
from crawl_spark.functions.urlnorm import canonicalize, host_of
from crawl_spark.plans.handlers import HandlerRegistry

SEQ_STRIDE = 1 << 20


@dataclass
class Row:
    url: str
    url_canon: str
    host: str
    priority: int
    depth: int
    round_added: int
    seq: int
    callbacks: list
    referer: str | None = None
    deadline: float | None = None
    raw: bool = False

    def key(self):
        return (self.priority, self.round_added, self.seq)


@dataclass
class RefResult:
    transcript: list = field(default_factory=list)  # per round: [url_canon]
    seen: set = field(default_factory=set)
    texts: dict = field(default_factory=dict)  # url_canon -> {handler: text}
    errors: list = field(default_factory=list)  # (url, round, class)
    counters: list = field(default_factory=list)  # per round dict
    host_state: dict = field(default_factory=dict)


def crawl(
    pages: dict,  # url_canon -> html bytes
    seeds: list,  # dicts: url, callbacks, priority, (referer/deadline/raw)
    registry: HandlerRegistry,
    robots: dict | None = None,  # host -> (disallow list, crawl_delay)
    batch_cap: int = 1000,
    max_rounds: int = 50,
    robots_switch: tuple | None = None,  # (round k, new robots dict)
) -> RefResult:
    """``robots_switch=(k, new_robots)`` swaps the politeness inputs from
    round k on — the oracle for the engine's ``rebase_robots()`` epoch
    contract (rows already robots-dropped in rounds < k stay dropped;
    budgets and verdicts from round k use the new rules). Default None
    leaves PINNED ROUND SPEC v1 behavior byte-identical."""
    robots = robots or {}
    res = RefResult()
    frontier: list[Row] = []

    def _lst(v):
        return [] if v is None else list(v)  # tolerate numpy arrays from parquet

    deduped_at_seed = 0
    for i, s in enumerate(seeds):
        canon = canonicalize(s["url"], s.get("referer"))
        if canon is None or host_of(canon) is None:
            res.errors.append((s["url"], 0, "invalid_url"))
            continue
        if canon in res.seen:
            deduped_at_seed += 1
            continue
        res.seen.add(canon)
        frontier.append(
            Row(
                url=s["url"],
                url_canon=canon,
                host=host_of(canon),
                priority=int(s.get("priority") or 0),
                depth=0,
                round_added=0,
                seq=i,
                callbacks=_lst(s.get("callbacks")),
                referer=s.get("referer"),
                deadline=s.get("deadline"),
                raw=bool(s.get("raw")),
            )
        )

    next_time = res.host_state

    for r in range(max_rounds):
        if robots_switch is not None and r == robots_switch[0]:
            robots = robots_switch[1] or {}
        if not frontier:
            break
        c = {
            "round": r,
            "fetched": 0,
            "deduped": deduped_at_seed if r == 0 else 0,
            "deferred_by_politeness": 0,
            "expired": 0,
            "errors": 0,
        }

        # 1. expire
        live = []
        for row in frontier:
            if row.deadline is not None and row.deadline <= r:
                c["expired"] += 1
            else:
                live.append(row)

        # 2. robots disallow
        allowed = []
        for row in live:
            dis, _ = robots.get(row.host, ([], 0.0))
            path = row.url_canon.split(row.host, 1)[1] if row.host in row.url_canon else "/"
            if any(path.startswith(p) for p in dis):
                res.errors.append((row.url_canon, r, "robots_denied"))
                c["errors"] += 1
            else:
                allowed.append(row)

        # 3+4. per-host budget
        by_host: dict[str, list[Row]] = {}
        for row in sorted(allowed, key=Row.key):
            by_host.setdefault(row.host, []).append(row)
        survivors: list[Row] = []
        for host, rows in by_host.items():
            _, d = robots.get(host, ([], 0.0))
            if d <= 0:
                survivors.extend(rows)
                continue
            s_t = max(next_time.get(host, 0.0), float(r))
            budget = max(0, math.ceil((r + 1 - s_t) / d))
            survivors.extend(rows[:budget])

        # 5. global cap
        survivors.sort(key=Row.key)
        batch = survivors[:batch_cap]
        batch_set = {id(row) for row in batch}
        deferred = [row for row in allowed if id(row) not in batch_set]
        c["deferred_by_politeness"] = len(deferred)
        res.transcript.append([row.url_canon for row in batch])

        # 6. host clock update
        per_host_k: dict[str, int] = {}
        for row in batch:
            per_host_k[row.host] = per_host_k.get(row.host, 0) + 1
        for host, k in per_host_k.items():
            _, d = robots.get(host, ([], 0.0))
            if d > 0:
                next_time[host] = max(next_time.get(host, 0.0), float(r)) + k * d

        # 6b. fetch + 7. extract/dispatch/schedule
        new_rows: list[Row] = []
        for b, row in enumerate(batch, start=1):
            html = pages.get(row.url_canon)
            if html is None:
                res.errors.append((row.url_canon, r, "fetch_miss"))
                c["errors"] += 1
                continue
            c["fetched"] += 1
            if row.raw:
                continue
            root = parse_html(html)
            pos = 0
            for h in registry.get_handlers(row.callbacks):
                res.texts.setdefault(row.url_canon, {})[h.name] = sel_text(
                    root, h.text_selector
                )
                if not h.follow:
                    continue
                for link in extract_links(root, row.url, h.link_selector):
                    my_pos = pos
                    pos += 1
                    canon = canonicalize(link)
                    if canon is None or host_of(canon) is None:
                        continue
                    if canon in res.seen:
                        c["deduped"] += 1
                        continue
                    res.seen.add(canon)
                    new_rows.append(
                        Row(
                            url=link,
                            url_canon=canon,
                            host=host_of(canon),
                            priority=row.priority,
                            depth=row.depth + 1,
                            round_added=r + 1,
                            seq=b * SEQ_STRIDE + my_pos,
                            callbacks=list(h.out_callbacks or row.callbacks),
                            referer=row.url,
                        )
                    )
        res.counters.append(c)
        frontier = deferred + new_rows

    return res


def seen_rows(res: RefResult) -> list[tuple]:
    """Seen-set rows in the engine's SEEN schema shape (sans first_round)."""
    return sorted((u, url_hash64(u), murmur3_32(host_of(u).encode())) for u in res.seen)
