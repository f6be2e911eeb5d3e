"""Single-process reference simulator (SURVEY.md §5.2.3).

Implements EXACTLY the pinned crawl semantics of croawl_spark/plans/cycle.py
— but as a straight-line, single-threaded Python loop with dicts and sorts,
independently of Spark. The Spark engine must reproduce this fetch_log order
and final seen-set byte-for-byte at any parallelism; that equality is the
substitute correctness gate for the absent reference binary (SURVEY.md §0).

Shared with the engine (by design — these ARE the pinned fixtures, not the
logic under test): canonicalize_url, parse_robots/allowed, gen_page,
extract_all. The *scheduling logic* below is written independently.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from croawl_spark import synth
from croawl_spark.functions.extract import extract_all
from croawl_spark.functions.robots import allowed, parse_robots
from croawl_spark.functions.urls import canonicalize_url


def simulate(seeds: list[str], n_cycles: int, k_per_host: int = 2):
    """-> (fetch_log rows, seen dict canon_url->disc_seq, frontier list)

    fetch_log row: (cycle, fetch_seq, canon_url, host, status, content_kind,
    nbytes)
    """
    robots: dict[str, tuple[list, float]] = {}

    def host_of(c: str) -> str:
        return c.split("/")[2].split("@")[-1].split(":")[0].lower()

    def rules_for(h: str):
        if h not in robots:
            robots[h] = parse_robots(synth.robots_body(h))
        return robots[h]

    def path_of(c: str) -> str:
        rest = c.split("/", 3)
        return "/" + rest[3].split("?")[0] if len(rest) > 3 else "/"

    def robots_ok(c: str) -> bool:
        rules, _ = rules_for(host_of(c))
        return allowed(rules, path_of(c))

    # bootstrap: canonicalize in seed order, first-wins, renumber 0..n-1.
    # ALL deduped seeds enter seen; only robots-allowed rows enter the
    # frontier (insert-time robots, matching the engine's pinned semantics).
    first: dict[str, int] = {}
    for i, u in enumerate(seeds):
        c = canonicalize_url(u)
        if c is not None and c not in first:
            first[c] = i
    ordered = sorted(first.items(), key=lambda kv: kv[1])
    frontier: dict[str, tuple[int, int]] = {}  # canon -> (depth, disc_seq)
    seen: dict[str, int] = {}
    for disc_seq, (c, _orig) in enumerate(ordered):
        seen[c] = disc_seq
        if robots_ok(c):
            frontier[c] = (0, disc_seq)

    last_fetch: dict[str, int] = {}
    fetch_log: list[tuple] = []
    fetch_seq = 0

    for t in range(n_cycles):
        # 2. due-time gate + 3. per-host top-k by (depth, disc_seq)
        by_host: dict[str, list] = {}
        for c, (depth, dseq) in frontier.items():
            h = host_of(c)
            _, delay = rules_for(h)
            if h in last_fetch and t < last_fetch[h] + int(-(-delay // 1)):
                continue
            by_host.setdefault(h, []).append((depth, dseq, c))
        batch = []
        for h, rows in by_host.items():
            rows.sort()
            batch.extend(rows[:k_per_host])
        batch.sort()  # global order (depth, disc_seq) — disc_seq unique
        # 4-5. fetch + parse; 6. frontier update
        discovered: list[tuple[int, int, str]] = []  # (parent_seq, pos, url)
        for depth, dseq, c in batch:
            h = host_of(c)
            page = synth.gen_page(c)
            fetch_log.append(
                (t, fetch_seq, c, h, page["status"], page["content_kind"],
                 page["nbytes"])
            )
            last_fetch[h] = t
            del frontier[c]
            if page["status"] == 200:
                ex = extract_all(page["spans"])
                for pos, link in enumerate(ex["outlinks"]):
                    discovered.append((fetch_seq, pos, link, depth + 1))
            fetch_seq += 1
        # first-wins per canon_url by (parent_fetch_seq, link_pos)
        fw: dict[str, tuple[int, int, int]] = {}
        for pseq, pos, link, d in discovered:
            cu = canonicalize_url(link)
            if cu is None or cu in seen:
                continue
            if cu not in fw or (pseq, pos) < fw[cu][:2]:
                fw[cu] = (pseq, pos, d)
        base = (max(seen.values()) + 1) if seen else 0
        for i, (cu, (pseq, pos, d)) in enumerate(
            sorted(fw.items(), key=lambda kv: kv[1][:2])
        ):
            seen[cu] = base + i
            if robots_ok(cu):  # insert-time robots: denied never enter
                frontier[cu] = (d, base + i)
    return fetch_log, seen, frontier


if __name__ == "__main__":
    seeds = synth.gen_seeds(100)
    log, seen, frontier = simulate(seeds, 5)
    print(f"fetches={len(log)} seen={len(seen)} frontier={len(frontier)}")
    for row in log[:10]:
        print(row)
