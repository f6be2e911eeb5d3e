"""robots.txt parsing + longest-prefix-match predicate (S4/F6, RFC 9309 subset).

Pinned semantics (mirrored by the oracle simulator):
  * only ``User-agent: *`` groups are honored (croawl-style single UA)
  * rules are (allow: bool, path_prefix: str); empty Disallow = allow-all
  * a URL path is allowed iff the LONGEST matching prefix rule allows it;
    ties between allow and disallow of equal length -> allow
  * no rules / missing robots.txt -> allowed, crawl_delay = 0
  * Crawl-delay: seconds (here: cycles) — float, default 0
"""

from __future__ import annotations


def parse_robots(body: str | None) -> tuple[list[tuple[bool, str]], float]:
    """-> ([(allow, path_prefix), ...], crawl_delay). Pure Python, shared
    with the oracle."""
    if not body:
        return [], 0.0
    rules: list[tuple[bool, str]] = []
    delay = 0.0
    in_star = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            in_star = val == "*"
        elif in_star and key == "disallow":
            if val:  # empty Disallow => allow everything (no rule)
                rules.append((False, val))
        elif in_star and key == "allow":
            if val:
                rules.append((True, val))
        elif in_star and key == "crawl-delay":
            try:
                delay = float(val)
            except ValueError:
                pass
    return rules, delay


def allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """Longest-prefix-match; allow wins length ties; default allow."""
    matches = [(len(p), a) for a, p in rules if path.startswith(p)]
    if not matches:
        return True
    mlen = max(m[0] for m in matches)
    return any(a for ln, a in matches if ln == mlen)
