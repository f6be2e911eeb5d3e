"""The deterministic synthetic web (V6) + fixture generators.

The sandbox has no network, so "fetch" is a pure function of the canonical
URL: ``gen_page(canon_url)`` returns status / kind / bytes / interleaved
spans. The SAME function backs the Spark fetch stage (inside applyInPandas)
and the single-process ordering oracle (tests/oracle_sim.py) — the driver's
correctness rule is about *scheduling order* and *seen-set membership*, which
the two implementations must reproduce independently; the page content
itself is shared fixture, not the thing under test.

All randomness is sha256-of-URL based: no wall clock, no RNG state, no seeds
to thread. Identical across processes, partitions and cluster sizes.
"""

from __future__ import annotations

import hashlib


def h64(s: str, salt: str = "") -> int:
    """Stable 64-bit value from a string (sha256-based, process-independent)."""
    return int.from_bytes(
        hashlib.sha256((salt + "\x1f" + s).encode("utf-8")).digest()[:8], "big"
    )


# Universe size knobs. Defaults are PINNED for the ordering-oracle tests
# (engine and oracle must agree); benchmarks may enlarge the universe by
# setting these env vars BEFORE any crawl runs (both processes would need
# the same values for any cross-checking).
import os as _os

N_HOSTS = int(_os.environ.get("CROAWL_SYNTH_HOSTS", "50"))
N_PATHS = int(_os.environ.get("CROAWL_SYNTH_PATHS", "2000"))
# Extra distractor <meta> tags per page (citation_*/og:* — present on real
# scholarly landing pages in the hundreds; the extractor must scan past
# them). 0 keeps test pages small; benches set ~100+ for realistic parse
# cost per page.
N_META = int(_os.environ.get("CROAWL_SYNTH_META_TAGS", "0"))
_WORDS = (
    "the spark frontier crawl fetch queue host robots page link merge of and in "
    "scan filter window batch cycle seed depth hash bloom probe rank budget"
).split()


def _host(i: int) -> str:
    return f"h{i}.test"


def _zipf_host(v: int) -> str:
    """Map a uniform 64-bit value to a skewed host index: squaring the
    unit uniform concentrates ~30% of mass on the first few hosts —
    the hot-host skew the salted ranking (W1) must defuse."""
    u = (v % 10_000) / 10_000.0
    return _host(int(N_HOSTS * u * u))


def target_url(parent: str, i: int) -> str:
    """The i-th outlink target of a page — possibly messy (uppercase,
    default port, dot-segments, fragment) to exercise canonicalization."""
    v = h64(parent, f"link{i}")
    # host from HIGH bits, path from LOW bits — otherwise host becomes a
    # function of path and the URL universe collapses to N_PATHS values
    host = _zipf_host(v >> 20)
    path = f"/p/{v % N_PATHS}"
    style = v % 10
    if style == 0:
        return f"HTTP://{host.upper()}:80{path}#frag{i}"
    if style == 1:
        return f"http://{host}/a/../{path.lstrip('/')}"
    if style == 2:
        return f"http://{host}{path}?s={v % 7}"
    if style == 3:
        return f"http://{host}:80{path}"
    return f"http://{host}{path}"


def _words(v: int, n: int) -> str:
    return " ".join(
        _WORDS[((v >> ((i * 13) % 57)) + i * 2654435761) % len(_WORDS)]
        for i in range(n)
    )


def gen_page(canon_url: str) -> dict:
    """Deterministic page: status, content_kind, nbytes, spans.

    spans: list of dicts (kind, text, media_ref, offset) — interleaved text
    and media, offsets = 0..n-1 (FIXTURES.md §1). Outlinks and DC metadata
    are embedded IN the text spans as HTML; extraction happens downstream
    (functions/extract.py), exactly like a real crawler.
    """
    v = h64(canon_url, "page")
    if v % 100 < 5:
        return {"status": 404, "content_kind": "html", "nbytes": 0, "spans": []}
    if v % 100 < 10:
        return {
            "status": 200,
            "content_kind": "pdf",
            "nbytes": 1000 + v % 50_000,
            "spans": [
                {"kind": "media", "text": None,
                 "media_ref": f"pdf://{v % 10**10:010d}", "offset": 0}
            ],
        }
    n_links = v % 6  # 0..5 outlinks
    anchors = "".join(
        f'<a href="{target_url(canon_url, i)}">l{i}</a> ' for i in range(n_links)
    )
    has_dc = v % 10 < 3
    dc = ""
    if has_dc:
        t = _words(h64(canon_url, "t"), 3)
        dc = (
            f'<meta name="DC.title" content="{t}">'
            f'<meta name="DC.creator" content="Author {v % 97}">'
            f'<meta name="dc.identifier" content="doi:10.{v % 9999}/{v % 100000}">'
        )
        if v % 4 == 0:
            host = canon_url.split("/")[2]
            dc += f'<link rel="oai" href="http://{host}/oai?verb=Identify">'
    paras = "".join(
        f"<p>{_words(h64(canon_url, f'w{j}'), 18)}</p>" for j in range(3 + v % 5)
    )
    distractors = "".join(
        f'<meta name="citation_ref_{j}" content="{_WORDS[(v + j) % len(_WORDS)]} {j}">'
        for j in range(N_META)
    )
    body = f"<html>{dc}{distractors}<p>{_words(v, 8)} {anchors}</p>{paras}</html>"
    # split the HTML at deterministic points (possibly mid-tag): extraction
    # must reassemble text spans in offset order (FIXTURES.md §3)
    n_pieces = 2 + v % 5
    step = max(len(body) // n_pieces, 1)
    jitter = v % max(step - 1, 1)
    cuts = [min(step * j + jitter, len(body)) for j in range(1, n_pieces)]
    bounds = [0] + cuts + [len(body)]
    pieces = [body[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]
    spans, off = [], 0
    for j, piece in enumerate(pieces):
        spans.append({"kind": "text", "text": piece, "media_ref": None, "offset": off})
        off += 1
        if (v >> j) % 3 == 0:
            spans.append(
                {"kind": "media", "text": None,
                 "media_ref": f"img://{(v >> j) % 10**10:010d}", "offset": off}
            )
            off += 1
    return {
        "status": 200,
        "content_kind": "html",
        "nbytes": len(body),
        "spans": spans,
    }


def robots_body(host: str) -> str | None:
    """Deterministic per-host robots.txt; ~20% of hosts have none
    (missing file => allow-all, default delay)."""
    v = h64(host, "robots")
    if v % 5 == 0:
        return None
    lines = ["User-agent: *"]
    if v % 3 == 0:
        lines.append("Disallow: /p/1")  # prefix: blocks /p/1, /p/1*, /p/10..
        lines.append("Allow: /p/12")  # longest-match override inside it
    if v % 4 == 0:
        lines.append("Disallow: /private")
    lines.append(f"Crawl-delay: {v % 3}")
    return "\n".join(lines)


def gen_seeds(n: int) -> list[str]:
    """Seed list per FIXTURES.md §2: zipfian hosts, messy URL variants,
    ~2% exact dups, ~5% dups-after-canonicalization."""
    seeds: list[str] = []
    for i in range(n):
        v = h64(f"seed{i}", "s")
        if i > 10 and v % 50 == 0:
            seeds.append(seeds[v % len(seeds)])  # exact duplicate
            continue
        url = target_url(f"seedspace{v % (n // 2 + 1)}", v % 3)
        seeds.append(url)
    return seeds
