"""Parser-fixture tests (FIXTURES.md §3) + span-sequence equality
(BASELINE.json input_hint) + property checks for URL/robots/bloom."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from croawl_spark.functions.extract import extract_all, span_fingerprint
from croawl_spark.functions.robots import allowed, parse_robots
from croawl_spark.functions.urls import canonicalize_url

FIXTURES = json.loads(
    (Path(__file__).parent / "fixtures" / "dc_pages.json").read_text()
)


@pytest.mark.parametrize("fx", FIXTURES, ids=[f["fixture_id"] for f in FIXTURES])
def test_extract_pure(fx):
    got = extract_all(fx["spans"])
    exp = fx["expected"]
    assert got["dc_title"] == exp["dc_title"], fx["fixture_id"]
    assert got["dc_creator"] == exp["dc_creator"]
    assert got["dc_identifier"] == exp["dc_identifier"]
    assert got["oai_endpoint"] == exp["oai_endpoint"]


def test_extract_job_spark(spark):
    """End-to-end §3.2 path: documents_interleaved DF -> metadata DF."""
    from croawl_spark.plans.extract import extract_metadata, with_fingerprint
    from croawl_spark.tables import DOCUMENTS_INTERLEAVED

    rows = [
        {"doc_id": f["fixture_id"],
         "spans": [(s["kind"], s["text"], s["media_ref"], s["offset"])
                   for s in f["spans"]]}
        for f in FIXTURES
    ]
    docs = spark.createDataFrame(
        [(r["doc_id"], r["spans"]) for r in rows], DOCUMENTS_INTERLEAVED
    )
    meta = {r["doc_id"]: r for r in extract_metadata(docs).collect()}
    assert len(meta) == len(FIXTURES)
    for f in FIXTURES:
        m = meta[f["fixture_id"]]
        e = f["expected"]
        assert m["dc_title"] == e["dc_title"], f["fixture_id"]
        assert list(m["dc_creator"]) == e["dc_creator"]
        assert m["dc_identifier"] == e["dc_identifier"]
        assert m["oai_endpoint"] == e["oai_endpoint"]

    # span-sequence equality: Spark-side fingerprint == pure-python fingerprint
    fps = {r["doc_id"]: r["span_fp"] for r in with_fingerprint(docs).collect()}
    for f in FIXTURES:
        assert fps[f["fixture_id"]] == span_fingerprint(f["spans"]), f["fixture_id"]


def test_fingerprint_is_order_invariant_by_offset():
    a = [
        {"kind": "text", "text": "x", "media_ref": None, "offset": 0},
        {"kind": "media", "text": None, "media_ref": "img://1", "offset": 1},
    ]
    b = list(reversed(a))  # same spans, stored out of order
    assert span_fingerprint(a) == span_fingerprint(b)
    c = [dict(a[0], text="y"), a[1]]
    assert span_fingerprint(a) != span_fingerprint(c)


# --- property checks (SURVEY §5.2.6) --------------------------------------

CANON_CASES = [
    ("HTTP://Example.COM:80/a/../b#frag", "http://example.com/b"),
    ("https://h.test:443/", "https://h.test/"),
    ("https://h.test:8443/x", "https://h.test:8443/x"),
    ("http://h.test", "http://h.test/"),
    ("http://h.test/a/./b/../c?q=1&p=2", "http://h.test/a/c?q=1&p=2"),
    ("http://h.test/%7euser/%41", "http://h.test/~user/A"),
    ("http://h.test/a%2fb", "http://h.test/a%2Fb"),
    ("ftp://h.test/x", None),
    ("not a url", None),
    ("", None),
    (None, None),
    ("http://h.test/p?", "http://h.test/p"),
]


@pytest.mark.parametrize("raw,want", CANON_CASES)
def test_canonicalize_pinned(raw, want):
    assert canonicalize_url(raw) == want


def test_canonicalize_idempotent():
    import random

    rnd = random.Random(42)
    for _ in range(500):
        raw = "".join(
            rnd.choice("abcXYZ:/?#%.~-_=&0123456789") for _ in range(rnd.randint(5, 40))
        )
        for prefix in ("http://h.test/", "HTTPS://H2.TEST:443/"):
            c = canonicalize_url(prefix + raw)
            if c is not None:
                assert canonicalize_url(c) == c, (raw, c)


def test_robots_pinned():
    rules, delay = parse_robots(
        "User-agent: *\nDisallow: /p/1\nAllow: /p/12\nCrawl-delay: 2\n"
        "User-agent: other\nDisallow: /\n"
    )
    assert delay == 2.0
    assert allowed(rules, "/p/2")        # no match -> allow
    assert not allowed(rules, "/p/1")    # disallow exact
    assert not allowed(rules, "/p/10")   # prefix
    assert allowed(rules, "/p/12")       # longer allow wins
    assert allowed(rules, "/p/123")      # longest match is the allow
    assert allowed([], "/anything")
    # allow wins equal-length ties
    r2, _ = parse_robots("User-agent: *\nDisallow: /x\nAllow: /x\n")
    assert allowed(r2, "/x/1")


def test_bloom_no_false_negatives(spark):
    import random

    from pyspark.sql import functions as F

    from croawl_spark.operators.seenfilter import build_filter, probe_filter

    rnd = random.Random(7)
    hashes = [rnd.randint(-(2**63), 2**63 - 1) for _ in range(2000)]
    seen = spark.createDataFrame([(h,) for h in hashes], "url_hash long")
    filt = build_filter(seen, n_buckets=8, m_bits=1 << 12)
    cand = spark.createDataFrame(
        [(h, i < len(hashes)) for i, h in enumerate(hashes + [rnd.randint(-(2**63), 2**63 - 1) for _ in range(1000)])],
        "url_hash long, was_inserted boolean",
    )
    probed = probe_filter(cand, filt, n_buckets=8, m_bits=1 << 12)
    # every inserted hash MUST probe maybe_seen (no false negatives)
    fn = probed.filter(F.col("was_inserted") & ~F.col("maybe_seen")).count()
    assert fn == 0
    # and the filter actually filters: most non-inserted are 'definitely new'
    fresh = probed.filter(~F.col("was_inserted") & ~F.col("maybe_seen")).count()
    assert fresh > 800


def test_cuckoo_insert_probe_delete(spark):
    import random

    from pyspark.sql import functions as F

    from croawl_spark.operators.seenfilter import build_cuckoo_filter, probe_cuckoo

    rnd = random.Random(11)
    hashes = [rnd.randint(-(2**63), 2**63 - 1) for _ in range(3000)]
    seen = spark.createDataFrame([(h,) for h in hashes], "url_hash long")
    filt = build_cuckoo_filter(seen, n_buckets=8, m_slots=1 << 10)
    cand = spark.createDataFrame(
        [(h, i < len(hashes)) for i, h in enumerate(
            hashes + [rnd.randint(-(2**63), 2**63 - 1) for _ in range(1500)])],
        "url_hash long, was_inserted boolean",
    )
    probed = probe_cuckoo(cand, filt, n_buckets=8, m_slots=1 << 10)
    assert probed.filter(F.col("was_inserted") & ~F.col("maybe_seen")).count() == 0
    assert probed.filter(~F.col("was_inserted") & ~F.col("maybe_seen")).count() > 1400

    # deletion: remove a third; remaining items must still have no FNs,
    # deleted ones mostly absent
    dels = spark.createDataFrame([(h,) for h in hashes[:1000]], "url_hash long")
    filt2 = build_cuckoo_filter(
        spark.createDataFrame([], "url_hash long"),
        n_buckets=8, m_slots=1 << 10, existing=filt, deletes=dels,
    )
    remaining = spark.createDataFrame(
        [(h, True) for h in hashes[1000:]] + [(h, False) for h in hashes[:1000]],
        "url_hash long, still_in boolean",
    )
    p2 = probe_cuckoo(remaining, filt2, n_buckets=8, m_slots=1 << 10)
    assert p2.filter(F.col("still_in") & ~F.col("maybe_seen")).count() == 0
    deleted_still_maybe = p2.filter(~F.col("still_in") & F.col("maybe_seen")).count()
    assert deleted_still_maybe < 50  # only fp-collision residue


def test_cuckoo_overflow_raises_not_silently_drops(spark):
    """Driving a bucket past its eviction capacity must FAIL LOUDLY: a
    silently dropped insert would be a false negative for a present item."""
    import random

    import pytest as _pytest

    from croawl_spark.operators.seenfilter import build_cuckoo_filter

    rnd = random.Random(3)
    # 8 buckets x (16 rows x 4 slots) = 512 capacity; 2000 inserts overflow
    hashes = [rnd.randint(-(2**63), 2**63 - 1) for _ in range(2000)]
    seen = spark.createDataFrame([(h,) for h in hashes], "url_hash long")
    filt = build_cuckoo_filter(seen, n_buckets=8, m_slots=1 << 4)
    with _pytest.raises(Exception, match="cuckoo bucket .* overflow"):
        filt.collect()


def test_cuckoo_delete_then_reinsert_in_one_delta(spark):
    """With a shared op sequence, delete-then-reinsert of the same hash in
    one delta nets to PRESENT (ops applied in logical order, not
    inserts-first)."""
    from pyspark.sql import functions as F

    from croawl_spark.operators.seenfilter import build_cuckoo_filter, probe_cuckoo

    base = spark.createDataFrame([(h,) for h in (111, 222, 333)], "url_hash long")
    filt = build_cuckoo_filter(base, n_buckets=4, m_slots=1 << 8)
    # delta: seq 0 deletes 222, seq 1 re-inserts 222
    dels = spark.createDataFrame([(222, 0)], "url_hash long, seq long")
    ins = spark.createDataFrame([(222, 1)], "url_hash long, seq long")
    filt2 = build_cuckoo_filter(
        ins, n_buckets=4, m_slots=1 << 8, existing=filt, deletes=dels,
        seen_seq="seq", deletes_seq="seq",
    )
    cand = spark.createDataFrame([(222,), (111,)], "url_hash long")
    probed = {r["url_hash"]: r["maybe_seen"]
              for r in probe_cuckoo(cand, filt2, n_buckets=4, m_slots=1 << 8).collect()}
    assert probed[222] is True and probed[111] is True
    n = filt2.agg(F.sum("n_items")).collect()[0][0]
    assert n == 3  # -1 delete +1 reinsert nets to the original count


def test_canonicalize_fast_path_equivalence():
    """The vectorized fast path in canonicalize_udf must admit ONLY
    fixed points of canonicalize_url."""
    import random
    import re

    import pandas as pd

    from croawl_spark import synth
    from croawl_spark.functions.urls import _DOTSEG_RE, _FAST_RE

    urls = []
    for i in range(20000):
        urls.append(synth.target_url(f"eq{i // 3}", i % 3))
    rnd = random.Random(99)
    for _ in range(5000):
        urls.append(
            "http" + rnd.choice(["", "s"]) + "://"
            + "".join(rnd.choice("abcZ09.-:@/") for _ in range(rnd.randint(3, 15)))
            + rnd.choice(["", "/p/../x", "?q=1", "?", "#f", "/%41", "/a//b", "/."])
        )
    s = pd.Series(urls)
    fast = s.str.match(_FAST_RE, na=False) & ~s.str.contains(_DOTSEG_RE, regex=True, na=False)
    n_fast = 0
    for u, is_fast in zip(urls, fast):
        if is_fast:
            n_fast += 1
            assert canonicalize_url(u) == u, u
    assert n_fast > 5000  # the fast path actually fires on plain URLs
