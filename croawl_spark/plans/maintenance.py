"""Warehouse maintenance jobs — run BETWEEN crawl cycles, never inside one.

``expire_recrawl`` is the recrawl-TTL story (SURVEY.md §2.4 A6: cuckoo
deletion exists "e.g. forgetting URLs after recrawl-TTL expiry"): URLs
fetched more than ``ttl`` cycles ago are forgotten from the URL-seen set,
so the next time a link to them is discovered they are treated as new and
refetched — recrawl-on-rediscovery, the natural policy for a link-driven
scheduler (unreferenced pages age out of the crawl entirely).

Scale shape: one anti-join keyed on (url_hash, canon_url) producing the
retained seen set, one log compaction (O(retained) rewrite — amortized:
run every ~ttl cycles, not every cycle), one filter rebuild. The bloom
filter cannot delete, so expiry rebuilds it from the retained set (this is
exactly the auto-sizer's rebuild path); a cuckoo-backed deployment would
instead stream the expired hashes through ``build_cuckoo_filter(...,
deletes=expired)`` and skip the rebuild.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from croawl_spark.operators.seenfilter import build_filter
from croawl_spark.sources.tableio import TableIO


def expire_recrawl(
    spark: SparkSession, io: TableIO, ttl: int, cfg
) -> dict:
    """Forget URLs whose LAST fetch is older than ttl cycles.

    Returns counters {expired, retained}. Idempotent: re-running with the
    same ttl expires nothing new. The frontier is untouched — queued URLs
    stay queued; expired URLs re-enter via normal link discovery with
    fresh disc_seqs (deterministic given the deterministic crawl).
    """
    last = io.last_committed_cycle()
    cutoff = last - ttl
    fetch_log = io.read_log("fetch_log")
    # LAST fetch per URL decides expiry (a page refetched recently stays)
    last_fetch = fetch_log.groupBy("url_hash", "canon_url").agg(
        F.max("cycle").alias("_last_cycle")
    )
    expired = last_fetch.filter(F.col("_last_cycle") <= cutoff).select(
        "url_hash", "canon_url"
    )
    seen = io.read_log("seen")
    retained = seen.join(expired, ["url_hash", "canon_url"], "left_anti")
    retained = retained.localCheckpoint()  # sever lineage from old segments
    n_exp = seen.count() - retained.count()
    io.compact_log(retained, "seen", last + 1)
    counters = io.counters()
    geo_buckets = int(counters.get("filter_n_buckets", cfg.n_buckets))
    geo_m = int(counters.get("filter_m_bits", cfg.m_bits))
    if cfg.use_filter:
        io.write_snapshot(
            build_filter(retained.select("url_hash"), geo_buckets, geo_m),
            "seen_filter",
            last + 1,
        )
        io.commit_cycle(last + 1, ["seen_filter"])
    return {"expired": int(n_exp), "retained": int(retained.count())}
