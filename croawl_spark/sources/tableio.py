"""TableIO port — snapshot/append table storage with atomic per-cycle commits.

Production target is Iceberg (``df.writeTo(...).append()``, snapshot
isolation, partition overwrite); the Iceberg runtime jar is unavailable in
this sandbox (SURVEY.md §7.4), so the fallback backend emulates exactly the
semantics the engine uses:

  base/<table>/cycle=<N>/...parquet     one directory per committed cycle
  base/_manifest.json                   {"tables": {t: [cycles...]}, "last_cycle": N}

Commit protocol: all tables for cycle N are written first; the manifest is
rewritten LAST via write-tmp + os.replace (atomic on POSIX). A crash between
data write and manifest commit leaves orphan directories that are ignored on
read and harmlessly overwritten on replay — idempotent resume, which is the
Iceberg property the crawl loop actually relies on (BASELINE.json:
"resumable from checkpoint with per-partition lineage").

Snapshot tables (frontier/seen/host_state/seen_filter) read ONLY their
latest committed cycle; log tables (fetch_log/documents/metadata/metrics)
read the union of all committed cycles — partition pruning by ``cycle``
comes free from the directory layout.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SNAPSHOT_TABLES = ("frontier", "seen", "host_state", "seen_filter")


class TableIO:
    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = base
        os.makedirs(base, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.base, "_manifest.json")

    def read_manifest(self) -> dict:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"tables": {}, "last_cycle": -1}

    def commit_cycle(
        self, cycle: int, tables: list[str], counters: dict | None = None
    ) -> None:
        """counters: engine scalars (total_fetches, next_disc_seq, ...)
        committed atomically WITH the cycle — replaces per-cycle count jobs
        and stays consistent on replay."""
        m = self.read_manifest()
        for t in tables:
            cs = m["tables"].setdefault(t, [])
            if cycle not in cs:
                cs.append(cycle)
        m["last_cycle"] = max(m["last_cycle"], cycle)
        if counters:
            m.setdefault("counters", {}).update(counters)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    def counters(self) -> dict:
        return self.read_manifest().get("counters", {})

    def last_committed_cycle(self) -> int:
        return self.read_manifest()["last_cycle"]

    # -- data --------------------------------------------------------------
    def _dir(self, table: str, cycle: int) -> str:
        return os.path.join(self.base, table, f"cycle={cycle}")

    def write_snapshot(self, df: DataFrame, table: str, cycle: int) -> None:
        """Uncommitted write; becomes visible only after commit_cycle."""
        path = self._dir(table, cycle)
        if os.path.exists(path):  # replay after crash: idempotent overwrite
            shutil.rmtree(path)
        df.write.mode("overwrite").parquet(path)

    def read_snapshot(self, table: str, cycle: int | None = None) -> DataFrame:
        m = self.read_manifest()
        cycles = m["tables"].get(table, [])
        if cycle is not None:
            cycles = [c for c in cycles if c <= cycle]
        if not cycles:
            raise FileNotFoundError(f"no committed snapshot for {table}")
        return self.spark.read.parquet(self._dir(table, max(cycles)))

    def read_log(self, table: str, upto_cycle: int | None = None) -> DataFrame:
        m = self.read_manifest()
        cycles = sorted(m["tables"].get(table, []))
        if upto_cycle is not None:
            cycles = [c for c in cycles if c <= upto_cycle]
        if not cycles:
            raise FileNotFoundError(f"no committed data for {table}")
        df = self.spark.read.parquet(*[self._dir(table, c) for c in cycles])
        return df

    def compact_log(self, df: DataFrame, table: str, cycle: int) -> None:
        """Replace ALL committed segments of a log table with one compacted
        segment at ``cycle`` (maintenance path: seen-log expiry/compaction).
        The data is written to a fresh directory first and the manifest
        swap is the usual atomic rename — a crash mid-compaction leaves the
        old segments committed. Old directories are removed lazily AFTER
        the commit (orphans are harmless: reads go through the manifest).

        Iceberg mapping: REPLACE TABLE ... AS SELECT (or rewrite_data_files
        + expire_snapshots) — same read-through-metadata guarantee.
        """
        old_cycles = self.read_manifest()["tables"].get(table, [])
        # the compacted df usually READS the old segments — writing over an
        # existing segment would delete its input mid-scan
        assert cycle not in old_cycles, "compact to a fresh cycle number"
        self.write_snapshot(df, table, cycle)
        m = self.read_manifest()
        m["tables"][table] = [cycle]
        m["last_cycle"] = max(m["last_cycle"], cycle)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)  # atomic commit point
        for c in old_cycles:
            if c != cycle:
                shutil.rmtree(self._dir(table, c), ignore_errors=True)

    def destroy(self) -> None:
        shutil.rmtree(self.base, ignore_errors=True)


class IcebergTableIO:
    """Production backend of the same port over Apache Iceberg.

    NOT exercisable in this sandbox (no Iceberg runtime jar, no network to
    fetch one — SURVEY.md §7.4); the code documents the production mapping
    so deployment is a config change, not a redesign:

      * snapshot tables  -> ``df.writeTo(tbl).overwritePartitions()`` with a
        ``cycle`` partition column; read picks the latest committed cycle
      * log tables       -> ``df.writeTo(tbl).append()`` partitioned by
        ``cycle`` (partition pruning replaces the directory unions)
      * frontier/seen    -> ``PARTITIONED BY (bucket(N, url_hash))`` so the
        anti-join and the AMQ probe co-partition storage-side (SPJ can then
        eliminate the shuffle entirely)
      * manifest         -> Iceberg's own snapshot log; `counters` ride as
        snapshot summary properties; atomicity comes from the Iceberg commit
      * resume           -> read the last snapshot's summary instead of
        _manifest.json
    """

    def __init__(self, spark: SparkSession, catalog: str, db: str):
        self.spark = spark
        self.ns = f"{catalog}.{db}"
        try:
            spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.ns}")
        except Exception as e:  # pragma: no cover — sandbox has no Iceberg
            raise RuntimeError(
                "Iceberg runtime not available; use TableIO (parquet+manifest)"
            ) from e

    def write_snapshot(self, df: DataFrame, table: str, cycle: int) -> None:
        tbl = f"{self.ns}.{table}"
        df = df.withColumn("cycle", F.lit(cycle))
        if table in SNAPSHOT_TABLES:
            df.writeTo(tbl).overwritePartitions()
        else:
            df.writeTo(tbl).append()

    def read_snapshot(self, table: str, cycle: int | None = None) -> DataFrame:
        t = self.spark.table(f"{self.ns}.{table}")
        target = t.agg(F.max("cycle")).collect()[0][0] if cycle is None else cycle
        return t.filter(F.col("cycle") == target).drop("cycle")

    def read_log(self, table: str, upto_cycle: int | None = None) -> DataFrame:
        t = self.spark.table(f"{self.ns}.{table}")
        return t if upto_cycle is None else t.filter(F.col("cycle") <= upto_cycle)
