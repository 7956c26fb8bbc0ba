"""Snapshot-versioned parquet tables — the sandbox stand-in for Iceberg.

Production design (SURVEY.md §1.3): Iceberg tables with hidden partitioning
(``months(discovered_at)`` for the monthly-index parity,
``bucket(N, host_salt)`` for the frontier), MERGE INTO for the idempotent
`_id`-style upsert, snapshots + time travel for backup/restore (S8) and
wave checkpointing. No Iceberg runtime ships in this sandbox, so this
module provides the same *semantics* over bare parquet:

- every write creates ``snapshots/v{N}`` + updates ``manifest.json``
  atomically (rename), so a killed job never corrupts the table;
- ``read(version=...)`` is time travel; ``latest_version`` is the resume
  point (test: kill between waves → relaunch → identical tables);
- ``merge_upsert`` = last-writer-wins by key via anti-join + union —
  exactly the ES ``_id`` overwrite semantics (reference
  playwrightcrawler.py:1628-1651).

The interface is deliberately the subset that maps 1:1 onto Iceberg calls
(``writeTo(...).append()``, ``MERGE INTO``, ``VERSION AS OF``) so swapping
the backend is a catalog change, not a rewrite.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    """kind='full': every snapshot is the whole table (frontier — the
    Iceberg copy-on-write analogue). kind='delta': every snapshot is an
    increment and read() unions them (crawled/metrics — the Iceberg
    fast-append analogue); append cost is O(wave), not O(table)."""

    def __init__(self, root: str, name: str, kind: str = "full",
                 partition_by: list[str] | None = None):
        self.dir = Path(root) / name
        self.name = name
        self.kind = kind
        # hive-style partition columns per snapshot — the bare-parquet
        # analogue of Iceberg's hidden months(ts) partitioning (S3:
        # reference monthly indices, playwrightcrawler.py:1458-1481);
        # Catalyst prunes partition directories on matching filters
        self.partition_by = partition_by or []
        self.dir.mkdir(parents=True, exist_ok=True)

    # -- manifest -----------------------------------------------------------
    @property
    def _manifest_path(self) -> Path:
        return self.dir / "manifest.json"

    def _read_manifest(self) -> dict:
        if not self._manifest_path.exists():
            return {"versions": []}
        return json.loads(self._manifest_path.read_text())

    def _commit(self, version: int, meta: dict | None = None) -> None:
        m = self._read_manifest()
        m["versions"].append(
            {"version": version, "committed_at": time.time(), **(meta or {})}
        )
        tmp = self._manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(m, indent=1))
        os.replace(tmp, self._manifest_path)  # atomic commit point

    @property
    def latest_version(self) -> int | None:
        v = self._read_manifest()["versions"]
        return v[-1]["version"] if v else None

    def versions(self) -> list[dict]:
        return self._read_manifest()["versions"]

    def exists(self) -> bool:
        return self.latest_version is not None

    def _snap_dir(self, version: int) -> str:
        return str(self.dir / "snapshots" / f"v{version:06d}")

    # -- IO -------------------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = self.latest_version if version is None else version
        if v is None:
            raise FileNotFoundError(f"table {self.name} has no snapshots")
        if self.kind == "delta":
            dirs = [self._snap_dir(e["version"]) for e in self.versions()
                    if e["version"] <= v]
            if not self.partition_by:
                return spark.read.parquet(*dirs)
            # partitioned snapshots: discovery must run per snapshot root
            # (multi-root reads raise CONFLICTING_DIRECTORY_STRUCTURES);
            # Iceberg replaces this with manifest-based planning
            out = spark.read.parquet(dirs[0])
            for d in dirs[1:]:
                out = out.unionByName(spark.read.parquet(d))
            return out
        return spark.read.parquet(self._snap_dir(v))

    def write(self, df: DataFrame, meta: dict | None = None) -> int:
        """Full-table snapshot write (Iceberg: overwritePartitions)."""
        v = (self.latest_version or 0) + 1
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self._snap_dir(v))
        self._commit(v, meta)
        return v

    def append(self, spark: SparkSession, df: DataFrame, meta: dict | None = None) -> int:
        """delta tables: write just the increment. full tables: previous
        snapshot ∪ new rows (old snapshots stay immutable either way)."""
        if self.kind != "delta" and self.exists():
            df = self.read(spark).unionByName(df, allowMissingColumns=True)
        return self.write(df, meta)

    def merge_upsert(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key: str,
        meta: dict | None = None,
    ) -> int:
        """MERGE INTO … WHEN MATCHED UPDATE / NOT MATCHED INSERT with
        last-writer-wins — the `_id` overwrite semantics of save_batch."""
        updates = updates.dropDuplicates([key])
        if self.exists():
            current = self.read(spark)
            kept = current.join(updates.select(key), on=key, how="left_anti")
            merged = kept.unionByName(updates, allowMissingColumns=True)
        else:
            merged = updates
        return self.write(merged, meta)

    def write_rows(self, rows: list[dict], schema, meta: dict | None = None) -> int:
        """Driver-local write for tiny frames: straight pyarrow parquet, no
        Spark job. ``schema`` is a pyarrow schema. For delta tables the rows
        are an increment; for full tables they ARE the new snapshot (used by
        the 64-row bloom sidecar)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        v = (self.latest_version or 0) + 1
        d = Path(self._snap_dir(v))
        d.mkdir(parents=True, exist_ok=True)
        cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
        pq.write_table(pa.table(cols, schema=schema), d / "part-00000.parquet")
        self._commit(v, meta)
        return v

    def truncate(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)
        self.dir.mkdir(parents=True, exist_ok=True)


class MorTable(SnapshotTable):
    """Merge-on-read keyed table — the Iceberg MoR analogue for the
    frontier. A wave commit writes ONLY the increments (O(wave), never
    O(table)):

    - ``inserts``: brand-new rows (full schema);
    - ``flips``: ``(key, wave)`` visited-marks for rows selected this wave.

    ``read()`` reconstructs current state WITHOUT shuffling the big side:
    (base ∪ insert-deltas) LEFT JOIN broadcast(flips aggregated by key) —
    the flip set is bounded by total-crawled, orders of magnitude below the
    frontier (on real Iceberg this is positional-delete merge-on-read, no
    join at all). ``compact()`` folds everything into a fresh base every K
    waves so the delta list stays bounded; old snapshots remain immutable
    (time travel / resume read any committed version)."""

    FLIP_COLS = ("url_hash", "wave")

    # above this many accumulated flip rows, read() merges flips with a
    # shuffle join instead of a broadcast — a broadcast that grows with
    # crawled-since-base would eventually exceed any driver/executor
    # memory budget (round-2 verdict; real Iceberg sidesteps this with
    # positional deletes). Tests/engines may override per instance.
    FLIP_BROADCAST_ROWS = 5_000_000

    def __init__(self, root: str, name: str):
        super().__init__(root, name, kind="mor")

    def _is_base(self, entry: dict) -> bool:
        return bool(entry.get("base"))

    # -- commits --------------------------------------------------------------
    def write(self, df: DataFrame, meta: dict | None = None) -> int:
        """Full base snapshot (bootstrap / compaction)."""
        v = (self.latest_version or 0) + 1
        df.write.mode("overwrite").parquet(self._snap_dir(v))
        self._commit(v, {**(meta or {}), "base": True})
        return v

    def commit_wave(
        self,
        inserts: DataFrame | None,
        flips: DataFrame | None,
        meta: dict | None = None,
    ) -> int:
        """One atomic O(wave) commit: write increment files, then the
        manifest rename publishes both (a kill mid-write leaves an
        unreferenced directory, never a corrupt table)."""
        v = (self.latest_version or 0) + 1
        d = self._snap_dir(v)
        if inserts is not None:
            inserts.write.mode("overwrite").parquet(f"{d}/inserts")
        if flips is not None:
            flips.select(*self.FLIP_COLS).write.mode("overwrite").parquet(f"{d}/flips")
        self._commit(v, {**(meta or {}), "base": False})
        return v

    def append(self, spark: SparkSession, df: DataFrame, meta: dict | None = None) -> int:
        """Insert-only increment (seed ingestion)."""
        return self.commit_wave(inserts=df, flips=None, meta=meta)

    # -- reconstruction ---------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = self.latest_version if version is None else version
        if v is None:
            raise FileNotFoundError(f"table {self.name} has no snapshots")
        entries = [e for e in self.versions() if e["version"] <= v]
        base_vs = [e["version"] for e in entries if self._is_base(e)]
        if not base_vs:
            raise FileNotFoundError(f"table {self.name} has no base snapshot <= v{v}")
        base_v = max(base_vs)
        delta_vs = [e["version"] for e in entries if e["version"] > base_v]

        rows = spark.read.parquet(self._snap_dir(base_v))
        insert_dirs, flip_dirs = [], []
        for dv in delta_vs:
            d = Path(self._snap_dir(dv))
            if (d / "inserts").exists():
                insert_dirs.append(str(d / "inserts"))
            if (d / "flips").exists():
                flip_dirs.append(str(d / "flips"))
        if insert_dirs:
            rows = rows.unionByName(spark.read.parquet(*insert_dirs))
        if flip_dirs:
            flips = (
                spark.read.parquet(*flip_dirs)
                .groupBy("url_hash")
                .agg(F.max("wave").alias("_flip_wave"))
            )
            # broadcast only while the accumulated flip set is small;
            # beyond the threshold fall back to a shuffle join (the flip
            # set is still orders of magnitude below the frontier, and
            # compaction triggered on flip volume keeps this path rare)
            if self.flip_rows_since_base(upto=v) <= self.FLIP_BROADCAST_ROWS:
                flips = F.broadcast(flips)
            rows = (
                rows.join(flips, on="url_hash", how="left")
                .withColumn(
                    "visited",
                    F.when(F.col("_flip_wave").isNotNull(), True).otherwise(F.col("visited")),
                )
                .withColumn(
                    "wave",
                    F.when(F.col("_flip_wave").isNotNull(), F.col("_flip_wave").cast("int"))
                    .otherwise(F.col("wave")),
                )
                .drop("_flip_wave")
            )
        return rows

    def read_keys(self, spark: SparkSession, cols: tuple[str, ...] = ("url_hash",),
                  version: int | None = None) -> DataFrame:
        """The table's KEY SET (url_hash ∪ …) without the merge-on-read flip
        join. Flip deltas only mark existing keys visited — they never add or
        remove keys — so the seen-set consumers (anti-join, Bloom build) can
        read base ∪ insert-deltas directly: a plain multi-dir parquet scan
        with column pruning, no flip aggregation and no broadcast build per
        use. At 10^10 rows that removes one whole join from every wave's
        dedup path (on Iceberg: a data-file scan that skips the positional
        delete merge)."""
        v = self.latest_version if version is None else version
        if v is None:
            raise FileNotFoundError(f"table {self.name} has no snapshots")
        entries = [e for e in self.versions() if e["version"] <= v]
        base_vs = [e["version"] for e in entries if self._is_base(e)]
        if not base_vs:
            raise FileNotFoundError(f"table {self.name} has no base snapshot <= v{v}")
        base_v = max(base_vs)
        dirs = [self._snap_dir(base_v)]
        for e in entries:
            if e["version"] > base_v:
                d = Path(self._snap_dir(e["version"])) / "inserts"
                if d.exists():
                    dirs.append(str(d))
        return spark.read.parquet(*dirs).select(*cols)

    def deltas_since_base(self) -> int:
        entries = self.versions()
        base_vs = [e["version"] for e in entries if self._is_base(e)]
        if not base_vs:
            return len(entries)
        return len([e for e in entries if e["version"] > max(base_vs)])

    def flip_rows_since_base(self, upto: int | None = None) -> int:
        """Cumulative flip rows in deltas after the last base — the size of
        the merge-on-read join side. Counted from parquet footers (driver-
        side metadata reads, no Spark job), so it is exact regardless of
        who committed the flips."""
        import pyarrow.parquet as pq

        entries = [e for e in self.versions()
                   if upto is None or e["version"] <= upto]
        base_vs = [e["version"] for e in entries if self._is_base(e)]
        base_v = max(base_vs) if base_vs else -1
        total = 0
        for e in entries:
            if e["version"] <= base_v:
                continue
            d = Path(self._snap_dir(e["version"])) / "flips"
            if d.exists():
                total += sum(
                    pq.ParquetFile(p).metadata.num_rows
                    for p in d.glob("*.parquet")
                )
        return total

    def compact(self, spark: SparkSession, meta: dict | None = None) -> int:
        """Fold base+deltas into a new base (Iceberg rewrite_data_files)."""
        return self.write(self.read(spark), {**(meta or {}), "op": "compact"})


class Lakehouse:
    """The engine's table set rooted at one directory (FIXTURES.md A3-A6)."""

    TABLES = ("frontier", "crawled", "wave_metrics", "robots_rules", "seen_bloom")
    _KINDS = {"crawled": "delta", "wave_metrics": "delta"}

    # crawled rows route into month partitions (S3 monthly-index parity)
    _PARTITIONS = {"crawled": ["month"]}

    def __init__(self, root: str):
        self.root = root
        for t in self.TABLES:
            if t == "frontier":
                setattr(self, t, MorTable(root, t))
            else:
                setattr(self, t, SnapshotTable(
                    root, t, kind=self._KINDS.get(t, "full"),
                    partition_by=self._PARTITIONS.get(t),
                ))

    def describe(self) -> dict:
        return {
            t: getattr(self, t).latest_version for t in self.TABLES
        }


def with_host_salt(df: DataFrame, host_col: str = "host", buckets: int = 64) -> DataFrame:
    """Skew salt: stable bucket of the host hash (north_rule). Used as the
    frontier's physical partitioning key so one mega-domain spreads over
    many tasks for *hashing* work while politeness still aggregates on the
    raw host column."""
    return df.withColumn("host_salt", (F.pmod(F.xxhash64(F.col(host_col)), F.lit(buckets))).cast("int"))
