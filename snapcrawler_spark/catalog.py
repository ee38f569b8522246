"""Iceberg-semantics snapshot catalog over Parquet.

The sandbox has no Iceberg runtime JAR, so this implements the subset
of Iceberg semantics the crawl needs — atomic snapshot commits,
``VERSION AS OF``-style reads, and per-snapshot lineage counters — as
Parquet directories plus a JSON manifest updated by atomic rename
(POSIX rename is the commit point, the same trick Iceberg's
HadoopTableOperations uses for file:// catalogs).

Swap-in for real Iceberg: replace SnapshotTable.append/overwrite with
``df.writeTo("catalog.db.t").append()`` and read_version with
``spark.read.option("snapshot-id", ...)`` — the engine only touches
this API surface (see README).

Layout:
    <root>/<table>/manifest.json         ← list of committed snapshots
    <root>/<table>/v00042/               ← one parquet dir per snapshot
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.dir = os.path.join(root, name)
        self.name = name
        os.makedirs(self.dir, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    def _read_manifest(self) -> list[dict]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return json.load(f)["snapshots"]

    def _commit(self, snapshots: list[dict]) -> None:
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"snapshots": snapshots}, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    # ------------------------------------------------------------------
    def versions(self) -> list[int]:
        return [s["version"] for s in self._read_manifest()]

    def latest_version(self) -> int | None:
        v = self.versions()
        return v[-1] if v else None

    def counters(self, version: int | None = None) -> dict:
        snaps = self._read_manifest()
        if not snaps:
            return {}
        if version is None:
            return snaps[-1].get("counters", {})
        for s in snaps:
            if s["version"] == version:
                return s.get("counters", {})
        raise KeyError(f"{self.name}: no snapshot v{version}")

    def append(
        self, df: DataFrame, counters: dict | None = None, wave: int | None = None
    ) -> int:
        """Commit a new snapshot = previous data + df (Iceberg append)."""
        snaps = self._read_manifest()
        version = (snaps[-1]["version"] + 1) if snaps else 0
        path = os.path.join(self.dir, f"v{version:05d}")
        staging = path + f".staging.{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(staging)
        os.replace(staging, path)
        dirs = (snaps[-1]["dirs"] if snaps else []) + [f"v{version:05d}"]
        snaps.append(
            {
                "version": version,
                "wave": wave,
                "dirs": dirs,
                "counters": counters or {},
            }
        )
        self._commit(snaps)
        return version

    def overwrite(
        self, df: DataFrame, counters: dict | None = None, wave: int | None = None
    ) -> int:
        """Commit a new snapshot that replaces the table contents."""
        snaps = self._read_manifest()
        version = (snaps[-1]["version"] + 1) if snaps else 0
        path = os.path.join(self.dir, f"v{version:05d}")
        staging = path + f".staging.{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(staging)
        os.replace(staging, path)
        snaps.append(
            {
                "version": version,
                "wave": wave,
                "dirs": [f"v{version:05d}"],
                "counters": counters or {},
            }
        )
        self._commit(snaps)
        return version

    def read(self, version: int | None = None) -> DataFrame:
        """Read the table contents as of a committed snapshot
        (``VERSION AS OF``); default latest."""
        snaps = self._read_manifest()
        if not snaps:
            raise FileNotFoundError(f"{self.name}: no committed snapshots")
        snap = snaps[-1]
        if version is not None:
            snap = next(s for s in snaps if s["version"] == version)
        paths = [os.path.join(self.dir, d) for d in snap["dirs"]]
        return self.spark.read.parquet(*paths)

    def truncate(self) -> None:
        if os.path.exists(self.dir):
            shutil.rmtree(self.dir)
        os.makedirs(self.dir, exist_ok=True)


class SnapshotCatalog:
    """A directory of SnapshotTables + a catalog-level wave cursor so a
    crashed crawl resumes from the last *fully committed* wave."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable(self.spark, self.root, name)

    @property
    def _cursor_path(self) -> str:
        return os.path.join(self.root, "wave_cursor.json")

    def committed_wave(self) -> int | None:
        if not os.path.exists(self._cursor_path):
            return None
        with open(self._cursor_path) as f:
            return json.load(f)["wave"]

    def commit_wave(self, wave: int, meta: dict | None = None) -> None:
        tmp = self._cursor_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"wave": wave, **(meta or {})}, f)
        os.replace(tmp, self._cursor_path)
