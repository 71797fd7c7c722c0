"""Snapshot layer: Iceberg-semantics table versioning over plain
parquet, for environments without the Iceberg runtime jar (this
sandbox). Implements the subset the engine's resume/time-travel story
needs — append/overwrite commits as immutable snapshots, a current
pointer, read-at-snapshot (time travel) and rollback — with the same
commit discipline Iceberg uses: data files are written first, the
manifest next, and the table becomes visible only when the tiny
current-pointer file is atomically replaced (os.replace), so readers
never observe a half-written snapshot.

When the Iceberg jar IS present (session.ICEBERG_JAR_ENV), use the
real catalog instead — `df.writeTo(...)` / `VERSION AS OF`; this module
is the behavior-compatible fallback, and its tests document the
contract either backend must satisfy.

No wall-clock anywhere: snapshot ids are a monotone counter, so runs
are reproducible bit-for-bit.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    """Versioned parquet table rooted at `root`.

    Layout:
        root/snap-<id>/data/*.parquet   immutable data of commit <id>
        root/snap-<id>/manifest.json    {id, parent, op, data_dirs}
        root/_current                   the committed snapshot id
    An `append` snapshot's data_dirs = parent's data_dirs + its own;
    an `overwrite` snapshot's = its own only. Reading a snapshot is a
    union scan over its data_dirs — exactly Iceberg's manifest-list
    model flattened to one level.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- pointer ------------------------------------------------------------

    def current_id(self) -> int | None:
        p = os.path.join(self.root, "_current")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def _set_current(self, snap_id: int) -> None:
        tmp = os.path.join(self.root, "_current.tmp")
        with open(tmp, "w") as f:
            f.write(str(snap_id))
        os.replace(tmp, os.path.join(self.root, "_current"))  # atomic

    def _manifest(self, snap_id: int) -> dict:
        with open(os.path.join(self.root, f"snap-{snap_id}", "manifest.json")) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        """All committed snapshots' manifests, oldest first (history —
        including ones orphaned by a rollback, which stay readable)."""
        out = []
        i = 0
        while True:
            d = os.path.join(self.root, f"snap-{i}", "manifest.json")
            if not os.path.exists(d):
                break
            with open(d) as f:
                out.append(json.load(f))
            i += 1
        return out

    # -- commits ------------------------------------------------------------

    def _next_id(self) -> int:
        i = 0
        while os.path.exists(os.path.join(self.root, f"snap-{i}")):
            i += 1
        return i

    def _commit(
        self, df: DataFrame, op: str, properties: dict | None = None
    ) -> int:
        snap_id = self._next_id()
        snap_dir = os.path.join(self.root, f"snap-{snap_id}")
        data_dir = os.path.join(snap_dir, "data")
        df.write.mode("overwrite").parquet(data_dir)  # 1. data files

        parent = self.current_id()
        if op == "append" and parent is not None:
            dirs = self._manifest(parent)["data_dirs"] + [data_dir]
        else:
            dirs = [data_dir]
        # table properties carry forward commit-over-commit (Iceberg
        # table-properties semantics); a commit's `properties` dict
        # overlays the parent's
        props = dict(self._manifest(parent).get("properties") or {}) \
            if parent is not None else {}
        props.update(properties or {})
        manifest = {
            "id": snap_id,
            "parent": parent,
            "op": op,
            "data_dirs": dirs,
            "properties": props,
        }
        with open(os.path.join(snap_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f)                     # 2. manifest
        self._set_current(snap_id)                     # 3. atomic publish
        return snap_id

    def append(self, df: DataFrame, properties: dict | None = None) -> int:
        return self._commit(df, "append", properties)

    def overwrite(self, df: DataFrame, properties: dict | None = None) -> int:
        return self._commit(df, "overwrite", properties)

    def properties(self, snapshot_id: int | None = None) -> dict:
        """Table properties at a snapshot (current by default)."""
        snap = self.current_id() if snapshot_id is None else snapshot_id
        if snap is None:
            return {}
        return self._manifest(snap).get("properties") or {}

    # -- reads --------------------------------------------------------------

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """Current table state, or time-travel to `snapshot_id`
        (Iceberg `VERSION AS OF`)."""
        snap = self.current_id() if snapshot_id is None else snapshot_id
        if snap is None:
            raise ValueError(f"empty snapshot table at {self.root}")
        dirs = self._manifest(snap)["data_dirs"]
        return self.spark.read.parquet(*dirs)

    def rollback(self, snapshot_id: int) -> None:
        """Point the table back at an ancestor snapshot. Later
        snapshots' files stay on disk (still time-travel-readable) —
        Iceberg rollback semantics."""
        self._manifest(snapshot_id)  # must exist
        self._set_current(snapshot_id)
