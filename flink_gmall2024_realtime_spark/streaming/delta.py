"""Delta-format append sink — exactly-once streaming commits into a real
``_delta_log`` table, the WRITE side of ``operators/deltalog.py``.

Each micro-batch becomes one Delta commit: the batch's rows land in a
parquet data file named deterministically by batch id, then the commit
is published by creating ``_delta_log/{version:020d}.json`` with
``O_CREAT | O_EXCL`` — the putIfAbsent primitive the actual Delta
protocol commits through. That gives the three guarantees the
versioned keyed store (``streaming/versioned.py``) documents, but in an
OPEN format any Delta reader can consume:

- **exactly-once under at-least-once replay**: every commit carries a
  ``commitInfo`` with the producing ``batchId``; a replayed batch whose
  id is already committed is skipped before any write. A crash after
  the data file but before the commit leaves an unreferenced parquet
  file (vacuum fodder, exactly like real Delta) and the replay rewrites
  it byte-deterministically.
- **optimistic concurrency, append-only**: losing the O_EXCL race means
  another writer committed that version first. Blind appends never
  conflict semantically (Delta's OCC rule for AddFile-only commits), so
  the loser re-reads the head and retries at the next version — bounded
  attempts, then a loud ``ConcurrentWriteError``.
- **time travel**: version 0 carries ``protocol`` + ``metaData``
  (schemaString derived from the batch schema); snapshots at any
  version replay through ``read_delta_snapshot_dir`` or any Delta
  reader.

Executor note: rows move via Arrow (``toArrow``) into one pyarrow
parquet file per commit — the dim/serving-table shape this sink exists
for (the big-fact path stays in partitioned parquet sinks); at 100 TB
the same protocol holds with a distributed write + one AddFile per
task file.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from .versioned import ConcurrentWriteError

_SPARK_TO_DELTA = {
    "long": "long",
    "integer": "integer",
    "short": "short",
    "byte": "byte",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "binary": "binary",
}


def _schema_string(df: DataFrame) -> str:
    fields = []
    for f in df.schema.fields:
        t = f.dataType.typeName()
        if t not in _SPARK_TO_DELTA:
            raise NotImplementedError(
                f"delta append sink: unsupported column type {t!r} "
                f"(field {f.name!r})"
            )
        fields.append(
            {
                "name": f.name,
                "type": _SPARK_TO_DELTA[t],
                "nullable": bool(f.nullable),
                "metadata": {},
            }
        )
    return json.dumps({"type": "struct", "fields": fields})


class DeltaAppendSink:
    """Append-only Delta table writer for ``foreachBatch``."""

    def __init__(self, path: str, max_commit_attempts: int = 20) -> None:
        self.path = path
        self.max_commit_attempts = max_commit_attempts
        os.makedirs(os.path.join(path, "_delta_log"), exist_ok=True)
        # incremental batch-id scan state: versions < _scanned_upto are
        # already folded into _known_batch_ids (commit files are
        # immutable once published, so the cache never invalidates)
        self._scanned_upto = 0
        self._known_batch_ids: set[int] = set()

    # ------------------------------------------------------------- log

    def _commit_path(self, version: int) -> str:
        return os.path.join(self.path, "_delta_log", f"{version:020d}.json")

    def committed_versions(self) -> list[int]:
        logdir = os.path.join(self.path, "_delta_log")
        return sorted(
            int(fn[: -len(".json")])
            for fn in os.listdir(logdir)
            if fn.endswith(".json")
        )

    def _committed_batch_ids(self) -> set[int]:
        # only parse commit files newer than the last scan — O(new) per
        # micro-batch instead of O(all history) (ADVICE r11)
        for v in self.committed_versions():
            if v < self._scanned_upto:
                continue
            with open(self._commit_path(v), "rb") as f:
                for line in f.read().splitlines():
                    action = json.loads(line)
                    if "commitInfo" in action:
                        bid = action["commitInfo"].get("batchId")
                        if bid is not None:
                            self._known_batch_ids.add(bid)
            self._scanned_upto = v + 1
        return self._known_batch_ids

    def _publish(self, version: int, body: bytes) -> bool:
        """Atomically publish one complete commit file; False when the
        version was claimed first by a concurrent writer.

        The body is written (and fsynced) to a hidden temp file, then
        linked into place with ``os.link`` — the same fail-if-exists
        putIfAbsent semantics as O_EXCL, but the commit file is complete
        the instant it becomes visible, so a concurrent reader can never
        observe an empty/partial commit and a crash mid-write leaves
        only an invisible temp file (ADVICE r11)."""
        logdir = os.path.join(self.path, "_delta_log")
        tmp = os.path.join(logdir, f".{version:020d}.{os.getpid()}.json.tmp")
        fd = os.open(tmp, os.O_CREAT | os.O_WRONLY | os.O_TRUNC)
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(body)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, self._commit_path(version))
            except FileExistsError:
                return False
            dirfd = os.open(logdir, os.O_RDONLY)
            try:
                os.fsync(dirfd)
            finally:
                os.close(dirfd)
            return True
        finally:
            os.unlink(tmp)

    # ----------------------------------------------------------- write

    def commit_batch(self, batch: DataFrame, batch_id: int) -> int | None:
        """Write one micro-batch as one Delta commit; returns the
        committed version, or None when this batch id already committed
        (at-least-once replay)."""
        import pyarrow.parquet as pq

        if batch_id in self._committed_batch_ids():
            return None
        rel = f"part-b{batch_id:010d}.parquet"
        full = os.path.join(self.path, rel)
        table = batch.toArrow()
        # deterministic rewrite on replay-after-crash: same rows, same file
        pq.write_table(table, full, compression="snappy")
        n_rows = table.num_rows
        add = json.dumps(
            {
                "add": {
                    "path": rel,
                    "size": os.path.getsize(full),
                    "partitionValues": {},
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": json.dumps({"numRecords": n_rows}),
                }
            }
        )
        info = json.dumps(
            {"commitInfo": {"operation": "STREAMING UPDATE", "batchId": batch_id}}
        )
        for _ in range(self.max_commit_attempts):
            versions = self.committed_versions()
            next_v = (versions[-1] + 1) if versions else 0
            lines = [info]
            if next_v == 0:
                lines.append(
                    json.dumps(
                        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
                    )
                )
                lines.append(
                    json.dumps(
                        {
                            "metaData": {
                                "id": "delta-append-sink",
                                "format": {"provider": "parquet", "options": {}},
                                "schemaString": _schema_string(batch),
                                "partitionColumns": [],
                                "configuration": {},
                            }
                        }
                    )
                )
            lines.append(add)
            body = ("\n".join(lines) + "\n").encode()
            if not self._publish(next_v, body):
                # lost the race: maybe OUR earlier attempt actually landed
                if batch_id in self._committed_batch_ids():
                    return None
                continue  # append-only commits never conflict; retry above
            return next_v
        raise ConcurrentWriteError(
            f"could not claim a delta version for batch {batch_id} in "
            f"{self.max_commit_attempts} attempts"
        )

    def sink(self):
        """``foreachBatch`` adapter."""

        def write(batch: DataFrame, batch_id: int) -> None:
            self.commit_batch(batch, batch_id)

        return write

    # ------------------------------------------------------------ read

    def snapshot(self, version: int | None = None) -> dict:
        from ..operators.deltalog import read_delta_snapshot_dir

        return read_delta_snapshot_dir(self.path, version)
