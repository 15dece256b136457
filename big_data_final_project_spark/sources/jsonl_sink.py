"""JSON-lines audit SINK as a real Spark writer (Spark 4 Python
DataSource API) — the write-side twin of ``weather_datasource``'s
reader, completing the custom-source story: this engine can both
ingest from and emit to formats Spark doesn't ship.

Registers a ``jsonl_audit`` format whose writes run ON EXECUTORS with
the standard two-phase commit protocol: each task writes a
``part-<task>-<uuid>.jsonl.tmp`` file and returns a commit message;
``commit()`` (driver, after ALL tasks succeeded) renames every temp to
its final name and stamps ``_SUCCESS``; ``abort()`` removes temps, so
a failed job leaves no visible output. Readers that respect
``_SUCCESS`` (or just glob ``part-*.jsonl``) never observe partial
jobs — the same atomicity contract as Spark's built-in file sinks.

Assumes the path is shared storage (POSIX/DFS) visible to driver and
executors, like every file-based sink.

    spark.dataSource.register(JsonlAuditDataSource)
    df.write.format("jsonl_audit").option("path", d).mode("append").save()
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _TaskFile(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class JsonlAuditWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool = False):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        """Executor-side: stream the partition's rows to ONE temp
        file (constant memory), return its commit message."""
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl.tmp")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str, sort_keys=True))
                fh.write("\n")
                n += 1
        return _TaskFile(tmp_path=tmp, n_rows=n)

    def commit(self, messages):
        """Driver-side, all tasks green: publish atomically-per-file
        (rename) and stamp _SUCCESS with the committed row count.

        The PREVIOUS job's _SUCCESS is removed FIRST (ADVICE r7: left
        in place, a stale stamp stays visible through the commit
        window — and permanently after a crash mid-commit — over a
        partial new part set), so _SUCCESS-respecting readers treat
        the directory as uncommitted from the moment publication
        starts until the new stamp lands, and never see a partial
        job. mode("overwrite") then RETIRES every pre-existing
        part-*.jsonl to a ``.old`` suffix and deletes the retirees
        only after all renames and the _SUCCESS stamp succeeded, so
        no byte of old output is destroyed until the new output is
        fully published — a crash anywhere in the commit phase leaves
        the old parts recoverable on disk (as ``*.jsonl.old``) and a
        rerun converges (rename overwrites any same-named ``.old``;
        leftover retirees are swept after the next successful stamp).
        The remaining non-atomicity is VISIBILITY only: a reader that
        globs ``part-*.jsonl`` without honoring _SUCCESS can observe
        an in-flight commit as empty-then-filling. Orphaned
        ``*.jsonl.tmp`` from crashed earlier jobs are swept here too
        (pre-publish — temps were never visible output)."""
        # Zero-partition writes run no task, so only commit() can
        # create the directory (ADVICE r6) — without this, listdir and
        # the _SUCCESS write below raise FileNotFoundError.
        os.makedirs(self.path, exist_ok=True)
        # Invalidate the previous job's stamp BEFORE any part becomes
        # visible or retired: stamp present <=> last job fully
        # published (both append and overwrite).
        try:
            os.remove(os.path.join(self.path, "_SUCCESS"))
        except FileNotFoundError:
            pass
        fresh_tmp = {m.tmp_path for m in messages}
        fresh = {p[: -len(".tmp")] for p in fresh_tmp}
        if self.overwrite:
            for name in os.listdir(self.path):
                full = os.path.join(self.path, name)
                if not name.startswith("part-"):
                    continue
                if name.endswith(".jsonl") and full not in fresh:
                    os.rename(full, full + ".old")
                elif name.endswith(".jsonl.tmp") and full not in fresh_tmp:
                    os.remove(full)
        total = 0
        for m in messages:
            os.rename(m.tmp_path, m.tmp_path[: -len(".tmp")])
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(str(total))
        if self.overwrite:
            # New output fully published and stamped: this run's
            # retirees (plus any .old a crashed commit left behind)
            # can now go.
            for name in os.listdir(self.path):
                if name.startswith("part-") and name.endswith(".old"):
                    os.remove(os.path.join(self.path, name))

    def abort(self, messages):
        """Any task failed: remove temps; nothing was published."""
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


class JsonlAuditDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema, overwrite: bool) -> JsonlAuditWriter:
        return JsonlAuditWriter(self.options, overwrite=overwrite)


def register(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(JsonlAuditDataSource)
