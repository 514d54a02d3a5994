"""Incremental change-feed consumption: a durable cursor over
``TxLogMergeSink.table_changes``.

The txlog CDF (txlog.py) answers "what changed between versions A and B";
this module turns that into the downstream-consumer loop the reference's
sink subscribers run against Kafka (consume → process → commit offset):
``poll()`` hands the consumer every change it has not yet acknowledged,
``commit()`` advances the cursor atomically. Crash anywhere before
``commit`` and the next ``poll`` redelivers the same range — at-least-once
delivery, made effectively exactly-once by idempotent consumers (the same
contract the changelog apply path already holds, ST1).

The cursor is one tiny JSON file on shared storage (atomic rename), so a
consumer restart costs a single file read — no log scan, no Spark state.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from cdc_connector_spark.changelog.txlog import TxLogMergeSink


class CdfConsumer:
    """One named consumer's position in a txlog table's change feed.

    Usage::

        c = CdfConsumer(sink, cursor_dir, name="search-indexer")
        batch = c.poll()
        if batch is not None:
            changes, upto = batch
            ...  # process `changes` (idempotently)
            c.commit(upto)

    Multiple consumers track independent cursors by ``name``; the table's
    vacuum retention window bounds how far behind a consumer may fall
    before its next poll can no longer be served (same rule as Delta CDF).
    """

    def __init__(self, sink: TxLogMergeSink, cursor_dir: str, name: str = "default"):
        self.sink = sink
        self.cursor_file = os.path.join(cursor_dir, f"{name}.json")
        os.makedirs(cursor_dir, exist_ok=True)

    def position(self) -> int:
        """Last ACKNOWLEDGED version (-1 = nothing consumed yet)."""
        try:
            with open(self.cursor_file) as fh:
                return json.load(fh)["version"]
        except FileNotFoundError:
            return -1

    def poll(self) -> tuple[DataFrame, int] | None:
        """Unacknowledged changes as ``(changes, to_version)``, or None when
        caught up. The returned frame is ``table_changes(pos+1, current)``;
        the consumer MUST ``commit(to_version)`` only after its processing
        is durable."""
        pos = self.position()
        current = self.sink.current_version()
        if current is None or current <= pos:
            return None
        changes = self.sink.table_changes(pos + 1, current)
        if changes is None:
            # only logical no-ops in the range (compaction/DDL): auto-ack so
            # the cursor does not poll them forever
            self.commit(current)
            return None
        return changes, current

    def commit(self, version: int) -> None:
        """Atomically advance the cursor (monotonic: going backwards is a
        consumer bug and raises)."""
        pos = self.position()
        if version < pos:
            raise ValueError(f"cursor moved backwards: {pos} -> {version}")
        tmp = f"{self.cursor_file}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({"version": version}, fh)
        os.replace(tmp, self.cursor_file)

    def process(self, fn) -> int:
        """Poll-process-commit convenience: run ``fn(changes, to_version)``
        on the pending range (if any) and commit on success. Returns the
        number of ranges processed (0 or 1)."""
        batch = self.poll()
        if batch is None:
            return 0
        changes, upto = batch
        fn(changes, upto)
        self.commit(upto)
        return 1
