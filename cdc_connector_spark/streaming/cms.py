"""Streaming Count-Min-Sketch: a continuously-maintained heavy-hitter
monitor over a CDC/event stream.

CMS is LINEAR — sketch(A ∪ B) = sketch(A) + sketch(B) cell-by-cell — so
incremental maintenance is exact, not approximate-on-approximate: each
micro-batch's ``depth × width`` cell counts simply ADD into the persisted
counter table (``ops/sketch.py::cms_counters`` semantics, bit-identical
hashes). The state is the counter table itself: ≤ depth·width rows
FOREVER, regardless of stream volume or key cardinality — the property
that makes a heavy-hitter monitor viable where a per-key exact count
table (the ``StreamingGapMonitor``'s islands analogue) would grow with
distinct keys.

Exactly-once by the house marker-commit protocol: batch N's merged
counters write to their own directory, the marker lands last, a replayed
batch short-circuits on the marker; the previous snapshot is kept as the
crash cushion and older ones are pruned.

Estimates never under-count (cells only add), and because the hashes are
the portable salted md5 fold the persisted table is auditable by ANY
engine — the same property the batch entry value-verifies.

Candidate keys come from the CALLER (``estimate``) — the sketch stores no
keys by design; a production monitor probes it with a rolling candidate
set (e.g. this batch's keys, an allowlist, a complaint queue).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_connector_spark.ops.sketch import cms_counters, portable_hash60


class StreamingCMS:
    """foreachBatch applier maintaining the CMS counter table across
    micro-batches. See the module header for semantics."""

    def __init__(
        self,
        state_dir: str,
        key_col: str,
        depth: int = 4,
        width: int = 64,
    ) -> None:
        self.state_dir = state_dir
        self.key_col = key_col
        self.depth = depth
        self.width = width

    # -- commit bookkeeping --------------------------------------------------

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.state_dir, "_committed", str(batch_id))

    def committed_batch_ids(self) -> list[int]:
        d = os.path.join(self.state_dir, "_committed")
        if not os.path.isdir(d):
            return []
        return sorted(int(n) for n in os.listdir(d) if n.isdigit())

    def _counters_dir(self, batch_id: int) -> str:
        return os.path.join(self.state_dir, f"counters_batch={batch_id}")

    def _latest_counters(self, spark) -> DataFrame | None:
        done = self.committed_batch_ids()
        if not done:
            return None
        return spark.read.parquet(self._counters_dir(done[-1]))

    # -- the applier -----------------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return  # replayed batch — already committed
        spark = batch_df.sparkSession
        add = cms_counters(batch_df, self.key_col, self.depth, self.width)
        prev = self._latest_counters(spark)
        merged = (
            add.unionByName(prev).groupBy("row_idx", "pos").agg(
                F.sum("cnt").alias("cnt")
            )
            if prev is not None
            else add
        )
        merged.write.mode("overwrite").parquet(self._counters_dir(batch_id))
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        with open(self._marker(batch_id), "w") as fh:
            fh.write("")
        for old in self.committed_batch_ids():
            if old < batch_id - 1:
                shutil.rmtree(self._counters_dir(old), ignore_errors=True)

    # -- lifecycle ---------------------------------------------------------------

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
    ) -> StreamingQuery:
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # -- queries over the state ----------------------------------------------

    def counters(self, spark) -> DataFrame:
        out = self._latest_counters(spark)
        if out is None:
            raise ValueError(f"no committed batches under {self.state_dir}")
        return out

    def estimate(self, keys: DataFrame, key_col: str | None = None) -> DataFrame:
        """(key, est) for each candidate key — min over the sketch's rows,
        never an under-count. ``keys`` is the caller's candidate set
        (distinct'd here); the counter table broadcasts."""
        kc = key_col or self.key_col
        spark = keys.sparkSession
        cand = (
            keys.filter(F.col(kc).isNotNull())
            .select(F.col(kc).cast("string").alias("key"))
            .distinct()
        )
        probes = cand.select(
            "key",
            F.posexplode(
                F.array(
                    *[
                        F.pmod(
                            portable_hash60(F.col("key"), salt=str(i)),
                            F.lit(self.width),
                        )
                        for i in range(self.depth)
                    ]
                )
            ).alias("row_idx", "pos"),
        )
        # LEFT join: a probe position with no counter row is a ZERO cell
        # (an inner join would silently take the min over fewer rows and
        # over-report never-seen keys whose other positions collide)
        return (
            probes.join(F.broadcast(self.counters(spark)), ["row_idx", "pos"], "left")
            .groupBy("key")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        )
