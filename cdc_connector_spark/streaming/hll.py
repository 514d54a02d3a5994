"""Streaming HyperLogLog distinct-count monitor — the third leg of the
bounded-state monitoring triad (``StreamingCMS`` = frequencies,
``StreamingKMV`` = distincts + set overlap, this = distincts at a
memory point KMV can't reach: 2^p registers ≈ 256 rows per group vs
k=64-1024 hash rows, with relative error ~1.04/sqrt(2^p) independent
of cardinality).

HLL registers are MAX-mergeable — regs(A ∪ B) is the per-(grp, bucket)
MAX of regs(A) and regs(B) — so each micro-batch's register table
merges into the persisted state exactly (``ops/sketch.py::hll_merge``);
after any number of batches the state equals the one-shot sketch
register-for-register (pinned by ``tests/test_streaming_hll.py``).

State is |groups| × 2^p rows FOREVER. Exactly-once by the house
marker-commit protocol (see ``StreamingCMS``). Hashes are the portable
60-bit md5 fold, so the persisted registers — and estimates — audit in
any engine (``hll_stream_merge_orders`` value-verifies the batch merge
chain against DuckDB).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from cdc_connector_spark.ops.sketch import hll_estimate, hll_merge, hll_registers


class StreamingHLL:
    """foreachBatch applier maintaining the per-group HLL register table
    across micro-batches. See the module header for semantics."""

    def __init__(
        self,
        state_dir: str,
        key_col: str,
        group_col: str,
        p: int = 8,
    ) -> None:
        self.state_dir = state_dir
        self.key_col = key_col
        self.group_col = group_col
        self.p = p

    # -- commit bookkeeping ---------------------------------------------------

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.state_dir, "_committed", str(batch_id))

    def committed_batch_ids(self) -> list[int]:
        d = os.path.join(self.state_dir, "_committed")
        if not os.path.isdir(d):
            return []
        return sorted(int(n) for n in os.listdir(d) if n.isdigit())

    def _regs_dir(self, batch_id: int) -> str:
        return os.path.join(self.state_dir, f"registers_batch={batch_id}")

    def _latest_regs(self, spark) -> DataFrame | None:
        done = self.committed_batch_ids()
        if not done:
            return None
        return spark.read.parquet(self._regs_dir(done[-1]))

    # -- the applier ------------------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return  # replayed batch — already committed
        spark = batch_df.sparkSession
        add = hll_registers(batch_df, self.key_col, self.group_col, p=self.p)
        prev = self._latest_regs(spark)
        merged = hll_merge([add, prev]) if prev is not None else add
        merged.select("grp", "bucket", "mreg").write.mode("overwrite").parquet(
            self._regs_dir(batch_id)
        )
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        with open(self._marker(batch_id), "w") as fh:
            fh.write("")
        for old in self.committed_batch_ids():
            if old < batch_id - 1:
                shutil.rmtree(self._regs_dir(old), ignore_errors=True)

    # -- lifecycle ----------------------------------------------------------------

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

    # -- queries over the state -------------------------------------------------

    def registers(self, spark) -> DataFrame:
        out = self._latest_regs(spark)
        if out is None:
            raise ValueError(f"no committed HLL state under {self.state_dir}")
        return out

    def estimates(self, spark) -> DataFrame:
        """Per-group distinct-count estimates from the persisted register
        state — estimate ONLY (production shape)."""
        return hll_estimate(self.registers(spark), p=self.p)
