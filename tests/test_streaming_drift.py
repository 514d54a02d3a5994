"""Streaming drift monitor: incremental histogram maintenance, PSI parity
with the batch operator, write-once reference, replay idempotence."""

import os

import pytest

from cdc_connector_spark.streaming.drift import StreamingDriftMonitor
from cdc_connector_spark.validation.drift import population_stability

SCHEMA = "v double"


def _df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], SCHEMA)


def test_streaming_psi_equals_batch_psi(spark, tmp_path):
    """The streaming readout must be the SAME number the batch operator
    computes on (reference, union-of-batches)."""
    mon = StreamingDriftMonitor(str(tmp_path / "s"), "v", lo=0.0, hi=100.0, bins=10)
    ref_vals = [i % 100 for i in range(400)]
    mon.set_reference(_df(spark, ref_vals))
    b0 = [50 + i % 50 for i in range(200)]
    b1 = [60 + i % 40 for i in range(100)]
    mon.process_batch(_df(spark, b0), 0)
    mon.process_batch(_df(spark, b1), 1)
    got = mon.psi(spark).collect()[0]
    exp = population_stability(
        _df(spark, ref_vals), _df(spark, b0 + b1), "v", lo=0.0, hi=100.0, bins=10
    ).collect()[0]
    assert (got["psi"], got["n_expected"], got["n_actual"]) == (
        exp["psi"], exp["n_expected"], exp["n_actual"],
    )
    assert got["psi"] > 0.25  # the planted shift is a real drift alarm


def test_reference_is_write_once(spark, tmp_path):
    mon = StreamingDriftMonitor(str(tmp_path / "s"), "v", lo=0.0, hi=10.0, bins=5)
    mon.set_reference(_df(spark, [1, 2, 3]))
    with pytest.raises(ValueError):
        mon.set_reference(_df(spark, [4, 5, 6]))


def test_replay_idempotent_and_state_bounded(spark, tmp_path):
    mon = StreamingDriftMonitor(str(tmp_path / "s"), "v", lo=0.0, hi=10.0, bins=5)
    mon.set_reference(_df(spark, list(range(10))))
    for i in range(3):
        mon.process_batch(_df(spark, [i, i + 1, 20.0, -5.0]), i)  # outliers clamp
    before = {(r["bin"], r["cnt"]) for r in mon.histogram(spark).collect()}
    mon.process_batch(_df(spark, [9.0] * 100), 2)  # replay: marker short-circuits
    after = {(r["bin"], r["cnt"]) for r in mon.histogram(spark).collect()}
    assert after == before
    assert mon.histogram(spark).count() <= 5
    assert sum(c for _, c in after) == 12  # every row incl. clamped outliers
    dirs = [d for d in os.listdir(mon.state_dir) if d.startswith("hist_batch=")]
    assert sorted(dirs) == ["hist_batch=1", "hist_batch=2"]


def test_streaming_wiring_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    _df(spark, [1, 2, 3]).repartition(1).write.parquet(os.path.join(src, "f0"))
    _df(spark, [7, 8]).repartition(1).write.parquet(os.path.join(src, "f1"))
    mon = StreamingDriftMonitor(str(tmp_path / "state"), "v", lo=0.0, hi=10.0, bins=5)
    mon.set_reference(_df(spark, list(range(10))))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = mon.start(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    assert len(mon.committed_batch_ids()) == 2
    assert mon.psi(spark).collect()[0]["n_actual"] == 5
