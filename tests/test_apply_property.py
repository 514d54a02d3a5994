"""Property test: for ANY event log, the distributed applier produces the
same state as a naive sequential last-writer-wins replay (the semantics the
reference's upsert sink guarantees via per-key ordered topics)."""

import random

from pyspark.sql import functions as F

from cdc_connector_spark.changelog.apply import apply_changes


def naive_replay(events):
    """Driver-side oracle: apply events in (ts, seq) order, last writer wins."""
    state = {}
    for ev in sorted(events, key=lambda e: (e["ts"], e["seq"])):
        if ev["op"] == "d":
            state.pop(ev["id"], None)
        else:
            state[ev["id"]] = ev["val"]
    return state


def gen_log(rng, n_events, n_keys, with_replay=True):
    """Generate a delivered stream. At-least-once is modeled as SUFFIX
    replay (redeliver from an earlier offset to the head) — the real Kafka
    failure mode. An isolated stale event re-delivered with nothing after it
    would violate the per-key ordering assumption the reference gets from
    1-partition topics (SURVEY.md ST3) and is out of contract."""
    events, seq = [], 0
    for _ in range(n_events):
        seq += 1
        events.append(
            {
                "id": rng.randrange(n_keys),
                "val": f"v{seq}",
                "op": rng.choice(["c", "u", "u", "u", "r", "d"]),
                "ts": (seq // 3) * 10,  # non-decreasing, frequent same-ts ties
                "seq": seq,
            }
        )
    delivered = list(events)
    if with_replay:
        replay_from = rng.randrange(len(events))
        delivered += events[replay_from:]
    return delivered


def to_df(spark, events):
    return spark.createDataFrame(
        [(e["id"], e["val"], e["op"], e["ts"], e["seq"]) for e in events],
        "id long, val string, __op string, __ts_ms long, __seq long",
    )


def test_applier_equals_naive_replay_randomized(spark):
    rng = random.Random(42)
    for trial in range(5):
        events = gen_log(rng, n_events=200, n_keys=30)
        got = {
            r["id"]: r["val"]
            for r in apply_changes(None, to_df(spark, events), ["id"]).collect()
        }
        assert got == naive_replay(events), f"trial {trial} diverged"


def test_applier_equals_naive_replay_batched(spark):
    """Splitting the same log into sequential micro-batches must converge to
    the same state as one-shot application (micro-batch boundaries are
    arbitrary in Structured Streaming)."""
    rng = random.Random(7)
    events = gen_log(rng, n_events=300, n_keys=25)  # delivered order, incl. suffix replay
    oneshot = {
        r["id"]: r["val"] for r in apply_changes(None, to_df(spark, events), ["id"]).collect()
    }
    # split the delivered stream into 4 sequential micro-batches at arbitrary
    # boundaries (even mid-replay) — final state must still converge
    state = None
    chunk = len(events) // 4 + 1
    for i in range(0, len(events), chunk):
        state = apply_changes(state, to_df(spark, events[i : i + chunk]), ["id"])
    batched = {r["id"]: r["val"] for r in state.collect()}
    assert batched == naive_replay(events) == oneshot
