"""Property-based replay correctness: for ANY interleaving of
insert/update/delete ops over a small key space — including repeated
touches of one key inside a batch, deletes of absent keys, and immediate
re-inserts — the engine's final table equals the closed-form
last-writer-wins oracle, for every batch partitioning of the same log.

(The reference's suite is example-based; this is the randomized
generalization of its ``Db2ConnectorIT`` final-state assertions.)
"""

import datetime
import os

from hypothesis import HealthCheck, given, settings, strategies as st

from debezium_connector_db2_spark.lake import LakeTable
from debezium_connector_db2_spark.schemas import BINLOG_SCHEMA, PK_COLS, TRANSCRIPT_SCHEMA
from debezium_connector_db2_spark.sources.binlog import BinlogSource
from debezium_connector_db2_spark.streaming.engine import CdcEngine

TS = datetime.datetime(2026, 1, 1)

# a step: (key 0..5, op) — tiny key space maximizes same-key interleavings
_steps = st.lists(
    st.tuples(st.integers(0, 5), st.sampled_from(["I", "U", "D"])),
    min_size=1, max_size=40,
)


def _python_oracle(steps):
    state = {}
    for i, (k, op) in enumerate(steps):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = f"v{i}"
    return state


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(steps=_steps, batch_lsns=st.integers(1, 7))
def test_any_op_interleaving_converges(spark, tmp_path_factory, steps,
                                       batch_lsns):
    tmp = str(tmp_path_factory.mktemp("prop"))
    rows = [
        (i + 1, 0, op, "transcripts", 0, f"c{k}", 0, "user",
         f"v{i}" if op != "D" else "x", None, TS)
        for i, (k, op) in enumerate(steps)
    ]
    src = BinlogSource(spark, os.path.join(tmp, "bl"), bucket_size=4)
    src.write(spark.createDataFrame(rows, BINLOG_SCHEMA))
    target = LakeTable.create(spark, os.path.join(tmp, "t"),
                              TRANSCRIPT_SCHEMA, bucket_by="conv_id",
                              n_buckets=2)
    eng = CdcEngine(spark, src, target, os.path.join(tmp, "ck"),
                    max_lsns_per_batch=batch_lsns)
    eng.run_available()

    got = {r.conv_id: r.text for r in target.read().collect()}
    want = {f"c{k}": v for k, v in _python_oracle(steps).items()}
    assert got == want, f"steps={steps} batch_lsns={batch_lsns}"
