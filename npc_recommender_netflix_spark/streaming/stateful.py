"""§2.10 arbitrary stateful streaming: applyInPandasWithState.

Running per-user event count — the canonical custom-state operator. State
is a single counter per user_id; each micro-batch updates it and emits the
new total. Declared rows-only (emission cadence is runtime behavior);
tests/test_streaming.py asserts parity with the batch groupBy count.

Scale: state is partitioned by the group key across executors (RocksDB
state store in production); the pandas function sees one key's rows per
call — no cross-key coupling, linear scale-out.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import register
from .stream_windows import read_events_stream, run_to_memory


@register("st_stateful")  # rows-only: per-batch emission cadence is runtime
def st_stateful(spark, sf_dir):
    # Defined inside the query fn: cloudpickle then serializes it BY VALUE.
    # A module-level function is pickled by reference and the executor-side
    # Python worker cannot import this package (repo not on its sys.path).
    def running_count(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    ev = read_events_stream(spark, sf_dir)
    counts = ev.groupBy("user_id").applyInPandasWithState(
        running_count,
        outputStructType="user_id LONG, n LONG",
        stateStructType="n LONG",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = run_to_memory(counts, "update")
    return spark.table(name)
