"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no SQL-level streaming operators (SURVEY.md §1.6) — this
is the Spark-native extension point for operators the built-in windowed
aggs can't express (running per-key accumulators, custom session logic,
online sketches). State lives in the checkpoint (RocksDB/HDFS-backed state
store on a cluster) and survives micro-batch and query restarts.

Functions are built as closures so cloudpickle ships them by value —
workers don't need this package importable on their sys.path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

RUNNING_TOTAL_OUT = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)
_RUNNING_TOTAL_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_totals(grouped_stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) maintained in explicit group state.

    ``grouped_stream`` is a streaming DataFrame; the operator groups it by
    ``key_col`` and emits the updated accumulator for each key touched by
    the micro-batch (outputMode 'update').
    """
    import pandas as pd

    def accumulate(key, pdfs, state):
        (k,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame([{"key": k, "n_events": n, "total": total}])

    return grouped_stream.groupBy(key_col).applyInPandasWithState(
        accumulate,
        outputStructType=RUNNING_TOTAL_OUT,
        stateStructType=_RUNNING_TOTAL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
