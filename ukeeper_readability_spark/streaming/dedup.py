"""Custom stateful streaming operator: first-seen exact dedup.

Built-in `dropDuplicates` on a stream keeps ALL keys in state with no way to
attach per-key payload or eviction policy, and batch `exact_duplicates`
(pipeline/dedup.py) needs the whole corpus. This operator is the
`applyInPandasWithState` form the brief's streaming section calls for: the
stream is grouped by the dedup key (e.g. a content hash), each key carries a
single boolean GroupState, and only the FIRST occurrence is emitted
downstream — the deterministic min over (order_cols) WITHIN a micro-batch;
ACROSS batches the first-arriving batch wins (a later batch's lower-ordered
row is suppressed by the existing state — ADVICE r5, pinned by the restart
test). The training-pipeline use: exact-dedup an unbounded document
feed before the expensive extraction/minhash stages, emitting each distinct
payload once.

State lifecycle: one flag per distinct key, persisted in the streaming
state store and restored across query restarts (checkpointLocation) — the
test proves a re-sent key after a restart is NOT re-emitted. Production
eviction: `GroupStateTimeout.ProcessingTimeTimeout` + `state.setTimeoutDuration`
bounds state for keys that stop arriving (re-admitting a key after its
timeout — the documented trade for bounded state at 10^12 keys); the
bounded-corpus form here uses NoTimeout.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def first_seen_dedup_stream(
    events: DataFrame,
    key_col: str,
    order_cols: Tuple[str, ...],
    output_schema: StructType,
) -> DataFrame:
    """Emit only the first occurrence of each `key_col` value.

    `order_cols` makes "first" deterministic (lexicographic min within the
    group's pending rows); `output_schema` must list key_col + the payload
    columns to keep, all present in `events`.
    """
    out_cols = [f.name for f in output_schema.fields]

    def dedup(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            return  # key already emitted in an earlier batch (or run)
        best = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            cand = pdf.sort_values(list(order_cols), kind="mergesort").iloc[:1]
            if best is None or (
                tuple(cand.iloc[0][list(order_cols)])
                < tuple(best.iloc[0][list(order_cols)])
            ):
                best = cand
        if best is None:
            return
        state.update((True,))
        yield best[out_cols]

    return events.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=output_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
