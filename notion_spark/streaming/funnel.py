"""Streaming funnel — continuous ordered-step progression per user.

The streaming analogue of `operators.behavior.funnel_max_stage`
(greedy-earliest subsequence matching): per-user state is ONE int (the
stage reached so far), carried across micro-batches with
applyInPandasWithState. Each micro-batch emits the user's updated stage,
so a dashboard upserting on user always shows current funnel progress.

Ordering semantics: within a micro-batch events are sorted by (ts, tie);
ACROSS batches arrival order applies — identical to every append-mode
stateful operator here (streaming/sessions.py). When the whole input
arrives in one batch, the result equals the batch operator exactly
(pinned by the tests/test_sessions.py equivalence test).

State is one int per user — memory-bounded regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "stage int"


def funnel_stage_stream(
    stream: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, stage) updates per micro-batch; stage saturates at
    len(steps). Filter to step events BEFORE this operator when the
    stream carries other types — the scan stays cheap and state groups
    form only for funnel participants."""
    if not steps:
        raise ValueError("steps must be non-empty")
    steps = list(steps)
    in_fields = {f.name: f.dataType.simpleString() for f in stream.schema.fields}
    out_schema = f"user {in_fields[user_col]}, stage int"

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user,) = key
        stage = state.get[0] if state.exists else 0
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            state.update((stage,))
            return
        pdf = pd.concat(chunks).sort_values([ts_col, tie_col])
        for et in pdf[type_col]:
            if stage < len(steps) and et == steps[stage]:
                stage += 1
        state.update((stage,))
        yield pd.DataFrame({"user": [user], "stage": [stage]})

    return (
        stream.filter(F.col(type_col).isin(steps))
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
