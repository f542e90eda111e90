"""Custom stateful streaming operators (applyInPandasWithState).

The reference's realtime consumer is stateless per message and leans on the
idempotent sink for dedup (/root/reference/src/queue/transaction-consumer.ts
:101-143). With managed per-key state we can do better *upstream*: a
streaming conditional-LWW gate that drops stale/duplicate events before
they ever reach the sink, shrinking sink traffic on duplicate-heavy
streams (the reference's DLQ reality: 5.1M duplicate-ish messages,
RABBITMQ-VOLUME-ANALYSIS.md:12-47).

State per (repo, path): the max (commit_seq, event_seq) seen. An arriving
event is emitted iff its version is newer; otherwise dropped as
stale/duplicate. State is Spark-managed (checkpointed with the query).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

STATE_SCHEMA = "max_commit_seq LONG, max_event_seq LONG"


def _lww_gate(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    # vectorized: after sorting by (commit_seq, event_seq), a row survives
    # iff it beats the carried state AND is not an exact duplicate of its
    # predecessor — equivalent to the running strictly-greater scan, with
    # no per-row Python loop (numpy compares over the whole Arrow batch)
    if state.exists:
        max_c, max_e = state.get
    else:
        max_c, max_e = -1, -1
    out = []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["commit_seq", "event_seq"])
        c = pdf["commit_seq"].to_numpy()
        e = pdf["event_seq"].to_numpy()
        gt_state = (c > max_c) | ((c == max_c) & (e > max_e))
        dup_prev = np.zeros(len(c), dtype=bool)
        dup_prev[1:] = (c[1:] == c[:-1]) & (e[1:] == e[:-1])
        out.append(pdf[gt_state & ~dup_prev])
        last = (int(c[-1]), int(e[-1]))  # sorted -> batch max
        if last > (max_c, max_e):
            max_c, max_e = last
    state.update((max_c, max_e))
    yield pd.concat(out) if out else pd.DataFrame()


def streaming_lww_gate(
    events: DataFrame,
    output_schema: StructType | str,
    key_cols: tuple[str, str] = ("repo", "path"),
) -> DataFrame:
    """Stateful streaming dedup/staleness gate keyed by (repo, path).

    ``events`` must be a streaming DataFrame containing the key columns
    plus commit_seq/event_seq. Emits only rows that advance their key's
    LWW version. Batch-mode note: use operators.lww.dedupe_lww instead —
    this operator exists for the continuous path where state must persist
    ACROSS micro-batches.
    """
    return (
        events.groupBy(*key_cols)
        .applyInPandasWithState(
            _lww_gate,
            outputStructType=output_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
