"""Streaming heavy hitters: Misra-Gries summaries as a custom stateful
operator — the ingest-time form of ``tokens.mg_heavy_hitters``.

Each micro-batch's exact token counts merge into a per-bucket MG summary
held in state (Agarwal et al., PODS 2012 merge rule: sum counters, then
subtract the (k+1)-th largest and drop non-positives).  Unlike most
stream state, the summary is BOUNDED BY CONSTRUCTION — k counters per
bucket, n_buckets * k rows total, forever — so no watermark/timeout
eviction is needed; this operator can legitimately run unbounded.

Bucketing matches the batch operator (portable md5 of the doc id), so a
one-batch stream produces exactly the batch summaries (parity-tested);
across batches the MG merge guarantee holds: per-token undercount <=
(total tokens seen in the bucket) / (k+1).

Output (mode "update"): every trigger re-emits the updated buckets'
surviving (bucket, token, est) rows; consumers sum est by token across
buckets for the global estimate (the batch operator's merge stage)."""

from __future__ import annotations

from collections import Counter
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("token", T.LongType(), False),
        T.StructField("est", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.LongType()), True),
        T.StructField("counts", T.ArrayType(T.LongType()), True),
    ]
)


def _mg_merge(summary: Counter, k: int) -> Counter:
    """Offline-MG truncation: keep <= k counters by subtracting the
    (k+1)-th largest count from all and dropping non-positives."""
    if len(summary) <= k:
        return summary
    thresh = sorted(summary.values(), reverse=True)[k]
    return Counter(
        {t: c - thresh for t, c in summary.items() if c - thresh > 0}
    )


def make_hh_fn(k: int):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            toks, cnts = state.get
            summary = Counter(dict(zip(toks, cnts)))
        else:
            summary = Counter()
        for pdf in pdfs:
            for arr in pdf["tokens"]:
                summary.update(int(t) for t in arr)
        summary = _mg_merge(summary, k)
        items = sorted(summary.items())
        state.update((
            [int(t) for t, _ in items],
            [int(c) for _, c in items],
        ))
        yield pd.DataFrame(
            {
                "bucket": int(key[0]),
                "token": [t for t, _ in items],
                "est": [c for _, c in items],
            }
        )

    return update


def stream_heavy_hitters(
    stream_df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 32,
    n_summaries: int = 32,
) -> DataFrame:
    """Per-bucket streaming MG summaries (see module docstring).  Input
    stream needs (id, tokens); output one row per surviving counter per
    updated bucket per trigger.  Use output mode "update"."""
    pid = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("hh:"), F.col(id_col).cast("string"))), 1, 6
            ),
            16, 10,
        ).cast("int") % n_summaries
    ).alias("bucket")
    keyed = stream_df.select(pid, F.col(tokens_col).alias("tokens"))
    return keyed.groupBy("bucket").applyInPandasWithState(
        make_hh_fn(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,  # state bounded at k rows
    )
