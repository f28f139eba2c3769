"""Stateful streaming operators (applyInPandasWithState).

The batch engine is content-deterministic, so plain ingestion needs no
state (encode_stream.py). These are the two stateful surfaces a streaming
TRAINING-DATA pipeline does need ahead of the encoder:

* :func:`dedup_stream` — cross-micro-batch exact dedup: the first arrival
  of each content key is emitted, every later duplicate (same batch or any
  later batch) is dropped. State per key = one seen-flag — O(distinct keys)
  cluster-wide, sharded by the state-store partitioning, no driver state.
* :func:`running_source_stats` — per-source running (docs, tokens) totals,
  emitted each micro-batch — the metrics feed for an always-on ingest.

Both use ``applyInPandasWithState`` (Arrow-batched; the state store shuffles
on the group key exactly once per batch). Keys are engine-portable content
hashes so a restart from checkpoint reconstructs identical decisions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOKENS_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def dedup_stream(stream_df: DataFrame) -> DataFrame:
    """Exactly-once emission per content key across all micro-batches.

    Content key = TWO independent xxhash64s of (doc_id, tokens, source) —
    128 key bits, so collisions are ~n²/2^129 (never, at any corpus scale;
    a single 64-bit key would silently drop ~tens of thousands of distinct
    docs per 10^12 sequences). Duplicates are *identical docs*
    (re-delivered files, at-least-once sources), the standard upstream
    guard before encoding. Within a batch the first row wins; across
    batches the state-store flag wins."""
    keyed = stream_df.withColumn(
        "_ck", F.xxhash64(F.col("doc_id"), F.col("tokens"), F.col("source"))
    ).withColumn(
        "_ck2",
        F.xxhash64(F.col("doc_id"), F.col("tokens"), F.col("source"), F.lit(0x9E3779B9)),
    )

    def emit_first(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        for pdf in pdfs:
            if len(pdf):
                state.update((1,))
                yield pdf.iloc[:1].drop(columns=["_ck", "_ck2"])
                return

    return keyed.groupBy("_ck", "_ck2").applyInPandasWithState(
        emit_first,
        outputStructType=TOKENS_SCHEMA,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_source_stats(stream_df: DataFrame) -> DataFrame:
    """Per-source cumulative (n_docs, n_tok), one updated row per source per
    micro-batch that touches it."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        docs, toks = state.get if state.exists else (0, 0)
        batch_docs = batch_toks = 0
        for pdf in pdfs:
            batch_docs += len(pdf)
            batch_toks += int(pdf["n_tok"].sum())
        docs += batch_docs
        toks += batch_toks
        state.update((docs, toks))
        yield pd.DataFrame(
            {"source": [key[0]], "n_docs": [docs], "n_tok_total": [toks]}
        )

    return stream_df.groupBy("source").applyInPandasWithState(
        update,
        outputStructType="source string, n_docs long, n_tok_total long",
        stateStructType="n_docs long, n_tok long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
