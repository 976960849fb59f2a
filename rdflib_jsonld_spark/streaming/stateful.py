"""Custom stateful streaming operator: per-conversation progress tracking
via ``applyInPandasWithState`` (the brief's 'custom stateful operators'
row; no reference counterpart — SURVEY.md §2.I).

State = (n_turns_seen, max_turn_idx, n_mention_blocks) per conv_id.
Each micro-batch emits one updated row per conversation touched, so a
downstream sink always has the latest per-conversation coverage — the
bookkeeping a resumable 10^12-turn ingest needs to detect gaps (missing
turn_idx) online.

GroupStateTimeout: conversations idle past 30 min of processing time are
finalized and dropped from the store, bounding state size.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_turns LONG, max_turn_idx INT, n_blocks LONG"

OUTPUT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("n_turns", T.LongType(), False),
    T.StructField("max_turn_idx", T.IntegerType(), False),
    T.StructField("n_blocks", T.LongType(), False),
    T.StructField("has_gap", T.BooleanType(), False),
    T.StructField("finalized", T.BooleanType(), False),
])


def _track(key: Any, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        n_turns, max_idx, n_blocks = state.get
        state.remove()
        yield pd.DataFrame([{
            "conv_id": conv_id, "n_turns": n_turns,
            "max_turn_idx": max_idx, "n_blocks": n_blocks,
            "has_gap": n_turns != max_idx + 1, "finalized": True}])
        return
    n_turns, max_idx, n_blocks = state.get if state.exists else (0, -1, 0)
    for pdf in pdfs:
        n_turns += len(pdf)
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
            n_blocks += int(pdf["text"].str.count("```ld").sum())
    state.update((n_turns, max_idx, n_blocks))
    yield pd.DataFrame([{
        "conv_id": conv_id, "n_turns": n_turns, "max_turn_idx": max_idx,
        "n_blocks": n_blocks, "has_gap": n_turns != max_idx + 1,
        "finalized": False}])


def conversation_progress(transcripts_stream: DataFrame,
                          idle_timeout: bool = False) -> DataFrame:
    """Streaming transcripts → per-conversation coverage state updates.

    ``idle_timeout=True`` enables ProcessingTimeTimeout finalization (for
    continuous micro-batch triggers; conversations idle >30 min are
    flushed and removed, bounding the state store). It must stay OFF for
    availableNow/once runs — a processing-time timeout never fires there
    and the drained query would wait on it (observed deadlock)."""
    return (transcripts_stream
            .select("conv_id", "turn_idx", "text")
            .groupBy("conv_id")
            .applyInPandasWithState(
                _track_with_timeout if idle_timeout else _track,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                             if idle_timeout else
                             GroupStateTimeout.NoTimeout)))


def _track_with_timeout(key, pdfs, state: GroupState):
    for out in _track(key, pdfs, state):
        if state.exists and not state.hasTimedOut:
            state.setTimeoutDuration(30 * 60 * 1000)
        yield out


def run_conversation_progress(spark, input_path: str, output_path: str,
                              checkpoint_path: str) -> None:
    from .incremental import read_transcript_stream
    stream = read_transcript_stream(spark, input_path)

    # update-mode stateful output needs an update-capable sink; parquet is
    # append-only → write each micro-batch's updates via foreachBatch (the
    # standard pattern for update-mode → file/table sinks)
    def write_batch(batch_df, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_path)

    q = (conversation_progress(stream).writeStream
         .foreachBatch(write_batch)
         .option("checkpointLocation", checkpoint_path)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
