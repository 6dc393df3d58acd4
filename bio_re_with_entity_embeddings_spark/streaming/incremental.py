"""Structured-Streaming wrappers (SURVEY 2.9).

The reference is pure batch; its only "incremental" behavior is
file-existence caching. These wrappers are the extension point for a
continuously-arriving corpus: the SAME stage functions run inside
``foreachBatch`` (exactly-once per micro-batch against the
checkpointed manifest), and event-style rollups run as native
watermarked streaming aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_hourly_rollup(
    spark: SparkSession,
    path: str,
    schema,
    watermark: str = "2 hours",
):
    """readStream over an event parquet directory -> watermarked
    tumbling-window rollup (late rows beyond the watermark dropped).
    Returns the unstarted streaming DataFrame; callers pick the sink."""
    events = spark.readStream.schema(schema).parquet(path)
    # parquet event-time may infer as TIMESTAMP_NTZ; watermarks need TIMESTAMP
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState):
    exact content dedup across the whole stream's lifetime.

    State: per content fingerprint (md5 of normalized text), the keeper
    doc id and how many occurrences have been seen. Every arriving doc
    is emitted with ``is_duplicate`` + the keeper id; the first arrival
    (batch ties broken by doc id) becomes the keeper. The state store
    checkpoints with the query, so duplicates are recognized across
    micro-batches AND across restarts — the streaming analog of
    ``operators/dedup.py::exact_duplicates``.

    Shape notes for scale: state is keyed by the 32-hex fingerprint —
    hash-partitioned across executors by the state store, O(1) per
    group per batch; rows per group are tiny (true dup groups). No
    per-row Python outside the Arrow batches.
    """
    import pandas as pd

    from ..functions.text import fingerprint

    keyed = docs_stream.select(
        fingerprint(text_col).alias("fp"),
        F.col(id_col).cast("string").alias("doc"),
    )

    def dedup_fn(key, pdfs, state):
        if state.exists:
            keeper, n = state.get
        else:
            keeper, n = None, 0
        out = []
        for pdf in pdfs:
            for doc in sorted(pdf["doc"].tolist()):
                n += 1
                if keeper is None:
                    keeper = doc
                out.append((key[0], doc, keeper, doc != keeper, n))
        state.update((keeper, n))
        yield pd.DataFrame(
            out, columns=["fp", "doc_id", "keeper", "is_duplicate", "n_seen"]
        )

    return keyed.groupBy("fp").applyInPandasWithState(
        dedup_fn,
        outputStructType=(
            "fp string, doc_id string, keeper string, "
            "is_duplicate boolean, n_seen long"
        ),
        stateStructType="keeper string, n long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def incremental_mentions(
    spark: SparkSession,
    corpus_stream: DataFrame,
    dict_entries,
    sink_fn,
    checkpoint_dir: str,
):
    """foreachBatch wrapper: run ingest + trie mention detection on
    each corpus micro-batch and hand the mention DataFrame to
    ``sink_fn(df, epoch_id)`` (e.g. an idempotent Iceberg append keyed
    by epoch). Spark's streaming checkpoint provides exactly-once
    batch replay; the sink must be idempotent per epoch_id."""
    from ..operators.mentions import detect_mentions
    from ..plans.pipeline import ingest

    def run_batch(batch_df: DataFrame, epoch_id: int) -> None:
        mentions = detect_mentions(ingest(batch_df), dict_entries)
        sink_fn(mentions, epoch_id)

    return (
        corpus_stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
