"""Incremental ingest wrapper (SURVEY.md §2.10).

The reference is batch-only; the engine's incremental path treats newly
arriving ``webdocs`` files as a stream: ``readStream`` on the input
directory, ``Trigger.AvailableNow`` (drain everything present, then stop —
idempotent catch-up runs), watermark on ``warc_ts`` for bounded state, and
``foreachBatch`` feeding the SAME batch stages (normalize → sentences →
triples), so streaming and batch semantics cannot diverge.

Delivery semantics: Structured Streaming's checkpoint makes ``foreachBatch``
*at-least-once* — a crash between the sink write and the checkpoint commit
replays the whole micro-batch on restart. A blind ``append`` would then
duplicate rows, so every batch is written to a deterministic
``batch_id=<id>`` subdirectory in ``overwrite`` mode
(``write_batch_idempotent``): a replay overwrites its own previous output
and the sink is effectively exactly-once for a fixed checkpoint lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WEBDOCS_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def write_batch_idempotent(
    batch_df: DataFrame,
    output_dir: str,
    batch_id: int,
    partition_by: list[str] | None = None,
) -> None:
    """Idempotent micro-batch sink: parquet under ``batch_id=<id>`` with
    overwrite, so an at-least-once replay of the same batch cannot
    duplicate rows. Readers see ``batch_id`` as a discovered partition
    column of ``output_dir``."""
    w = batch_df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(f"{output_dir}/batch_id={batch_id}")


def stream_normalize_to_parquet(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    backend: str = "mock",
    max_files_per_trigger: int | None = None,
):
    """Start an AvailableNow stream: input parquet dir → normalized parquet.
    Returns the StreamingQuery (caller awaits termination)."""
    from kgforge.stages.normalize import normalize

    reader = (
        spark.readStream.schema(WEBDOCS_DDL)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(input_dir).withWatermark("warc_ts", "1 day")

    def process_batch(batch_df, batch_id: int):
        write_batch_idempotent(
            normalize(batch_df, backend=backend), output_dir, batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_extract_edges(
    spark: SparkSession,
    input_dir: str,
    alias_map_path: str,
    output_dir: str,
    checkpoint_dir: str,
    backend: str = "mock",
):
    """Full incremental KG path: newly arrived webdocs → fused docstream
    (normalize + sentence split + triple extraction) → canonical rewrite
    against the precomputed alias map → idempotent batch_id-keyed append to
    the edges table (see module docstring: checkpoint dedups inputs,
    overwrite-per-batch dedups replayed outputs) (SURVEY.md §2.10)."""
    from pyspark.sql import functions as F

    from kgforge.stages.canonicalize import edges_with_day, rewrite_triples
    from kgforge.stages.docstream import extract_docstream

    mention_map = spark.read.parquet(alias_map_path).select(
        F.col("alias").alias("mention"), "canon_id"
    )
    stream = (
        spark.readStream.schema(WEBDOCS_DDL)
        .format("parquet")
        .load(input_dir)
        .withWatermark("warc_ts", "1 day")
    )

    def process_batch(batch_df, batch_id: int):
        edges = edges_with_day(
            rewrite_triples(extract_docstream(batch_df, backend=backend), mention_map)
        )
        write_batch_idempotent(edges, output_dir, batch_id, partition_by=["day"])

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_doc_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    late_threshold: str = "2 hours",
):
    """Watermarked tumbling-window doc counts per lang — the standard
    late-data-tolerant streaming aggregate, append-mode output."""
    stream = (
        spark.readStream.schema(WEBDOCS_DDL)
        .format("parquet")
        .load(input_dir)
        .withWatermark("warc_ts", late_threshold)
    )
    agg = stream.groupBy(
        F.window("warc_ts", window).alias("w"), "lang"
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    flat = agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "lang",
        "n_docs",
    )
    return (
        flat.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
