"""Incremental ingest wrapper (SURVEY.md §2.10).

The reference is batch-only; the engine's incremental path treats newly
arriving ``webdocs`` files as a stream: ``readStream`` on the input
directory, ``Trigger.AvailableNow`` (drain everything present, then stop —
idempotent catch-up runs), watermark on ``warc_ts`` for bounded state, and
``foreachBatch`` feeding the SAME batch stages (normalize → sentences →
triples), so streaming and batch semantics cannot diverge. Checkpointing
gives exactly-once sink appends on top of the per-stage lineage manifests.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

WEBDOCS_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


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
        out = normalize(batch_df, backend=backend).withColumn(
            "batch_id", F.lit(batch_id)
        )
        out.write.mode("append").parquet(output_dir)

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
    against the precomputed alias map → append to the edges table. New
    ``warc_ts`` partitions are processed exactly once (checkpoint), making
    incremental ingest idempotent (SURVEY.md §2.10)."""
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
        edges.write.mode("append").partitionBy("day").parquet(output_dir)

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
