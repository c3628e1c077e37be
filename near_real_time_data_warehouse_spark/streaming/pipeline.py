"""Near-real-time path: Structured Streaming ETL into the Parquet star.

The reference's threaded producer/consumer machinery (hybrid_join.py:
142-166 producer, :168-311 join thread, thread-safe queue + lock-guarded
hash table) collapses into one streaming query:

    readStream(csv) → stream-static broadcast joins → foreachBatch(star loader)

Stream-static joins re-read the static side per micro-batch — strictly
better than the reference, which loads master data once at startup
(:59-60) and never refreshes. ``Trigger.AvailableNow`` gives the same
drain-and-stop semantics as the reference's EOF shutdown (:162-163,
:209-211) but with checkpointed exactly-once batches instead of
commit/rollback-per-batch at-least-once (:465-471, T5 in SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..etl import (
    enrich,
    load_star_batch,
    read_customer_master,
    read_product_master,
    read_transactions,
)


def run_streaming_etl(
    spark: SparkSession,
    transactions_dir: str,
    customer_master_path: str,
    product_master_path: str,
    warehouse_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Replay transaction CSVs as a stream and load the star schema;
    blocks until the source is drained (availableNow)."""
    cust = read_customer_master(spark, customer_master_path)
    prod = read_product_master(spark, product_master_path)
    stream = read_transactions(spark, transactions_dir, streaming=True)
    if max_files_per_trigger is not None:
        stream = (
            spark.readStream.format("csv")
            .option("header", True)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .schema(stream.schema)
            .load(transactions_dir)
        )
    enriched = enrich(stream, cust, prod)

    def sink(batch_df, epoch_id: int) -> None:  # noqa: ANN001
        load_star_batch(batch_df.sparkSession, batch_df, cust, prod, warehouse_dir)

    query = (
        enriched.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
