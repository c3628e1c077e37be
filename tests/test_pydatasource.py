"""Custom Python DataSource (Spark 4 API): the eventgen connector works
as a batch relation and as a replayable streaming source."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_spark.sources.pydatasource import (
    EventGenSource,
    gen_row,
)


def _registered(spark):
    spark.dataSource.register(EventGenSource)
    return spark


def test_eventgen_batch_partitioned_and_deterministic(spark):
    s = _registered(spark)
    df = (
        s.read.format("eventgen")
        .option("n_rows", 500)
        .option("n_partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r.event_id: tuple(r) for r in df.collect()}
    assert len(rows) == 500
    # every row matches the pure generator function (determinism = the
    # replay/exactly-once foundation)
    for i in (0, 7, 123, 499):
        assert rows[i] == gen_row(i)
    # a second read is bit-identical
    again = {
        r.event_id: tuple(r)
        for r in s.read.format("eventgen")
        .option("n_rows", 500)
        .option("n_partitions", 4)
        .load()
        .collect()
    }
    assert again == rows


def test_eventgen_stream_drains_exactly_once_across_restarts(
    spark, tmp_path_factory
):
    """The streaming side commits its offset to the checkpoint; each
    availableNow run consumes the next prefetched range, and restarts
    continue WITHOUT duplication until the source is exhausted —
    exactly-once from offset replay + deterministic generation."""
    s = _registered(spark)
    ckpt = str(tmp_path_factory.mktemp("eventgen_ckpt"))
    out_dir = str(tmp_path_factory.mktemp("eventgen_out"))

    def run_once():
        q = (
            s.readStream.format("eventgen")
            .option("batch_rows", 200)
            .option("max_rows", 500)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for _ in range(5):  # more runs than needed: extras must add nothing
        run_once()
    got = s.read.parquet(out_dir)
    assert got.count() == 500                      # drained, no duplicates
    assert got.select("event_id").distinct().count() == 500
    sample = {r.event_id: tuple(r) for r in got.filter(F.col("event_id") < 3).collect()}
    assert sample == {i: gen_row(i) for i in range(3)}


def test_eventgen_feeds_windowed_aggregation(spark):
    """Integration: the custom Python source drives a real windowed
    aggregation and the drained result equals the same aggregate over
    the closed-form generator output — source, not sink, is the only
    untrusted piece."""
    from pyspark.sql import functions as F

    s = _registered(spark)
    stream = (
        s.readStream.format("eventgen")
        .option("batch_rows", 500)
        .option("max_rows", 400)
        .load()
    )
    q = (
        stream.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value_cents").alias("cents"))
        .writeStream.format("memory")
        .queryName("eg_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.event_type: (r.n, r.cents)
        for r in s.sql("SELECT * FROM eg_agg").collect()
    }
    expect = {}
    for i in range(400):
        _, _, et, cents = gen_row(i)
        n, c = expect.get(et, (0, 0))
        expect[et] = (n + 1, c + cents)
    assert got == expect
