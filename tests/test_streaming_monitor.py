"""The stateful streaming anomaly monitor's final emissions equal the
batch operator bit for bit — including the float baseline columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_spark.functions import eventtime
from near_real_time_data_warehouse_spark.operators import events as batch_events
from near_real_time_data_warehouse_spark.streaming import windows as sw
from near_real_time_data_warehouse_spark.streaming.monitor import (
    streaming_hourly_anomalies,
)

from .conftest import SF_SMALL


def test_streaming_anomalies_equal_batch(spark):
    stream = sw.read_event_stream(spark, SF_SMALL)
    stream = stream.withColumn("us", eventtime.us_expr(stream))
    sw.run_to_memory(streaming_hourly_anomalies(stream), "anomalies_out", "update")

    out = spark.sql("SELECT * FROM anomalies_out")
    # last emission per (type, hour) reflects the fully-drained state
    from pyspark.sql import Window

    w = Window.partitionBy("event_type", "hour_epoch_s").orderBy(F.desc("emit_seq"))
    final = (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "emit_seq")
    )
    streamed = {
        (r.event_type, r.hour_epoch_s): (
            r.n_events, r.total_value, r.baseline_mean, r.baseline_std, r.is_anomaly
        )
        for r in final.collect()
    }
    batch = {
        (r.event_type, r.hour_epoch_s): (
            r.n_events, r.total_value, r.baseline_mean, r.baseline_std, r.is_anomaly
        )
        for r in batch_events.hourly_anomalies(spark, SF_SMALL).collect()
    }
    assert streamed == batch
    # sf0.001 is too calm to fire a 3σ flag (the sf0.01 oracle entry
    # does, 73 of 3385); here assert the baselines were actually
    # evaluated, i.e. flags are decided (non-null) where history suffices
    assert any(v[4] is not None for v in streamed.values())
