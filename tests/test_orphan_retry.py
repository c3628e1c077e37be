"""Late-arriving dimension handling: orphaned facts are parked, then
rescued when the master refreshes — never silently dropped, never
duplicated on the happy path."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_spark.streaming.pipeline import (
    run_streaming_etl_with_retry,
)

from .fixtures import write_fixture_csvs

ORPHAN_CID = 9999999  # the fixture's unknown-customer id (~5% of orders)


def test_orphans_parked_then_rescued_by_master_refresh(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("orphan_retry")
    paths = write_fixture_csvs(base)
    wh, ckpt, orph = str(base / "wh"), str(base / "ckpt"), str(base / "orphans")

    run_streaming_etl_with_retry(
        spark, str(paths["transactions"]), str(paths["customer"]),
        str(paths["product"]), wh, ckpt, orph,
    )
    fact1 = spark.read.parquet(f"{wh}/salefact")
    n1 = fact1.count()
    assert fact1.filter(F.col("customer_id") == ORPHAN_CID).count() == 0

    parked = spark.read.parquet(orph)
    n_orphans = parked.count()
    assert n_orphans > 0
    assert set(r.Customer_ID for r in parked.select("Customer_ID").distinct().collect()) == {
        ORPHAN_CID
    }

    # Master refresh: the missing customer appears; a new batch arrives.
    with open(paths["customer"], "a", newline="") as f:
        f.write(f"{ORPHAN_CID},M,26-35,7,B,2,0\r\n")
    with open(f"{paths['transactions']}/late.csv", "w", newline="") as f:
        f.write("orderID,Customer_ID,Product_ID,date,quantity\r\n")
        f.write("99991,1000001,P00000001,1/15/2019,2\r\n")

    run_streaming_etl_with_retry(
        spark, str(paths["transactions"]), str(paths["customer"]),
        str(paths["product"]), wh, ckpt, orph,
    )
    fact2 = spark.read.parquet(f"{wh}/salefact")
    rescued = fact2.filter(F.col("customer_id") == ORPHAN_CID).count()
    assert rescued == n_orphans  # every parked line loaded exactly once
    assert fact2.count() == n1 + n_orphans + 1  # + the late batch's one line
    assert spark.read.parquet(orph).count() == 0  # queue drained

    # the rescued customer reached the dimension too
    cust_dim = spark.read.parquet(f"{wh}/customer_dim")
    assert cust_dim.filter(F.col("customer_id") == ORPHAN_CID).count() == 1
