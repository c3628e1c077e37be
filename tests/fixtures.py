"""Deterministic reference-faithful CSV fixtures (FIXTURES.md §A, seed=42)."""

from __future__ import annotations

import csv
import random
from pathlib import Path

AGE_BUCKETS = ["0-17", "18-25", "26-35", "36-45", "46-50", "51-55", "55+"]
CITY_CATEGORIES = ["A", "B", "C"]
STORES = {1: "Electro Mart", 2: "Tech Haven", 3: "Gadget Hub"}
SUPPLIERS = {9: "Canon Inc.", 13: "Samsung Electronics", 16: "Sony Corp."}
CATEGORIES = ["Appliances", "Electronics", "Toys", "Clothing"]


def write_fixture_csvs(
    base: Path,
    n_customers: int = 200,
    n_products: int = 80,
    n_orders: int = 600,
    seed: int = 42,
) -> dict[str, Path]:
    rng = random.Random(seed)
    base.mkdir(parents=True, exist_ok=True)

    cust_path = base / "customer_master.csv"
    customer_ids = [1000001 + i for i in range(n_customers)]
    with cust_path.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["Customer_ID", "Gender", "Age", "Occupation", "City_Category",
             "Stay_In_Current_City_Years", "Marital_Status"]
        )
        for cid in customer_ids:
            w.writerow(
                [cid, rng.choice("FM"), rng.choice(AGE_BUCKETS), rng.randrange(21),
                 rng.choice(CITY_CATEGORIES), rng.randrange(5), rng.randrange(2)]
            )

    prod_path = base / "product_master.csv"
    product_ids = [f"P{i:08d}" for i in range(n_products)]
    with prod_path.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["Product_ID", "Product_Category", "price$", "storeID", "storeName",
             "supplierID", "supplierName"]
        )
        for pid in product_ids:
            sid = rng.choice(list(STORES))
            sup = rng.choice(list(SUPPLIERS))
            w.writerow(
                [pid, rng.choice(CATEGORIES), round(rng.uniform(1, 500), 2),
                 sid, STORES[sid], sup, SUPPLIERS[sup]]
            )

    txn_dir = base / "transactions"
    txn_dir.mkdir(exist_ok=True)
    txn_path = txn_dir / "transactions.csv"
    with txn_path.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["orderID", "Customer_ID", "Product_ID", "date", "quantity"])
        for oid in range(1, n_orders + 1):
            # ~5% unknown customers (J1 eviction), ~3% unknown products (J2 left)
            cid = rng.choice(customer_ids) if rng.random() > 0.05 else 9999999
            month = rng.randrange(1, 13)
            day = rng.randrange(1, 28)
            year = rng.choice([2019, 2020])
            for _ in range(rng.randrange(1, 5)):  # multi-line orders (q16 pairs)
                pid = rng.choice(product_ids) if rng.random() > 0.03 else "P_UNKNOWN"
                w.writerow([oid, cid, pid, f"{month}/{day}/{year}", rng.randrange(1, 11)])

    return {"customer": cust_path, "product": prod_path, "transactions": txn_dir}


def shard_split_frame(spark, sf_dir):
    """Test helper: the shard split assignment as pandas (tiny at test
    SFs). Lives here, not in operators/ — a ``toPandas()`` collect has
    no place in non-test source (VERDICT r12 what's-wrong #4)."""
    from near_real_time_data_warehouse_spark.operators.text import shard_split

    return shard_split(spark, sf_dir).toPandas()
