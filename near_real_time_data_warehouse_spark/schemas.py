"""Declared schemas — reference-faithful inputs and the star warehouse.

Input schemas follow /root/reference master CSVs and the recovered
transactional schema (SURVEY.md §1.3); warehouse schemas follow
starSchema.sql:5-46 with the two deliberate redesigns documented in
SURVEY.md §1.2: deterministic ``date_id`` (yyyymmdd int) instead of
auto-increment, and no ``sales_id`` surrogate (order_id+product_id+
line position identifies a fact row; no reference query reads either id).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- inputs (schema-on-read with explicit types — never inferSchema) ------

CUSTOMER_MASTER_SCHEMA = T.StructType(
    [
        T.StructField("Customer_ID", T.IntegerType(), False),
        T.StructField("Gender", T.StringType(), True),
        T.StructField("Age", T.StringType(), True),  # bucket, e.g. '26-35', '55+'
        T.StructField("Occupation", T.IntegerType(), True),
        T.StructField("City_Category", T.StringType(), True),
        T.StructField("Stay_In_Current_City_Years", T.StringType(), True),
        T.StructField("Marital_Status", T.IntegerType(), True),
    ]
)

PRODUCT_MASTER_SCHEMA = T.StructType(
    [
        T.StructField("Product_ID", T.StringType(), False),
        T.StructField("Product_Category", T.StringType(), True),
        T.StructField("price$", T.DoubleType(), True),
        T.StructField("storeID", T.IntegerType(), True),
        T.StructField("storeName", T.StringType(), True),
        T.StructField("supplierID", T.IntegerType(), True),
        T.StructField("supplierName", T.StringType(), True),
    ]
)

TRANSACTION_SCHEMA = T.StructType(
    [
        T.StructField("orderID", T.IntegerType(), False),
        T.StructField("Customer_ID", T.IntegerType(), True),
        T.StructField("Product_ID", T.StringType(), True),
        T.StructField("date", T.StringType(), True),  # '%m/%d/%Y'
        T.StructField("quantity", T.IntegerType(), True),
    ]
)

# --- warehouse (starSchema.sql) -------------------------------------------

CUSTOMER_DIM_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.IntegerType(), False),
        T.StructField("gender", T.StringType(), True),
        T.StructField("age", T.IntegerType(), True),  # bucket lower bound
        T.StructField("occupation", T.IntegerType(), True),
        T.StructField("city_category", T.StringType(), True),
        T.StructField("stay_in_current_city_years", T.StringType(), True),
        T.StructField("marital_status", T.IntegerType(), True),
    ]
)

PRODUCT_DIM_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.StringType(), False),
        T.StructField("product_category", T.StringType(), True),
        T.StructField("price", T.DecimalType(10, 2), True),
        T.StructField("store_id", T.IntegerType(), True),
        T.StructField("store_name", T.StringType(), True),
        T.StructField("supplier_id", T.IntegerType(), True),
        T.StructField("supplier_name", T.StringType(), True),
    ]
)

TIME_DIM_SCHEMA = T.StructType(
    [
        T.StructField("date_id", T.LongType(), False),
        T.StructField("full_date", T.DateType(), True),
        T.StructField("day_of_week", T.StringType(), True),
        T.StructField("month", T.StringType(), True),
        T.StructField("quarter", T.LongType(), True),
        T.StructField("season", T.StringType(), True),
        T.StructField("year", T.LongType(), True),
    ]
)

SALE_FACT_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.IntegerType(), False),
        T.StructField("customer_id", T.IntegerType(), False),
        T.StructField("product_id", T.StringType(), False),
        T.StructField("date_id", T.LongType(), False),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("purchase_amount", T.DecimalType(12, 2), True),
    ]
)
