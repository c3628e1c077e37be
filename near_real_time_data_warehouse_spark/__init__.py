"""PySpark-native near-real-time data warehouse engine.

A brand-new engine with the query and data-processing capabilities of
``ramalahamir/near-real-time-data-warehouse`` (reference surveyed in
/root/repo/SURVEY.md): a streaming enrichment ETL that loads a retail star
schema (customer/product/time dimensions + sales fact) and a library of ~20
OLAP analysis queries, re-expressed Spark-first — DataFrame/SQL on Catalyst,
Structured Streaming for the near-real-time path, Parquet for storage —
plus large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB scale.
"""

__version__ = "0.1.0"
