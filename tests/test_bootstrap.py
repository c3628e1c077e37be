from __future__ import annotations

from near_real_time_data_warehouse_spark import bootstrap


def test_bootstrap_registers_empty_star(spark):
    bootstrap.bootstrap(spark)
    for name, schema in bootstrap.STAR_SCHEMAS.items():
        df = spark.sql(f"SELECT * FROM {name}")
        assert df.count() == 0
        assert df.schema == schema


def test_ddl_parses_and_matches_schema(spark, tmp_path):
    stmts = bootstrap.ddl(str(tmp_path))
    assert set(stmts) == set(bootstrap.STAR_SCHEMAS)
    for name, stmt in stmts.items():
        assert f"CREATE TABLE IF NOT EXISTS {name}" in stmt
        assert "USING parquet" in stmt
        for f in bootstrap.STAR_SCHEMAS[name].fields:
            assert f.name in stmt
