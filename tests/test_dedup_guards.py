"""Guard-rail tests for the iterative dedup kernels."""

from __future__ import annotations

import pytest

from near_real_time_data_warehouse_spark.operators.dedup import connected_components


def test_connected_components_raises_when_iteration_capped(spark):
    # A 6-vertex path graph has diameter 5: label 0 cannot reach vertex 5
    # in 2 rounds, so the kernel must refuse to return unconverged labels.
    vertices = spark.range(6).withColumnRenamed("id", "doc_id")
    chain = [(i, i + 1) for i in range(5)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(vertices, edges, max_iterations=2)
    # and with enough rounds it converges to a single component
    labels = connected_components(vertices, edges, max_iterations=10)
    assert {r.component for r in labels.collect()} == {0}
