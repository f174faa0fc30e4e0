"""Value-free actions on Python-UDF-backed ops.

df.count() (and any projection that needs none of the output values)
lets Catalyst prune the inputs of applyInPandas / cogroup / UDTF
nodes down to the grouping key — the pandas function then receives
frames WITHOUT its value columns. udaf_cogrouped crashed exactly this
way (KeyError 'ts' from the Python worker; fixed round 5 by guarding
on column presence). The driver's gate materializes full outputs, so
this failure mode is invisible there — this test is the only thing
that exercises the pruned path for every Python-boundary op.
"""

from __future__ import annotations

import pytest

from lambda_hive_spark.registry import all_ops

SF = "/root/testdata/sf0.001"

# Every op whose plan crosses the JVM↔Python boundary (pandas_udf,
# applyInPandas, cogroup, mapInPandas, UDTF).
PY_BOUNDARY_OPS = [
    "udf_scalar",
    "udf_scalar_iter",
    "udaf_grouped",
    "udaf_cogrouped",
    "udtf",
    "udtf_arrow",
    "stream_stateful",
    "mm_ingest",
    "mm_feature_extract",
    "mm_resize_stub",
    "mm_frame_sample",
]


@pytest.mark.parametrize("name", PY_BOUNDARY_OPS)
def test_count_survives_column_pruning(spark, name):
    ops = all_ops()
    assert ops[name].fn(spark, SF).count() >= 0
