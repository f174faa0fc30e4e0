"""Operator modules — importing this package registers every op from
SURVEY.md §2 into `lambda_hive_spark.registry`.

Import order IS registration order, and the driver's bounded
correctness window grades ungraded ops in registration order
(`__spark_entry__._ordered_ops`) — so round-1/2 modules (including
windows/udx, the oldest never-graded backlog) register BEFORE the
round-3 additions (timeseries, tpch_full, training); newly added ops
queue behind the existing backlog rather than displacing it."""

from lambda_hive_spark.operators import (  # noqa: F401
    advagg,
    aggregates,
    analytics,
    extras,
    functions,
    functions2,
    joins,
    llm,
    maintenance,
    misc_agg,
    multimodal,
    pipeline,
    relational,
    scans,
    setops,
    sorts,
    stats,
    streams,
    tpch,
    udx,
    windows,
    timeseries,
    tpch_full,
    training,
    profiling,
    warehouse,
    quality,
    sketches,
    intervals,
    graph,
    spark4,
)
