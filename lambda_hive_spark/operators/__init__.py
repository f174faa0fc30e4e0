"""Operator modules — importing this package registers every op from
SURVEY.md §2 into `lambda_hive_spark.registry`."""

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
    timeseries,
    tpch,
    tpch_full,
    training,
    udx,
    windows,
)
