"""lambda_hive_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query/data-processing
capabilities cataloged in SURVEY.md. The reference repo at
/root/reference is empty (SURVEY.md §0), so SURVEY.md §2 is the
authoritative operator contract; no reference file:line citations are
possible.

Design (SURVEY.md §3/§4): the engine introduces NO intermediate
representation of its own — every operator is a declarative DataFrame
plan handed to Catalyst. Engine-owned structures are limited to the
operator registry (`registry.OPS`) and the orchestrator DAG
(`orchestrate.Dag`).
"""

from lambda_hive_spark.registry import all_ops, op
from lambda_hive_spark.io import TABLES, register_views, table
from lambda_hive_spark.session import get_spark

__all__ = ["all_ops", "op", "TABLES", "register_views", "table", "get_spark"]
__version__ = "0.1.0"
