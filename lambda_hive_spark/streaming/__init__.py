"""Structured Streaming surface (SURVEY.md §2.9).

Design: every streaming operator is a *mode-agnostic plan builder*
(`plans.py`) applied to either a batch DataFrame (for the driver's
DuckDB t2 gate) or a `readStream` DataFrame (for the true streaming
tests). The same declarative plan runs in both modes — that is the
idiomatic Spark unified-batch/stream story, and it is what makes the
batch oracle a meaningful check of the streaming semantics.

Reference file:line citations: N/A — the reference dir is empty
(SURVEY.md §0); this surface is mandated by SURVEY.md §2.9.
"""

from lambda_hive_spark.streaming.core import (  # noqa: F401
    events_stream,
    landing_dir,
    run_available_now,
)
