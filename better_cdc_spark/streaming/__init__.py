"""Structured Streaming surface: windows, dedup, stateful ops, CDC pipeline."""

from better_cdc_spark.streaming.core import (  # noqa: F401
    events_stream,
    run_to_memory,
    run_to_parquet,
)
from better_cdc_spark.streaming.pipeline import CDCStreamPipeline  # noqa: F401
