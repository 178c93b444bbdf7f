"""better_cdc_spark — a PySpark-native analytics engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of the reference CDC pipeline (elqsar/better-cdc): CDC
change-log normalization, the full relational operator surface, streaming
semantics (watermarks, dedup, stateful transaction assembly, idempotent
sinks), plus large-scale training-data-pipeline operators (dedup families,
similarity search, text analysis, multimodal columns).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Pandas UDFs only where built-ins can't express the semantics.
"""

__version__ = "0.1.0"

from better_cdc_spark.session import get_spark  # noqa: F401
