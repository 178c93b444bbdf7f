"""CDC pipeline: change-log ingest → normalized CDC envelope → routing/DLQ.

Spark-first re-expression of the reference's dataflow
(source → decode → filter → tx-assembly → transform → route → sink):
every stage is a DataFrame transformation optimized by Catalyst; ordering
and transaction structure are data properties (lsn, txid, seq_in_tx), not
delivery properties.
"""

from better_cdc_spark.cdc.changelog import (  # noqa: F401
    read_changelog_json,
    synthesize_changelog_from_orders,
)
from better_cdc_spark.cdc.apply import apply_changelog, latest_per_key, snapshot_at  # noqa: F401
from better_cdc_spark.cdc.scd2 import scd2_apply_increment, scd2_history  # noqa: F401
from better_cdc_spark.cdc.normalize import normalize_changelog  # noqa: F401
from better_cdc_spark.cdc.dlq import route_failures  # noqa: F401
from better_cdc_spark.cdc.serialize import marshal_cdc_event  # noqa: F401
