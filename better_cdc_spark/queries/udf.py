"""UDF / UDAF / UDTF surface (SURVEY.md §2.2 Q90–Q93), oracle-paired.

Demonstrates every user-function extension point with deterministic,
SQL-checkable semantics:

- Q90 row-at-a-time Python UDF — the reference's subject-token sanitizer
  (internal/config/config.go:188-234) as a scalar function. Kept OFF hot
  paths at scale (per-row serialization); it exists because users write
  them; the engine must run them correctly.
- Q91 pandas (vectorized) UDF — Arrow-batched, the sanctioned Python path
  (~10-100× over Q90's per-row bridge).
- Q92 grouped-map applyInPandas — the UDAF-equivalent: whole-group pandas
  kernel after a hash shuffle on the group key.
- Q93 Python UDTF (one row → many) — lateral-joined table function.

Scale notes: every query here shuffles at most once (Q92 on the group key);
Q90/Q91/Q93 are narrow maps. The Python boundary is Arrow-batched except
Q90 (deliberately row-at-a-time, it IS the thing being exercised).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from better_cdc_spark.io import load_table
from better_cdc_spark.queries import query
from better_cdc_spark.session import tune_for_oracle

# ---------------------------------------------------------------------------
# Q90 — Python scalar UDF: NATS-subject token sanitizer (reference R9)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[^A-Za-z0-9_-]")


def sanitize_token(s: str | None) -> str | None:
    """Replace every char outside [A-Za-z0-9_-] with '_' (subject-safe).

    Mirrors the reference's subject sanitization contract
    (internal/publisher/dlq.go:50-63): tokens must never introduce
    delimiter/wildcard chars into the routing subject.
    """
    if s is None:
        return None
    return _TOKEN_RE.sub("_", s)


sanitize_token_udf = F.udf(sanitize_token, T.StringType())


@query(
    "q90_python_udf",
    oracle="""
    SELECT c_custkey,
           concat_ws('.', 'cdc', 'db',
                     regexp_replace(c_mktsegment, '[^A-Za-z0-9_-]', '_', 'g'),
                     regexp_replace(c_name, '[^A-Za-z0-9_-]', '_', 'g')) AS subject
    FROM customer
    WHERE c_custkey <= 500
    """,
    tags=("udf",),
)
def q90_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF building sanitized routing subjects."""
    tune_for_oracle(spark)
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return cust.select(
        "c_custkey",
        F.concat_ws(
            ".",
            F.lit("cdc"),
            F.lit("db"),
            sanitize_token_udf("c_mktsegment"),
            sanitize_token_udf("c_name"),
        ).alias("subject"),
    )


# ---------------------------------------------------------------------------
# Q91 — pandas (vectorized) UDF: discounted charge
# ---------------------------------------------------------------------------


@F.pandas_udf(T.LongType())
def charge_micros_vec(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized charge = price * (1-discount) * (1+tax), in micro-units.

    Inputs are 2-decimal money values, so the true charge has ≤6 decimals —
    an exact integer in micros. Emitting that integer makes the result
    tie-free across engines (rounding a 4-decimal double hits exact .5
    boundaries constantly with money inputs).
    """
    return (price * (1.0 - discount) * (1.0 + tax) * 1_000_000).round().astype("int64")


@query(
    "q91_pandas_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000, 0)
                AS BIGINT) AS charge_micros
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
    tags=("udf", "pandas"),
)
def q91_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar computation with an exact integer contract."""
    tune_for_oracle(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge_micros_vec("l_extendedprice", "l_discount", "l_tax").alias("charge_micros"),
    )


# ---------------------------------------------------------------------------
# Q92 — grouped-map applyInPandas (UDAF-equivalent)
# ---------------------------------------------------------------------------

_Q92_SCHEMA = T.StructType(
    [
        T.StructField("o_custkey", T.LongType()),
        T.StructField("n_orders", T.LongType()),
        T.StructField("sum_total", T.DoubleType()),
        T.StructField("max_total", T.DoubleType()),
    ]
)


def _order_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Whole-group pandas kernel: per-customer order stats.

    Sum via sorted-ascending accumulation so the fp result is reproducible
    and matches an oracle summing the same exact values as DECIMAL.
    """
    totals = pdf["o_totalprice"].round(2)
    return pd.DataFrame(
        {
            "o_custkey": [pdf["o_custkey"].iloc[0]],
            "n_orders": [len(pdf)],
            "sum_total": [float(totals.sort_values().sum().round(2))],
            "max_total": [float(totals.max())],
        }
    )


@query(
    "q92_grouped_map",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_total
    FROM orders
    WHERE o_custkey <= 200
    GROUP BY o_custkey
    """,
    tags=("udf", "grouped-map"),
)
def q92_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas after a hash shuffle on the group key.

    The group key is the shuffle key; each group materializes as one Arrow
    batch in Python. At 100 TB the per-group size bound matters (a hot
    customer must fit in executor memory) — for unbounded groups prefer
    built-in aggs (q30) or pre-aggregate before the pandas kernel.
    """
    tune_for_oracle(spark)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    return (
        orders.select("o_custkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(_order_stats, schema=_Q92_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Q93 — Python UDTF (one row → many)
# ---------------------------------------------------------------------------


@query(
    "q93_udtf",
    oracle="""
    SELECT doc_id, u.pos AS pos, u.word AS word
    FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w)),
                      i -> struct_pack(pos := i, word := w[i]))) AS u
        FROM (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE doc_id < 50)
    )
    """,
    tags=("udf", "udtf"),
)
def q93_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF exploding a document into (pos, word) rows via LATERAL join.

    The UDTF yields one output row per word — the table-function extension
    point (Spark 3.5+ `udtf`). Narrow map: each input row expands locally,
    no shuffle. posexplode(split(...)) would plan the same shape fully in
    the JVM; the point here is the Python UDTF surface itself.
    """
    tune_for_oracle(spark)
    # Arrow-optimized UDTF evaluation (Spark 4): batches rows over Arrow
    # instead of pickling row-at-a-time.
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, word: string")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return
            for i, word in enumerate(text.split(" "), start=1):
                yield i, word

    spark.udtf.register("bcs_split_words", SplitWords)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.select("doc_id", "text").createOrReplaceTempView("bcs_q93_docs")
    return spark.sql(
        """
        SELECT doc_id, s.pos, s.word
        FROM bcs_q93_docs, LATERAL bcs_split_words(text) s
        """
    )


@query(
    "q91b_map_in_arrow",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
                                  (a, b) -> a + b)), 4) AS l2_norm,
           len(embedding) AS dim
    FROM embeddings
    """,
    tags=("udf", "arrow"),
)
def q91b_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy Python boundary (Spark 4) — the kernel
    receives pyarrow RecordBatches directly, skipping even the
    Arrow→pandas conversion that mapInPandas pays.

    Computes per-vector L2 norms over the Arrow buffers. For wide numeric
    batch kernels (embedding pipelines), this is the fastest Python path
    Spark has; the plan is a narrow map, zero shuffle. Cross-engine
    determinism: the kernel accumulates float64 in the SAME left-fold
    order as the oracle's list_reduce (a numpy pairwise dot differs in
    the last ulps) and rounds half-away-from-zero like DuckDB's ROUND
    (Python round() is banker's) — bit-identical at the 4dp compare for
    any testdata regeneration.
    """
    import math

    import pyarrow as pa

    tune_for_oracle(spark)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def norms(batches):
        for batch in batches:
            tbl = batch.to_pydict()
            ids = tbl["vec_id"]
            vecs = tbl["embedding"]
            out_norm, out_dim = [], []
            for v in vecs:
                acc = 0.0
                for x in v:
                    fx = float(x)
                    acc += fx * fx
                norm = math.sqrt(acc)
                out_norm.append(math.floor(norm * 1e4 + 0.5) / 1e4)
                out_dim.append(len(v))
            yield pa.RecordBatch.from_pydict(
                {"vec_id": ids, "l2_norm": out_norm, "dim": out_dim},
                schema=pa.schema(
                    [("vec_id", pa.int64()), ("l2_norm", pa.float64()), ("dim", pa.int64())]
                ),
            )

    return emb.mapInArrow(norms, "vec_id long, l2_norm double, dim long")
