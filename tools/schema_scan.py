"""Flag registry queries whose OUTPUT columns are complex-typed
(array/map/struct) — the external driver's canonicalizer sorts rows with
pandas, which cannot hash list cells, so such a query crashes the
driver's compare even when tools/check.py passes it locally.

Usage: PYTHONPATH=/root/repo python tools/schema_scan.py <sf_dir> [names...]
"""
import sys

from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, MapType, StructType

from better_cdc_spark.queries import load_all, REGISTRY


def main() -> None:
    sf_dir = sys.argv[1]
    load_all()
    names = sys.argv[2:] or list(REGISTRY)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("schema_scan")
        .getOrCreate()
    )
    flagged = []
    for name in names:
        spec = REGISTRY[name]
        try:
            df = spec.fn(spark, sf_dir)
            bad = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            continue
        if bad:
            flagged.append((name, bad))
            print(f"FLAG {name}: complex output columns {bad}")
        else:
            print(f"ok   {name}")
    print(f"\n{len(flagged)} flagged of {len(names)}")


if __name__ == "__main__":
    main()
