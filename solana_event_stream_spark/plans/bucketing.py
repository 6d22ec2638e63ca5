"""Bucketed-table layout: co-located joins without shuffles.

At 100 TB the dominant cost of the big fact-fact joins (orders ⋈
lineitem; instruction events ⋈ CPI events by signature) is the shuffle
of both sides. Spark's bucketed tables pre-hash-partition data on disk:
when both sides are bucketed on the join key with the same bucket
count, the SortMergeJoin reads bucket i of each side directly —
`.explain` shows NO Exchange on either side (and no Sort either when
the buckets are also sortBy'd and single-file).

This is the persisted-layout counterpart of the broadcast/AQE strategy
the catalog queries use: pay one bucketed write, then every subsequent
join on that key is shuffle-free. The right call when a table is joined
on the same key by many queries (events by signature, lineitem by
orderkey).

Demonstrated + asserted in tests/test_bucketing.py; plan excerpt in
PLANS.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, path: str, key: str,
                   n_buckets: int = 8) -> None:
    """Persist ``df`` as an external bucketed+sorted parquet table.

    Bucket metadata lives in the session catalog (bucketBy requires
    saveAsTable); the parquet files live at ``path``. ``sortBy`` the
    same key so single-file buckets also skip the merge-join Sort.
    """
    (df.write.format("parquet")
     .option("path", path)
     .mode("overwrite")
     .bucketBy(n_buckets, key)
     .sortBy(key)
     .saveAsTable(table_name))


def cohosted_join(spark: SparkSession, left_table: str, right_table: str,
                  left_key: str, right_key: str) -> DataFrame:
    """Join two bucketed tables on their bucket keys (shuffle-free when
    bucket counts match)."""
    left, right = spark.table(left_table), spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
