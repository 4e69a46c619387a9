"""Bucketed co-located join: the write-time lever that removes the
shuffle from repeated large-table equi-joins (SCALE.md). Both sides are
bucketed+sorted on the join key, so the sort-merge join runs with ZERO
exchanges — the plan shape that must survive a 100x scale-up."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from mapreduce_project_spark.plans.inspect import count_node, has_node


def test_bucketed_join_has_no_exchange(spark):
    a_name = f"bkt_a_{uuid.uuid4().hex[:8]}"
    b_name = f"bkt_b_{uuid.uuid4().hex[:8]}"
    left = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # one file per bucket (repartition on the bucket key) — with
        # multiple files per bucket Spark distrusts the per-file sort
        # and re-sorts before the merge join
        left.repartition(8, "k").write.bucketBy(8, "k").sortBy("k").saveAsTable(a_name)
        right.repartition(8, "k").write.bucketBy(8, "k").sortBy("k").saveAsTable(b_name)
        # force the sort-merge path (at real scale neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(a_name).join(spark.table(b_name), "k")
        # co-located: no shuffle on either side (a per-bucket in-memory
        # sort remains — Spark no longer trusts bucket-file ordering by
        # default, SPARK-28595 — but the exchange, the part that costs
        # network at scale, is gone)
        assert count_node(joined, "Exchange") == 0, "bucketed join must not shuffle"
        assert has_node(joined, "SortMergeJoin")
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql(f"DROP TABLE IF EXISTS {a_name}")
        spark.sql(f"DROP TABLE IF EXISTS {b_name}")
