"""MLlib sanity cross-check (SURVEY.md §7.3): this engine's exact-split tree
must be at least as accurate as pyspark.ml's quantile-binned
DecisionTreeClassifier on the same data at the same depth.

MLlib cannot reproduce the reference's semantics (no exact distinct-value
thresholds, no gain>0 stop, no node-dict artifact) — the cross-check is
about gross training correctness, not parity: if our accuracy ever fell
clearly below MLlib's at equal depth, the split search would be broken in a
way the DuckDB oracles (which verify the math, not the learning) might not
catch.
"""

from __future__ import annotations

from pyspark.ml.classification import DecisionTreeClassifier as MLlibTree
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.sql import functions as F

from efficient_trees_spark.enums import Criterion
from efficient_trees_spark.tree import DecisionTreeClassifier

FEATURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def test_accuracy_at_least_mllib(spark, sf_small):
    li = (
        spark.read.parquet(f"{sf_small}/lineitem.parquet")
        .select(*FEATURES, F.col("l_returnflag").alias("target"))
        .cache()
    )
    try:
        n = li.count()

        ours = DecisionTreeClassifier(max_depth=3, criterion=Criterion.GINI)
        ours.fit(li, "target")
        ours_correct = (
            ours.transform(li, null_policy="keep")
            .filter(F.col("prediction") == F.col("target"))
            .count()
        )

        indexed = StringIndexer(inputCol="target", outputCol="label").fit(li).transform(li)
        assembled = VectorAssembler(inputCols=FEATURES, outputCol="features").transform(indexed)
        mllib_model = MLlibTree(
            maxDepth=3, impurity="gini", labelCol="label", featuresCol="features"
        ).fit(assembled)
        mllib_correct = (
            mllib_model.transform(assembled)
            .filter(F.col("prediction") == F.col("label"))
            .count()
        )

        ours_acc = ours_correct / n
        mllib_acc = mllib_correct / n
        # Exact split search considers a superset of MLlib's binned candidate
        # thresholds; tiny slack absorbs tie-break/binning jitter.
        assert ours_acc >= mllib_acc - 0.01, (ours_acc, mllib_acc)
        # and both must actually have learned something beyond one class
        majority = (
            li.groupBy("target").count().orderBy(F.desc("count")).first()["count"] / n
        )
        assert ours_acc >= majority
    finally:
        li.unpersist()
