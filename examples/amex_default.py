"""Large-parquet training (reference: examples/amex_default.py).

The reference scans the ~5.5M-row AMEX parquet, drops non-feature columns,
imputes nulls, fits depth-4, and reports training accuracy.  Offline, the
driver's lineitem table stands in: a synthetic binary target is derived and
the identical pipeline runs — lazy parquet scan (S1), drop (P2), fill_null
(P8), fit, predict_many accuracy.  Set SPARK_GRAFT_SF_DIR to scale up.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from efficient_trees_spark.session import get_spark
from efficient_trees_spark.sources import io
from efficient_trees_spark.tree import DecisionTreeClassifier
from examples.utils import Timer, plot_tree

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

spark = get_spark(app_name="amex-default-example")
spark.sparkContext.setLogLevel("ERROR")

data = io.read_parquet(spark, f"{sf_dir}/lineitem.parquet")

columns_to_exclude = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_comment",  # string column
    "l_shipdate",  # date column, would need transforming
    "l_commitdate",
    "l_receiptdate",
    "l_returnflag",
    "l_linestatus",
    "l_shipinstruct",
    "l_shipmode",
]
target_name = "target"

data = (
    data.withColumn(target_name, (F.col("l_returnflag") == "R").cast("int"))
    .drop(*columns_to_exclude)
    .na.fill(0.0)
)

tree = DecisionTreeClassifier(max_depth=4, streaming=True)
with Timer("fit"):
    tree.fit(data, target_name)
tree.save_model("/tmp/decision_tree.pkl")
plot_tree(tree.tree, "decision_tree_amex.pdf")

with Timer("predict"):
    scored = tree.transform(data, null_policy="keep")
    agg = scored.select(
        F.avg((F.col(target_name) == F.col("prediction")).cast("double")).alias("acc")
    ).collect()
print(f"Training Accuracy: {agg[0]['acc']:.2f}")
spark.stop()
