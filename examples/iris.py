"""Iris classification (reference: examples/iris.py).

Same flow as the reference — iris, seed-42 70/30 split, depth-4 tree, train
and test accuracy — with the frames as Spark DataFrames.  sklearn's loader
and splitter are replaced by the bundled dataset module; `accuracy_score`
by a plain comparison.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from efficient_trees_spark.datasets import iris_train_test
from efficient_trees_spark.session import get_spark
from efficient_trees_spark.tree import DecisionTreeClassifier
from examples.utils import plot_tree

spark = get_spark(app_name="iris-example", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

train_pdf, test_pdf = iris_train_test()
train = spark.createDataFrame(train_pdf)

decision_tree_classifier = DecisionTreeClassifier(max_depth=4)
decision_tree_classifier.fit(train, "target")
plot_tree(decision_tree_classifier.tree, "decision_tree_iris.pdf")

y_train_pred = decision_tree_classifier.predict(
    train_pdf.drop(columns=["target"]).to_dict("records")
)
y_test_pred = decision_tree_classifier.predict(
    test_pdf.drop(columns=["target"]).to_dict("records")
)

train_accuracy = (train_pdf["target"] == y_train_pred).mean()
test_accuracy = (test_pdf["target"] == y_test_pred).mean()

print(f"Training Accuracy: {train_accuracy:.2f}")
print(f"Test Accuracy: {test_accuracy:.2f}")
spark.stop()
