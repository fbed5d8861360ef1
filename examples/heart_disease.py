"""Heart-disease-style classification from a CSV scan
(reference: examples/heart_disease.py).

The reference pulls a Kaggle CSV via kagglehub; offline, this example
materializes an equivalent mixed numeric/categorical table (FIXTURES.md F2)
to CSV first, then runs the reference flow Spark-first:

- CSV scan with inferred schema            (S2 — `spark.read.csv`)
- drop excluded columns                    (P2)
- full shuffle                             (O4 — `orderBy(rand(seed))`)
- 80/20 offset slice                       (O3 — row_number over explicit order)
- categorical target encoding, depth-8 fit, save_model, accuracy
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from efficient_trees_spark.session import get_spark
from efficient_trees_spark.tree import DecisionTreeClassifier
from examples.utils import plot_tree

spark = get_spark(app_name="heart-disease-example", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

# ---- offline stand-in for the Kaggle download: synthesize + write CSV ------
rng = np.random.RandomState(7)
n = 5000
systolic = rng.normal(130, 20, n).round()
cholesterol = rng.randint(1, 4, n)
risk = (systolic - 120) / 40 + (cholesterol - 1) * 0.6 + rng.normal(0, 1, n)
pdf = pd.DataFrame(
    {
        "id": np.arange(n),
        "age": rng.randint(10000, 25000, n),  # days, like the source data
        "height": rng.randint(150, 200, n),
        "weight": (rng.normal(74, 14, n)).round(1),
        "gender": rng.randint(1, 3, n),
        "ap_hi": systolic,
        "ap_lo": (systolic - rng.normal(40, 8, n)).round(),
        "cholesterol": cholesterol,
        "gluc": rng.randint(1, 4, n),
        "smoke": rng.randint(0, 2, n),
        "alco": rng.randint(0, 2, n),
        "active": rng.randint(0, 2, n),
        "bp_category": "n/a",
        "bp_category_encoded": 0,
        "cardio": (risk > 0.5).astype(int),
    }
)
csv_dir = os.path.join(tempfile.gettempdir(), "cardio_csv_example")
pdf.to_csv(os.path.join(csv_dir + ".csv"), index=False)

# ---- the reference flow ----------------------------------------------------
data = spark.read.csv(csv_dir + ".csv", header=True, inferSchema=True)

# drop columns that should not be used (reference heart_disease.py:15)
data = data.drop("id", "age", "bp_category", "bp_category_encoded")

target_name = "cardio"
categorical_columns = ["gender", "cholesterol", "gluc", "smoke", "alco", "active"]

# sample(fraction=1.0, shuffle=True) -> deterministic-seed random reorder (O4)
data = data.orderBy(F.rand(42))

# slice(0, n)/slice(n) train-test split (O3): Spark frames are unordered, so
# pin the shuffled order with a row_number before slicing.
count_training_data = int(data.count() * 0.8)
w = Window.orderBy(F.rand(43))
indexed = data.withColumn("__idx", F.row_number().over(w))
training_data = indexed.filter(F.col("__idx") <= count_training_data).drop("__idx")
test_data = indexed.filter(F.col("__idx") > count_training_data).drop("__idx")

tree = DecisionTreeClassifier(
    max_depth=8, streaming=True, categorical_columns=categorical_columns
)
tree.fit(training_data.na.fill(0.0), target_name)
tree.save_model(os.path.join(tempfile.gettempdir(), "decision_tree.pkl"))
plot_tree(tree.tree, "decision_tree_heart_disease.pdf")

for data_type, dataset in [("Training", training_data), ("Test", test_data)]:
    scored = tree.transform(dataset.na.fill(0.0), null_policy="keep")
    agg = scored.select(
        F.avg((F.col(target_name) == F.col("prediction")).cast("double")).alias("acc")
    ).collect()
    print(f"{data_type} Accuracy: {agg[0]['acc']:.2f}")

spark.stop()
