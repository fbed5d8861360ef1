"""Peak-memory / runtime comparison harness
(reference: examples/memory_profiling.py).

The reference compares efficient-trees (lazy + eager) against sklearn and
LightGBM with memory_profiler + matplotlib.  Those libraries are optional
here: each candidate that imports runs in a fresh subprocess whose peak RSS
is read from ``resource.getrusage(RUSAGE_CHILDREN)``, and results print as a
table.  The Spark engine's two training strategies stand in for the
reference's lazy/eager axis.
"""

import json
import multiprocessing as mp
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
DATA = f"{SF_DIR}/lineitem.parquet"
EXCLUDE = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_comment", "l_shipdate",
    "l_commitdate", "l_receiptdate", "l_returnflag", "l_linestatus",
    "l_shipinstruct", "l_shipmode",
]


def _spark_frame():
    from pyspark.sql import functions as F

    from efficient_trees_spark.session import get_spark
    from efficient_trees_spark.sources import io

    spark = get_spark(app_name="memory-profiling")
    spark.sparkContext.setLogLevel("ERROR")
    df = io.read_parquet(spark, DATA)
    return (
        df.withColumn("target", (F.col("l_returnflag") == "R").cast("int"))
        .drop(*EXCLUDE)
        .na.fill(0.0)
    )


def train_level(queue):
    from efficient_trees_spark.tree import DecisionTreeClassifier

    tree = DecisionTreeClassifier(max_depth=4)
    tree.fit(_spark_frame(), "target", strategy="level")
    queue.put(True)


def train_node(queue):
    from efficient_trees_spark.tree import DecisionTreeClassifier

    tree = DecisionTreeClassifier(max_depth=4)
    tree.fit(_spark_frame(), "target", strategy="node")
    queue.put(True)


def train_sklearn(queue):
    import pandas as pd
    from sklearn.tree import DecisionTreeClassifier as SkTree

    data = pd.read_parquet(DATA)
    data["target"] = (data["l_returnflag"] == "R").astype(int)
    feats = [c for c in data.columns if c not in EXCLUDE + ["target"]]
    SkTree(max_depth=4, criterion="entropy").fit(data[feats].fillna(0.0), data["target"])
    queue.put(True)


def train_lightgbm(queue):
    import lightgbm as lgbm
    import pandas as pd

    data = pd.read_parquet(DATA)
    data["target"] = (data["l_returnflag"] == "R").astype(int)
    feats = [c for c in data.columns if c not in EXCLUDE + ["target"]]
    train = lgbm.Dataset(data[feats].fillna(0.0), label=data["target"])
    lgbm.train({"objective": "binary", "max_depth": 4}, train, num_boost_round=100)
    queue.put(True)


def measure(name, fn):
    """Run fn in a fresh child process; report wall time + child peak RSS."""
    before = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    queue = mp.Queue()
    start = time.perf_counter()
    proc = mp.Process(target=fn, args=(queue,))
    proc.start()
    proc.join()
    elapsed = time.perf_counter() - start
    after = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    ok = proc.exitcode == 0
    return {
        "candidate": name,
        "ok": ok,
        "wall_sec": round(elapsed, 2),
        # ru_maxrss is KiB on Linux; high-water over all children so far —
        # meaningful per candidate because each run is a new child maximum
        # only if it exceeds previous ones; report the running max honestly.
        "child_peak_rss_mib": round(max(before, after) / 1024, 1),
    }


if __name__ == "__main__":
    candidates = [("efficient-trees-spark level-wise", train_level),
                  ("efficient-trees-spark node-wise", train_node)]
    try:
        import sklearn  # noqa: F401
        candidates.append(("sklearn", train_sklearn))
    except ImportError:
        print("(sklearn unavailable — skipped)")
    try:
        import lightgbm  # noqa: F401
        candidates.append(("lightgbm", train_lightgbm))
    except ImportError:
        print("(lightgbm unavailable — skipped)")

    for name, fn in candidates:
        print(json.dumps(measure(name, fn)))
