"""Source/sink parity helpers (sources/io.py): the S2/S3/S5 reference
surface — CSV scan, in-memory pandas table, result -> list — plus the
temp-view registration used for spark.sql access."""

import pandas as pd
from pyspark.sql import functions as F

from efficient_trees_spark.sources import io


def test_read_csv_infers_header_and_schema(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("a,b,c\n1,2.5,x\n3,4.5,y\n")
    df = io.read_csv(spark, p)
    assert df.columns == ["a", "b", "c"]
    rows = sorted(map(tuple, df.collect()))
    assert rows == [(1, 2.5, "x"), (3, 4.5, "y")]  # typed, not strings
    # explicit-schema escape hatch: inference off keeps strings
    raw = io.read_csv(spark, p, infer_schema=False)
    assert [f.dataType.typeName() for f in raw.schema.fields] == ["string"] * 3


def test_from_pandas_round_trip(spark):
    pdf = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    df = io.from_pandas(spark, pdf)
    assert df.count() == 3
    back = df.toPandas().sort_values("x").reset_index(drop=True)
    assert back.equals(pdf)


def test_to_list_default_and_named_column(spark):
    df = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "n int, s string")
    ordered = df.orderBy("n")
    assert io.to_list(ordered) == [1, 2, 3]  # first column by default
    assert io.to_list(ordered, "s") == ["a", "b", "c"]


def test_register_views_serves_spark_sql(spark, sf_small):
    io.register_views(spark, sf_small)
    got = spark.sql(
        "SELECT r_name FROM region ORDER BY r_name LIMIT 2"
    ).collect()
    assert [r[0] for r in got] == ["AFRICA", "AMERICA"]
    # joins across registered views work end-to-end
    n = spark.sql(
        "SELECT count(*) FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey"
    ).first()[0]
    assert n == 25


def test_write_parquet_for_wide_readers_bounds_row_groups(spark, tmp_path):
    """The wide-reader writer's contract: every written row group stays
    near the requested byte bound (the reader's per-task buffering unit),
    and the file count feeds the session's parallelism."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    cols = [
        (F.rand(seed=j) * 1000).alias(f"c{j}") for j in range(40)
    ]
    df = spark.range(120_000).select("id", *cols)
    out = str(tmp_path / "wide.parquet")
    bound = 1 << 20  # 1 MB groups to force several per file
    io.write_parquet_for_wide_readers(
        df, out, row_group_bytes=bound, rows_per_file=30_000
    )
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= spark.sparkContext.defaultParallelism
    total_groups = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for g in range(meta.num_row_groups):
            # the UNCOMPRESSED group size is what block.size bounds (the
            # writer flushes when the buffered estimate crosses it — allow
            # 2x for estimation slack on the last buffered page set), and
            # it is also what the reader buffers per task
            assert meta.row_group(g).total_byte_size <= 2 * bound
        total_groups += meta.num_row_groups
    # the bound actually engaged: far more groups than files
    assert total_groups > len(files)


def test_fan_out_never_probes_rdd_and_skips_derived_lineages(
    spark, sf_small, monkeypatch
):
    """r12 guard: ``fan_out_small_input`` must never touch ``df.rdd`` —
    under AQE, ``.rdd`` on a plan containing any Exchange EXECUTES the
    shuffle stages below it (a full extra pass per probe).  Scan
    pipelines still fan out via the file-size estimate; a derived
    lineage (post-aggregation) is returned unchanged instead of probed."""
    import pyspark.sql.classic.dataframe as _cdf

    def poisoned_rdd(self):
        raise AssertionError(
            ".rdd probe reached in fan_out_small_input — this executes "
            "Exchange stages under AQE"
        )

    monkeypatch.setattr(
        _cdf.DataFrame, "rdd", property(poisoned_rdd), raising=True
    )
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    fanned = io.fan_out_small_input(docs.select("doc_id", "text"))
    # the few-split local scan was widened (plan carries the repartition)
    assert "Repartition" in fanned._jdf.queryExecution().analyzed().toString()
    assert fanned.count() == docs.count()

    derived = docs.groupBy("doc_id").count()
    out = io.fan_out_small_input(derived)
    assert out is derived  # skipped: no estimate, no .rdd probe
