"""SURVEY.md §2 operator inventory as checkable queries on the TPC-H-ish
testdata, each paired with a DuckDB oracle.

Conventions for oracle agreement:
* every computed column is aliased identically on both sides;
* money aggregates go through DECIMAL(18,4) so sums are exact and
  order-independent (double summation order differs between engines);
* ratio/criterion outputs are rounded to 9 dp on both sides;
* timestamps are formatted to strings;
* any LIMIT is preceded by a total-order sort.

Scale notes are inline per query — these run at sf0.01 for the gate but are
written for the 100 TB layout (pushdown-friendly filters, broadcast dims,
partial aggregation, no driver-side loops).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from efficient_trees_spark.workloads.base import load, workload

DEC = "decimal(18,4)"


# --------------------------------------------------------------------- scans

@workload(
    "s1_scan_project_filter",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_quantity > 30 AND l_returnflag = 'R'
    """,
    description="S1+P1+F1/F2: parquet scan with projection+predicate pushdown "
    "(reference: pl.scan_parquet, amex_default.py:12; select/filter tree.py:239)",
    tags=("inventory",),
)
def s1_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both the filter and the 3-column projection reach the parquet reader
    # (PushedFilters / ReadSchema in explain) — at 100 TB this is the
    # difference between scanning 3 columns of a few row groups and the table.
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .filter((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R"))
        .drop("l_returnflag")
    )


# --------------------------------------------------------- projection suite

@workload(
    "p_projection_suite",
    oracle="""
        SELECT o_orderkey,
               o_totalprice AS price,
               CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(0.1 AS DECIMAL(4,2)) AS DOUBLE) AS tax,
               upper(o_orderpriority) AS priority,
               'orders' AS src,
               CAST(o_orderkey AS VARCHAR) AS key_str
        FROM orders
    """,
    description="P2-P6: drop/rename/computed/literal/cast columns "
    "(reference tree.py:75-77,133,240,334; test_tree.py:24-34)",
    tags=("inventory",),
)
def p_projection_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .drop("o_custkey", "o_orderstatus", "o_orderdate")  # P2
        .withColumnRenamed("o_totalprice", "price")  # P3
        .withColumn("tax", (F.col("price").cast(DEC) * F.lit(0.1).cast("decimal(4,2)")).cast("double"))  # P4/P6
        .withColumn("priority", F.upper("o_orderpriority"))  # P4
        .withColumn("src", F.lit("orders"))  # P5
        .withColumn("key_str", F.col("o_orderkey").cast("string"))  # P6
        .select("o_orderkey", "price", "tax", "priority", "src", "key_str")
    )


@workload(
    "p_transform_suite",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 WHEN 'R' THEN 2 END AS flag_code,
               coalesce(CASE WHEN l_discount < 0.02 THEN NULL ELSE l_discount END, 0.0) AS disc_filled,
               CAST(CAST(l_extendedprice AS REAL) AS DOUBLE) AS price_f32
        FROM lineitem
    """,
    description="P7+P8+P10 in one lineitem pass: dict-based value replace as "
    "a literal-map lookup (reference pl.col().replace(mapping), tree.py:76), "
    "null imputation fill_null(0.0) on synthesized nulls (amex_default.py:23), "
    "and dtype shrinking — the float64 -> float32 round-trip behind the "
    "reference's shrink_dtype (tree.py:90; SURVEY.md P10), where both engines "
    "use IEEE round-to-nearest-even so values match bit-for-bit",
    tags=("inventory", "suite"),
)
def p_transform_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    mapping = {"A": 0, "N": 1, "R": 2}
    literal_map = F.create_map(*[x for k, v in mapping.items() for x in (F.lit(k), F.lit(v))])
    df = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        literal_map[F.col("l_returnflag")].alias("flag_code"),  # P7
        F.when(F.col("l_discount") < 0.02, F.lit(None)).otherwise(F.col("l_discount")).alias("disc_filled"),  # P8
        F.col("l_extendedprice").cast("float").cast("double").alias("price_f32"),  # P10
    )
    return df.na.fill({"disc_filled": 0.0})


@workload(
    "p9_nan_guard",
    oracle="""
        WITH p AS (
            SELECT l_returnflag,
                   CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM lineitem) AS prop
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               round(CASE WHEN prop > 0 THEN prop * log2(prop) ELSE 0.0 END, 9) AS entropy_term
        FROM p
    """,
    description="P9: the 0*log2(0)=0 guard from the entropy expression "
    "(reference fill_nan(0.0), tree.py:215)",
    tags=("inventory",),
)
def p9_nan_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w_all = Window.partitionBy()
    props = li.groupBy("l_returnflag").count().select(
        "l_returnflag",
        (F.col("count").cast("double") / F.sum("count").over(w_all)).alias("prop"),
    )
    return props.select(
        "l_returnflag",
        F.round(
            F.when(F.col("prop") > 0, F.col("prop") * F.log2("prop")).otherwise(0.0), 9
        ).alias("entropy_term"),
    )


@workload(
    "p11_row_index",
    oracle="""
        SELECT o_orderkey,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS idx
        FROM orders
        QUALIFY idx <= 1000
    """,
    description="P11: stable row index over an explicit total order "
    "(reference with_row_index, tree.py:135 — but see SURVEY §2.9: the engine "
    "avoids the index entirely for prediction)",
    tags=("inventory",),
)
def p11_row_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A global row index forces a single-partition window: acceptable only on
    # small/aggregated relations (here: capped at 1000 output rows). The engine
    # itself never needs one (CASE-compiled prediction preserves order).
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumn("idx", F.row_number().over(w))
        .filter(F.col("idx") <= 1000)
        .drop("o_totalprice")
    )


# ------------------------------------------------------------------ filters

@workload(
    "f3_filter_above_global_avg",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
    description="F3: filter against a scalar aggregate broadcast "
    "(reference sum>cum_sum filter, tree.py:274-277)",
    tags=("inventory",),
)
def f3_filter_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark form of Polars' scalar broadcast: empty-partition window (A4).
    # At scale: the window's agg is computed once per partition-tree by the
    # exchange; equivalently crossJoin(broadcast(agg)) — both avoid a driver trip.
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    w_all = Window.partitionBy()
    return orders.withColumn("avg_price", F.avg("o_totalprice").over(w_all)).filter(
        F.col("o_totalprice") > F.col("avg_price")
    ).drop("avg_price")


@workload(
    "f6_having_max",
    oracle="""
        WITH counts AS (SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority)
        SELECT o_orderpriority, n FROM counts WHERE n = (SELECT max(n) FROM counts)
    """,
    description="F6: HAVING against the max count — the reference's majority-class "
    "pattern (group_by.len().filter(len == len.max()), tree.py:175)",
    tags=("inventory",),
)
def f6_having_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = load(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    w_all = Window.partitionBy()
    return counts.withColumn("max_n", F.max("n").over(w_all)).filter(
        F.col("n") == F.col("max_n")
    ).drop("max_n")


# ------------------------------------------------------------- aggregations

@workload(
    "a_counts_suite",
    oracle="""
        SELECT l_quantity AS feature_value,
               count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS class_a_count,
               count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS class_n_count,
               count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS class_r_count,
               count(*) AS count_examples,
               count(CASE WHEN l_returnflag = 'A' THEN 1 END)
             + count(CASE WHEN l_returnflag = 'N' THEN 1 END)
             + count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS horizontal_total
        FROM lineitem
        GROUP BY l_quantity
    """,
    description="A1+A7 in one aggregation: per distinct feature value, "
    "per-class conditional counts + total (the split-finder workhorse, "
    "reference tree.py:243-254) and the row-wise horizontal sum across the "
    "generated per-class columns (reference pl.sum_horizontal, "
    "tree.py:210-218 — a plain + fold in Spark)",
    tags=("inventory", "suite"),
)
def a_counts_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy(F.col("l_quantity").alias("feature_value")).agg(
        F.count(F.when(F.col("l_returnflag") == "A", 1)).alias("class_a_count"),
        F.count(F.when(F.col("l_returnflag") == "N", 1)).alias("class_n_count"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("class_r_count"),
        F.count(F.lit(1)).alias("count_examples"),
    )
    horizontal = reduce(
        lambda a, b: a + b,
        [F.col(f"class_{c}_count") for c in ["a", "n", "r"]],
    )
    return agg.withColumn("horizontal_total", horizontal)


@workload(
    "a2_target_encoding_order",
    oracle="""
        SELECT c_mktsegment, round(avg(c_acctbal), 9) AS avg_bal
        FROM customer
        GROUP BY c_mktsegment
    """,
    description="A2: group-by mean — the target-encoding ordering query "
    "(reference tree.py:99-102)",
    tags=("inventory",),
)
def a2_target_encoding_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.round(F.avg("c_acctbal"), 9).alias("avg_bal"))
    )


_A4_LEG = """
        SELECT '{method}' AS method,
               CAST({key_out} AS VARCHAR) AS group_key,
               n,
               round(n / sum(n) OVER (), 9) AS share,
               min_bal, max_bal, avg_ck
        FROM (
            SELECT {key_out},
                   count(*) AS n,
                   CAST(min(c_acctbal) AS DOUBLE) AS min_bal,
                   CAST(max(c_acctbal) AS DOUBLE) AS max_bal,
                   CAST(sum(c_custkey) AS DOUBLE) / count(*) AS avg_ck
            FROM {source}
            GROUP BY {key_out}
        )
"""


@workload(
    "a4_group_share_of_total",
    oracle=" UNION ALL ".join(
        [
            _A4_LEG.format(method="window_share", key_out="c_nationkey", source="customer"),
            _A4_LEG.format(method="salted_agg", key_out="c_nationkey", source="customer"),
            _A4_LEG.format(
                method="salted_join",
                key_out="n_name",
                source="(SELECT * FROM customer JOIN nation ON c_nationkey = n_nationkey)",
            ),
        ]
    ),
    description="A4 + skew suite: method='window_share' is the scalar-aggregate "
    "broadcast alongside row-level columns (reference agg-inside-select, "
    "tree.py:261-268); method='salted_agg' computes the SAME aggregates via the "
    "two-phase salted rewrite (operators/skew.py salted_aggregate — hot group "
    "keys fan over n_salts reducers, partials recompose) so the external oracle "
    "proves salted == plain GROUP BY; method='salted_join' routes the join "
    "through salted_join (hot keys' probe rows fanned across salts, small side's "
    "hot rows replicated) and must match the plain SQL join",
    tags=("inventory", "suite", "skew"),
)
def a4_group_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from efficient_trees_spark.operators.skew import (
        hot_keys,
        salted_aggregate,
        salted_join,
    )

    customer = load(spark, sf_dir, "customer")
    w_all = Window.partitionBy()

    def finish(grouped: DataFrame, method: str, key_col: str) -> DataFrame:
        return grouped.select(
            F.lit(method).alias("method"),
            F.col(key_col).cast("string").alias("group_key"),
            "n",
            F.round(F.col("n") / F.sum("n").over(w_all), 9).alias("share"),
            "min_bal",
            "max_bal",
            "avg_ck",
        )

    plain = customer.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.min("c_acctbal").cast("double").alias("min_bal"),
        F.max("c_acctbal").cast("double").alias("max_bal"),
        (F.sum("c_custkey").cast("double") / F.count("*")).alias("avg_ck"),
    )

    # Same result through the two-phase salted rewrite: sums/counts/min/max
    # recompose from per-salt partials; avg_ck's sum and count partials are
    # exact integers, so the final division is bit-identical to the plain leg.
    salted = salted_aggregate(
        customer,
        ["c_nationkey"],
        {
            "n": ("count", "c_custkey"),
            "min_bal": ("min", "c_acctbal"),
            "max_bal": ("max", "c_acctbal"),
            "__ck_sum": ("sum", "c_custkey"),
        },
    ).select(
        "c_nationkey",
        "n",
        F.col("min_bal").cast("double").alias("min_bal"),
        F.col("max_bal").cast("double").alias("max_bal"),
        (F.col("__ck_sum").cast("double") / F.col("n")).alias("avg_ck"),
    )

    # Skew-safe join: every nation key clears the hot threshold here, so the
    # whole probe side takes the fanned-out path — the strongest exercise of
    # the salt plumbing the small tables allow.
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    hot = hot_keys(customer, ["c_nationkey"], min_count=2)
    joined = salted_join(customer, nation, ["c_nationkey"], hot, n_salts=8)
    join_grouped = joined.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.min("c_acctbal").cast("double").alias("min_bal"),
        F.max("c_acctbal").cast("double").alias("max_bal"),
        (F.sum("c_custkey").cast("double") / F.count("*")).alias("avg_ck"),
    )

    return (
        finish(plain, "window_share", "c_nationkey")
        .unionByName(finish(salted, "salted_agg", "c_nationkey"))
        .unionByName(finish(join_grouped, "salted_join", "n_name"))
    )


@workload(
    "a5_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    description="A5: distinct — the unique-targets query (reference tree.py:110-113)",
    tags=("inventory",),
)
def a5_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@workload(
    "a6_argmax_per_group",
    oracle="""
        SELECT l_returnflag, l_quantity AS top_quantity, n
        FROM (
            SELECT l_returnflag, l_quantity, count(*) AS n,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY count(*) DESC, l_quantity ASC) AS rk
            FROM lineitem GROUP BY l_returnflag, l_quantity
        ) WHERE rk = 1
    """,
    description="A6: arg-max per group with deterministic tie-break "
    "(reference sort desc + head(1), tree.py:332-333; SURVEY §2.11.4)",
    tags=("inventory",),
)
def a6_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("n"), F.asc("l_quantity"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("top_quantity"), "n")
    )


# ------------------------------------------------------------------ windows

@workload(
    "w1_prefix_sums",
    oracle="""
        WITH long AS (
            SELECT 'l_quantity' AS feature, CAST(l_quantity AS DOUBLE) AS feature_value,
                   l_returnflag FROM lineitem
            UNION ALL
            SELECT 'l_discount', CAST(l_discount AS DOUBLE), l_returnflag FROM lineitem
        ),
        counts AS (
            SELECT feature, feature_value,
                   count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS class_r,
                   count(*) AS n
            FROM long GROUP BY feature, feature_value
        )
        SELECT feature, feature_value,
               CAST(sum(class_r) OVER w AS BIGINT) AS cum_class_r,
               CAST(sum(n) OVER w AS BIGINT) AS cum_n
        FROM counts
        WINDOW w AS (PARTITION BY feature ORDER BY feature_value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    description="W1: per-feature prefix sums over sorted distinct values — the "
    "split-finder core shape (reference cum_sum, tree.py:255-268), melt+window "
    "partitioned by feature so no single-partition sort",
    tags=("inventory",),
)
def w1_prefix_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_discount").cast("double").alias("l_discount"),
        "l_returnflag",
    )
    long_df = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_discount"],
        variableColumnName="feature",
        valueColumnName="feature_value",
    )
    counts = long_df.groupBy("feature", "feature_value").agg(
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("class_r"),
        F.count(F.lit(1)).alias("n"),
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("feature_value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return counts.select(
        "feature",
        "feature_value",
        F.sum("class_r").over(w).alias("cum_class_r"),
        F.sum("n").over(w).alias("cum_n"),
    )


# ------------------------------------------------------------- sorts/limits

@workload(
    "o_topk_slice_suite",
    oracle="""
        SELECT 'topk' AS op, o_orderkey, o_totalprice
        FROM (
            SELECT o_orderkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        )
        UNION ALL
        SELECT 'slice', o_orderkey, o_totalprice
        FROM (
            SELECT o_orderkey, o_totalprice,
                   row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders
        ) WHERE rk BETWEEN 101 AND 200
    """,
    description="O2+O3: op='topk' is top-k by metric with total-order "
    "tie-break (reference sort desc + head, tree.py:332-333 — "
    "TakeOrderedAndProject, no full sort); op='slice' is an offset/length "
    "slice, which requires an explicit total order on an unordered relation "
    "(reference data.slice, heart_disease.py:25-26)",
    tags=("inventory", "suite"),
)
def o_topk_slice_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    topk = (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(F.lit("topk").alias("op"), "o_orderkey", "o_totalprice")
    )
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    sliced = (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk").between(101, 200))
        .select(F.lit("slice").alias("op"), "o_orderkey", "o_totalprice")
    )
    return topk.unionByName(sliced)


# ------------------------------------------------------------------- unions

@workload(
    "u1_union_relaxed",
    oracle="""
        SELECT 'l_quantity' AS feature, CAST(max(l_quantity) AS DOUBLE) AS max_value FROM lineitem
        UNION ALL
        SELECT 'l_linenumber' AS feature, CAST(max(l_linenumber) AS DOUBLE) AS max_value FROM lineitem
    """,
    description="U1: union with supertype coercion — Spark requires the explicit "
    "double cast Polars' vertical_relaxed does implicitly (tree.py:341-343)",
    tags=("inventory",),
)
def u1_union_relaxed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.agg(F.max("l_quantity").cast("double").alias("max_value")).select(
        F.lit("l_quantity").alias("feature"), "max_value"
    )
    b = li.agg(F.max("l_linenumber").cast("double").alias("max_value")).select(
        F.lit("l_linenumber").alias("feature"), "max_value"
    )
    return a.unionByName(b)


@workload(
    "u2_union_by_name_missing",
    oracle="""
        SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM orders WHERE o_totalprice > 400000
        UNION ALL BY NAME
        SELECT o_orderkey, NULL AS o_totalprice, o_orderpriority FROM orders WHERE o_totalprice <= 400000
    """,
    description="U2: union-by-name with missing columns (diagonal concat, "
    "reference tree.py:131)",
    tags=("inventory",),
)
def u2_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    high = orders.filter(F.col("o_totalprice") > 400000).select("o_orderkey", "o_totalprice")
    low = orders.filter(F.col("o_totalprice") <= 400000).select("o_orderkey", "o_orderpriority")
    return high.unionByName(low, allowMissingColumns=True)


# ----------------------------------------------------------- headline joins

@workload(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(24,6)) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,4)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4)))) AS DECIMAL(24,6)) AS DOUBLE) AS sum_charge,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 9) AS avg_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 9) AS avg_price,
               round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 9) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 adapted: the multi-aggregate scan — partial (map-side) "
    "aggregation makes the shuffle 6 rows per partition regardless of scale",
    tags=("headline", "bench"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from efficient_trees_spark.sources.io import fan_out_small_input

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    # Fan out the few-split local scan before the partial aggregation
    # (cluster no-op — splits >> cores there): the sf0.1 lineitem parquet
    # is ONE 11 MB split, so the DECIMAL-heavy partial aggregation ran on
    # 1 of 32 cores (r12; interleaved A/B 0.95 -> 0.79 s median).  The
    # projection narrows the fanned-out shuffle to the 6 consumed columns
    # (guide §2.3).  Bit-safe: every aggregate is an exact DECIMAL sum or
    # a count — associative, so partial-aggregation order cannot change
    # any output bit (verified identical rows).
    li = fan_out_small_input(
        li.select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        )
    )
    dec = lambda c: F.col(c).cast(DEC)  # noqa: E731
    # Two scale tricks keep the money sums bit-identical to DuckDB at ANY sf:
    # (1) product factors use NARROW decimals — price (14,4), rate (6,4) —
    # so the multiply chain stays within precision 38 on both engines and is
    # exact end-to-end ((18,4) factors overflow and each engine rounds at a
    # different internal scale); (2) sums pass through DECIMAL(24,6) before
    # the double cast — lossless (the data is 2-dp, so products have exactly
    # 6 decimals) and it keeps the scaled integer below 2^53, where BOTH
    # engines' decimal→double conversions are correctly rounded.  Without it
    # DuckDB converts a >2^53 scale-12 integer and can land one ulp off.
    price = F.col("l_extendedprice").cast("decimal(14,4)")
    disc_rate = F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    tax_rate = F.lit(1) + F.col("l_tax").cast("decimal(6,4)")
    d6 = lambda c: c.cast("decimal(24,6)").cast("double")  # noqa: E731
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        d6(F.sum(price * disc_rate)).alias("sum_disc_price"),
        d6(F.sum(price * disc_rate * tax_rate)).alias("sum_charge"),
        F.round(F.sum(dec("l_quantity")).cast("double") / F.count("*"), 9).alias("avg_qty"),
        F.round(F.sum(dec("l_extendedprice")).cast("double") / F.count("*"), 9).alias("avg_price"),
        F.round(F.sum(dec("l_discount")).cast("double") / F.count("*"), 9).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@workload(
    "q3_top_revenue_orders",
    oracle="""
        SELECT l_orderkey,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(24,6)) AS DOUBLE) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    description="TPC-H Q3 adapted: selective dim filter → broadcast join → agg "
    "→ top-k. customer is broadcast; only lineitem shuffles (on l_orderkey)",
    tags=("headline", "bench"),
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    customer = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # customer is the only side safe to broadcast unconditionally; the
    # orders⨝lineitem join is large-large → leave the strategy to Catalyst/AQE
    # (shuffle join on l_orderkey, or runtime broadcast if the filtered side
    # turns out small).
    joined = li.join(
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey),
        li.l_orderkey == F.col("o_orderkey"),
    )
    # same exact-decimal scheme as q1 (narrow factors + lossless (24,6)
    # pass-through before the double cast) so revenue is bit-stable at any sf
    revenue = (
        F.col("l_extendedprice").cast("decimal(14,4)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)"))
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("decimal(24,6)").cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@workload(
    "q5_region_nation_volume",
    oracle="""
        SELECT n_name,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(24,6)) AS DOUBLE) AS revenue
        FROM region
          JOIN nation ON n_regionkey = r_regionkey
          JOIN customer ON c_nationkey = n_nationkey
          JOIN orders ON o_custkey = c_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    description="TPC-H Q5 adapted: star join — every dimension broadcasts, the "
    "fact table shuffles once for the aggregation; local-supplier condition "
    "(s_nationkey = c_nationkey) applied as a post-join predicate",
    tags=("headline", "bench"),
)
def q5_region_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    supplier = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")

    # region/nation are constant-size → always broadcast; customer/orders/
    # supplier grow with SF → plain joins, Catalyst/AQE picks broadcast at
    # runtime when a filtered side fits, shuffle join otherwise.
    dims = (
        customer.join(F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
                      customer.c_nationkey == F.col("n_nationkey"))
        .select("c_custkey", "n_name", "n_nationkey")
    )
    fact = (
        li.join(orders.join(dims, orders.o_custkey == dims.c_custkey)
                .select("o_orderkey", "n_name", "n_nationkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(supplier, (li.l_suppkey == supplier.s_suppkey)
              & (supplier.s_nationkey == F.col("n_nationkey")))
    )
    revenue = (
        F.col("l_extendedprice").cast("decimal(14,4)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)"))
    )
    return fact.groupBy("n_name").agg(
        F.sum(revenue).cast("decimal(24,6)").cast("double").alias("revenue")
    )


# ------------------------------------------------------------- CSV source

def s2_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: CSV sink + scan with header and schema inference (reference:
    pl.scan_csv, heart_disease.py:12).  The table round-trips parquet -> CSV
    -> DataFrame, so the aggregate matches the parquet-side oracle only when
    the CSV reader re-derives identical values and types.  Registered via
    ``s_format_roundtrip_suite`` (fmt='csv')."""
    import tempfile

    csv_dir = f"{tempfile.gettempdir()}/spark_graft_s2_nation_csv"
    load(spark, sf_dir, "nation").write.mode("overwrite").option("header", True).csv(csv_dir)
    nation_csv = spark.read.csv(csv_dir, header=True, inferSchema=True)
    return nation_csv.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.sum("n_nationkey").alias("key_sum"),
    )


# ------------------------------------------------- remaining inventory rows

@workload(
    "s3_inmemory_table",
    oracle="""
        -- literals go through DOUBLE before adding: DuckDB parses 4.9 as
        -- DECIMAL(2,1) and would sum exactly, while Spark sums IEEE doubles
        -- (4.9 + 1.4 = 6.300000000000001)
        SELECT sepal_length, petal_length, target,
               sepal_length + petal_length AS total_length
        FROM (
            SELECT CAST(sl AS DOUBLE) AS sepal_length,
                   CAST(pl AS DOUBLE) AS petal_length, target
            FROM (VALUES (5.1, 1.4, 0), (4.9, 1.4, 0), (6.3, 4.7, 1), (5.8, 4.1, 1))
                 AS t(sl, pl, target)
        )
    """,
    description="S3: in-memory table from driver arrays "
    "(reference pl.DataFrame(X, schema=...), iris.py:18-22, test_tree.py:21-22)",
    tags=("inventory",),
)
def s3_inmemory_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [(5.1, 1.4, 0), (4.9, 1.4, 0), (6.3, 4.7, 1), (5.8, 4.1, 1)]
    df = spark.createDataFrame(rows, ["sepal_length", "petal_length", "target"])
    return df.withColumn("total_length", F.col("sepal_length") + F.col("petal_length"))


@workload(
    "o4_shuffle",
    oracle="SELECT o_orderkey, o_totalprice FROM orders",
    description="O4: random reorder via orderBy(rand(seed)) "
    "(reference .sample(fraction=1.0, shuffle=True), heart_disease.py:22). "
    "The oracle checks multiset equality — the compare sorts values, so any "
    "permutation of the same rows hash-matches",
    tags=("inventory",),
)
def o4_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A full-table random sort is ONE shuffle keyed by rand(seed); at scale
    # prefer repartition(rand) when only decorrelation (not a total order)
    # is needed — that is a round-robin-ish exchange with no sort.
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.rand(seed=42))
    )


@workload(
    "f5_mask_split",
    oracle="""
        SELECT 'left' AS side, count(*) AS cnt FROM lineitem
        WHERE (CASE WHEN l_discount < 0.02 THEN NULL ELSE l_discount END) <= 0.05
        UNION ALL
        SELECT 'right' AS side, count(*) AS cnt FROM lineitem
        WHERE NOT ((CASE WHEN l_discount < 0.02 THEN NULL ELSE l_discount END) <= 0.05)
        UNION ALL
        SELECT 'total' AS side, count(*) AS cnt FROM lineitem
    """,
    description="F5: boolean-mask filter + negation with NULL-drop semantics "
    "(reference tree.py:351-358): rows NULL in the mask column satisfy "
    "neither mask nor ~mask, so left+right < total — the semantic trap of "
    "SURVEY.md §2.11.3, checked by count",
    tags=("inventory",),
)
def f5_mask_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").withColumn(
        "masked_disc",
        F.when(F.col("l_discount") < 0.02, F.lit(None)).otherwise(F.col("l_discount")),
    )
    pred = F.col("masked_disc") <= 0.05
    left = li.filter(pred).select(F.lit("left").alias("side")).groupBy("side").agg(F.count(F.lit(1)).alias("cnt"))
    right = li.filter(~pred).select(F.lit("right").alias("side")).groupBy("side").agg(F.count(F.lit(1)).alias("cnt"))
    total = li.select(F.lit("total").alias("side")).groupBy("side").agg(F.count(F.lit(1)).alias("cnt"))
    return left.unionByName(right).unionByName(total)


# ----------------------------------------------------------- sinks at scale

@workload(
    "s6_partitioned_parquet_sink",
    oracle="""
        SELECT o_orderstatus, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM orders WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderstatus
    """,
    description="Hive-partitioned parquet sink + partition-pruned scan-back: "
    "orders written partitionBy(o_orderpriority), re-read with a partition "
    "filter that prunes to one directory (PartitionFilters in the scan, not "
    "a post-read filter) — the layout a 100 TB table would use so queries "
    "touch only the partitions they name",
    tags=("inventory", "sink"),
)
def s6_partitioned_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    out = f"{tempfile.gettempdir()}/spark_graft_s6_orders_part"
    load(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(out)
    return (
        spark.read.parquet(out)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        )
    )


@workload(
    "s7_bucketed_colocated_join",
    oracle="""
        SELECT c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
    """,
    description="Bucketed-table sink + shuffle-free co-located join: customer "
    "and orders both written bucketBy(8, custkey) sorted within buckets, then "
    "joined bucket-to-bucket — zero Exchange on either side of the join "
    "(asserted by a plan test). THE layout for repeated large-to-large joins "
    "at cluster scale: the shuffle is paid once at write time, never per query",
    tags=("inventory", "sink"),
)
def s7_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    base = tempfile.gettempdir()
    for table, key in (("customer", "c_custkey"), ("orders", "o_custkey")):
        name = f"spark_graft_s7_{table}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            load(spark, sf_dir, table)
            .write.mode("overwrite")
            .option("path", f"{base}/{name}")
            .bucketBy(8, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    cust = spark.table("spark_graft_s7_customer")
    orders = spark.table("spark_graft_s7_orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        )
    )


def s8_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + scan with explicit schema: events round-trip
    parquet -> JSONL -> DataFrame.  Schema is DECLARED on read — at scale,
    schema inference over JSON means an extra full pass; production readers
    always pin the schema.  Registered via ``s_format_roundtrip_suite``
    (fmt='json')."""
    import tempfile

    out = f"{tempfile.gettempdir()}/spark_graft_s8_events_json"
    ev = load(spark, sf_dir, "events")
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(ev.schema).json(out)
    # decimal-exact sum: order-independent, so the round-tripped aggregate is
    # bit-identical to the oracle at any scale (a double sum's association
    # noise survives round(..., 9) on ~1e6 totals)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total"),
    )


def s9_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan (the other columnar format Spark ships a vectorized
    reader for): lineitem round-trips parquet -> ORC -> DataFrame with
    predicate-capable columnar scan.  Registered via
    ``s_format_roundtrip_suite`` (fmt='orc')."""
    import tempfile

    out = f"{tempfile.gettempdir()}/spark_graft_s9_lineitem_orc"
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    li.write.mode("overwrite").orc(out)
    return (
        spark.read.orc(out)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("revenue"),
        )
    )


def s10_backfill_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental partition backfill: events written date-partitioned, then
    ONE day reprocessed (halved to even event_ids) and dynamically
    overwritten in place — the daily-rerun pattern for a 100 TB
    date-partitioned table (static overwrite would truncate the whole
    table; append would duplicate the day).  The read-back per-day
    aggregate must equal the oracle's 'as-if-reprocessed' relation, which
    proves BOTH that the target day was replaced and that every other
    partition is untouched.  Registered via ``s_format_roundtrip_suite``
    (fmt='backfill')."""
    import tempfile

    out = f"{tempfile.gettempdir()}/spark_graft_s10_events_by_day"
    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(out)
    target_day = ev.agg(F.min("day")).first()[0]
    corrected = ev.filter(
        (F.col("day") == target_day) & (F.col("event_id") % 2 == 0)
    )
    # Restore whatever the session had before, not a hardcoded 'static' —
    # clobbering a session configured dynamic would be a side effect.
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        corrected.write.mode("overwrite").partitionBy("day").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return (
        spark.read.parquet(out)
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total"),
        )
    )


def s11_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard export (sources/shards.py): documents
    hash-assigned to 4 shards, written hive-partitioned with seeded
    in-shard order, manifest read back FROM THE WRITTEN FILES.  Shard
    membership is xxhash64 (not SQL-portable), so the oracle pins the
    sf0.01 manifest as literal VALUES behind the loud scale guard.
    Registered via ``s_format_roundtrip_suite`` (fmt='shards')."""
    import tempfile

    from efficient_trees_spark.functions import text
    from efficient_trees_spark.sources.shards import write_training_shards
    from efficient_trees_spark.workloads.base import require_pinned_scale

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.coalesce(F.size(text.tokens("text")), F.lit(0)).alias("n_tok"),
    )
    # Guard on a CONTENT-sensitive scalar: sf0.001 and sf0.01 documents have
    # identical ids but different texts, so a row-count guard alone would
    # let a wrong-scale run reach the value hash as a mystery mismatch.
    require_pinned_scale(
        toks.agg(F.sum("n_tok")).first()[0],
        27165,
        "s_format_roundtrip_suite",
        "documents total token count (sf0.01)",
    )
    out = f"{tempfile.gettempdir()}/spark_graft_s11_shards"
    return write_training_shards(toks, out, "doc_id", n_shards=4, token_col="n_tok")


def s12_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free group split (operators/sampling.py:group_split):
    documents grouped by ``doc_id % 50``, split 30% test by GROUP — rows of
    a group can never straddle the boundary.  Output: per-side row count
    and distinct-group count.  Seeded-hash assignment is xxhash64, so the
    sf0.01 outcome is pinned VALUES behind the loud scale guard.
    Registered via ``s_format_roundtrip_suite`` (fmt='split')."""
    from efficient_trees_spark.operators.sampling import group_split
    from efficient_trees_spark.workloads.base import require_pinned_scale

    docs = load(spark, sf_dir, "documents")
    require_pinned_scale(
        docs.count(), 500, "s_format_roundtrip_suite", "documents row count (sf0.01)"
    )
    split = group_split(
        docs.withColumn("grp", F.col("doc_id") % 50), "grp", 0.3, seed=7
    )
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("grp").alias("n_groups"),
    )


def s13_token_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture construction (operators/sampling.py): half the
    corpus tokens allocated across languages by ``temperature_allocation``
    (τ=1.0 — natural proportions; a single-round allocation both engines
    express exactly in IEEE doubles) and selected best-quality-first by
    ``mixture_budget_sample`` (per-stratum greedy window under the budget).
    Output: selected docs + tokens per language.  Fully re-derived in SQL —
    allocation formula, quality order, cumulative-sum admission rule.
    Registered via ``s_format_roundtrip_suite`` (fmt='mixture')."""
    from efficient_trees_spark.functions import text
    from efficient_trees_spark.operators.sampling import (
        mixture_budget_sample,
        temperature_allocation,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        text.token_count("text").alias("n_tok"),
        text.quality_score("text").alias("q"),
    )
    total = int(docs.agg(F.sum("n_tok")).first()[0])
    budgets = temperature_allocation(
        docs, "lang", "n_tok", total // 2, temperature=1.0
    )
    mix = mixture_budget_sample(
        docs,
        "lang",
        "n_tok",
        budgets,
        order_by=[F.desc("q"), F.asc("doc_id")],
    )
    return mix.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tok").cast("double").alias("total"),
    )


def _mixture_oracle() -> str:
    """DuckDB twin of s13_token_mixture: same tokenization/quality contract
    as the text suite, same floor(B·n_s/N) single-round allocation (τ=1.0
    never caps a stratum since B < N), same ROWS-frame cumulative admission."""
    from efficient_trees_spark.functions import text as _text
    from efficient_trees_spark.workloads.text_pipeline import (
        _QUALITY,
        _TOKS,
        _sw_array,
    )

    quality = _QUALITY.replace("__SW__", _sw_array(_text.LANG_STOPWORDS["en"]))
    return f"""
        SELECT 'mixture' AS fmt, lang AS key, count(*) AS n,
               CAST(CAST(sum(n_tok) AS BIGINT) AS DOUBLE) AS total
        FROM (
            SELECT lang, n_tok, budget,
                   sum(n_tok) OVER (PARTITION BY lang
                                    ORDER BY q DESC, doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum
            FROM (
                SELECT d.doc_id, d.lang, d.n_tok, d.q,
                       CAST(floor(CAST(s.b AS DOUBLE) * CAST(s.n_s AS DOUBLE)
                                  / CAST(s.n_corpus AS DOUBLE)) AS BIGINT)
                           AS budget
                FROM (SELECT doc_id, lang, len({_TOKS}) AS n_tok,
                             {quality} AS q
                      FROM documents) d
                JOIN (SELECT lang, CAST(sum(len({_TOKS})) AS BIGINT) AS n_s,
                             (SELECT CAST(sum(len({_TOKS})) AS BIGINT)
                              FROM documents) AS n_corpus,
                             (SELECT CAST(floor(CAST(sum(len({_TOKS}))
                                                     AS DOUBLE) / 2) AS BIGINT)
                              FROM documents) AS b
                      FROM documents GROUP BY lang) s USING (lang)
            )
        )
        WHERE cum - n_tok < budget
        GROUP BY lang
    """


def s14_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length sequence packing (sources/shards.pack_sequences): the
    documents' token streams concatenate in doc_id order WITHIN 4 shards
    (doc_id % 4 — SQL-replicable; production uses assign_shards) and cut
    every 256 tokens, trailing partials dropped.  Each sequence is pinned
    by the md5 of its space-joined tokens, so the oracle checks content
    AND order of every packed sequence.  Registered via
    ``s_format_roundtrip_suite`` (fmt='pack')."""
    from efficient_trees_spark.functions import text
    from efficient_trees_spark.sources.shards import pack_sequences

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 4).cast("int").alias("shard"),
        text.tokens("text").alias("toks"),
    )
    packed = pack_sequences(docs, "doc_id", "toks", seq_len=256, shard_col="shard")
    return packed.select(
        F.md5(F.concat_ws(" ", "tokens")).alias("key"),
        F.size("tokens").cast("long").alias("n"),
        F.col("seq_id").cast("double").alias("total"),
    )


def _pack_oracle() -> str:
    """DuckDB twin of s14_sequence_packing: same tokenization contract,
    same per-shard doc_id-ordered prefix-sum offsets, same 256-token cuts
    with trailing partials dropped, md5 over the space-joined sequence."""
    from efficient_trees_spark.workloads.text_pipeline import _TOKS

    return f"""
        SELECT 'pack' AS fmt, md5(string_agg(tok, ' ' ORDER BY sp)) AS key,
               count(*) AS n, CAST(seq AS DOUBLE) AS total
        FROM (
            SELECT shard, (off + pos - 1) // 256 AS seq,
                   (off + pos - 1) % 256 AS sp, tok
            FROM (
                SELECT shard, doc_id, off, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) AS pos
                FROM (
                    SELECT shard, doc_id, toks,
                           coalesce(sum(len(toks)) OVER (
                               PARTITION BY shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS off
                    FROM (SELECT doc_id, doc_id % 4 AS shard,
                                 {_TOKS} AS toks
                          FROM documents)
                    WHERE len(toks) > 0
                )
            )
        )
        GROUP BY shard, seq
        HAVING count(*) = 256
    """


@workload(
    "s_format_roundtrip_suite",
    oracle=f"""
        SELECT 'csv' AS fmt, CAST(n_regionkey AS VARCHAR) AS key,
               count(*) AS n, CAST(CAST(sum(n_nationkey) AS BIGINT) AS DOUBLE) AS total
        FROM nation GROUP BY n_regionkey
        UNION ALL
        SELECT 'json', event_type, count(*),
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'orc', l_returnflag, count(*),
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        -- backfill: min day reprocessed to even event_ids, other days intact
        SELECT 'backfill', strftime(ts, '%Y-%m-%d'), count(*),
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        FROM events
        WHERE strftime(ts, '%Y-%m-%d')
                > (SELECT min(strftime(ts, '%Y-%m-%d')) FROM events)
           OR event_id % 2 = 0
        GROUP BY strftime(ts, '%Y-%m-%d')
        UNION ALL
        -- shards + split: xxhash64 memberships pinned at sf0.01 (loud scale
        -- guard on the Spark side; documents there = 500 rows)
        SELECT * FROM (VALUES
            ('shards', '0', 130, 6819.0), ('shards', '1', 124, 6884.0),
            ('shards', '2', 134, 7217.0), ('shards', '3', 112, 6245.0),
            ('split', 'test', 150, 15.0), ('split', 'train', 350, 35.0)
        ) AS pinned(fmt, key, n, total)
        UNION ALL
        {_mixture_oracle()}
        UNION ALL
        {_pack_oracle()}
    """,
    description="Source/sink suite, tagged by fmt: nation goes parquet -> "
    "CSV (header + inferSchema — the reader must re-derive identical values "
    "AND types, reference pl.scan_csv heart_disease.py:12); events go "
    "parquet -> JSON-lines with the schema DECLARED on read; lineitem goes "
    "parquet -> ORC through the vectorized columnar reader; events are "
    "date-partitioned and one day dynamically overwritten in place "
    "(fmt='backfill' — the daily reprocess pattern); documents export as 4 "
    "deterministic xxhash64 training shards with read-back manifest "
    "(fmt='shards') and split leakage-free by group (fmt='split') — both "
    "pinned VALUES at sf0.01 behind the loud scale guard; fmt='pack' packs "
    "the documents' token streams into fixed 256-token training sequences "
    "within 4 shards (sources/shards.pack_sequences — per-shard prefix-sum "
    "offsets, one grouping shuffle), every sequence pinned by the md5 of "
    "its space-joined content so the oracle re-derives the full packing.  "
    "Each branch aggregates what was actually read back and must match "
    "the oracle",
    tags=("inventory", "sink", "suite"),
)
def s_format_roundtrip_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    csv = s2_csv_scan(spark, sf_dir).select(
        F.lit("csv").alias("fmt"),
        F.col("n_regionkey").cast("string").alias("key"),
        F.col("n_nations").alias("n"),
        F.col("key_sum").cast("double").alias("total"),
    )
    json_ = s8_json_scan(spark, sf_dir).select(
        F.lit("json").alias("fmt"),
        F.col("event_type").alias("key"),
        "n",
        "total",
    )
    orc = s9_orc_scan(spark, sf_dir).select(
        F.lit("orc").alias("fmt"),
        F.col("l_returnflag").alias("key"),
        "n",
        F.col("revenue").alias("total"),
    )
    backfill = s10_backfill_overwrite(spark, sf_dir).select(
        F.lit("backfill").alias("fmt"),
        F.col("day").alias("key"),
        "n",
        "total",
    )
    shards = s11_training_shards(spark, sf_dir).select(
        F.lit("shards").alias("fmt"),
        F.col("shard").cast("string").alias("key"),
        F.col("n_rows").alias("n"),
        F.col("n_tokens").cast("double").alias("total"),
    )
    split = s12_group_split(spark, sf_dir).select(
        F.lit("split").alias("fmt"),
        F.col("split").alias("key"),
        "n",
        F.col("n_groups").cast("double").alias("total"),
    )
    mixture = s13_token_mixture(spark, sf_dir).select(
        F.lit("mixture").alias("fmt"),
        F.col("lang").alias("key"),
        "n",
        "total",
    )
    pack = s14_sequence_packing(spark, sf_dir).select(
        F.lit("pack").alias("fmt"), "key", "n", "total"
    )
    return (
        csv.unionByName(json_)
        .unionByName(orc)
        .unionByName(backfill)
        .unionByName(shards)
        .unionByName(split)
        .unionByName(mixture)
        .unionByName(pack)
    )
