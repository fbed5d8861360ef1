"""Corpus sampling operators for training-data pipelines.

Building a training mix from a 100 TB corpus is a sampling problem: "exactly
k documents per language", "200M tokens per source, best-quality first",
"20% of each stratum".  Three operators cover it, all pure DataFrame ops:

* ``stratified_fraction_sample`` — Bernoulli per-stratum fractions via
  ``sampleBy``: map-only (no shuffle), approximate sizes, the right tool
  when only proportions matter.
* ``stratified_exact_sample`` — exactly ``k`` rows per stratum: seeded
  random order within each stratum, ``row_number() <= k``.  One shuffle on
  the stratum key; per-stratum parallelism.
* ``token_budget_sample`` — greedy selection per stratum until a token
  budget: running token sum over an explicit priority order, keep rows
  while the PREVIOUS cumulative total is under budget (so the first
  overshooting document is still admitted — budgets are met, never
  silently undershot by a large tail doc).

Scale notes: all three shuffle at most once, on the stratum key.  A single
giant stratum serializes its window sort; at that point pre-aggregate to
(doc, priority) pairs — the window runs over doc-level rows, which these
operators already assume — or split the stratum by a salt and take the
per-salt quota ``k/s``.  Determinism: ``F.rand(seed)`` is seeded per
partition, so results are reproducible for a fixed input partitioning (the
usual Spark contract; asserted in tests) but not across repartitions — pass
an explicit ``order_by`` for partition-independent selection (e.g. a hash
of a stable id, or a quality score).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stratified_fraction_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Bernoulli sample with a per-stratum fraction (``df.sampleBy``).

    Map-only: every partition filters its own rows against the stratum's
    fraction — no shuffle, no state; sizes are binomially distributed
    around fraction × stratum size."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def _priority(order_by: Column | None, seed: int) -> Column:
    # Explicit priority wins; otherwise seeded-random order.
    return order_by if order_by is not None else F.rand(seed)


def stratified_exact_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    seed: int = 42,
    order_by: Column | None = None,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum.

    :param order_by: priority Column — lowest values selected first (e.g.
        ``F.desc`` wrap for best-quality-first).  Default: seeded random.
    """
    w = Window.partitionBy(strata_col).orderBy(_priority(order_by, seed))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def temperature_allocation(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    total_budget: int,
    temperature: float = 1.0,
) -> dict:
    """Per-stratum token budgets proportional to ``size^temperature`` —
    the standard multilingual-mixture rule (τ=1 reproduces natural
    proportions; τ→0 approaches uniform; published multilingual-model
    recipes typically use τ in [0.2, 0.7] to up-weight low-resource
    strata).  One tiny aggregation job (rows = number of strata) feeds a
    driver-side normalization; compose with :func:`token_budget_sample`:

        budgets = temperature_allocation(d, "lang", "n_tokens", 10**9, 0.5)
        parts = [token_budget_sample(d.filter(F.col("lang") == s), "lang",
                                     "n_tokens", b) for s, b in budgets.items()]

    A stratum is never allocated more than it has (the excess is
    redistributed over the remaining strata by the same power rule, until
    fixed point), so the returned budgets are always achievable."""
    sizes = {
        row[strata_col]: row["total"]
        for row in df.groupBy(strata_col)
        .agg(F.sum(token_col).alias("total"))
        .collect()
    }
    budgets: dict = {}
    remaining_budget = int(total_budget)
    open_strata = dict(sizes)
    # Redistribute capped strata's unused budget until every stratum is
    # either uncapped or exactly exhausted (≤ len(sizes) rounds).
    while open_strata and remaining_budget > 0:
        weights = {s: n ** temperature for s, n in open_strata.items()}
        total_w = sum(weights.values())
        capped = {}
        for s, w in weights.items():
            share = int(remaining_budget * w / total_w)
            if share >= open_strata[s]:
                capped[s] = open_strata[s]
        if not capped:
            for s, w in weights.items():
                budgets[s] = budgets.get(s, 0) + int(remaining_budget * w / total_w)
            break
        for s, n in capped.items():
            budgets[s] = budgets.get(s, 0) + n
            remaining_budget -= n
            del open_strata[s]
    return budgets


def token_budget_sample(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    budget: int,
    seed: int = 42,
    order_by: Column | None = None,
) -> DataFrame:
    """Select rows per stratum, in priority order, until ``budget`` tokens.

    Admission rule: a row enters while the cumulative token count BEFORE it
    is under budget — so every stratum with ≥ budget tokens reaches the
    budget (the boundary document overshoots by at most one document), and
    token-poor strata are taken whole.  This is the standard corpus-mixture
    construction ("200M tokens of each source, highest quality first")."""
    pri = _priority(order_by, seed)
    w = (
        Window.partitionBy(strata_col)
        .orderBy(pri)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(token_col).over(w)
    return (
        df.withColumn("__cum", running)
        .filter(F.col("__cum") - F.col(token_col) < budget)
        .drop("__cum")
    )


def mixture_budget_sample(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    budgets: dict,
    seed: int = 42,
    order_by: list[Column] | Column | None = None,
) -> DataFrame:
    """:func:`token_budget_sample` with PER-STRATUM budgets in one plan —
    the output side of :func:`temperature_allocation`:

        budgets = temperature_allocation(d, "lang", "n_tokens", B, tau)
        mix = mixture_budget_sample(d, "lang", "n_tokens", budgets,
                                    order_by=[F.desc("quality"), F.asc("id")])

    The budget table is a driver literal (strata-sized) broadcast onto the
    corpus; selection is the same single window shuffle on the stratum key
    as the scalar form.  Strata absent from ``budgets`` are dropped (inner
    join) — allocate first, then select.  An empty ``budgets`` dict (a
    legitimate :func:`temperature_allocation` result on an empty input)
    selects nothing."""
    if not budgets:
        return df.limit(0)
    spark = df.sparkSession
    budget_rows = [(k, int(v)) for k, v in sorted(budgets.items())]
    # Explicit schema: the stratum key joins df's own column, so pin its
    # type to that column's type instead of per-call row inference.
    schema = T.StructType(
        [
            T.StructField(strata_col, df.schema[strata_col].dataType),
            T.StructField("__budget", T.LongType()),
        ]
    )
    bdf = spark.createDataFrame(budget_rows, schema)
    pri = (
        order_by
        if isinstance(order_by, (list, tuple))
        else [_priority(order_by, seed)]
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(*pri)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(token_col).over(w)
    return (
        df.join(F.broadcast(bdf), strata_col)
        .withColumn("__cum", running)
        .filter(F.col("__cum") - F.col(token_col) < F.col("__budget"))
        .drop("__cum", "__budget")
    )


def group_split(
    df: DataFrame,
    group_col: str,
    test_fraction: float,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-free train/test split BY GROUP: every row of a group lands on
    the same side, so correlated rows (near-duplicate documents sharing a
    dedup cluster, events of one user, repeat measurements of one entity)
    can never straddle the boundary and leak test content into training —
    the failure mode row-wise ``randomSplit`` has on deduplicated corpora
    (pair with ``dedup.connected_components``: split on ``cluster_id``).

    Assignment is a pure projection — ``pmod(xxhash64(group, seed), 10^6) <
    test_fraction * 10^6`` — deterministic under retries and re-runs, adds
    no shuffle, and needs no group enumeration.  The realized fraction
    converges on ``test_fraction`` by group COUNT (not row count: a giant
    group drags its whole mass to one side by design).  Returns ``df`` plus
    a ``split_col`` string column 'test' / 'train'."""
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError(f"test_fraction must be in [0, 1], got {test_fraction}")
    bucket = F.pmod(F.xxhash64(F.col(group_col), F.lit(seed)), F.lit(1_000_000))
    return df.withColumn(
        split_col,
        F.when(bucket < F.lit(int(round(test_fraction * 1_000_000))), F.lit("test"))
        .otherwise(F.lit("train")),
    )
