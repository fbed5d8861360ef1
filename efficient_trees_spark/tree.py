"""DecisionTreeClassifier — exact-split decision tree training as Spark dataflow.

Same capabilities as the reference classifier
(``/root/reference/efficient_trees/tree.py:16-385``) re-architected for Spark:

* **Exact split search** over every distinct feature value (not MLlib's
  quantile bins — SURVEY.md §7.3), as ONE declarative job per tree node
  (``operators/split_finder.py``) instead of one plan per feature.
* **Batch prediction compiled to a single CASE projection**
  (``plans/case_compiler.py``) instead of a 2^depth filter-union.
* **No Python in the hot path** — fit and transform are pure Catalyst
  expression plans; driver-side Python only orchestrates recursion over the
  (tiny) node dicts, matching the reference's discipline (SURVEY.md §2.11).
* **Lineage discipline for deep recursion**: each node's frame is persisted
  before its split search and unpersisted when its subtree completes, and
  lineage is truncated with ``localCheckpoint`` every ``checkpoint_interval``
  levels — without this, depth-d children replay the scan plus d filters
  (SURVEY.md §4.3.1).

Model artifact: the same nested dict as the reference — internal nodes
``{"type": "node", "feature", "threshold", "information_gain",
"criterion_value", "target_distribution", "left", "right"}`` (tree.py:374-383),
leaves ``{"type": "leaf", "value"}`` — so persistence is pickle/JSON of a
driver-side object, independent of Spark.

Semantic fine print reproduced from the reference (SURVEY.md §2.11):

* recursion continues only while best information gain > 0 (tree.py:350);
* rows NULL in the chosen split feature drop out of BOTH children during fit
  and batch predict (tree.py:351-358, 129-130) — ``transform`` exposes this as
  ``null_policy="drop"`` (parity), plus ``"keep"`` and ``"strict"`` modes;
* candidate thresholds are distinct feature values with each feature's maximum
  excluded (tree.py:244, 274-277);
* tie-breaking, engine-order-dependent in the reference (§2.11.4), is replaced
  by total orders: splits by (gain desc, feature position asc, threshold asc),
  majority class by (count desc, class value asc).
"""

from __future__ import annotations

import json
import pickle
import warnings
from collections.abc import Iterable
from concurrent.futures import ThreadPoolExecutor
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from efficient_trees_spark.enums import Criterion
from efficient_trees_spark.operators import split_finder
from efficient_trees_spark.plans.case_compiler import compile_tree

_TARGET_IDX = split_finder.TARGET_IDX

# Above this cardinality, categorical codes are applied via a broadcast-join
# mapping table instead of a literal CASE map (SURVEY.md §2.8).
_LITERAL_MAP_MAX = 256


def _fan_out_small_input(prepared: DataFrame) -> DataFrame:
    """Binned mode's passes (edge stats, pack, encode, one Arrow histogram
    per tree level) parallelize over THIS relation's partition count.  A
    local benchmark table is a handful of 128 MB parquet splits — 4
    partitions would idle 28 of 32 cores in EVERY pass — so fan out to the
    session's parallelism once, before anything is persisted, paying one
    bounded shuffle.  On a real cluster the source has far more splits than
    cores and this is a no-op.  Applied to the shared ``prepared`` relation
    BEFORE the histogram paths diverge, so the order-statistic edge
    placement (partitioning-sensitive within the documented rank error) sees
    identical partitions in both paths — arrow/expand bit-parity holds by
    construction.  Exact (unbinned) fits keep the source partitioning: their
    map side is pure codegen and the repartition was A/B-measured slower
    (see the note in ``_prepare``).  Partition count via the ~1 ms file-size
    estimate when the lineage is a plain scan pipeline (r11 — the ``df.rdd``
    probe costs ~0.4 s of physical planning per call), the probe otherwise.

    Returns ``(df, n_parts)`` — the relation plus its KNOWN partition count
    (``repartition(n)`` pins exactly n; AQE does not coalesce an explicit
    user repartition).  Callers thread the count through the fit instead of
    re-probing: under AQE, ``df.rdd`` on a plan that now contains this
    fan-out Exchange EXECUTES the shuffle stage to resolve the final plan —
    a full extra source pass per probe (measured ~1.2 s at the sf0.1
    4-feature shape; see OPTIMIZATION_r11.md)."""
    from efficient_trees_spark.sources.io import estimate_scan_partitions

    sc = prepared.sparkSession.sparkContext
    n = estimate_scan_partitions(prepared)
    if n is None:
        # pre-fan-out lineage: no Exchange below, so .rdd is planning only
        n = prepared.rdd.getNumPartitions()
    if n < sc.defaultParallelism:
        return prepared.repartition(sc.defaultParallelism), sc.defaultParallelism
    return prepared, n


def _packed_partition_target(
    n_parts: int, n_rows: int, width: int, parallelism: int
) -> int:
    """Partition count the persisted uint8 code cache SHOULD have: enough
    partitions that every core gets ≥ 4 waves (the pack+encode scan runs at
    this granularity too, and a 2-wave schedule was measured ~15% slower on
    the ×30 rung from straggler tail alone), few enough that each holds
    ~``SPARK_GRAFT_PACKED_PARTITION_BYTES`` (default 64 MB) of codes.
    Returns ``n_parts`` unchanged when no reduction is warranted."""
    import math
    import os

    target_bytes = int(
        os.environ.get("SPARK_GRAFT_PACKED_PARTITION_BYTES", str(64 << 20))
    )
    # +8: per-row binary header + the int target column riding the blob.
    want = max(
        4 * parallelism, math.ceil(max(1, n_rows) * (width + 8) / target_bytes)
    )
    return want if n_parts > want else n_parts


def _coalesce_for_pack(
    prepared: DataFrame,
    n_rows: int | None,
    width: int,
    bytes_per_cell: int = 1,
    n_parts: int | None = None,
) -> tuple[DataFrame, int | None]:
    """Right-size the partitioning the pack+encode pass — and therefore the
    PERSISTED code cache every per-level histogram job re-reads — inherits.

    The code relation's partition count defaults to the SOURCE scan's split
    count, sized for reading raw parquet (16–128 MB of compressed floats),
    not for 1-byte/cell codes: at the ×30 wide ladder rung (18M × 190) the
    13 GB table scanned as 848 splits, so the cache held ~4 MB of codes per
    partition and every level's ``mapInArrow`` paid 848 python-worker round
    trips — measured 16 s/level, and the partitions × nodes dense-cube
    driver merge fell out of budget from level 1 (split_finder.py).
    Coalescing (zero shuffle — adjacent splits merge map-side; the pack fn
    streams per Arrow batch, so per-task memory does not grow) to ~64 MB of
    codes per partition amortizes the round trips, keeps the dense merge in
    budget at every level, and leaves ≥ 2 waves per core for balance.  Row
    counts ride the edge-stats / distinct merges (``with_counts``), so
    sizing costs no extra job; partition-count-only reduction changes no
    per-row value — trees are bit-identical (histograms are exact integer
    sums, edges are already placed).

    ``n_parts`` is the caller's known partition count (from the fan-out,
    which pins it) — passed so the probe never runs ``.rdd`` on an
    Exchange-bearing plan (under AQE that executes the shuffle stage: a
    full extra source pass).  Returns ``(df, n_parts)`` with the output's
    count, threaded on to the per-level histogram budget."""
    if not n_rows:
        return prepared, None
    sc = prepared.sparkSession.sparkContext
    if n_parts is None:
        n_parts = prepared.rdd.getNumPartitions()
    want = _packed_partition_target(
        n_parts, n_rows, width * bytes_per_cell, sc.defaultParallelism
    )
    if want < n_parts:
        return prepared.coalesce(want), want
    return prepared, n_parts


def _two_scan_binned_edges(
    prepared: DataFrame,
    feature_names: list[str],
    n_bins: int,
    stats: int,
    dtype: str,
    n_parts: int | None = None,
) -> tuple[dict[str, list[float]], int]:
    """Pass 1 of the binned two-scan flow, shared by the single-tree fit
    and the forest: per-partition order statistics over the COLUMNAR
    relation (nothing persisted, rows-independent output) merged into
    quantile edges + the per-feature row counts.  Returns
    ``(bin_edges, n_rows_est)``.

    The raw stats volume is partitions × features × 2·stats doubles —
    row-count-independent but PARTITION-proportional, and a many-partition
    input (wide ladder ×9: 532 parquet splits) serializes past
    ``spark.driver.maxResultSize``.  Under budget, collect + driver merge
    (skips a whole Spark job); over it, the feature-keyed distributed merge
    collects only F edge rows.  Edges are bit-identical either way."""
    from efficient_trees_spark.operators.histogram import (
        _trim_malloc,
        arrow_stat_rows,
        merge_edge_stats_rows,
        merge_order_stats_distributed,
        partition_order_stats,
        stats_collect_budget,
    )

    stats_df = partition_order_stats(prepared, feature_names, stats, dtype=dtype)
    if n_parts is None:
        # Budget decision only — both branches are bit-identical; but avoid
        # probing .rdd on an Exchange-bearing plan (AQE executes the stage).
        n_parts = prepared.rdd.getNumPartitions()
    # x1.25: when no repartition fired, n_parts is the ~1 ms FilePartition
    # ESTIMATE (tree._fan_out_small_input), written for a parallelism
    # heuristic where both miss directions are safe; feeding a driver-
    # collect budget it must be treated as a lower bound (ADVICE r11) —
    # the pad trades a slightly earlier distributed-merge fallback (bit-
    # identical) for maxResultSize headroom.
    # Row width: stat values at the matrix dtype + fixed per-row fields —
    # the gap run-lengths never transfer at all (r12 gap-free format:
    # reconstructed from __sn via histogram._linspace_gaps).
    val_bytes = 4 if dtype == "f4" else 8
    est_stats_bytes = (
        int(n_parts * 1.25) * len(feature_names) * (stats * val_bytes + 48)
    )
    if est_stats_bytes > stats_collect_budget(prepared.sparkSession):
        bin_edges, feat_counts = merge_order_stats_distributed(
            stats_df, feature_names, n_bins, with_counts=True,
            stats_per_partition=stats,
        )
    else:
        if hasattr(stats_df, "toArrow"):
            # partitions x features rows of double-lists: Arrow IPC
            # transport + zero-copy numpy views instead of py4j row
            # pickling (tuple-indexed either way).
            stat_rows = arrow_stat_rows(stats_df.toArrow())
        else:  # pragma: no cover - pre-Arrow-collect Spark
            stat_rows = stats_df.collect()
        bin_edges, feat_counts = merge_edge_stats_rows(
            stat_rows, feature_names, n_bins, with_counts=True,
            stats_per_partition=stats,
        )
        del stat_rows
    _trim_malloc()
    return bin_edges, max(feat_counts.values(), default=0)


class DecisionTreeClassifier:
    """Decision tree classifier with a Spark DataFrame backend.

    :param max_depth: maximum tree depth; None = unbounded (gain>0 still stops).
    :param categorical_columns: columns to target-encode to ordinal codes
        before training (reference tree.py:93-108).
    :param criterion: impurity criterion (entropy default, like the reference).
    :param checkpoint_interval: truncate plan lineage with localCheckpoint
        every this many tree levels (Spark-specific; no reference analogue).
    :param max_bins: None (default) = the reference's EXACT split search over
        every distinct feature value (tree.py:244).  An integer caps the
        candidate set at ``max_bins`` equi-depth quantile edges per feature —
        the PLANET/MLlib scale strategy.  Exact mode's shuffle volume is
        Σ_f |distinct(f)| rows; on a 100 TB table a continuous feature has
        ~billions of distinct values, so that aggregated relation itself
        becomes the bottleneck.  Binned mode bounds it at
        n_features × max_bins regardless of data size.  The gain computed for
        each surviving candidate is EXACT — not an approximation — because
        binning maps every value to the smallest edge ≥ it, which preserves
        the row count of ``value <= edge`` for every edge; only the candidate
        set is thinned.  Thresholds remain real feature-space values, so
        inference is unchanged.
    :param bin_rel_error: relative rank error of the quantile sketch
        (``approxQuantile``) used to place bin edges; only the edge PLACEMENT
        is approximate, never the gains at the chosen edges.
    """

    def __init__(
        self,
        max_depth: int | None = None,
        categorical_columns: list[str] | None = None,
        criterion: Criterion = Criterion.ENTROPY,
        checkpoint_interval: int = 4,
        streaming: bool = False,
        max_bins: int | None = None,
        bin_rel_error: float = 1e-3,
        hist_method: str = "auto",
    ):
        self.max_depth = max_depth
        self.categorical_columns = categorical_columns
        self.criterion = Criterion(criterion)
        self.checkpoint_interval = checkpoint_interval
        self.max_bins = max_bins
        self.bin_rel_error = bin_rel_error
        # How split statistics are computed: "expand" melts features
        # long-form through a Catalyst hash aggregate (pure built-ins);
        # "arrow" computes Arrow-batched partial histograms
        # (operators/histogram.py) — bit-identical trees, ~10x faster at the
        # reference's 190-feature benchmark width because it skips the
        # rows x n_features Expand.  In EXACT mode (max_bins=None), "arrow"
        # uses every distinct value as a packed candidate edge when all
        # features fit uint8 code space (<= 253 distinct), else raises with
        # guidance.  "auto" = arrow for binned level-wise fits; for WIDE
        # (>= 64 feature) exact level-wise fits it tries the packed exact
        # path and falls back to the melt with a warning on overflow;
        # expand otherwise.
        if hist_method not in ("auto", "expand", "arrow"):
            raise ValueError(f"unknown hist_method: {hist_method!r}")
        self.hist_method = hist_method
        self.bin_edges_: dict[str, list[float]] | None = None
        # Drop-in compatibility with the reference signature (tree.py:20-26):
        # `streaming` selects Polars' out-of-core engine there.  Spark executes
        # partition-at-a-time with spill by architecture (SURVEY.md §2.10), so
        # the knob is accepted and recorded but changes nothing.
        self.streaming = streaming
        self.categorical_mappings: dict[str, dict[Any, int]] | None = None
        self.tree: dict[str, Any] | None = None

    # ------------------------------------------------------------------ io

    def save_model(self, path: str) -> None:
        """Persist the model artifact (pickle, like reference tree.py:41-53)."""
        with open(path, "wb") as f:
            pickle.dump(
                {"tree": self.tree, "categorical_mappings": self.categorical_mappings},
                f,
                protocol=pickle.HIGHEST_PROTOCOL,
            )

    def load_model(self, path: str) -> None:
        """Load a model artifact saved by :meth:`save_model` (tree.py:55-65)."""
        with open(path, "rb") as f:
            loaded = pickle.load(f)
        self.tree = loaded["tree"]
        self.categorical_mappings = loaded["categorical_mappings"]

    def to_json(self) -> str:
        """Portable JSON form of the model (extension beyond the reference)."""
        return json.dumps(
            {
                "tree": self.tree,
                "categorical_mappings": (
                    {
                        col: [[k, v] for k, v in mapping.items()]
                        for col, mapping in self.categorical_mappings.items()
                    }
                    if self.categorical_mappings
                    else None
                ),
            }
        )

    @classmethod
    def from_json(cls, payload: str) -> "DecisionTreeClassifier":
        data = json.loads(payload)
        model = cls()
        model.tree = data["tree"]
        if data["categorical_mappings"] is not None:
            model.categorical_mappings = {
                col: {k: v for k, v in pairs}
                for col, pairs in data["categorical_mappings"].items()
            }
        return model

    # ------------------------------------------------- categorical encoding

    def _fit_categorical_mappings(self, df: DataFrame, target_name: str) -> None:
        """Target encoding: order each categorical's values by mean target
        (reference tree.py:93-107).  Deterministic tie-break: (avg asc nulls
        first, value asc) — the reference inherits engine order on ties."""
        mappings: dict[str, dict[Any, int]] = {}
        for col in self.categorical_columns or []:
            rows = (
                df.groupBy(col)
                .agg(F.avg(F.col(target_name).try_cast("double")).alias("avg"))
                .orderBy(F.asc_nulls_first("avg"), F.asc(col))
                .collect()
            )
            mappings[col] = {row[col]: index for index, row in enumerate(rows)}
        self.categorical_mappings = mappings

    def apply_categorical_mappings(self, df: DataFrame) -> DataFrame:
        """Replace categorical values with their ordinal codes (tree.py:67-77).

        Small mappings become a literal map lookup (pure expression, no
        shuffle); large ones a broadcast-join against a tiny mapping table —
        both broadcast-cheap at any data scale.
        """
        if not self.categorical_mappings:
            return df
        for col, mapping in self.categorical_mappings.items():
            # NULL is a legal category (the target-encoding groupBy emits a
            # NULL group, and polars' replace maps it like any other value)
            # but neither a map key nor a join key: route it explicitly.
            null_code = mapping.get(None)
            non_null = {k: v for k, v in mapping.items() if k is not None}
            if len(non_null) <= _LITERAL_MAP_MAX:
                literal_map = F.create_map(
                    *[x for k, v in non_null.items() for x in (F.lit(k), F.lit(v))]
                )
                coded = F.when(F.col(col).isNull(), F.lit(null_code)).otherwise(
                    literal_map[F.col(col)]
                )
                df = df.withColumn(col, coded.cast("int"))
            else:
                spark = df.sparkSession
                mapping_df = spark.createDataFrame(
                    [(k, v) for k, v in non_null.items()], [col, f"__code_{col}"]
                )
                df = (
                    df.join(F.broadcast(mapping_df), on=col, how="left")
                    .withColumn(
                        col,
                        F.when(F.col(col).isNull(), F.lit(null_code))
                        .otherwise(F.col(f"__code_{col}"))
                        .cast("int"),
                    )
                    .drop(f"__code_{col}")
                )
        return df

    # ------------------------------------------------------------------ fit

    def fit(
        self,
        data: DataFrame,
        target_name: str,
        strategy: str = "level",
        shrink_features: bool = True,
    ) -> None:
        """Train the tree.  Reference lifecycle: tree.py:79-115.

        :param strategy:
            ``"level"`` (default) — PLANET-style level-wise growth: ONE split
            job + one distribution job per tree LEVEL, scoring every node of
            the level in a single plan keyed by a routing node-id column.
            Depth-4 fit = ~10 Spark jobs regardless of node count, the input
            relation is persisted once, and lineage stays one select deep.
            The scale answer for wide/deep trees on big clusters.
            ``"node"`` — the reference-shaped recursion (tree.py:180-385):
            one split + one distribution job per NODE with per-node persists.
            Kept as a cross-check oracle; produces the identical tree (both
            strategies share the same total-order tie-breaks).
        :param shrink_features:
            ``True`` (default) replicates the reference's ``shrink_dtype``
            pass (tree.py:90): float features are rounded to float32 before
            split search, so thresholds are f32 values.  This is NOT
            semantics-neutral — inference compares the user's unrounded
            float64 data against the f32 threshold, so a row sitting exactly
            on a split value can route differently than under f64 training
            (e.g. ``1.9 <= float32(1.9)=1.8999999762`` is false).  The
            reference's golden iris outputs depend on this behavior; bit
            parity requires it.  ``False`` trains in full float64.
            Divergence note: polars shrinks Float64→Float32 only when the
            column's min/max fit in f32 range (±3.4e38); this engine shrinks
            unconditionally to avoid an extra min/max scan.  Integer features
            are exact either way.
        """
        prepared, feature_names, unique_targets = self._prepare(
            data, target_name, shrink_features
        )

        hist_method = self.hist_method
        exact_auto_fallback = False
        if hist_method == "auto":
            if strategy == "level" and self.max_bins is not None:
                hist_method = "arrow"
            elif (
                strategy == "level"
                and self.max_bins is None
                and len(feature_names) >= 64
            ):
                # Wide exact fit: attempt the packed exact path (candidates
                # = every distinct value, uint8 codes); fall back to the
                # melt with a warning if any feature exceeds code space.
                hist_method = "arrow"
                exact_auto_fallback = True
            else:
                hist_method = "expand"
        if hist_method == "arrow" and strategy != "level":
            raise ValueError("hist_method='arrow' requires strategy='level'")
        if (
            hist_method == "expand"
            and self.max_bins is None
            and strategy == "level"
            and len(feature_names) >= 64
        ):
            # The melt's Expand multiplies rows by width (75 s at just
            # 60k x 190 — histogram.py module notes); never let a wide exact
            # fit take it silently.
            warnings.warn(
                f"exact-mode melt split search over {len(feature_names)} "
                "features Expands every row per feature; prefer "
                "hist_method='arrow' (packed exact, needs <= 65533 distinct "
                "values per feature) or max_bins for quantile candidates",
                stacklevel=2,
            )

        known_parts: int | None = None
        if self.max_bins is not None or hist_method == "arrow":
            prepared, known_parts = _fan_out_small_input(prepared)
        # Kept for the auto-exact fallback: the melt path must see the
        # double-typed relation, not the arrow path's f32-narrowed one.
        prepared_base = prepared

        if hist_method == "arrow" and shrink_features:
            # Shrunk features are f32-representable by construction, so the
            # persisted relation can store float32: halves the Arrow batch
            # volume every level's histogram pass transfers.  Lossless —
            # searchsorted compares f32 upcast to the float64 edges, and the
            # emitted candidate values are the edges themselves.
            prepared = prepared.selectExpr(
                *[
                    f"CAST(`{f.replace('`', '``')}` AS FLOAT) AS "
                    f"`{f.replace('`', '``')}`"
                    for f in feature_names
                ],
                _TARGET_IDX,
            )

        bin_edges: dict[str, list[float]] | None = None
        packed_mode = False
        packed_code_dtype = "u1"
        if hist_method == "arrow":
            from efficient_trees_spark.operators.histogram import (
                _MAX_PACKED_EDGES,
                _MAX_PACKED16_EDGES,
                distinct_edges_packed,
                pack_encode_features,
            )

            dtype = "f4" if shrink_features else "f8"
            if self.max_bins is not None:
                # Binned mode: TWO streaming scans of the source and no raw
                # cache at all — the XGBoost approx-tree architecture.
                # Pass 1 collects per-partition order statistics only
                # (rows-independent output, nothing persisted); pass 2
                # fuses pack+encode straight to uint8 codes, materialized
                # into the level-0 code cache (1 byte/cell — the only
                # persisted training artifact).  Edges and trees are
                # bit-identical to the cache-the-raw-floats flow
                # (histogram.partition_order_stats parity notes); versus it
                # the rescan of column-pruned compressed parquet replaces
                # writing AND reading back a 4/8-byte-per-cell cache — the
                # measured data-proportional chunk of peak executor memory.
                n_bins, stats = self._binned_edge_params()
                bin_edges, n_rows_est = _two_scan_binned_edges(
                    prepared, feature_names, n_bins, stats, dtype,
                    n_parts=known_parts,
                )
                self.bin_edges_ = bin_edges
                max_card = max(
                    (len(e) for e in bin_edges.values()), default=0
                )
                if max_card <= _MAX_PACKED16_EDGES:
                    # The persisted training relation becomes packed bin
                    # codes — uint8 (1 byte/cell) when every feature fits
                    # 253 edges, uint16 (2 bytes/cell, <= 65 533 edges)
                    # past that; routing and histograms run on codes —
                    # order-isomorphic to raw values, bit-identical trees.
                    packed_code_dtype = (
                        "u1" if max_card <= _MAX_PACKED_EDGES else "u2"
                    )
                    prepared, known_parts = _coalesce_for_pack(
                        prepared,
                        n_rows_est,
                        len(feature_names),
                        bytes_per_cell=1 if packed_code_dtype == "u1" else 2,
                        n_parts=known_parts,
                    )
                    prepared = pack_encode_features(
                        prepared,
                        feature_names,
                        bin_edges,
                        _TARGET_IDX,
                        dtype=dtype,
                        code_dtype=packed_code_dtype,
                    )
                    packed_mode = True
                # beyond uint16 code space: `prepared` stays columnar and
                # the per-level searchsorted histogram path takes over below.
            else:
                # EXACT mode on the packed path: candidates = every distinct
                # value (the reference's tree.py:244 semantics).  Snapping to
                # edges that ARE the distinct values is the identity, so the
                # histogram relation — and hence the tree — is bit-identical
                # to the exact melt; raises with guidance when any feature
                # exceeds uint8 code space (or, under auto selection, falls
                # back to the melt with a warning — the cardinality probe is
                # two cheap passes vs. the melt's rows x width Expand).
                # Same two-scan shape as the binned branch: the distinct
                # pass reads the columnar relation directly and the encode
                # is fused — no raw float cache in exact mode either.
                try:
                    bin_edges, n_rows_est = distinct_edges_packed(
                        prepared,
                        feature_names,
                        max_distinct=_MAX_PACKED16_EDGES,
                        dtype=dtype,
                        packed=False,
                        with_counts=True,
                    )
                except ValueError:
                    if not exact_auto_fallback:
                        raise
                    warnings.warn(
                        "auto exact fit: a feature exceeds uint16 code space "
                        "(> 65533 distinct values) — falling back to the "
                        "melt split search; consider max_bins for the "
                        "bounded scale path",
                        stacklevel=2,
                    )
                    hist_method = "expand"
                    bin_edges = None
                    prepared = prepared_base
                else:
                    self.bin_edges_ = bin_edges
                    # uint8 codes whenever every feature fits 253 distinct
                    # values; uint16 (2 bytes/cell) up to 65 533 — virtually
                    # every real exact fit, without ever taking the melt's
                    # rows x width Expand.
                    max_card = max(
                        (len(e) for e in bin_edges.values()), default=0
                    )
                    packed_code_dtype = (
                        "u1" if max_card <= _MAX_PACKED_EDGES else "u2"
                    )
                    prepared, known_parts = _coalesce_for_pack(
                        prepared,
                        n_rows_est,
                        len(feature_names),
                        bytes_per_cell=1 if packed_code_dtype == "u1" else 2,
                        n_parts=known_parts,
                    )
                    prepared = pack_encode_features(
                        prepared,
                        feature_names,
                        bin_edges,
                        _TARGET_IDX,
                        dtype=dtype,
                        code_dtype=packed_code_dtype,
                    )
                    packed_mode = True
        elif self.max_bins is not None:
            bin_edges = self._compute_bin_edges(prepared, feature_names)
            # Arrow histograms snap inside the count pass; the expand
            # path materializes the snapped relation up front.
            prepared = self._snap_to_edges(prepared, feature_names)

        # Both packed branches above are two-scan flows (sketch/distinct
        # pass + fused pack-encode): no raw float relation is ever cached
        # by a single-tree fit, so there is nothing to release — the only
        # persisted training artifact is the 1 byte/cell code relation the
        # level-wise builder pins (and the forest's shared raw cache, which
        # ensemble.py manages itself).
        if strategy == "level":
            self.tree = self._build_tree_levelwise(
                prepared,
                feature_names,
                unique_targets,
                hist_method=hist_method,
                bin_edges=bin_edges if hist_method == "arrow" else None,
                packed=packed_mode,
                packed_code_dtype=packed_code_dtype,
                packed_n_parts=known_parts if packed_mode else None,
            )
        elif strategy == "node":
            self.tree = self._build_tree(
                prepared, feature_names, unique_targets, depth=0
            )
        else:
            raise ValueError(f"unknown strategy: {strategy!r}")

    def _prepare(
        self, data: DataFrame, target_name: str, shrink_features: bool
    ) -> tuple[DataFrame, list[str], list[Any]]:
        """Shared fit preamble: categorical encoding, class-label discovery,
        and the normalized training relation — features cast to double (a
        common unpivot value type), target encoded to its class index (cheap
        int comparisons in the conditional counts).  With shrink_features,
        fractional features round-trip through float32 first (reference
        shrink_dtype, tree.py:90) so every candidate threshold downstream is
        an f32 value; integer/decimal features go straight to double (exact,
        like polars' lossless int shrink).  Also used once per ensemble by
        RandomForestClassifier."""
        feature_names = [c for c in data.columns if c != target_name]

        if self.categorical_columns:
            self._fit_categorical_mappings(data, target_name)
            data = self.apply_categorical_mappings(data)

        # Distinct class labels, sorted ascending for deterministic indexing
        # (reference keeps engine order, tree.py:110-113).
        unique_targets = [
            row[0]
            for row in data.select(target_name).distinct().orderBy(target_name).collect()
        ]
        self._unique_targets = unique_targets

        fractional = {
            f.name
            for f in data.schema.fields
            if f.dataType.typeName() in ("float", "double")
        }

        # One parsed SQL string per feature built in a single py4j call
        # (histogram.array_cast_expr rationale): at width ~190 the
        # per-column F.col().cast().alias() chain costs ~0.5 s of driver
        # round-trips per plan.  CAST == Column.cast — identical plans.
        def feature_sql(name: str) -> str:
            q = f"`{name.replace('`', '``')}`"
            inner = f"CAST({q} AS FLOAT)" if shrink_features and name in fractional else q
            return f"CAST({inner} AS DOUBLE) AS {q}"

        # A NULL label is a class of its own (distinct() surfaces it; the
        # reference's engine-order indexing tolerates it) — but it can't be a
        # literal map key, so it gets an explicit isNull branch.
        null_idx = next((i for i, v in enumerate(unique_targets) if v is None), None)
        label_to_idx = F.create_map(
            *[
                x
                for i, v in enumerate(unique_targets)
                if v is not None
                for x in (F.lit(v), F.lit(i))
            ]
        )
        target_idx_expr = F.when(
            F.col(target_name).isNull(), F.lit(null_idx)
        ).otherwise(label_to_idx[F.col(target_name)])
        prepared = data.select(
            F.expr(
                "struct(" + ", ".join(feature_sql(f) for f in feature_names) + ")"
            ).alias("__feat"),
            target_idx_expr.cast("int").alias(_TARGET_IDX),
        ).select("__feat.*", _TARGET_IDX)
        # NOTE: widening the persisted relation to defaultParallelism via an
        # up-front repartition was measured SLOWER (A/B at sf0.1: ~12s vs
        # ~9s per fit) — the extra shuffle costs more than the narrow cached
        # map side, because the expensive work all happens after the split
        # finder's own shuffles, which AQE already fans out.  Keep the
        # source partitioning.
        return prepared, feature_names, unique_targets

    # -------------------------------------------------- quantile binning

    def _binned_edge_params(self) -> tuple[int, int]:
        """(n_bins, stats_per_partition) for quantile edge placement —
        shared by the two-pass flow (:meth:`_compute_bin_edges`) and the
        fused pack+stats flow so both place identical edges."""
        n_bins = int(self.max_bins)
        if n_bins < 2:
            raise ValueError(f"max_bins must be >= 2, got {self.max_bins}")
        stats = max(2 * n_bins, min(2048, int(round(1.0 / self.bin_rel_error))))
        return n_bins, stats

    def _compute_bin_edges(
        self,
        prepared: DataFrame,
        feature_names: list[str],
    ) -> dict[str, list[float]]:
        """Place ≤ ``max_bins`` equi-depth candidate edges per feature.

        MLlib's trees use the same strategy (quantile-binned candidates); here
        it is an OPT-IN scale path layered on the exact engine rather than the
        only mode (SURVEY.md §7.3 — exactness is what MLlib can't do).

        One ``mapInArrow`` pass emits per-partition order statistics per
        feature; one tiny feature-keyed merge places edges at ranks
        k/max_bins and unions the TRUE max (a top edge below the max would
        leave high values unmappable) — ``operators/histogram.py:
        partition_quantile_edges``.  NaN and NULL are excluded (NaN keeps
        its own candidate slot sorting greatest).  Rank error of the edge
        PLACEMENT is ≤ ``bin_rel_error``; the gain math is never
        approximate.  (Two JVM-side alternatives were A/B'd at the
        reference's 190-feature width and lost: ``df.stat.approxQuantile``
        29 s, a single ``percentile_approx`` ObjectHashAggregate 19 s, this
        pass ~3 s at 600k rows — the GK sketch update loop is the cost, not
        the scan.)

        Gains at the surviving candidates are bit-identical to exact-mode
        gains at those same thresholds — binning maps every value to the
        smallest edge ≥ it, which preserves the ``value <= edge`` row count
        for every edge; only the candidate set is thinned.

        Edges are computed AFTER the f32 shrink cast, so they are themselves
        representable shrunk values and golden-parity semantics compose.
        """
        from efficient_trees_spark.operators.histogram import (
            partition_quantile_edges,
        )

        n_bins, stats = self._binned_edge_params()
        edges_by_feature = partition_quantile_edges(
            prepared, feature_names, n_bins, stats
        )
        self.bin_edges_ = edges_by_feature
        return edges_by_feature

    def _snap_to_edges(self, prepared: DataFrame, feature_names: list[str]) -> DataFrame:
        """Replace every value by the smallest bin edge ≥ it (expand-mode
        binning; the Arrow histogram path folds this into its count pass).

        ``array_min`` over a filtered literal array — O(B) collection
        expressions per cell, no UDF.  (A chained ``CASE WHEN v <= e_k``
        per feature was A/B'd at the 190-feature width and is 4x SLOWER:
        6 080 branches blow the codegen method budget and the interpreted
        CASE walk beats neither form.)  NULLs stay NULL (dropped per-feature
        by the melt, reference F1) and NaN stays NaN (a distinct value
        sorting greatest, same as exact mode)."""
        assert self.bin_edges_ is not None
        exprs_out = []
        for name in feature_names:
            edges = self.bin_edges_[name]
            if not edges:  # all-NULL/NaN feature: nothing to bin
                exprs_out.append(F.col(name))
                continue
            arr = F.array(*[F.lit(e).cast("double") for e in edges])
            snapped = F.array_min(F.filter(arr, lambda x: x >= F.col(name)))
            exprs_out.append(
                F.when(F.isnan(name), F.col(name)).otherwise(snapped).alias(name)
            )
        return prepared.select(*exprs_out, _TARGET_IDX)

    def _distribution(self, df: DataFrame) -> list[tuple[int, int]]:
        """(class_idx, count) pairs, class-ascending.  One tiny job — serves
        both the majority vote (reference tree.py:166-178) and the node's
        target_distribution (tree.py:363-372)."""
        rows = df.groupBy(_TARGET_IDX).count().orderBy(_TARGET_IDX).collect()
        return [(row[_TARGET_IDX], row["count"]) for row in rows]

    @staticmethod
    def _majority_idx(distribution: list[tuple[int, int]]) -> int:
        """Majority class with (count desc, class asc) tie-break; the
        reference's filter(len == len.max()) + row 0 (tree.py:175-178) is
        engine-order-dependent on ties."""
        return max(distribution, key=lambda pair: (pair[1], -pair[0]))[0]

    # ------------------------------------------------ level-wise training

    @staticmethod
    def _routing_expr(node: dict[str, Any]):
        """Compile the partial tree into a node-id routing Column: rows land
        on their pending node's id, NULL under finished leaves or NULL split
        features (the reference's drop-from-both-children semantics)."""
        if node["type"] == "pending":
            return F.lit(node["node_id"])
        if node["type"] == "leaf":
            return F.lit(None).cast("int")
        feature, threshold = node["feature"], node["threshold"]
        return (
            F.when(
                F.col(feature) <= threshold,
                DecisionTreeClassifier._routing_expr(node["left"]),
            )
            .when(
                F.col(feature) > threshold,
                DecisionTreeClassifier._routing_expr(node["right"]),
            )
            .otherwise(F.lit(None).cast("int"))
        )

    @staticmethod
    def _compile_routing_splits(
        node: dict[str, Any],
        feature_names: list[str],
        bin_edges: dict[str, list[float]],
        node_id: int = 0,
        out: list | None = None,
    ) -> list[tuple]:
        """Flatten the partial tree into the parent-before-child split list
        ``histogram.route_codes`` consumes: ``(node_id, feature_pos,
        code_threshold, left_id, right_id)`` per internal node, -1 for
        finalized (leaf) children.  Thresholds (always bin edges) translate
        to their edge index; code comparisons are bit-equivalent to the raw
        routing expression by the encode_packed order isomorphism."""
        from bisect import bisect_left

        if out is None:
            out = []
        if node["type"] != "node":
            return out
        feature = node["feature"]
        code = bisect_left(bin_edges[feature], node["threshold"])
        left, right = node["left"], node["right"]
        lid, rid = 2 * node_id + 1, 2 * node_id + 2
        out.append(
            (
                node_id,
                feature_names.index(feature),
                code,
                lid if left["type"] != "leaf" else -1,
                rid if right["type"] != "leaf" else -1,
            )
        )
        DecisionTreeClassifier._compile_routing_splits(
            left, feature_names, bin_edges, lid, out
        )
        DecisionTreeClassifier._compile_routing_splits(
            right, feature_names, bin_edges, rid, out
        )
        return out

    def _build_tree_levelwise(
        self,
        data: DataFrame,
        feature_names: list[str],
        unique_targets: list[Any],
        hist_method: str = "expand",
        bin_edges: dict[str, list[float]] | None = None,
        packed: bool = False,
        packed_all_features: list[str] | None = None,
        packed_code_dtype: str = "u1",
        packed_n_parts: int | None = None,
    ) -> dict[str, Any]:
        """PLANET-style breadth-first growth (the published strategy behind
        MLlib's trees, here with exact distinct-value splits): each level runs
        ONE split-search job covering every pending node, keyed by a routing
        column compiled from the partial tree.

        Class distributions cost no extra jobs beyond the root's: a node's
        distribution over its children is a free by-product of its split scan
        (the prefix-sum counts at the chosen threshold are exactly the left
        child's per-class counts; total − prefix the right's — the same
        identity the gain math itself uses), so each child's distribution is
        recorded when its parent splits.  A depth-d fit is therefore d split
        jobs plus one root-distribution job that runs concurrently with the
        first of them.  The reference recomputes value_counts per node
        (tree.py:363-372); the results are identical because split routing
        (`f <= thr` / `f > thr`, NULLs to neither side) partitions rows the
        same way the not-null prefix sums count them.
        """
        node_col = "__node_id"
        data = data.persist()
        try:
            root: dict[str, Any] = {"type": "pending", "node_id": 0}
            frontier: dict[int, dict[str, Any]] = {0: root}
            # node_id -> [(class_idx, count), ...] class-ascending, zero-count
            # classes absent (value_counts semantics, reference tree.py:363-372).
            distributions: dict[int, list[tuple[int, int]]] = {}
            depth = 0
            # Counts relation for the NEXT level, derived driver-side from
            # the previous level's PAIR-cube pass (r12): when set, this
            # level's splits are scored with NO Spark job at all.
            carry_pdf = None
            while frontier:
                at_max_depth = self.max_depth is not None and depth >= self.max_depth
                need_root_dist = depth == 0

                best_by_node: dict[int, dict[str, Any]] = {}
                if need_root_dist or not at_max_depth:
                    if packed:
                        # Routing runs vectorized inside the histogram pass
                        # (histogram.route_codes); the root distribution is a
                        # plain target count (depth 0 routes every row to
                        # node 0).
                        dist_src = data

                        all_names = packed_all_features or feature_names
                        # Look one level ahead (pair-cube pass) only when
                        # the NEXT level will need splits too; the budget
                        # gate inside find_best_splits_packed decides
                        # whether the pair pass actually fires.
                        lookahead = (not at_max_depth) and (
                            self.max_depth is None
                            or depth + 1 < self.max_depth
                        )

                        if carry_pdf is not None:
                            level_pdf, carry_pdf = carry_pdf, None
                            lookahead = False

                            def find_splits():
                                import time as _time

                                t0 = _time.perf_counter()
                                best = split_finder.best_splits_from_counts_pdf(
                                    level_pdf,
                                    data.sparkSession,
                                    len(unique_targets),
                                    feature_names,
                                    node_col,
                                    self.criterion,
                                )
                                split_finder._emit_level_timings(
                                    {
                                        "path": "carried",
                                        "n_pending_nodes": len(frontier),
                                        "level_total_sec": round(
                                            _time.perf_counter() - t0, 3
                                        ),
                                        "stages": {},
                                    }
                                )
                                return best

                        else:

                            def find_splits():
                                return split_finder.find_best_splits_packed(
                                    data,
                                    feature_names,
                                    len(unique_targets),
                                    self.criterion,
                                    bin_edges,
                                    self._compile_routing_splits(
                                        root, all_names, bin_edges
                                    ),
                                    node_col=node_col,
                                    all_feature_names=all_names,
                                    n_pending_nodes=len(frontier),
                                    want_distributions=need_root_dist,
                                    code_dtype=packed_code_dtype,
                                    n_input_parts=packed_n_parts,
                                    lookahead=lookahead,
                                )

                    else:
                        with_node = data.withColumn(
                            node_col, self._routing_expr(root)
                        ).filter(F.col(node_col).isNotNull())
                        dist_src = with_node

                        def find_splits():
                            return split_finder.find_best_splits_per_node(
                                with_node,
                                feature_names,
                                len(unique_targets),
                                self.criterion,
                                node_col,
                                hist_method=hist_method,
                                bin_edges=bin_edges,
                                bounded_candidates=self.max_bins is not None,
                            )

                    def collect_root_distribution():
                        rows = (
                            dist_src.groupBy(_TARGET_IDX)
                            .count()
                            .orderBy(_TARGET_IDX)
                            .collect()
                        )
                        return [(row[_TARGET_IDX], row["count"]) for row in rows]

                    if packed and not at_max_depth:
                        # Packed path: the root distribution rides the
                        # level-0 histogram as DIST_FEATURE sentinel rows —
                        # one job, and no second job racing the first to
                        # materialize the code cache (both used to encode
                        # the same uncached partitions concurrently).
                        splits_out = find_splits()
                        if lookahead:
                            # 3-tuple contract: splits, fused distributions
                            # (root level only), and — when the pair pass
                            # fired — the NEXT level's counts relation.
                            splits_out, fused_dists, carry_pdf = splits_out
                        elif need_root_dist:
                            splits_out, fused_dists = splits_out
                        else:
                            fused_dists = None
                        if need_root_dist:
                            distributions[0] = (
                                fused_dists[0]
                                if fused_dists is not None and 0 in fused_dists
                                else collect_root_distribution()
                            )
                        best_by_node = {b["node_id"]: b for b in splits_out}
                    else:
                        # Expand path keeps the overlap: the (cheap)
                        # root-distribution job and the (expensive) split
                        # job are independent — submit both and let the
                        # scheduler overlap them.
                        with ThreadPoolExecutor(max_workers=2) as pool:
                            dist_future = (
                                pool.submit(collect_root_distribution)
                                if need_root_dist
                                else None
                            )
                            if not at_max_depth:
                                best_by_node = {
                                    b["node_id"]: b for b in find_splits()
                                }
                            if dist_future is not None:
                                distributions[0] = dist_future.result()

                next_frontier: dict[int, dict[str, Any]] = {}
                for node_id, placeholder in frontier.items():
                    distribution = distributions.pop(node_id)
                    majority = unique_targets[self._majority_idx(distribution)]
                    best = best_by_node.get(node_id)
                    if at_max_depth or best is None or not best["information_gain"] > 0:
                        placeholder.clear()
                        placeholder.update({"type": "leaf", "value": majority})
                        continue
                    # A pure child (single surviving class) can never split
                    # again (every candidate gain is 0 → leaf with that class,
                    # reference tree.py:350,384-385), so it is finalized here
                    # and its rows never enter the next level's split job.
                    def make_child(child_id: int, counts: list[int]) -> dict[str, Any]:
                        pairs = [(i, c) for i, c in enumerate(counts) if c > 0]
                        if len(pairs) == 1:
                            return {"type": "leaf", "value": unique_targets[pairs[0][0]]}
                        distributions[child_id] = pairs
                        return {"type": "pending", "node_id": child_id}

                    left = make_child(2 * node_id + 1, best["left_counts"])
                    right = make_child(2 * node_id + 2, best["right_counts"])
                    placeholder.clear()
                    placeholder.update(
                        {
                            "type": "node",
                            "feature": best["feature"],
                            "threshold": best["threshold"],
                            "information_gain": best["information_gain"],
                            "criterion_value": best["parent_criterion"],
                            "target_distribution": [c for _, c in distribution],
                            "left": left,
                            "right": right,
                        }
                    )
                    for child in (left, right):
                        if child["type"] == "pending":
                            next_frontier[child["node_id"]] = child

                frontier = next_frontier
                depth += 1
            return root
        finally:
            data.unpersist()

    # ----------------------------------------------- node-wise (reference)

    def _build_tree(
        self,
        data: DataFrame,
        feature_names: list[str],
        unique_targets: list[Any],
        depth: int,
    ) -> dict[str, Any]:
        """Recursive node construction mirroring reference tree.py:180-385,
        with Spark cache/lineage discipline layered on."""
        if self.checkpoint_interval and depth > 0 and depth % self.checkpoint_interval == 0:
            data = data.localCheckpoint(eager=False)
        data = data.persist()
        try:
            distribution = self._distribution(data)  # also materializes the cache
            majority = unique_targets[self._majority_idx(distribution)]

            if self.max_depth is not None and depth >= self.max_depth:
                return {"type": "leaf", "value": majority}

            best = split_finder.find_best_split(
                data, feature_names, len(unique_targets), self.criterion
            )
            if best is None or not best["information_gain"] > 0:
                return {"type": "leaf", "value": majority}

            feature, threshold = best["feature"], best["threshold"]
            # NULL split-feature rows satisfy neither predicate → dropped from
            # both children, matching the reference's mask semantics
            # (tree.py:351-358; SURVEY.md §2.11.3).
            left = data.filter(F.col(feature) <= threshold)
            right = data.filter(F.col(feature) > threshold)

            return {
                "type": "node",
                "feature": feature,
                "threshold": threshold,
                "information_gain": best["information_gain"],
                "criterion_value": best["parent_criterion"],
                # counts of present classes ordered by class value, like
                # value_counts().sort(target) (tree.py:363-372)
                "target_distribution": [count for _, count in distribution],
                "left": self._build_tree(left, feature_names, unique_targets, depth + 1),
                "right": self._build_tree(right, feature_names, unique_targets, depth + 1),
            }
        finally:
            data.unpersist()

    # ------------------------------------------------------------- predict

    def transform(
        self,
        df: DataFrame,
        prediction_col: str = "prediction",
        null_policy: str = "drop",
    ) -> DataFrame:
        """Spark-idiomatic batch inference: input DataFrame + one compiled
        CASE projection → input columns plus ``prediction_col``.  No action is
        triggered; the result composes into larger plans.

        :param null_policy:
            ``"drop"``  — rows whose root-to-leaf path hits a NULL split
            feature are removed (bit-parity with reference predict_many,
            tree.py:129-130);
            ``"keep"``  — such rows survive with a NULL prediction;
            ``"strict"`` — raise if any such row exists (the per-row
            ``predict`` analogue, which fails on NULL comparisons).
        """
        if self.tree is None:
            raise RuntimeError("model not fitted: call fit() or load_model() first")
        if self.categorical_mappings:
            df = self.apply_categorical_mappings(df)
        out = df.withColumn(prediction_col, compile_tree(self.tree))
        if null_policy == "drop":
            return out.filter(F.col(prediction_col).isNotNull())
        if null_policy == "keep":
            return out
        if null_policy == "strict":
            n_bad = out.filter(F.col(prediction_col).isNull()).count()
            if n_bad:
                raise ValueError(
                    f"{n_bad} rows hit a NULL split feature; impute nulls or use "
                    "null_policy='drop'/'keep'"
                )
            return out
        raise ValueError(f"unknown null_policy: {null_policy!r}")

    def predict_many(self, data: DataFrame) -> list[Any]:
        """Reference-shaped API (tree.py:117-145): list of predictions in input
        row order.  The plan is select+filter only — no shuffle — so collected
        order equals input order without the reference's row-index + re-sort."""
        rows = self.transform(data, null_policy="drop").select("prediction").collect()
        return [row[0] for row in rows]

    def predict(self, data: Iterable[dict]) -> list[Any]:
        """Pure-driver per-row tree walk (reference tree.py:147-164); useful as
        an oracle against the compiled CASE plan.  Categorical codes are applied
        from the fitted mappings; a NULL/None split feature raises, like the
        reference's None-comparison TypeError."""

        def walk(node: dict[str, Any], sample: dict) -> Any:
            if node["type"] == "leaf":
                return node["value"]
            value = sample[node["feature"]]
            if value is None:
                raise TypeError(
                    f"NULL value for split feature {node['feature']!r} in predict(); "
                    "use transform(null_policy=...) for explicit NULL routing"
                )
            if self.categorical_mappings and node["feature"] in self.categorical_mappings:
                value = self.categorical_mappings[node["feature"]][value]
            return walk(node["left"] if value <= node["threshold"] else node["right"], sample)

        return [walk(self.tree, sample) for sample in data]

    def feature_importances(self) -> dict[str, float]:
        """Gain-based feature importances (the sklearn/MLlib convention):
        each internal node contributes ``information_gain × node_sample_count``
        to its split feature; totals are normalized to sum to 1.  Pure
        driver-side walk of the node dicts — no Spark job.  Extension beyond
        the reference (which exposes no importances); useful for the feature
        pruning step a wide-table pipeline runs between fits."""
        if self.tree is None:
            raise RuntimeError("model not fitted: call fit() or load_model() first")
        totals: dict[str, float] = {}

        def walk(node: dict[str, Any]) -> None:
            if node["type"] != "node":
                return
            weight = float(sum(node["target_distribution"]))
            totals[node["feature"]] = totals.get(node["feature"], 0.0) + (
                node["information_gain"] * weight
            )
            walk(node["left"])
            walk(node["right"])

        walk(self.tree)
        norm = sum(totals.values())
        if norm <= 0:
            return {f: 0.0 for f in totals}
        return {f: v / norm for f, v in totals.items()}

    def get_majority_class(self, df: DataFrame, target_name: str) -> Any:
        """Majority class of a frame (reference tree.py:166-178), with the
        deterministic (count desc, value asc) tie-break."""
        rows = df.groupBy(target_name).count().orderBy(F.desc("count"), F.asc(target_name)).limit(1).collect()
        return rows[0][0]
