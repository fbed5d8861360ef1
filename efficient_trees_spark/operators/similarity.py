"""Embedding similarity search: brute-force cosine baseline + LSH-bucketed
approximate variant.

Scale design (corpus = N vectors, queries = Q << N):

* **Brute force** — the Q queries (with precomputed norms) are broadcast; the
  corpus is scanned exactly once with its norms computed inline; no shuffle
  at all until the (small) per-query top-k window.  This is the correct
  baseline up to ~millions × dozens of queries.
* **Hyperplane LSH** — each vector gets a bucket id from the signs of its dot
  products with ``n_planes`` fixed hyperplanes; the query-corpus join becomes
  bucket-equality (shuffle on a small int key, bucket-local compare).  Recall
  is the standard partial-recall tradeoff; planes are deterministic integer
  patterns so results are reproducible and oracle-checkable across engines.

All math is built-in Catalyst array expressions (``zip_with`` +
``aggregate``) in double precision — no UDFs, no Python workers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (matches the oracle's fold order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ------------------------------------------------- int8 scalar quantization
#
# The standard memory lever for billion-vector ANN: store int8 codes + one
# float scale per vector (≈4x smaller than float32, ≈8x than float64), score
# candidates on dequantized values.  Symmetric per-vector scheme: scale =
# max|x| / 127, code_i = round(x_i / scale).  Pure collection expressions.


def quantize_embedding(vec_col: Column | str) -> Column:
    """struct<scale: double, codes: array<tinyint>> — symmetric per-vector
    int8 quantization.  All-zero vectors get scale 0 and zero codes.

    ``amax`` is ``_bind``-hoisted: referenced inside the code lambda it
    would re-run the array_max fold per ELEMENT (twice — condition and
    divisor: O(dim²) per row).  ``named_struct``, not ``struct``: field
    aliases are dropped inside lambda bodies."""
    vec = as_double_array(vec_col)

    def quantized(vv: Column, amax: Column) -> Column:
        scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(0.0))
        codes = F.transform(
            vv,
            lambda x: F.when(amax > 0, F.round(x / (amax / 127.0)))
            .otherwise(F.lit(0))
            .cast("tinyint"),
        )
        return F.named_struct(
            F.lit("scale"), scale, F.lit("codes"), codes
        )

    return _bind(
        vec,
        lambda vv: _bind(
            F.array_max(F.transform(vv, F.abs)),
            lambda amax: quantized(vv, amax),
        ),
    )


def dequantize_embedding(q_col: Column | str) -> Column:
    """array<double> reconstruction: code_i * scale (max abs error
    scale/2 = max|x|/254 per component)."""
    q = F.col(q_col) if isinstance(q_col, str) else q_col
    return F.transform(q.getField("codes"), lambda c: c.cast("double") * q.getField("scale"))


def _with_norm(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    vec = as_double_array(vec_col)
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        vec.alias(f"{prefix}_vec"),
        norm(vec).alias(f"{prefix}_norm"),
    )


def brute_force_scores(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(query_id, neighbor_id, cos) for every query × corpus combination,
    self-pairs excluded.  Queries are broadcast — the corpus never shuffles
    by a KEY; a few-split corpus (one local parquet file, one unsplittable
    archive) is round-robin fanned out first so the O(N×Q) compare — the
    whole cost of this operator — runs on every core instead of the scan's
    split count (r11: the sf0.1 corpus scanned as ONE split, so scoring ran
    1-of-32 cores; measured ~2x on both brute bench queries).  On a real
    cluster splits far exceed cores and the fan-out is a no-op.  Scores and
    ranks are partition-invariant (row-wise math, rounded total orders), so
    results are bit-identical either way."""
    from efficient_trees_spark.sources.io import fan_out_small_input

    q = _with_norm(queries, id_col, vec_col, "query")
    c = _with_norm(fan_out_small_input(corpus), id_col, vec_col, "neighbor")
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    cos = dot(F.col("query_vec"), F.col("neighbor_vec")) / (
        F.col("query_norm") * F.col("neighbor_norm")
    )
    return pairs.select("query_id", "neighbor_id", cos.alias("cos"))


def cosine_above_threshold(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    round_to: int = 6,
) -> DataFrame:
    scores = brute_force_scores(corpus, queries, id_col, vec_col)
    return scores.select(
        "query_id", "neighbor_id", F.round("cos", round_to).alias("cos")
    ).filter(F.col("cos") >= threshold)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    round_to: int = 6,
) -> DataFrame:
    """Top-k neighbors per query, ranked on the ROUNDED score with id
    tie-break — a total order, so results are engine- and partitioning-stable."""
    from pyspark.sql import Window

    scores = brute_force_scores(corpus, queries, id_col, vec_col).select(
        "query_id", "neighbor_id", F.round("cos", round_to).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ------------------------------------------------------------ LSH bucketing

N_PLANES = 8


def plane_weight(p: int, d: int) -> int:
    """Deterministic pseudo-random hyperplane weight in [-6, 6] — an integer
    pattern both engines compute identically (no RNG, no floats)."""
    return (p * 37 + d * 61) % 13 - 6


def bucket_id(vec_col: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Bucket = bit pattern of hyperplane-side signs.

    The planes ride in as ONE parsed literal (``array<struct<bit, w>>``)
    folded with ``aggregate`` — the previous unrolled ``element_at``
    arithmetic cost n_planes × dim py4j round-trips per call (~3.7 s of
    plan construction at 8 × 64) and re-cast the vector once per plane
    (``_bind`` hoists the cast+slice to once per row).  The per-plane dot
    is the same left-to-right sequential sum, so bucket values are
    bit-identical to the unrolled form (and to the DuckDB ``_bucket_sql``
    re-derivation)."""
    v = as_double_array(vec_col) if not isinstance(vec_col, str) else as_double_array(F.col(vec_col))
    planes_lit = F.expr(
        "array("
        + ",".join(
            "named_struct('bit', %d, 'w', array(%s))"
            % (
                2**p,
                ",".join(
                    repr(float(plane_weight(p, d))) + "D" for d in range(dim)
                ),
            )
            for p in range(n_planes)
        )
        + ")"
    )
    return _bind(
        F.slice(v, 1, dim),  # first dim elements, like the unrolled form
        lambda vv: F.aggregate(
            planes_lit,
            F.lit(0),
            lambda acc, pl: acc
            + F.when(dot(vv, pl["w"]) > 0, pl["bit"]).otherwise(F.lit(0)),
        ),
    )


def lsh_cosine_above_threshold(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float,
    n_planes: int = N_PLANES,
    round_to: int = 6,
) -> DataFrame:
    """Approximate variant: compare only within matching hyperplane buckets.
    Misses pairs whose vectors straddle a plane (partial recall) — the scale
    path when Q × N brute force is too large."""
    q = _with_norm(queries, id_col, vec_col, "query").withColumn(
        "bucket", bucket_id(F.col("query_vec"), dim, n_planes)
    )
    c = _with_norm(corpus, id_col, vec_col, "neighbor").withColumn(
        "bucket", bucket_id(F.col("neighbor_vec"), dim, n_planes)
    )
    pairs = c.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = dot(F.col("query_vec"), F.col("neighbor_vec")) / (
        F.col("query_norm") * F.col("neighbor_norm")
    )
    return pairs.select(
        "query_id", "neighbor_id", F.round(cos, round_to).alias("cos")
    ).filter(F.col("cos") >= threshold)


# ------------------------------------------------------------ IVF bucketing

def nearest_centroids(
    vectors: DataFrame,
    centroids: "DataFrame | CentroidSet",
    id_col: str,
    vec_col: str,
    nprobe: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """(id, cell, probe_rank) — each vector's ``nprobe`` nearest centroids by
    cosine (rounded, centroid-id tie-break: a total order both engines agree
    on).  For inlineable centroid sets this is MAP-ONLY: the ranked probes
    come from :func:`inline_probe_cells` (a per-row ``array_sort`` over
    literal centroids, exploded) — zero exchanges for ANY nprobe, so even a
    corpus-sized "query" relation never shuffles for assignment.  Past
    ``_LITERAL_ASSIGN_MAX_K`` centroids the lazy fallback takes over:
    ``centroids`` joins in by broadcast and a ``partitionBy(id)`` window
    ranks the k-per-vector scored relation (one exchange)."""
    probes = inline_probe_cells(
        centroids, as_double_array(vec_col), nprobe, round_to
    )
    if probes is not None:
        return vectors.select(
            F.col(id_col).alias("__vid"), F.explode(probes).alias("__p")
        ).select(
            F.col("__vid").alias(id_col),
            F.col("__p.cell").alias("cell"),
            F.col("__p.probe_rank").alias("probe_rank"),
        )
    from pyspark.sql import Window

    c = _centroid_df(centroids).select(
        F.col("cid"),
        as_double_array("cvec").alias("cvec"),
        norm(as_double_array("cvec")).alias("cnorm"),
    )
    v = vectors.select(
        F.col(id_col).alias("__vid"),
        as_double_array(vec_col).alias("__vec"),
        norm(as_double_array(vec_col)).alias("__vnorm"),
    )
    scored = v.crossJoin(F.broadcast(c)).select(
        "__vid",
        "cid",
        F.round(
            dot(F.col("__vec"), F.col("cvec")) / (F.col("__vnorm") * F.col("cnorm")),
            round_to,
        ).alias("__ccos"),
    )
    w = Window.partitionBy("__vid").orderBy(F.desc("__ccos"), F.asc("cid"))
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .select(F.col("__vid").alias(id_col), F.col("cid").alias("cell"), "probe_rank")
    )


# Past this many centroids the plan-literal assignment form would bloat
# the expression tree (k x dim inline literals); the lazy join+window form
# takes over.  256 x 64-dim = 16k literals — comfortably inside codegen.
# The ceiling was probed past the cap (tools/probe_scale.py with
# PROBE_SCALE_INLINE_MAX, sf0.1, round 11): inline still WINS on
# execution wall at k=500 (1.15x/1.44x at x1/x50 rows) and k=1000
# (1.09x/1.28x), but per-call PLAN CONSTRUCTION (py4j literal shipping +
# Catalyst planning) grows ~linearly with k — ~2 s at k=250, ~4.5 s at
# 500, ~8.8 s at 1000 (warm) — and dominates any non-corpus-sized batch.
# The knee is a plan-cost knee, not an execution knee; 256 keeps the
# per-call driver cost bounded while the join+window fallback stays lazy.
_LITERAL_ASSIGN_MAX_K = 256


class CentroidSet:
    """Collected-once handle over a ``(cid, cvec)`` centroid relation.

    :func:`inline_cell_column` collects the centroid rows per call — one
    tiny driver action, but a suite composing several operators over the
    SAME centroids (``ivf_cosine_topk`` + ``residual_vectors`` +
    ``ivf_pq_topk`` + ``semantic_dedup``) pays that collect once per
    operator.  Wrap the relation once and pass the handle anywhere a
    centroid DataFrame is accepted: the rows are collected AT MOST ONCE
    (memoized on first literal-assignment use) while the underlying
    relation stays available for the lazy paths that never collect
    (query-side :func:`nearest_centroids`, the past-
    ``_LITERAL_ASSIGN_MAX_K`` join+window fallback).  Plans are identical
    to passing the raw DataFrame (parity-tested) — this changes WHEN the
    driver collects, never what executes."""

    def __init__(self, df: DataFrame):
        self.df = df
        self._rows: list[tuple[int, list[float]]] | None = None
        self.collect_count = 0  # observable in tests: must stay <= 1

    @property
    def rows(self) -> list[tuple[int, list[float]]]:
        """Up to ``_LITERAL_ASSIGN_MAX_K + 1`` rows (memoized).  The
        collect is LIMIT-bounded: a centroid relation too large to inline
        costs the driver one extra row, never the full relation — callers
        only ever need the rows when the set IS inlineable."""
        if self._rows is None:
            self.collect_count += 1
            self._rows = _bounded_centroid_rows(self.df)
        return self._rows


def _bounded_centroid_rows(df: DataFrame) -> list[tuple[int, list[float]]]:
    return [
        (r["cid"], [float(x) for x in r["cvec"]])
        for r in df.select("cid", "cvec")
        .limit(_LITERAL_ASSIGN_MAX_K + 1)
        .collect()
    ]


def _centroid_df(centroids: "DataFrame | CentroidSet") -> DataFrame:
    """The lazy relation behind either accepted centroid form."""
    return centroids.df if isinstance(centroids, CentroidSet) else centroids


def inline_cell_column(
    centroids: "DataFrame | CentroidSet", vec: Column, round_to: int = 6
) -> Column | None:
    """The nearest-centroid cell as a COLUMN over ``vec`` — the map-only
    corpus-side assignment primitive — or ``None`` when the centroid set
    is not inlineable (empty, or past ``_LITERAL_ASSIGN_MAX_K``).

    The window form (:func:`nearest_centroids`) is honest about the query
    side but NOT map-only on the corpus: its ``Window.partitionBy(id)``
    forces a corpus-sized exchange of the k-per-vector scored relation,
    and callers then pay a second corpus-sized join to attach the cell
    back.  Here the centroids relation is collected instead (k rows —
    tiny by the IVF/SemDeDup contract; ONE eager driver action, and the
    collect is LIMIT-bounded to ``_LITERAL_ASSIGN_MAX_K + 1`` rows, so a
    not-actually-tiny centroid relation costs the driver one extra row —
    never a full-relation flood — before the lazy fallback takes over)
    and the returned column compiles to
    :func:`assign_literal_centroid` — k inline dot products per row in
    whole-stage codegen — so the cell is born IN the caller's own
    projection: zero shuffle, zero join, no re-attachment.  Same rounding
    + lowest-cid tie-break as the window form (oracle-checked), so the
    two are interchangeable.  Pass a :class:`CentroidSet` instead of the
    raw relation to amortize the collect across composed operators."""
    cents = (
        centroids.rows
        if isinstance(centroids, CentroidSet)
        else _bounded_centroid_rows(centroids)
    )
    if not 0 < len(cents) <= _LITERAL_ASSIGN_MAX_K:
        return None
    return assign_literal_centroid(vec, cents, round_to)


def inline_probe_cells(
    centroids: "DataFrame | CentroidSet",
    vec: Column,
    nprobe: int,
    round_to: int = 6,
) -> Column | None:
    """The ``nprobe`` nearest centroid cells as an ORDERED ARRAY COLUMN
    (``array<struct<cell, probe_rank>>``) over ``vec`` — nprobe ranking as
    a pure projection — or ``None`` when the centroid set is not
    inlineable (empty, or past ``_LITERAL_ASSIGN_MAX_K``).

    This closes the one assignment path :func:`inline_cell_column` left on
    the join+window form: ``nprobe > 1`` ranking.  The window form
    (:func:`nearest_centroids`) EXCHANGES the k-per-vector scored relation
    even for a 3-probe assignment of a handful of queries — and in
    corpus-as-queries compositions (all-pairs matching, index refresh) the
    "query" relation is corpus-sized, where that exchange is the plan's
    biggest shuffle.  Here the k scored structs are ordered INSIDE the row:
    ``array_sort`` ascending on (−rounded cos, cid) — exactly the window's
    cos-DESC / cid-ASC total order — then sliced to ``nprobe`` and
    numbered, so callers explode a per-row ordered array instead of
    ranking a shuffle.  Degenerate cosines keep window parity via two
    sentinel mappings whose slots are vacant by Cauchy-Schwarz (an
    overflowed dot forces the norm product past it, so a cosine can be
    NaN but never ±Infinity): null (null / size-mismatched vector) maps
    to +inf and ranks LAST like desc-nulls-last; NaN (inf/inf on
    extreme-magnitude vectors) maps to -inf and ranks FIRST like Spark's
    NaN-greatest desc order (parity is monkeypatch-forced in tests)."""
    cents = (
        centroids.rows
        if isinstance(centroids, CentroidSet)
        else _bounded_centroid_rows(centroids)
    )
    if not 0 < len(cents) <= _LITERAL_ASSIGN_MAX_K:
        return None
    lits = _literal_centroids(cents)

    def probes(v, n):
        def sort_key(c):
            cos_r = F.round(dot(v, c["cvec"]) / (n * c["cnorm"]), round_to)
            # nanvl + coalesce, NOT a when-chain: Catalyst does not CSE
            # into lambda bodies, so every REFERENCE to cos_r here
            # re-evaluates the O(dim) dot per centroid — a null-flag
            # struct field (3 refs) measured 1.4x on the whole
            # corpus-as-queries assignment.  This form references cos_r
            # exactly once.  The two sentinel slots are VACANT by
            # arithmetic, not by hope: Cauchy-Schwarz holds in f64 too
            # (any overflowed product inflates the norm product past
            # the dot), so an overflowed cosine lands at NaN (inf/inf)
            # — never at ±Infinity.  Mapping: null -> +inf ranks LAST
            # (window's desc-nulls-last); NaN (-cos_r stays NaN) ->
            # -inf ranks FIRST (Spark orders NaN above +inf under desc
            # — negating alone would rank it last ascending, the parity
            # gap this fixes).
            key = F.coalesce(
                F.nanvl(-cos_r, F.lit(float("-inf"))),
                F.lit(float("inf")),
            )
            return F.named_struct(
                F.lit("neg_cos"), key, F.lit("cid"), c["cid"]
            )

        ordered = F.slice(
            F.array_sort(F.transform(lits, sort_key)), 1, int(nprobe)
        )
        return F.transform(
            ordered,
            lambda s, i: F.named_struct(
                F.lit("cell"), s["cid"], F.lit("probe_rank"), i + F.lit(1)
            ),
        )

    # vec and norm(vec) are _bind-hoisted: evaluated once per row, not
    # once per centroid inside the scoring lambda.
    return _bind(vec, lambda v: _bind(norm(v), lambda n: probes(v, n)))


def _probed_query_side(
    queries: DataFrame,
    centroids: "DataFrame | CentroidSet",
    id_col: str,
    vec_col: str,
    nprobe: int,
    round_to: int,
) -> DataFrame:
    """(query_id, query_vec, query_norm, cell) — one row per (query,
    probed cell): the relation IVF candidate joins broadcast.  Map-only
    for inlineable centroid sets (vector, norm and the exploded ranked
    probes are all columns of the query scan's own projection — no window
    exchange, no cells re-join); the join+window fallback otherwise."""
    vec = as_double_array(vec_col)
    probes = inline_probe_cells(centroids, vec, nprobe, round_to)
    if probes is not None:
        return queries.select(
            F.col(id_col).alias("query_id"),
            vec.alias("query_vec"),
            norm(vec).alias("query_norm"),
            F.explode(probes).alias("__p"),
        ).select(
            "query_id", "query_vec", "query_norm",
            F.col("__p.cell").alias("cell"),
        )
    query_cells = nearest_centroids(
        queries, centroids, id_col, vec_col, nprobe=nprobe, round_to=round_to
    )
    return _with_norm(queries, id_col, vec_col, "query").join(
        query_cells.select(F.col(id_col).alias("query_id"), "cell"), "query_id"
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: "DataFrame | CentroidSet",
    id_col: str,
    vec_col: str,
    k: int,
    nprobe: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their single nearest
    cell; each query probes its ``nprobe`` nearest cells and ranks only the
    vectors inside them.  Compared to hyperplane LSH this gives data-adapted
    cells (any centroid set works — k-means iterations or a fixed seed
    sample) and an explicit recall knob (nprobe).

    Scale shape: BOTH sides' centroid assignment is genuinely MAP-ONLY for
    inlineable centroid sets — the corpus cell is a literal-expression
    column born in the corpus's own projection (``inline_cell_column``: no
    window exchange, no re-attachment join), and the query side explodes a
    per-row ranked probe array (``inline_probe_cells``: nprobe ranking
    without the window exchange OR the cells re-join, so corpus-sized
    query batches also stay shuffle-free up to the candidate join).  Past
    ``_LITERAL_ASSIGN_MAX_K`` centroids both sides fall back to the lazy
    join+window form.  The candidate join keys on the cell id (bounded
    fan-out = cell size); per-query work is |probed cells| not |corpus|.
    A query touching nprobe/n_cells of the data replaces the brute-force
    full scan.
    """
    vec = as_double_array(vec_col)
    cell = inline_cell_column(centroids, vec, round_to)
    if cell is not None:
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            vec.alias("neighbor_vec"),
            norm(vec).alias("neighbor_norm"),
            cell,
        )
    else:
        corpus_cells = nearest_centroids(
            corpus, centroids, id_col, vec_col, nprobe=1, round_to=round_to
        )
        c = _with_norm(corpus, id_col, vec_col, "neighbor").join(
            corpus_cells.select(F.col(id_col).alias("neighbor_id"), "cell"),
            "neighbor_id",
        )
    q = _probed_query_side(queries, centroids, id_col, vec_col, nprobe, round_to)
    pairs = c.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = dot(F.col("query_vec"), F.col("neighbor_vec")) / (
        F.col("query_norm") * F.col("neighbor_norm")
    )
    scores = pairs.select(
        "query_id", "neighbor_id", F.round(cos, round_to).alias("cos")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scores.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ------------------------------------------------------- IVF centroid training

def _literal_centroids(centroids: list[tuple[int, list[float]]]) -> Column:
    """array<struct<cid, cvec, cnorm>> literal for map-only assignment.

    Built as ONE ``F.expr`` SQL string, not per-element ``F.lit`` columns:
    k × dim ``lit`` calls are k × dim py4j round-trips, measured at ~4.6 s
    of plan-construction time PER CALL at 65 centroids × 64 dims vs 0.4 s
    for the single parsed string (SCALE.md).  ``repr(float)`` is the
    shortest round-tripping decimal, and Spark's ``...D`` literal parses
    with ``Double.parseDouble`` — bit-identical values either way.  Falls
    back to the column form when a value is non-finite (no SQL literal
    spelling for inf/nan)."""
    import math

    # The finite gate must cover the DERIVED cnorm too: finite components
    # around 1e154+ overflow sum(x*x) to inf, and 'infD' is not a valid
    # SQL literal spelling (F.expr would raise at plan time).  Compute
    # norms first, then gate the one-expr form on components AND norms.
    norms = [math.sqrt(sum(x * x for x in cvec)) for _, cvec in centroids]
    if all(
        math.isfinite(x) for _, cvec in centroids for x in cvec
    ) and all(math.isfinite(n) for n in norms):
        parts = []
        for (cid, cvec), cnorm in zip(centroids, norms):
            arr = ",".join(repr(float(x)) + "D" for x in cvec)
            parts.append(
                f"named_struct('cid', {int(cid)}, 'cvec', array({arr}), "
                f"'cnorm', {cnorm!r}D)"
            )
        return F.expr("array(" + ",".join(parts) + ")")
    items = []
    for (cid, cvec), cnorm in zip(centroids, norms):
        items.append(
            F.struct(
                F.lit(int(cid)).alias("cid"),
                F.array(*[F.lit(float(x)) for x in cvec]).alias("cvec"),
                F.lit(cnorm).alias("cnorm"),
            )
        )
    return F.array(*items)


def _bind(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE and feed the bound value to ``fn`` —
    lambda-scoped common-subexpression elimination for higher-order
    functions.  Catalyst does not share subexpressions into lambda bodies,
    so an expression referenced inside a ``transform`` over k centroids
    re-evaluates PER ELEMENT (a ``norm(vec)`` in the scoring lambda costs
    k extra interpreted 64-element aggregates per row — measured 2.1×
    end-to-end on the probe assignment, SCALE.md).  Routing it through a
    one-element array makes it a lambda variable: computed once per row,
    referenced freely."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def assign_literal_centroid(
    vec: Column, centroids: list[tuple[int, list[float]]], round_to: int = 6
) -> Column:
    """Nearest-centroid cell id as a PURE PROJECTION — no join, no shuffle.

    The centroid set is encoded as a literal array expression (k is small by
    construction: it lives on the driver between Lloyd iterations), so
    assignment costs k dot products per row with no join or shuffle.
    The input vector and its norm are ``_bind``-hoisted so each is
    evaluated once per ROW, not once per centroid.  Cosine is rounded and
    ties break on the LOWEST cid — the same total order
    ``nearest_centroids`` uses, so a trained centroid set plugs into
    ``ivf_cosine_topk`` with identical cell semantics.
    """
    lits = _literal_centroids(centroids)

    def best(v, n):
        # named_struct, not struct(...alias...): aliases are dropped inside
        # lambda-function bodies (fields would come out col1/col2).
        scored = F.transform(
            lits,
            lambda c: F.named_struct(
                F.lit("cos"),
                F.round(dot(v, c["cvec"]) / (n * c["cnorm"]), round_to),
                F.lit("neg_cid"),
                -c["cid"],
            ),
        )
        return -F.array_max(scored)["neg_cid"]

    return _bind(
        vec, lambda v: _bind(norm(v), lambda n: best(v, n))
    ).alias("cell")


def train_ivf_centroids(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_iters: int = 5,
    round_to: int = 6,
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd's k-means for the IVF coarse quantizer.

    The reference ships no trainer (its ANN path is brute-force only); this
    is the data-adapted upgrade over seed-sampled centroids for
    ``ivf_cosine_topk``.  Deterministic throughout: init picks the k vectors
    with the smallest ``xxhash64(id)`` (a seeded uniform sample with a total
    order), assignment rounds cosine and tie-breaks on cid, and means are
    exact per-dimension averages.

    Scale shape per iteration (the classic Spark k-means loop):

    * **assign** — centroids ride into the plan as a literal expression
      (``assign_literal_centroid``): one map-only pass, zero shuffle, k dot
      products per row in codegen.  No crossJoin row expansion.
    * **update** — ``posexplode`` to (cell, pos, val) feeds a map-side
      combined ``groupBy(cell, pos).avg``: shuffle volume is
      partitions x k x dim partial sums, never corpus-sized.
    * **driver** — holds exactly k x dim doubles between iterations (the
      centroids ARE broadcast state by design).

    Empty cells drop out (k can shrink on degenerate data) — documented
    k-means behavior; callers needing exact k re-seed.  The input relation
    is persisted for the duration of the loop and unpersisted after.

    Returns ``[(cid, centroid_vector)]`` with cids renumbered 0..k'-1 in
    cell order; feed to ``centroids_frame`` / ``assign_literal_centroid``.
    """
    v = vectors.select(
        F.col(id_col).alias("__vid"), as_double_array(vec_col).alias("__vec")
    ).filter(F.col("__vec").isNotNull())
    v = v.persist()
    try:
        seeds = (
            v.orderBy(F.xxhash64("__vid"), F.col("__vid"))
            .limit(k)
            .select("__vec")
            .collect()
        )
        centroids = [(i, list(row["__vec"])) for i, row in enumerate(seeds)]
        for _ in range(n_iters):
            cell = assign_literal_centroid(F.col("__vec"), centroids, round_to)
            means = (
                v.select(cell, F.posexplode("__vec").alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(F.avg("val").alias("mean_val"))
                .groupBy("cell")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "mean_val"))
                    ).alias("dims")
                )
                .collect()
            )
            centroids = [
                (new_cid, [d["mean_val"] for d in row["dims"]])
                for new_cid, row in enumerate(sorted(means, key=lambda r: r["cell"]))
            ]
        return centroids
    finally:
        v.unpersist()


def centroids_frame(spark, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """(cid, cvec) DataFrame from a trained centroid list — the shape
    ``ivf_cosine_topk`` consumes."""
    return spark.createDataFrame(
        [(cid, [float(x) for x in cvec]) for cid, cvec in centroids],
        "cid long, cvec array<double>",
    )


# ------------------------------------------------------ product quantization
#
# PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search",
# TPAMI 2011 — the FAISS IVF-PQ building block): split each D-dim vector
# into M subvectors, quantize each against its own K_sub-entry codebook, and
# score queries against the M×K_sub table of partial distances instead of
# the raw vectors.  Storage per vector drops from D floats to M small codes
# (64 f32 → 8 bytes here, 32×), which is what makes billion-vector indexes
# driver-affordable; scoring is M table lookups per candidate.
#
# Everything below is deterministic and engine-portable: vectors are
# unit-normalized first (so asymmetric L2² = 2 − 2·cos and the emitted score
# is a PQ-approximated cosine), encode-side distances are rounded to 6 dp
# with argmin ties breaking on the LOWEST code, and ADC partials are
# quantized to integer micro-units so the score sum is exact BIGINT
# arithmetic with one final division (never a float round of a value that
# sits exactly on a decimal boundary) — so a DuckDB oracle reproduces codes
# and rankings bit-exactly.
#
# Codebooks: ``pq_codebooks_from_seeds`` derives them from K_sub
# deterministic data rows (oracle-friendly — the SQL side re-derives the
# same codebooks from the same rows); ``train_pq_codebooks`` is the
# production upgrade (per-subspace Lloyd's in numpy over a bounded
# deterministic sample — the standard practice: codebooks train on ~10⁵
# vectors regardless of corpus size, then ENCODING streams distributively).


def unit_vector(vec: Column) -> Column:
    """array<double> scaled to unit L2 norm (zero vectors pass through).

    The norm is ``_bind``-hoisted: referenced inside the scaling lambda it
    would re-run the 2·dim-op fold PER ELEMENT (O(dim²) per row — on the
    PQ corpus-encode hot path that was the dominant per-row cost)."""
    v = as_double_array(vec)
    return _bind(
        v,
        lambda vv: _bind(
            norm(vv),
            lambda n: F.when(
                n > 0, F.transform(vv, lambda x: x / n)
            ).otherwise(vv),
        ),
    )


def _l2sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance between two array<double>."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _literal_codebooks(codebooks: list[list[list[float]]]) -> Column:
    """The full M × K_sub codebook set as ONE literal column —
    ``array<array<struct<c, sub>>>``, outer index = subspace, inner =
    code entry.  Built as a single parsed ``F.expr`` string: the previous
    per-entry column construction cost ~6 py4j round-trips per (j, c)
    pair, which at the standard 8-bit PQ shape (m=8, ksub=256) is ~12k
    driver round-trips — minutes of plan construction for ZERO execution
    difference.  Per-element ``lit`` fallback for non-finite values."""
    import math

    if all(
        math.isfinite(x) for book in codebooks for entry in book for x in entry
    ):
        books = ",".join(
            "array("
            + ",".join(
                f"named_struct('c', {c}, 'sub', "
                f"array({','.join(repr(float(x)) + 'D' for x in entry)}))"
                for c, entry in enumerate(book)
            )
            + ")"
            for book in codebooks
        )
        return F.expr("array(" + books + ")")
    return F.array(
        *[
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.array(*[F.lit(float(x)) for x in entry]).alias("sub"),
                    )
                    for c, entry in enumerate(book)
                ]
            )
            for book in codebooks
        ]
    )


def pq_codebooks_from_seeds(
    seeds: DataFrame, id_col: str, vec_col: str, m: int
) -> list[list[list[float]]]:
    """``codebooks[j][c]`` = subspace-``j`` slice of the ``c``-th seed row
    (seeds ordered by id, unit-normalized).  K_sub = row count.  Tiny driver
    state (M × K_sub × D/M floats), broadcast into plans as literals."""
    rows = (
        seeds.select(F.col(id_col).alias("__sid"), unit_vector(F.col(vec_col)).alias("__u"))
        .orderBy("__sid")
        .collect()
    )
    if not rows:
        raise ValueError("pq_codebooks_from_seeds: empty seed frame")
    dim = len(rows[0]["__u"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [
        [[float(x) for x in row["__u"][j * sub : (j + 1) * sub]] for row in rows]
        for j in range(m)
    ]


def train_pq_codebooks(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    ksub: int = 16,
    n_iters: int = 10,
    sample_n: int = 100_000,
    normalize: bool = True,
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's k-means over a deterministic bounded sample.

    The sample is the ``sample_n`` rows with smallest ``xxhash64(id)`` (a
    seeded uniform draw with a total order — same idiom as
    ``train_ivf_centroids`` init), collected once: PQ codebooks are
    classically trained on a fixed-size sample because M × K_sub × D/M
    parameters saturate long before corpus size matters; the full corpus is
    only ever touched by the distributed ``pq_encode`` pass.  Deterministic:
    init takes the first ``ksub`` sample rows in hash order, assignment
    breaks ties on the lowest code, empty cells keep their previous
    centroid.

    ``normalize=False`` trains on the vectors as-is — required for
    RESIDUAL codebooks (:func:`train_pq_residual_codebooks`), where the
    input is already a centered difference and re-normalizing it would
    destroy the geometry."""
    import numpy as np

    vec_expr = (
        unit_vector(F.col(vec_col)) if normalize else as_double_array(vec_col)
    )
    rows = (
        vectors.select(F.col(id_col).alias("__sid"), vec_expr.alias("__u"))
        .orderBy(F.xxhash64("__sid"), F.col("__sid"))
        .limit(sample_n)
        .collect()
    )
    mat = np.asarray([row["__u"] for row in rows], dtype=np.float64)
    n, dim = mat.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if n < ksub:
        raise ValueError(f"sample ({n}) smaller than ksub ({ksub})")
    sub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        x = mat[:, j * sub : (j + 1) * sub]  # (n, sub)
        cb = x[:ksub].copy()  # (ksub, sub) init: first sample rows
        for _ in range(n_iters):
            d2 = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)  # (n, ksub)
            assign = d2.argmin(axis=1)  # ties -> lowest code (argmin contract)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    cb[c] = x[mask].mean(axis=0)
        books.append([[float(v) for v in row] for row in cb])
    return books


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    round_to: int = 6,
    normalize: bool = True,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [passthrough...], codes array<int>) — each vector's nearest
    codebook entry per subspace, as a PURE PROJECTION: the codebooks ride
    into the plan as literal arrays, so encoding is M × K_sub small folds
    per row inside whole-stage codegen — one map-only pass over the corpus,
    zero shuffle, no Python.  Distances are rounded and ties break on the
    lowest code (struct ``array_min`` compares (distance, code)
    lexicographically).  ``normalize=False`` encodes the vector as-is
    (residual encoding); ``passthrough`` carries extra columns (e.g. the
    IVF cell) through without a re-join."""
    u = unit_vector(F.col(vec_col)) if normalize else as_double_array(vec_col)
    # Bind the (possibly normalized) vector once per row (single
    # let-binding) rather than re-deriving it inside each of the M × K_sub
    # folds.
    extra = [F.col(c) for c in passthrough]
    withu = df.select(F.col(id_col), *extra, u.alias("__u"))
    return withu.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        _pq_codes_column(F.col("__u"), codebooks, round_to).alias("codes"),
    )


def _pq_codes_column(uvec: Column, codebooks, round_to: int) -> Column:
    """``array<int>`` PQ codes as a COLUMN over an already-normalized (or
    residual) vector expression — the projection primitive behind
    :func:`pq_encode`, exposed so a composed projection (e.g. the
    PQ-bearing :class:`SemanticIndex` build) can birth codes alongside
    vector/norm/cell without a second pass or re-join.  ``uvec`` is
    ``_bind``-hoisted (evaluated once per row however many subspaces
    slice it)."""
    sub = len(codebooks[0][0])
    books_lit = _literal_codebooks(codebooks)

    def codes_of(uu: Column) -> Column:
        def best(book, j):
            # the subvector slice is _bind-hoisted: cut once per (row, j),
            # not once per codebook entry inside the distance lambda
            return _bind(
                F.slice(uu, j * F.lit(sub) + F.lit(1), sub),
                lambda s: F.array_min(
                    F.transform(
                        book,
                        lambda e: F.named_struct(
                            F.lit("d"),
                            F.round(_l2sq(s, e["sub"]), round_to),
                            F.lit("c"),
                            e["c"],
                        ),
                    )
                )["c"],
            )

        return F.transform(books_lit, best)

    return _bind(uvec, codes_of)


# Estimated bytes per broadcast-hash-relation row of the query-batch-shaped
# serving relations priced by _serving_broadcast_plan.  Deliberately
# generous (UnsafeRow + hash-relation overhead included): the estimate
# guards an executor-memory cliff, so erring toward the shuffled join costs
# one exchange, not an OOM.
_ADC_TABLE_ROW_BYTES = 64  # (query_id, [cell], j, code, partial-int)
_PAIR_ROW_BYTES = 48  # (query_id, neighbor_id) shortlist rows


def _serving_broadcast_plan(
    queries: DataFrame,
    vec_col: str,
    broadcast: "bool | str",
    budget: int,
    table_rows_per_query: int,
    rerank: "int | None",
) -> tuple[bool, bool, bool]:
    """Resolve the per-side broadcast decisions of a PQ/IVFPQ serving call:
    ``(bc_table, bc_shortlist, bc_queries)``.

    All three broadcast relations of an ADC serving plan are
    query-batch-shaped — the ADC distance table (|Q| × nprobe × M × K_sub
    small-int rows), the rerank shortlist (|Q| × k' id pairs) and the raw
    query relation of the exact re-rank stage (|Q| vectors) — so ONE eager
    count + max-dim pass over ``queries`` prices all three against
    ``budget`` bytes.  ``broadcast=True/False`` forces every side;
    ``'auto'`` (the default) sizes each side independently and degrades
    only the oversized ones to shuffled hash joins (parity-tested: all
    paths produce identical rows).  A bulk re-scorer feeding a
    corpus-sized "query" batch now degrades instead of OOMing.  The count
    is an eager driver action at plan-construction time — cache a derived
    query relation first if its pipeline is expensive, or pass
    ``broadcast=True``.  A STREAMING query batch cannot be counted, so
    ``'auto'`` keeps the broadcast there (micro-batches are
    trigger-bounded by construction)."""
    if broadcast not in (True, False, "auto"):
        raise ValueError(
            f"broadcast must be True, False, or 'auto'; got {broadcast!r}"
        )
    if broadcast in (True, False):
        return broadcast, broadcast, broadcast
    if queries.isStreaming:
        return True, True, True
    n_rows, max_dim = queries.agg(
        F.count(F.lit(1)), F.max(F.size(as_double_array(vec_col)))
    ).first()
    n = n_rows or 0
    bc_table = n * table_rows_per_query * _ADC_TABLE_ROW_BYTES <= budget
    bc_shortlist = rerank is None or n * rerank * _PAIR_ROW_BYTES <= budget
    bc_queries = n * ((max_dim or 0) * 8 + _VEC_ROW_OVERHEAD_BYTES) <= budget
    return bc_table, bc_shortlist, bc_queries


def _maybe_broadcast(rel: DataFrame, bc: bool) -> DataFrame:
    """The serving-side join operand: broadcast inside the budget, shuffled
    hash join past it (the hinted side is the build side either way)."""
    return F.broadcast(rel) if bc else rel.hint("shuffle_hash")


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    k: int,
    round_to: int = 6,
    broadcast: "bool | str" = "auto",
    broadcast_budget_bytes: int = 256 << 20,
) -> DataFrame:
    """PQ asymmetric-distance top-k: rank corpus codes against per-query
    distance tables; score = 1 − ADC²/2, the PQ approximation of cosine on
    unit vectors.

    Relational shape (the oracle-checkable form): the corpus is ENCODED once
    (map-only, see :func:`pq_encode`) and exploded to (id, subspace, code) —
    M small ints per vector, the PQ compression itself; the Q × M × K_sub
    partial-distance table is built from the (broadcast) query batch and the
    literal codebooks, then the bounded table join + per-(query, id) sum
    reassembles ADC.  Shuffle volume is corpus × M code rows — independent
    of D (64× smaller than shipping raw vectors here).  At billion-vector
    scale the same plan holds with the codes relation persisted once and
    reused across query batches; a `mapInArrow` table-lookup variant can
    cut the explode but gives up engine-portable scoring.

    The distance table is BROADCAST by default; ``broadcast='auto'``
    prices it (|Q| × M × K_sub rows) against ``broadcast_budget_bytes``
    with one eager count and degrades to a shuffled hash join past the
    budget — see :func:`_serving_broadcast_plan` for the contract."""
    bc_table, _, _ = _serving_broadcast_plan(
        queries, vec_col, broadcast, broadcast_budget_bytes,
        len(codebooks) * len(codebooks[0]), None,
    )
    table = _pq_query_table(queries, codebooks, id_col, vec_col, round_to)
    codes = pq_encode(corpus, id_col, vec_col, codebooks, round_to).select(
        F.col(id_col).alias("neighbor_id"), F.posexplode("codes").alias("j", "code")
    )
    scale = float(10**round_to)
    scored = (
        codes.join(_maybe_broadcast(table, bc_table), ["j", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(_adc_score(scale).alias("cos"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _pq_query_table(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    round_to: int,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(query_id, [passthrough...], j, code, partial) — the per-query ADC
    distance table.  ``passthrough`` columns ride along unchanged (the
    IVFPQ path threads the probed ``cell`` through so the table never
    needs a cells re-join).

    Partial distances are carried as INTEGER micro-units (x 10^round_to):
    the per-(query, neighbor) ADC sum is then an exact BIGINT aggregation —
    immune to float-association order across partitionings/engines.  The
    score NEVER goes through round(): an odd micro-sum puts 1 - d²/2
    exactly ON a round-6 decimal boundary, where engines' round()
    implementations legitimately disagree (exact-decimal HALF_UP vs
    float-multiply).  Instead the score is assembled in exact integer
    half-micro units and divided out once (:func:`_adc_score`) —
    bit-identical everywhere."""
    sub = len(codebooks[0][0])
    scale = float(10**round_to)
    # One nested (subspace -> entries) literal, two generators: the flat
    # per-(j, c) entry array cost ~6 py4j calls per entry to construct.
    books_lit = _literal_codebooks(codebooks)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        *[F.col(p) for p in passthrough],
        unit_vector(F.col(vec_col)).alias("__qu"),
    )
    return q.select(
        "query_id",
        *passthrough,
        F.posexplode(books_lit).alias("j", "__book"),
        F.col("__qu"),
    ).select(
        "query_id",
        *passthrough,
        "j",
        F.explode("__book").alias("e"),
        F.col("__qu"),
    ).select(
        "query_id",
        *passthrough,
        "j",
        F.col("e.c").alias("code"),
        F.round(
            _l2sq(F.slice(F.col("__qu"), F.col("j") * sub + 1, sub), F.col("e.sub"))
            * F.lit(scale)
        )
        .cast("long")
        .alias("partial"),
    )


def _adc_score(scale: float) -> Column:
    """1 − ADC²/2 assembled in exact integer half-micro units."""
    return (F.lit(int(10 * scale)) - F.sum("partial") * F.lit(5)) / F.lit(10.0 * scale)


# --------------------------------------------------------- IVFPQ residuals


def residual_vectors(
    vectors: DataFrame,
    centroids: "DataFrame | CentroidSet",
    id_col: str,
    vec_col: str,
    nprobe: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """(id, cell, resid) — the unit vector minus its assigned cell's
    centroid, one row per probed cell (``nprobe=1`` for corpus encoding,
    ``nprobe=k`` for query-side tables).

    This is the FAISS IVFPQ residual step: PQ quantizes ``x − c(x)``
    instead of ``x``.  Residual magnitudes are a fraction of vector
    magnitudes, so the same codebook budget (M × K_sub entries) covers
    them with far less quantization error — the recall-at-equal-nprobe
    win over the non-residual composition.  Map-only at scale for
    inlineable centroid sets at ANY nprobe: ``nprobe=1`` puts the cell in
    the same projection as the unit vector (``inline_cell_column``) and
    ``nprobe>1`` explodes a per-row ranked probe array
    (``inline_probe_cells``) — no window exchange, no id re-join either
    way; only the centroid-vector lookup remains a BROADCAST join (the
    input never shuffles for it).  Past ``_LITERAL_ASSIGN_MAX_K``
    centroids the join+window assignment takes over."""
    cvecs = _centroid_df(centroids).select(
        F.col("cid").alias("cell"), as_double_array("cvec").alias("__cvec")
    )
    vec = as_double_array(vec_col)
    cell = inline_cell_column(centroids, vec, round_to) if nprobe == 1 else None
    probes = (
        inline_probe_cells(centroids, vec, nprobe, round_to)
        if nprobe != 1
        else None
    )
    if cell is not None:
        with_cell = vectors.select(
            F.col(id_col), unit_vector(F.col(vec_col)).alias("__u"), cell
        )
    elif probes is not None:
        with_cell = vectors.select(
            F.col(id_col),
            unit_vector(F.col(vec_col)).alias("__u"),
            F.explode(probes).alias("__p"),
        ).select(id_col, "__u", F.col("__p.cell").alias("cell"))
    else:
        cells = nearest_centroids(
            vectors, centroids, id_col, vec_col, nprobe=nprobe, round_to=round_to
        )
        with_cell = vectors.select(
            F.col(id_col), unit_vector(F.col(vec_col)).alias("__u")
        ).join(cells.select(id_col, "cell"), id_col)
    return with_cell.join(F.broadcast(cvecs), "cell").select(
        F.col(id_col),
        "cell",
        F.zip_with("__u", "__cvec", lambda x, c: x - c).alias("resid"),
    )


def train_pq_residual_codebooks(
    vectors: DataFrame,
    centroids: "DataFrame | CentroidSet",
    id_col: str,
    vec_col: str,
    m: int,
    ksub: int = 16,
    n_iters: int = 10,
    sample_n: int = 100_000,
    round_to: int = 6,
) -> list[list[list[float]]]:
    """PQ codebooks trained on cell residuals (``x − centroid(cell(x))``)
    rather than raw unit vectors — the codebooks :func:`ivf_pq_topk` with
    ``residual=True`` expects.  Same deterministic bounded-sample Lloyd's
    as :func:`train_pq_codebooks`, with normalization off (a residual is
    already centered; re-normalizing would destroy the geometry)."""
    res = residual_vectors(
        vectors, centroids, id_col, vec_col, nprobe=1, round_to=round_to
    )
    return train_pq_codebooks(
        res.select(F.col(id_col), F.col("resid")),
        id_col,
        "resid",
        m,
        ksub=ksub,
        n_iters=n_iters,
        sample_n=sample_n,
        normalize=False,
    )


def _pq_residual_query_table(
    queries: DataFrame,
    centroids: "DataFrame | CentroidSet",
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    nprobe: int,
    round_to: int,
) -> DataFrame:
    """(query_id, cell, j, code, partial) — the per-(query, probed-cell)
    ADC distance table for residual IVFPQ.  Each query contributes
    ``nprobe`` residuals (one per probed cell, against THAT cell's
    centroid), so the table is Q × nprobe × M × K_sub rows — still
    broadcast-sized.  Partials are the same exact integer micro-units as
    :func:`_pq_query_table` (see its docstring for why the score never
    goes through float round())."""
    sub = len(codebooks[0][0])
    books_lit = _literal_codebooks(codebooks)
    scale = float(10**round_to)
    qres = residual_vectors(
        queries, centroids, id_col, vec_col, nprobe=nprobe, round_to=round_to
    ).select(F.col(id_col).alias("query_id"), "cell", "resid")
    return qres.select(
        "query_id",
        "cell",
        F.posexplode(books_lit).alias("j", "__book"),
        F.col("resid"),
    ).select(
        "query_id", "cell", "j", F.explode("__book").alias("e"), F.col("resid")
    ).select(
        "query_id",
        "cell",
        "j",
        F.col("e.c").alias("code"),
        F.round(
            _l2sq(F.slice(F.col("resid"), F.col("j") * sub + 1, sub), F.col("e.sub"))
            * F.lit(scale)
        )
        .cast("long")
        .alias("partial"),
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: "DataFrame | CentroidSet",
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    k: int,
    nprobe: int = 2,
    round_to: int = 6,
    residual: bool = False,
    rerank: int | None = None,
    broadcast: "bool | str" = "auto",
    broadcast_budget_bytes: int = 256 << 20,
) -> DataFrame:
    """IVF + PQ composed — the classic two-level ANN index (FAISS IVFPQ
    shape): the coarse quantizer restricts each query to its ``nprobe``
    nearest cells, and ADC distance tables score only the codes INSIDE
    those cells.  Per-query work drops from |corpus| × M code rows to
    |probed cells| × M, with PQ's 32×-or-more compression on what
    remains — the combination that serves billion-vector indexes.

    ``rerank=k'`` (k' >= k) adds the production third stage: the ADC pass
    shortlists each query's top k' candidates, then the final top-``k``
    comes from EXACT cosine over the shortlist's raw vectors — quantization
    error stops costing recall beyond the shortlist boundary, for the price
    of k' exact dot products per query.  Scale shape: the shortlist
    (queries × k' ids) is BROADCAST onto the corpus, so the raw-vector
    lookup is a map-only semi-join — the corpus still never shuffles.
    Re-ranked ``cos`` is the true cosine (comparable to :func:`cosine_topk`
    output), not an ADC reconstruction.

    ``residual=False`` PQ-encodes raw unit vectors — a neighbor scored by
    both this and :func:`pq_adc_topk` gets the bit-identical score.
    ``residual=True`` is full FAISS IVFPQ: the corpus encodes
    ``x − centroid(cell(x))`` and each query builds a distance table per
    probed cell from ``q − centroid(cell)`` (``codebooks`` must then come
    from :func:`train_pq_residual_codebooks`).  ADC approximates
    ``‖q − (c + r̂)‖²`` — same reconstruction FAISS scores — so recall at
    equal nprobe is structurally better: residuals are small, and the
    codebook budget covers them with less quantization error.

    Scale shape (both modes): cell assignment and PQ encoding are
    broadcast/literal map-only passes over the corpus, and for inlineable
    centroid sets the QUERY side is generator-only too (the probed cells
    explode straight into the ADC table's own projection — no cells
    re-join; ``inline_probe_cells``); the scoring join keys on (cell,
    subspace, code) against the broadcast (query × probed-cell × M ×
    K_sub) table, so non-probed cells never leave the scan.  Scoring is
    the exact-integer ADC of :func:`pq_adc_topk`.

    All three query-batch-shaped broadcast relations — the ADC table, the
    rerank shortlist and the exact stage's raw query relation — default to
    ``broadcast='auto'``: one eager count + max-dim pass prices each side
    against ``broadcast_budget_bytes`` and degrades the oversized ones to
    shuffled hash joins (:func:`_serving_broadcast_plan`; identical rows
    either way, parity-tested)."""
    if rerank is not None and rerank < k:
        # validate BEFORE the 'auto' sizing pass: a bad parameter must not
        # cost an eager Spark job over the query pipeline first
        raise ValueError(f"rerank must be >= k ({k}), got {rerank}")
    bc_table, bc_shortlist, bc_queries = _serving_broadcast_plan(
        queries, vec_col, broadcast, broadcast_budget_bytes,
        nprobe * len(codebooks) * len(codebooks[0]), rerank,
    )
    if residual:
        codes = residual_vectors(
            corpus, centroids, id_col, vec_col, nprobe=1, round_to=round_to
        )
        codes = pq_encode(
            codes, id_col, "resid", codebooks, round_to,
            normalize=False, passthrough=("cell",),
        ).select(
            F.col(id_col).alias("neighbor_id"),
            "cell",
            F.posexplode("codes").alias("j", "code"),
        )
        table = _pq_residual_query_table(
            queries, centroids, codebooks, id_col, vec_col, nprobe, round_to
        )
    else:
        cell = inline_cell_column(centroids, as_double_array(vec_col), round_to)
        if cell is not None:
            # cell born in the same projection PQ encodes — one map-only
            # pass end-to-end, no corpus-cells re-join
            encoded = pq_encode(
                corpus.select(F.col(id_col), F.col(vec_col), cell),
                id_col, vec_col, codebooks, round_to, passthrough=("cell",),
            )
        else:
            corpus_cells = nearest_centroids(
                corpus, centroids, id_col, vec_col, nprobe=1, round_to=round_to
            )
            encoded = pq_encode(corpus, id_col, vec_col, codebooks, round_to).join(
                corpus_cells.select(F.col(id_col), "cell"), id_col
            )
        codes = encoded.select(
            F.col(id_col).alias("neighbor_id"),
            "cell",
            F.posexplode("codes").alias("j", "code"),
        )
        probes = inline_probe_cells(
            centroids, as_double_array(vec_col), nprobe, round_to
        )
        if probes is not None:
            # probed cell threads straight into the ADC table projection —
            # the whole query side is generator-only, no cells re-join
            probed = queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("__qv"),
                F.explode(probes).alias("__p"),
            ).select("query_id", F.col("__p.cell").alias("cell"), "__qv")
            table = _pq_query_table(
                probed, codebooks, "query_id", "__qv", round_to,
                passthrough=("cell",),
            )
        else:
            query_cells = nearest_centroids(
                queries, centroids, id_col, vec_col,
                nprobe=nprobe, round_to=round_to,
            )
            table = _pq_query_table(
                queries, codebooks, id_col, vec_col, round_to
            ).join(
                query_cells.select(F.col(id_col).alias("query_id"), "cell"),
                "query_id",
            )
    scale = float(10**round_to)
    scored = (
        codes.join(_maybe_broadcast(table, bc_table), ["cell", "j", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(_adc_score(scale).alias("cos"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rerank)
        .select("query_id", "neighbor_id")
    )
    c = _with_norm(corpus, id_col, vec_col, "neighbor")
    q = _with_norm(queries, id_col, vec_col, "query")
    exact = (
        c.join(_maybe_broadcast(shortlist, bc_shortlist), "neighbor_id")
        .join(_maybe_broadcast(q, bc_queries), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("query_vec"), F.col("neighbor_vec"))
                / (F.col("query_norm") * F.col("neighbor_norm")),
                round_to,
            ).alias("cos"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return exact.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )


# ------------------------------------------------------------------ SemDeDup


def _semdedup_assignments(
    corpus: DataFrame,
    centroids: "DataFrame | CentroidSet",
    id_col: str,
    vec_col: str,
    round_to: int,
    max_cell_size: int | None,
    dim: int | None,
    sub_planes: int | None,
) -> DataFrame:
    """``(a_id, a_vec, a_norm, cell, sub)`` — each vector's compare bucket
    for :func:`semantic_dedup`; ``a_vec`` keeps the source element type
    (see the in-body note).  ``sub`` is 0 everywhere on the unguarded
    path; with ``max_cell_size`` set, members of oversized cells get a
    hyperplane-LSH sub-bucket instead (see :func:`semantic_dedup` for the
    recall contract).  Split out so tests can bound the per-bucket sizes
    the pairwise join will actually see.

    Assignment is MAP-ONLY for inlineable centroid sets: id, vector,
    norm, cell (and the guard's sub-bucket) are all columns of ONE
    projection over the corpus scan — zero shuffles before the pairwise
    join itself (plan-gated in tests).  Collecting the centroids (k rows)
    is the one eager driver action; past ``_LITERAL_ASSIGN_MAX_K``
    centroids the lazy join+window assignment takes over."""
    vec = as_double_array(vec_col)
    cell = inline_cell_column(centroids, vec, round_to)
    # a_vec keeps the SOURCE element type (a float32 embedding column
    # stays float32 through the (cell, sub)-keyed self-join shuffle —
    # half the exchanged vector bytes of an eager double cast); norm and
    # cell compute through the cast, and scoring re-casts lazily, so cos
    # values are bit-identical either way (same trick as SemanticIndex).
    if cell is not None:
        assigned = corpus.select(
            F.col(id_col).alias("a_id"),
            F.col(vec_col).alias("a_vec"),
            norm(vec).alias("a_norm"),
            cell,
        )
    else:
        cells = nearest_centroids(
            corpus, centroids, id_col, vec_col, nprobe=1, round_to=round_to
        )
        assigned = corpus.select(
            F.col(id_col).alias("a_id"),
            F.col(vec_col).alias("a_vec"),
            norm(vec).alias("a_norm"),
        ).join(cells.select(F.col(id_col).alias("a_id"), "cell"), "a_id")
    if max_cell_size is None:
        return assigned.withColumn("sub", F.lit(0))
    if max_cell_size < 1:
        raise ValueError(f"max_cell_size must be >= 1, got {max_cell_size}")
    if dim is None:
        raise ValueError("max_cell_size requires dim (the embedding width)")
    counts = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("__cnt"))
    if sub_planes is None:
        # Adaptive plane count from the worst cell: one cells-sized agg
        # collected to the driver (cells relation <= |centroids| rows, but
        # computing it does cost one extra assignment pass over the
        # corpus).  Pass sub_planes explicitly to keep the plan fully lazy.
        import math

        top = counts.agg(F.max("__cnt")).first()[0] or 0
        if top <= max_cell_size:
            return assigned.withColumn("sub", F.lit(0))
        sub_planes = min(16, max(1, math.ceil(math.log2(top / max_cell_size))))
    if sub_planes < 1:
        raise ValueError(f"sub_planes must be >= 1, got {sub_planes}")
    big = counts.filter(F.col("__cnt") > max_cell_size).select(
        "cell", F.lit(True).alias("__big")
    )
    return (
        assigned.join(F.broadcast(big), "cell", "left")
        .withColumn(
            "sub",
            F.when(
                F.col("__big").isNotNull(),
                bucket_id(F.col("a_vec"), dim, sub_planes),
            ).otherwise(F.lit(0)),
        )
        .drop("__big")
    )


# Sentinel distinguishing "caller never thought about the skew guard" (warn
# loudly, then run unguarded) from an explicit max_cell_size=None opt-out.
_MAX_CELL_UNSET: object = object()


def semantic_dedup(
    corpus: DataFrame,
    centroids: "DataFrame | CentroidSet",
    id_col: str,
    vec_col: str,
    threshold: float,
    round_to: int = 6,
    max_cell_size: int | None | object = _MAX_CELL_UNSET,
    dim: int | None = None,
    sub_planes: int | None = None,
) -> DataFrame:
    """Semantic deduplication (Abbas et al., "SemDeDup", 2023): cluster the
    corpus by nearest centroid, then canonicalize near-duplicates WITHIN
    each cluster — (id, canonical_id) where canonical is the least id among
    self and all same-cell neighbors with cosine ≥ ``threshold``.

    This is the embedding-space scale answer to the all-pairs
    ``brute_force_scores`` canonicalization: the pairwise compare is
    cell-local (cluster assignment is a broadcast map-only pass, the
    self-join keys on the cell id), so total work is Σ|cell|² instead of
    N² — the paper's point is that true semantic duplicates share a cluster
    at high probability, making in-cell compare a near-lossless pruning.
    For inlineable centroid sets (≤ ``_LITERAL_ASSIGN_MAX_K``; SemDeDup's
    k is small by construction) the assignment is a LITERAL-expression
    projection — id/vector/norm/cell in one map-only pass, no window
    exchange, no cells re-join; the centroids relation is collected at
    plan-construction time (one tiny eager driver action).

    **Skew guard** (``max_cell_size``): real embedding corpora are
    heavy-tailed — one boilerplate/template cluster holding 1% of a 10 B-doc
    corpus is 10^16 in-cell pairs on its own, a quadratic wall the cell
    join would hit as-is.  With ``max_cell_size`` set (requires ``dim``),
    cells above it are RE-SPLIT before the self-join: their members get a
    deterministic hyperplane-LSH sub-bucket (:func:`bucket_id` over the
    module's fixed integer planes) and the pairwise join keys on
    ``(cell, sub)``, bounding each bucket to ~|cell| / 2^planes in
    expectation.  ``sub_planes`` fixes the plane count (keeps the plan
    lazy and lets an external oracle re-derive the split); when ``None``
    it adapts to the worst cell via one tiny driver agg,
    ``ceil(log2(max_cnt / max_cell_size))`` capped at 16.

    Recall trade-off, stated: sub-bucketing near-duplicates is the LSH
    collision bound — a pair at cosine ≥ t lands in the same sub-bucket
    with probability (1 - arccos(t)/π)^planes (t=0.95, 4 planes: ≈0.65;
    2 planes: ≈0.81), and IDENTICAL vectors always collide, so exact
    duplicates are never lost.  That is the documented price for removing
    the quadratic whale — same df-cap discipline as
    ``dedup.df_capped`` on the shingle side.  Small cells stay on the
    exact in-cell path ((cell, 0) buckets, zero recall loss).

    Leaving the guard off is an EXPLICIT decision: calling without
    ``max_cell_size`` warns (the default path is exactly where the
    quadratic whale bites); pass ``max_cell_size=None`` to accept the
    unguarded plan silently — e.g. when the cell-size distribution is
    known bounded."""
    if max_cell_size is _MAX_CELL_UNSET:
        import warnings

        warnings.warn(
            "semantic_dedup called without max_cell_size: the in-cell "
            "pairwise join is quadratic in the largest cell, and real "
            "embedding corpora are heavy-tailed (one boilerplate cluster "
            "holding 1% of a 10B-doc corpus is 10^16 pairs on its own).  "
            "Set max_cell_size (with dim) to re-split oversized cells into "
            "hyperplane-LSH sub-buckets, or pass max_cell_size=None "
            "explicitly to accept the unguarded plan.",
            stacklevel=2,
        )
        max_cell_size = None
    assigned = _semdedup_assignments(
        corpus, centroids, id_col, vec_col, round_to,
        max_cell_size, dim, sub_planes,
    )
    b = assigned.select(
        F.col("a_id").alias("b_id"),
        F.col("a_vec").alias("b_vec"),
        F.col("a_norm").alias("b_norm"),
        "cell",
        "sub",
    )
    cos = F.round(
        dot(as_double_array("a_vec"), as_double_array("b_vec"))
        / (F.col("a_norm") * F.col("b_norm")),
        round_to,
    )
    neighbors = (
        assigned.join(b, ["cell", "sub"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
        .groupBy("a_id")
        .agg(F.min("b_id").alias("min_neighbor"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(neighbors, F.col(id_col) == F.col("a_id"), "left")
        .select(
            F.col(id_col),
            F.least(
                F.col(id_col), F.coalesce(F.col("min_neighbor"), F.col(id_col))
            ).alias("canonical_id"),
        )
    )


# ------------------------------------------------- incremental semantic index
#
# The embedding-space member of the incremental-index triad (lexical:
# retrieval.Bm25Index; shingle: dedup.MinHashIndex): real pipelines dedup
# every NEW crawl batch against the accumulated corpus, and re-assigning
# 100 TB of accepted embeddings to cells per batch is the cost this kills.
# The index persists each vector WITH its precomputed norm and centroid
# cell, so matching a new batch touches the old corpus exactly once —
# a streaming scan through a cell-keyed broadcast join, zero old-side
# shuffles (plan-gated).


def _comparable_path(p: str) -> str:
    """A scheme-insensitive comparable form of a storage path, for the
    self-overwrite guard: ``file:///root/x`` and ``/root/x`` (and its
    symlinked spellings) must compare equal, and ``s3a://bucket/idx``
    must match the ``s3a://bucket/idx/vectors/part-*`` entries
    ``inputFiles()`` reports — ``os.path.abspath`` alone mangles URI
    paths into ``/cwd/s3a:/...`` and silently defeats the guard on
    object stores."""
    import os as _os

    if "://" in p:
        # URI: authority + path is the identity (s3a://bucket/x ->
        # bucket/x; hdfs://nn:8020/x -> nn:8020/x); local file URIs
        # resolve symlinks like bare paths do
        scheme, rest = p.split("://", 1)
        if scheme == "file":
            return _os.path.realpath("/" + rest.lstrip("/")).rstrip("/")
        return rest.rstrip("/")
    if p.startswith("file:"):
        p = p[len("file:"):]
    return _os.path.realpath(_os.path.abspath(p)).rstrip("/")


class SemanticIndex:
    """Corpus-side state for incremental embedding near-dup matching:
    ``(\\_\\_id, vec, norm, cell)`` rows plus the centroid relation they
    were assigned with (new batches MUST be assigned with the same
    centroids, or cell-local compare loses its meaning).  Round-trips
    through parquet — build where the corpus lives, match anywhere; the
    original embedding files are never needed again.

    With ``pq_codebooks`` the vectors relation additionally carries each
    vector's PQ ``codes`` (non-residual, unit-normalized — the
    :func:`ivf_pq_topk` corpus-side encoding), born in the SAME build
    projection, so the index also serves IVFPQ/ADC top-k
    (:func:`ivf_pq_topk_against_index`) without re-encoding the corpus
    per query batch."""

    def __init__(
        self,
        vectors: DataFrame,
        centroids: CentroidSet,
        round_to: int = 6,
        pq_codebooks: "list[list[list[float]]] | None" = None,
    ):
        self.vectors = vectors
        self.centroids = centroids
        self.round_to = round_to
        self.pq_codebooks = pq_codebooks

    def persist(self) -> "SemanticIndex":
        self.vectors.persist()
        return self

    def unpersist(self) -> "SemanticIndex":
        self.vectors.unpersist()
        return self

    # On-disk layout version.  Bump when vectors/centroids/params change
    # shape; readers refuse versions they don't know instead of
    # misinterpreting rows.  Version 1 = the original (round-9) layout,
    # whose params carried no version column — read as 1.  Version 2
    # adds a nullable ``pq_codebooks`` JSON column to params and an
    # optional ``codes`` column on the vectors relation; readers accept
    # 1..FORMAT_VERSION.
    FORMAT_VERSION = 2

    def write(self, path: str, mode: str = "error") -> None:
        """Persist to ``path`` (vectors/centroids/params parquet).

        ``write()`` to a FRESH path is also the COMPACTION step: k chained
        :func:`semantic_index_merge` calls build a union-of-unions lazy
        plan over k+1 parquet reads whose match/serve plans re-scan every
        source — writing materializes it into one flat relation; re-read
        with :func:`read_semantic_index` and drop the chain (recommended
        cadence: compact after ~10 merges, or when match latency drifts).

        Writing INTO a path any of this index's relations was lazily read
        from refuses loudly: ``overwrite`` deletes the source under the
        scan that feeds it (the classic lazy-read self-overwrite
        corruption trap — Spark only sometimes detects it) and ``append``
        silently duplicates rows.  Write to a fresh path and swap."""
        import json

        if mode in ("overwrite", "append"):
            target = _comparable_path(path)
            for rel, part in (
                (self.vectors, "vectors"),
                (self.centroids.df, "centroids"),
            ):
                try:
                    files = rel.inputFiles()
                except Exception:  # non-file-backed plans have no inputs
                    files = []
                if any(
                    _comparable_path(f).startswith(target + "/")
                    for f in files
                ):
                    raise ValueError(
                        f"refusing to {mode} the semantic index into "
                        f"{path!r}: its {part} relation lazily READS from "
                        "that path, so overwriting would delete the "
                        "source mid-scan (and append would duplicate "
                        "rows).  Write to a fresh path and swap — that "
                        "write is also the compaction step after merge "
                        "chains."
                    )
        self.vectors.write.mode(mode).parquet(f"{path}/vectors")
        self.centroids.df.select("cid", "cvec").write.mode(mode).parquet(
            f"{path}/centroids"
        )
        books_json = (
            json.dumps(self.pq_codebooks)
            if self.pq_codebooks is not None
            else None
        )
        self.vectors.sparkSession.createDataFrame(
            [(self.round_to, self.FORMAT_VERSION, books_json)],
            "round_to int, format_version int, pq_codebooks string",
        ).write.mode(mode).parquet(f"{path}/params")


def read_semantic_index(spark, path: str) -> SemanticIndex:
    import json

    params = spark.read.parquet(f"{path}/params").first()
    fields = params.__fields__
    version = params["format_version"] if "format_version" in fields else 1
    if version is None:
        # A params row written with an explicit-but-null version column is
        # the legacy layout too (e.g. a v1 writer that got the column via
        # schema merge) — fold into the v1 path instead of letting the
        # range comparison below raise TypeError.
        version = 1
    if not 1 <= version <= SemanticIndex.FORMAT_VERSION:
        raise ValueError(
            f"semantic index at {path!r} has on-disk format_version "
            f"{version}; this build reads versions 1.."
            f"{SemanticIndex.FORMAT_VERSION}.  Rebuild the index (or read "
            "it with a matching build)."
        )
    books_json = params["pq_codebooks"] if "pq_codebooks" in fields else None
    return SemanticIndex(
        vectors=spark.read.parquet(f"{path}/vectors"),
        centroids=CentroidSet(spark.read.parquet(f"{path}/centroids")),
        round_to=params["round_to"],
        pq_codebooks=json.loads(books_json) if books_json else None,
    )


def _assigned_vectors(
    df: DataFrame,
    centroids: CentroidSet,
    id_col: str,
    vec_col: str,
    round_to: int,
    pq_codebooks: "list[list[list[float]]] | None" = None,
) -> DataFrame:
    """(__id, vec, norm, cell[, codes]) — one map-only projection for
    inlineable centroid sets; the join+window fallback past
    ``_LITERAL_ASSIGN_MAX_K``.

    ``vec`` keeps the SOURCE element type (a float32 embedding stays
    float32 in the persisted index — half the storage of an eager double
    cast at 100 TB); norm and cell are computed through the double cast,
    and match/serve re-cast lazily at scan time, so scores are
    bit-identical either way.  With ``pq_codebooks`` the non-residual
    unit-normalized PQ ``codes`` (the :func:`ivf_pq_topk` corpus
    encoding) are born in the SAME projection — the build still costs
    one scan."""
    vec = as_double_array(vec_col)
    codes = (
        [
            _pq_codes_column(unit_vector(vec), pq_codebooks, round_to)
            .alias("codes")
        ]
        if pq_codebooks is not None
        else []
    )
    cell = inline_cell_column(centroids, vec, round_to)
    if cell is not None:
        return df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("vec"),
            norm(vec).alias("norm"),
            cell,
            *codes,
        )
    cells = nearest_centroids(df, centroids, id_col, vec_col, nprobe=1, round_to=round_to)
    return (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("vec"),
            norm(vec).alias("norm"),
            *codes,
        )
        .join(cells.select(F.col(id_col).alias("__id"), "cell"), "__id")
    )


def semantic_index(
    corpus: DataFrame,
    centroids: "DataFrame | CentroidSet",
    id_col: str,
    vec_col: str,
    round_to: int = 6,
    pq_codebooks: "list[list[list[float]]] | None" = None,
) -> SemanticIndex:
    """Build the index: ONE corpus scan — norm and centroid cell (and,
    with ``pq_codebooks``, the PQ codes that let the index serve
    IVFPQ/ADC) are columns of the same projection as the vector (map-only
    for inlineable centroid sets), so building costs a scan plus the
    parquet write."""
    cents = centroids if isinstance(centroids, CentroidSet) else CentroidSet(centroids)
    return SemanticIndex(
        vectors=_assigned_vectors(
            corpus, cents, id_col, vec_col, round_to, pq_codebooks
        ),
        centroids=cents,
        round_to=round_to,
        pq_codebooks=pq_codebooks,
    )


def semantic_index_merge(
    old: SemanticIndex,
    new_vectors: DataFrame,
    id_col: str,
    vec_col: str,
    validate: bool = False,
) -> SemanticIndex:
    """Append a batch: only ``new_vectors`` is assigned (with the OLD
    index's centroids — cell meaning is stable across appends); vector
    rows union.  Append ids must be disjoint from the old corpus;
    ``validate=True`` runs the same eager semi-join overlap guard as
    ``bm25_index_merge``/``minhash_index_merge``.

    The result is LAZY: each merge stacks one more union (and, for a
    disk-backed ``old``, one more parquet read) onto the plan, and every
    match/serve call re-scans all of them.  Compact a merge chain by
    ``write()``-ing to a FRESH path and re-reading
    (:meth:`SemanticIndex.write` documents the cadence and the
    self-overwrite guard)."""
    if validate:
        new_ids = new_vectors.select(F.col(id_col).alias("__id")).distinct()
        overlap = old.vectors.select("__id").join(new_ids, "__id").limit(1).first()
        if overlap is not None:
            raise ValueError(
                "semantic_index_merge is an APPEND: new_vectors contains ids "
                f"already present in the old index (e.g. {overlap['__id']!r}); "
                "merging them would duplicate vector rows and match output.  "
                "Remove them first (semantic_index_remove) or rebuild."
            )
    new = _assigned_vectors(
        new_vectors, old.centroids, id_col, vec_col, old.round_to,
        old.pq_codebooks,
    )
    return SemanticIndex(
        vectors=old.vectors.unionByName(new),
        centroids=old.centroids,
        round_to=old.round_to,
        pq_codebooks=old.pq_codebooks,
    )


def semantic_index_remove(old: SemanticIndex, ids: DataFrame) -> SemanticIndex:
    """Drop documents (dedup rerun, takedown): broadcast anti-join on the
    vector relation — survivors untouched, so remove == rebuild-on-
    survivors by construction.  Idempotent."""
    victims = ids.select(F.col(ids.columns[0]).alias("__id")).distinct()
    return SemanticIndex(
        vectors=old.vectors.join(F.broadcast(victims), "__id", "left_anti"),
        centroids=old.centroids,
        round_to=old.round_to,
        pq_codebooks=old.pq_codebooks,
    )


# Estimated per-row overhead of the broadcast-side relation beyond the
# vector payload itself: the doubled vector copy in the hash relation,
# UnsafeRow/array headers, the id, norm and cell fields.  Deliberately
# generous — the estimate guards an executor-memory cliff, so erring
# toward the shuffled join costs one exchange, not an OOM.
_VEC_ROW_OVERHEAD_BYTES = 96


def semantic_match_against_index(
    index: SemanticIndex,
    new_vectors: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    broadcast: "bool | str" = "auto",
    broadcast_budget_bytes: int = 256 << 20,
) -> DataFrame:
    """(new_id, old_id, cos) — new-batch vectors matched to index vectors
    sharing their centroid cell with cosine ≥ ``threshold`` (exact cosine,
    rounded to the index's ``round_to``; same cell-local semantics as the
    unguarded :func:`semantic_dedup` restricted to old × new pairs).

    Scale shape, ``broadcast=True``: the new batch is assigned its cells
    MAP-ONLY with the index's stored centroids and BROADCAST; the old
    vector relation — whose cells are already materialized in the
    parquet — streams through one cell-keyed broadcast hash join with
    ZERO exchanges (plan-gated).  Unlike the MinHash match there is no
    candidates-times-signatures second join to broadcast: vectors and
    norms ride the one join, so a whale cell costs |cell| STREAMED
    comparisons per colliding new doc (linear, spillable), never an
    old-corpus-sized broadcast.  The one remaining OOM hazard on that
    path is the NEW BATCH itself, so the default is ``'auto'``: a
    one-pass count x max-dim size estimate of ``new_vectors`` against
    ``broadcast_budget_bytes`` picks the join (an eager driver action at
    plan-construction time — cache a derived batch relation first if its
    pipeline is expensive; a STREAMING batch cannot be counted, so
    ``'auto'`` keeps the broadcast there: micro-batches are bounded by
    the trigger by construction).  ``broadcast=False`` — what 'auto'
    degrades to past the budget — turns the join into a shuffled hash
    join for TB-scale new batches (both sides exchange on the cell key,
    parity-tested).  All paths produce identical matches."""
    # same policy object as the ADC serving family: the new batch is the
    # "query relation" side, priced count x max-dim against the budget
    _, _, broadcast = _serving_broadcast_plan(
        new_vectors, vec_col, broadcast, broadcast_budget_bytes,
        table_rows_per_query=0, rerank=None,
    )
    new = _assigned_vectors(
        new_vectors, index.centroids, id_col, vec_col, index.round_to
    ).select(
        F.col("__id").alias("__new_id"),
        as_double_array("vec").alias("__new_vec"),
        F.col("norm").alias("__new_norm"),
        "cell",
    )
    new_side = _maybe_broadcast(new, broadcast)
    cos = F.round(
        dot(as_double_array("vec"), F.col("__new_vec"))
        / (F.col("norm") * F.col("__new_norm")),
        index.round_to,
    )
    return (
        index.vectors.join(new_side, "cell")
        .filter(F.col("__id") != F.col("__new_id"))
        .select(
            F.col("__new_id").alias("new_id"),
            F.col("__id").alias("old_id"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def ivf_topk_against_index(
    index: SemanticIndex,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    nprobe: int = 2,
) -> DataFrame:
    """IVF top-k SERVED from a persisted :class:`SemanticIndex` — the
    steady-state ANN pattern: the corpus side (vector, norm, cell) was
    paid for once at index build; each query batch costs only its own
    nprobe-cell assignment plus the cell-keyed candidate join.  Results
    are identical to :func:`ivf_cosine_topk` over the same corpus and
    centroids (parity-tested): the index stores exactly the relation that
    function's corpus-side projection computes per call.

    Scale shape: the query side is MAP-ONLY for inlineable centroid sets
    (``inline_probe_cells`` — ranked probes exploded from the query scan's
    own projection, no window exchange, no cells re-join; join+window
    fallback past the inline cap) and broadcasts onto the indexed corpus,
    which streams through the cell join with zero exchanges from a loaded
    index."""
    q = _probed_query_side(
        queries, index.centroids, id_col, vec_col, nprobe, index.round_to
    )
    c = index.vectors.select(
        F.col("__id").alias("neighbor_id"),
        as_double_array("vec").alias("neighbor_vec"),
        F.col("norm").alias("neighbor_norm"),
        "cell",
    )
    pairs = c.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = dot(F.col("query_vec"), F.col("neighbor_vec")) / (
        F.col("query_norm") * F.col("neighbor_norm")
    )
    scores = pairs.select(
        "query_id", "neighbor_id", F.round(cos, index.round_to).alias("cos")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scores.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_pq_topk_against_index(
    index: SemanticIndex,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    nprobe: int = 2,
    rerank: int | None = None,
    broadcast: "bool | str" = "auto",
    broadcast_budget_bytes: int = 256 << 20,
) -> DataFrame:
    """IVFPQ/ADC top-k SERVED from a persisted :class:`SemanticIndex`
    built with ``pq_codebooks`` — the steady-state form of
    :func:`ivf_pq_topk` (non-residual): the corpus-side PQ codes were
    born in the build projection and persisted, so a query batch costs
    its own map-only nprobe assignment + ADC distance table plus the
    (cell, subspace, code)-keyed join the stored codes stream through.
    Results are identical to the per-call form over the same corpus,
    centroids and codebooks (parity-tested), including the optional
    exact-cosine ``rerank`` stage — whose raw vectors also come FROM THE
    INDEX (vector and norm are stored), so serving never touches the
    original embedding files.

    The same ``broadcast='auto'`` guard as :func:`ivf_pq_topk` prices the
    ADC table, the rerank shortlist and the exact stage's query relation
    against ``broadcast_budget_bytes`` and degrades oversized sides to
    shuffled hash joins (:func:`_serving_broadcast_plan`)."""
    if index.pq_codebooks is None:
        raise ValueError(
            "this SemanticIndex carries no PQ codebooks; build it with "
            "semantic_index(..., pq_codebooks=...) (or use "
            "ivf_topk_against_index for exact-cosine serving)."
        )
    if "codes" not in index.vectors.columns:
        raise ValueError(
            "this SemanticIndex's vectors relation has no 'codes' column "
            "(built before PQ support?); rebuild with pq_codebooks."
        )
    if rerank is not None and rerank < k:
        # validate BEFORE the 'auto' sizing pass (see ivf_pq_topk)
        raise ValueError(f"rerank must be >= k ({k}), got {rerank}")
    bc_table, bc_shortlist, bc_queries = _serving_broadcast_plan(
        queries, vec_col, broadcast, broadcast_budget_bytes,
        nprobe * len(index.pq_codebooks) * len(index.pq_codebooks[0]),
        rerank,
    )
    round_to = index.round_to
    codes = index.vectors.select(
        F.col("__id").alias("neighbor_id"),
        "cell",
        F.posexplode("codes").alias("j", "code"),
    )
    probes = inline_probe_cells(
        index.centroids, as_double_array(vec_col), nprobe, round_to
    )
    if probes is not None:
        probed = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.explode(probes).alias("__p"),
        ).select("query_id", F.col("__p.cell").alias("cell"), "__qv")
        table = _pq_query_table(
            probed, index.pq_codebooks, "query_id", "__qv", round_to,
            passthrough=("cell",),
        )
    else:
        query_cells = nearest_centroids(
            queries, index.centroids, id_col, vec_col,
            nprobe=nprobe, round_to=round_to,
        )
        table = _pq_query_table(
            queries, index.pq_codebooks, id_col, vec_col, round_to
        ).join(
            query_cells.select(F.col(id_col).alias("query_id"), "cell"),
            "query_id",
        )
    scale = float(10**round_to)
    scored = (
        codes.join(_maybe_broadcast(table, bc_table), ["cell", "j", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(_adc_score(scale).alias("cos"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rerank)
        .select("query_id", "neighbor_id")
    )
    # exact stage from the INDEX's stored vectors/norms — no corpus files
    c = index.vectors.select(
        F.col("__id").alias("neighbor_id"),
        as_double_array("vec").alias("neighbor_vec"),
        F.col("norm").alias("neighbor_norm"),
    )
    q = _with_norm(queries, id_col, vec_col, "query")
    exact = (
        c.join(_maybe_broadcast(shortlist, bc_shortlist), "neighbor_id")
        .join(_maybe_broadcast(q, bc_queries), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("query_vec"), F.col("neighbor_vec"))
                / (F.col("query_norm") * F.col("neighbor_norm")),
                round_to,
            ).alias("cos"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return exact.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )
