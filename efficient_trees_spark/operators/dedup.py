"""Corpus deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All four are pure DataFrame compositions (no UDFs) designed around shuffle
volume at the 100 TB scale:

* the raw corpus is never self-joined — every pairwise comparison happens
  AFTER an aggregation step that reduces rows to (doc, token/shingle/bucket)
  or per-doc signatures;
* candidate generation is bucket-local (LSH bands / SimHash chunks / shared
  shingles), so the join key is a bucket hash with bounded fan-out, not a
  cross product;
* the hash family is md5-derived (``hash32``) — deterministic across engines,
  which makes every stage oracle-checkable in DuckDB, and uniformly
  distributed, which keeps bucket skew bounded.

The reference has no dedup operators; this is the extension surface for
training-data pipelines (build brief; SURVEY.md §7.1 step 8).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from efficient_trees_spark.functions import text

# ------------------------------------------------------------ hash plumbing

def hash32(col: Column, salt: str | None = None) -> Column:
    """Deterministic 32-bit hash as bigint: first 8 hex chars of md5.
    Engine-portable: DuckDB twin is ('0x' || substr(md5(x),1,8))::BIGINT."""
    salted = F.concat(F.lit(f"{salt}:"), col) if salt is not None else col
    return F.conv(F.substring(F.md5(F.encode(salted, "utf-8")), 1, 8), 16, 10).cast("bigint")


# Universal-hash MinHash family: ONE md5 digest per shingle supplies a 32-bit
# base value h; hash i is (a_i*h + b_i) mod (2^31-1) — the classic
# Carter-Wegman construction.  One cryptographic hash instead of ceil(k/4),
# and the linear transforms are integer ops inside whole-stage codegen.
# Bounds: a_i,b_i < 2^31, h < 2^32, so a_i*h + b_i < 2^63 — no ANSI-mode
# bigint overflow.  Coefficients are fixed (seeded LCG) so the DuckDB oracle
# embeds them as literals.
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1


def minhash_coefficients(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs, a_i odd/nonzero, b_i arbitrary."""
    state = 0x5DEECE66D
    out = []
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state >> 16) % (MINHASH_PRIME - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = (state >> 16) % MINHASH_PRIME
        out.append((a, b))
    return out


def minhash_base(col: Column) -> Column:
    """32-bit base hash for the universal-hash family (one md5)."""
    return F.conv(F.substring(F.md5(F.encode(col, "utf-8")), 1, 8), 16, 10).cast(
        "bigint"
    )


def minhash_family(base: Column, num_hashes: int) -> list[Column]:
    """k MinHash hash functions over an already-computed base hash column.
    The base is taken as a COLUMN, not recomputed per function — project it
    first so the md5 runs once per row regardless of k."""
    return [
        ((F.lit(a) * base + F.lit(b)) % F.lit(MINHASH_PRIME))
        for a, b in minhash_coefficients(num_hashes)
    ]


def hash60(col: Column) -> Column:
    """60-bit hash as bigint (15 hex chars) — SimHash bit source."""
    return F.conv(F.substring(F.md5(F.encode(col, "utf-8")), 1, 15), 16, 10).cast("bigint")


# ------------------------------------------------------------- exact dedup

def exact_duplicates(df: DataFrame, id_col: str, text_col: str, by: str = "content") -> DataFrame:
    """Map every doc to the canonical (minimum) id of its fingerprint group.

    ``by='content'`` uses the normalized-content md5; ``by='bag'`` the
    order-insensitive token-bag md5.  One shuffle on the fingerprint; group
    sizes are tiny (true duplicates), so no skew concern.

    Deliberately NOT fanned out (``fan_out_small_input``): the fingerprint
    projection is one md5 per row — too cheap to amortize a raw-text
    round-robin shuffle of the input (r11 A/B: fanning regressed the bench
    leg 0.70 s -> 1.03 s; the shingle operators below, whose map side is
    ~100x heavier, win ~2x from the same treatment).
    """
    fp = text.content_fingerprint(text_col) if by == "content" else text.bag_fingerprint(text_col)
    with_fp = df.select(F.col(id_col), fp.alias("fp"))
    canon = with_fp.groupBy("fp").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return with_fp.join(canon, "fp").select(id_col, "canonical_id", "group_size")


# ---------------------------------------------------------------- shingles

def token_sets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) distinct — the unigram shingle relation.

    Distinct by construction: ``array_distinct`` runs inside the row BEFORE
    the explode, so no dedup shuffle ever happens — a document's token set
    lives in one array cell.

    Fanned out first (no-op on many-split cluster inputs): tokenization is
    the map-side cost of every shingle consumer, and a few-split local
    input serialized it onto the scan's split count (r11)."""
    from efficient_trees_spark.sources.io import fan_out_small_input

    return fan_out_small_input(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(text.tokens(text_col))).alias("token"),
    )


def ngram_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) distinct with word n-gram shingles (map-side distinct,
    same zero-shuffle construction as :func:`token_sets`).

    The token array is materialized as a projection FIRST: Catalyst does not
    eliminate common subexpressions inside higher-order-function lambdas, so
    referencing ``tokens(text)`` n times per gram would re-run the whole
    regex tokenization per array element (~40x slowdown measured)."""
    from efficient_trees_spark.sources.io import fan_out_small_input

    # Fan out before tokenizing (cluster no-op): the regex tokenization +
    # per-window md5 below are the map-side cost of every shingle consumer,
    # and a few-split local input ran them on the scan's split count (r11).
    with_toks = fan_out_small_input(df).select(
        F.col(id_col), text.tokens(text_col).alias("__toks")
    )
    toks = F.col("__toks")
    # positions 1..len-n+1 (1-based element_at).  Guard the short-doc case
    # explicitly: sequence(1, 0) is DESCENDING in Spark ([1,0]), not empty.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    shingles = F.array_distinct(F.transform(idx, gram))
    return with_toks.select(F.col(id_col), F.explode(shingles).alias("shingle"))


# ------------------------------------------------------------------ jaccard

def jaccard_pairs(
    shingles: DataFrame, id_col: str, min_jaccard: float, shingle_col: str = "shingle"
) -> DataFrame:
    """Exact Jaccard over all pairs sharing ≥1 shingle.

    The self-join key is the shingle, so common shingles fan out — callers
    should bound shingle document-frequency first (see ``df_capped``) on
    heavy-tailed corpora; for near-dup thresholds the verified pairs always
    share rare shingles, so dropping ultra-common shingles is lossless in
    practice and removes the skew.
    """
    # The shingle relation is consumed FOUR times here (a, b, and sizes on
    # both pair sides), but an r11 A/B REJECTED materializing it with a
    # local checkpoint (0.65-1.0x): the relation is map-only — re-deriving
    # it is an embarrassingly parallel tokenize with no exchange, while
    # storing the (doc, shingle) blow-up paid block-manager serialization
    # + memory churn that degraded later runs in the same session.
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = shingles.select(F.col(id_col).alias("id_a"), F.col(shingle_col))
    b = shingles.select(F.col(id_col).alias("id_b"), F.col(shingle_col))
    shared = (
        a.join(b, shingle_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                9,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def df_capped(shingles: DataFrame, shingle_col: str = "shingle", max_df: int = 1000) -> DataFrame:
    """Drop shingles appearing in more than ``max_df`` docs — the standard
    skew guard before a shingle self-join at scale."""
    freq = shingles.groupBy(shingle_col).agg(F.count(F.lit(1)).alias("df"))
    return shingles.join(freq.filter(F.col("df") <= max_df), shingle_col).drop("df")


def shingle_relation(df: DataFrame, id_col: str, text_col: str, ngram: int) -> DataFrame:
    """(id, shingle) distinct — unigram token sets for ngram=1, word n-grams
    otherwise.  Distinct by construction (in-array), zero shuffles.  Word
    n-grams (n≈3) are the right default for near-dup work: unigram sets
    degenerate on small vocabularies."""
    if ngram == 1:
        return token_sets(df, id_col, text_col).withColumnRenamed("token", "shingle")
    return ngram_shingles(df, id_col, text_col, ngram)


# ------------------------------------------------------------------ minhash

def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, ngram: int = 3
) -> DataFrame:
    """(id, sig_0..sig_{k-1}) MinHash signatures over n-gram shingle sets.

    One explode + one groupBy: ONE md5 per (id, shingle) row supplies the
    base hash, the k hash functions are k integer linear transforms of it
    (universal hashing), aggregated with k ``min``s: a single shuffle whose
    width is k int64 columns, independent of document length.
    """
    return _signatures_from_shingles(
        shingle_relation(df, id_col, text_col, ngram), id_col, num_hashes
    )


def _quoted(name: str) -> str:
    return f"`{name.replace('`', '``')}`"


def _signatures_from_shingles(
    shingles: DataFrame, id_col: str, num_hashes: int
) -> DataFrame:
    """Signature aggregation over an existing shingle relation — split out
    (r11) so compositions that already materialized the shingles
    (:func:`minhash_near_duplicates`) don't re-derive them.

    The k hash columns and k min-aggregates are built as parsed SQL
    strings (``selectExpr`` / one ``F.expr`` per aggregate), not chained
    Column operators: at k=128 the operator chain costs ~0.45 s of py4j
    round trips PER CONSTRUCTION (histogram.array_cast_expr rationale;
    measured r11).  Bare integer literals parse to the same IntegerType
    literals ``F.lit`` produced (every coefficient and MINHASH_PRIME fits
    int32), so the expression trees — and the signatures — are
    identical."""
    based = shingles.select(id_col, minhash_base(F.col("shingle")).alias("__base"))
    hashed = based.selectExpr(
        _quoted(id_col),
        *[
            f"({a} * __base + {b}) % {MINHASH_PRIME} AS h_{i}"
            for i, (a, b) in enumerate(minhash_coefficients(num_hashes))
        ],
    )
    return hashed.groupBy(id_col).agg(
        *[F.expr(f"min(h_{i}) AS sig_{i}") for i in range(num_hashes)]
    )


def band_rows(
    signatures: DataFrame, id_col: str, num_hashes: int = 16, band_size: int = 4
) -> DataFrame:
    """(id, band, band_hash) — each signature exploded into its LSH band
    bucket keys (band hash = md5 of the band's comma-joined components);
    the shared banding primitive for self-join and cross-corpus matching."""
    n_bands = num_hashes // band_size
    # unhex(md5): the bucket key is internal (never in any result or
    # persisted index — signatures are what MinHashIndex stores), and the
    # 16-byte binary halves the banded self-join's shuffle bytes vs the
    # 32-char hex string (guide §2.3, r11).  unhex is bijective on md5
    # output, so bucket membership — and every candidate pair — is
    # identical.  Built as ONE parsed SQL string instead of ~10 Column
    # operator calls per band (~0.23 s of py4j round trips per
    # construction at 32 bands; same expressions, same values).
    def band_struct(b: int) -> str:
        parts = ", ".join(
            f"CAST(sig_{b * band_size + r} AS STRING)"
            for r in range(band_size)
        )
        return (
            f"struct({b} AS band, "
            f"unhex(md5(encode(concat_ws(',', {parts}), 'utf-8'))) "
            f"AS band_hash)"
        )

    all_bands = ", ".join(band_struct(b) for b in range(n_bands))
    return signatures.selectExpr(
        _quoted(id_col), f"explode(array({all_bands})) AS bb"
    ).select(id_col, "bb.band", "bb.band_hash")


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, num_hashes: int = 16, band_size: int = 4
) -> DataFrame:
    """Distinct (id_a, id_b) pairs whose signatures collide in ≥1 LSH band.

    Bands become (band_idx, band_hash) bucket keys; the pair join is bucket-
    local.  With b bands of r rows, collision probability is the classic
    1-(1-s^r)^b curve — tune (num_hashes, band_size) for the target
    similarity, not the data size.
    """
    bands = band_rows(signatures, id_col, num_hashes, band_size)
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_jaccard: float = 0.5,
    num_hashes: int = 16,
    band_size: int = 4,
    ngram: int = 3,
) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures → banded candidates → exact
    Jaccard verification on the candidate set only (never all pairs).

    The doc-sized SIGNATURES relation is materialized once per call with a
    lazy local checkpoint (r12): the band self-join consumes it on both
    sides, and left lazy each side re-ran the whole corpus scan → tokenize
    → shingle → k-hash → min-agg pipeline (the plan carried two complete
    scan+Generate+Exchange pipelines for one logical relation).  A calm-
    window interleaved A/B reads 2.24 → 1.74 s median (1.29x) at sf0.1 —
    r11's 0.90x rejection of the same rewrite was taken in this host's
    chronically contended windows and does not reproduce.  The relation is
    k int64 columns per doc (tiny), recomputed from parquet every call.

    The EXPLODED relations stay lazy, re-measured r12 with the sigs
    checkpoint in place: checkpointing shingles as well (r11's other
    variant) still loses (the (doc, shingle) blow-up pays block-manager
    serialization), and checkpointing the doc-sized SIZES relation
    measured 2.24 → 2.35 s — the extra materialization barrier costs more
    than the one tokenize pass it saves (verification re-derives shingles
    as a/b and sizes on both pair sides, all map-only)."""
    shingles = shingle_relation(df, id_col, text_col, ngram)
    sigs = _signatures_from_shingles(shingles, id_col, num_hashes).localCheckpoint(
        eager=False
    )
    candidates = lsh_candidate_pairs(sigs, id_col, num_hashes, band_size)
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    shared = (
        candidates.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                9,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


# ----------------------------------------------------- incremental minhash


@dataclass(frozen=True)
class MinHashIndex:
    """The corpus-derived half of incremental near-dup matching: per-doc
    MinHash signatures plus the hash-family parameters they were built
    with — the dedup counterpart of :class:`~efficient_trees_spark.\
operators.retrieval.Bm25Index`.  Real pipelines dedup every NEW crawl
    batch against the accumulated corpus; rebuilding signatures over
    100 TB of accepted documents per batch is the cost this avoids — the
    old corpus text is never re-shingled (or even needed: the index
    round-trips through parquet)."""

    signatures: DataFrame  # (__doc, sig_0..sig_{k-1})
    num_hashes: int
    band_size: int
    ngram: int

    def persist(self) -> "MinHashIndex":
        self.signatures.persist()
        return self

    def unpersist(self) -> "MinHashIndex":
        self.signatures.unpersist()
        return self

    def write(self, path: str, mode: str = "error") -> None:
        """Signatures + params as parquet — build where the corpus lives,
        match new batches anywhere."""
        self.signatures.write.mode(mode).parquet(f"{path}/signatures")
        spark = self.signatures.sparkSession
        spark.createDataFrame(
            [(self.num_hashes, self.band_size, self.ngram)],
            "num_hashes int, band_size int, ngram int",
        ).write.mode(mode).parquet(f"{path}/params")


def read_minhash_index(spark, path: str) -> MinHashIndex:
    p = spark.read.parquet(f"{path}/params").first()
    return MinHashIndex(
        signatures=spark.read.parquet(f"{path}/signatures"),
        num_hashes=p["num_hashes"],
        band_size=p["band_size"],
        ngram=p["ngram"],
    )


def minhash_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    band_size: int = 4,
    ngram: int = 3,
) -> MinHashIndex:
    """Build the signature index: one corpus scan, one signature shuffle
    (k int64 columns per doc, independent of document length)."""
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, ngram)
    return MinHashIndex(
        signatures=sigs.withColumnRenamed(id_col, "__doc"),
        num_hashes=num_hashes,
        band_size=band_size,
        ngram=ngram,
    )


def minhash_index_merge(
    old: MinHashIndex, new_docs: DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
    validate: bool = False,
) -> MinHashIndex:
    """Append a batch: only ``new_docs`` is shingled/signed; signatures
    union.  Append ids must be disjoint from the old corpus (same contract
    as ``bm25_index_merge`` — an overlap silently duplicates signature
    rows, which duplicates band rows and match output downstream).
    ``validate=True`` opts into the same eager guard BM25's merge has: one
    semi-join of the new batch's ids against the old signature relation,
    raising on any overlap (remove stale ids first with
    :func:`minhash_index_remove` for an upsert)."""
    if validate:
        new_ids = new_docs.select(F.col(id_col).alias("__doc")).distinct()
        overlap = (
            old.signatures.select("__doc").join(new_ids, "__doc").limit(1).first()
        )
        if overlap is not None:
            raise ValueError(
                "minhash_index_merge is an APPEND: new_docs contains doc ids "
                "already present in the old index (e.g. "
                f"{overlap['__doc']!r}); merging them would duplicate "
                "signature rows and match output.  Remove them first "
                "(minhash_index_remove) or rebuild."
            )
    new = minhash_index(
        new_docs, id_col, text_col, old.num_hashes, old.band_size, old.ngram
    )
    return MinHashIndex(
        signatures=old.signatures.unionByName(new.signatures),
        num_hashes=old.num_hashes,
        band_size=old.band_size,
        ngram=old.ngram,
    )


def minhash_index_remove(old: MinHashIndex, doc_ids: DataFrame) -> MinHashIndex:
    """Drop documents (dedup rerun, takedown): broadcast anti-join on the
    signature relation — the signatures of survivors are untouched, so
    remove == rebuild-on-survivors by construction."""
    ids = doc_ids.select(F.col(doc_ids.columns[0]).alias("__doc")).distinct()
    return MinHashIndex(
        signatures=old.signatures.join(F.broadcast(ids), "__doc", "left_anti"),
        num_hashes=old.num_hashes,
        band_size=old.band_size,
        ngram=old.ngram,
    )


def minhash_match_against_index(
    index: MinHashIndex,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_estimate: float = 0.5,
    broadcast: bool = True,
    max_candidate_pairs: int | None = 5_000_000,
) -> DataFrame:
    """(new_id, old_id, estimate) — new-batch documents matched to index
    documents: LSH band collision generates candidates, and the fraction
    of agreeing signature components — MinHash's unbiased Jaccard
    estimator — scores them (the raw old text is unavailable by design,
    so exact Jaccard verification is impossible and the estimator is the
    honest score; k=16 components give stderr ≈ sqrt(J(1-J)/16) ≈ 0.125
    at J=0.5 — raise ``num_hashes`` at index build time for tighter
    matching).

    Scale shape, ``broadcast=True`` (default — daily-batch regime): the
    new batch's band rows and the (candidates x new signatures) relation
    BROADCAST, so the old signature relation never shuffles.  The
    candidate set's size is bounded by OLD-corpus band collisions, not by
    the new batch — one new boilerplate page colliding with a
    million-document template cluster makes the broadcast old-corpus-
    scale — so the default runs an EAGER guard first: one pass over the
    band join counts candidates per new document (the old side streams
    through a broadcast join, so the guard job itself never exchanges the
    old relation) and a ``ValueError`` names the worst-colliding new
    document when the total exceeds ``max_candidate_pairs``.  Pass
    ``None`` to skip the guard (and its extra old-side scan) when the
    collision profile is known.

    ``broadcast=False`` (TB-scale new batch — e.g. matching one crawl
    snapshot against another): every join becomes a shuffled hash join —
    the old side exchanges on the band key and the doc id, both sides
    spill instead of OOMing, and the guard is skipped (no broadcast left
    to protect; output size is then inherent in the data).  Results are
    identical to the broadcast path (parity-tested)."""
    new_sigs = minhash_signatures(
        new_docs, id_col, text_col, index.num_hashes, index.ngram
    ).withColumnRenamed(id_col, "__new")
    old_bands = band_rows(
        index.signatures, "__doc", index.num_hashes, index.band_size
    )
    new_bands = band_rows(new_sigs, "__new", index.num_hashes, index.band_size)
    new_band_side = F.broadcast(new_bands) if broadcast else new_bands.hint("shuffle_hash")
    candidates = (
        old_bands.join(new_band_side, ["band", "band_hash"])
        .select("__new", "__doc")
        .distinct()
    )
    if broadcast and max_candidate_pairs is not None:
        worst = (
            candidates.groupBy("__new")
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.sum("__n").alias("__total"),
                F.max("__n").alias("__worst_n"),
                F.max_by("__new", "__n").alias("__worst"),
            )
            .first()
        )
        if worst["__total"] is not None and worst["__total"] > max_candidate_pairs:
            raise ValueError(
                f"minhash_match_against_index: {worst['__total']:,} candidate "
                f"pairs (> max_candidate_pairs={max_candidate_pairs:,}); the "
                f"worst new document ({worst['__worst']!r}) collides with "
                f"{worst['__worst_n']:,} index documents.  The broadcast plan "
                "would materialize this on every executor — pass "
                "broadcast=False for a shuffled-hash plan that spills instead, "
                "or raise/disable the guard if the pair volume is intended."
            )
    agree = sum(
        F.when(
            F.col(f"o.sig_{i}") == F.col(f"n.sig_{i}"), F.lit(1)
        ).otherwise(F.lit(0))
        for i in range(index.num_hashes)
    )
    # broadcast=True: the scoring join streams the OLD signatures against a
    # broadcast of (candidates x new signatures) — structurally, so the old
    # relation never exchanges even without AQE's size estimate (plan-gated).
    new_sig_side = F.broadcast(new_sigs) if broadcast else new_sigs.hint("shuffle_hash")
    cand_with_new = candidates.join(new_sig_side.alias("n"), "__new")
    cand_side = F.broadcast(cand_with_new) if broadcast else cand_with_new.hint("shuffle_hash")
    return (
        index.signatures.alias("o")
        .join(cand_side, "__doc")
        .select(
            F.col("__new").alias("new_id"),
            F.col("__doc").alias("old_id"),
            F.round(agree / F.lit(float(index.num_hashes)), 9).alias("estimate"),
        )
        .filter(F.col("estimate") >= min_estimate)
    )


# ------------------------------------------------------------------ simhash

N_SIMHASH_BITS = 60


def simhash(df: DataFrame, id_col: str, text_col: str, ngram: int = 3) -> DataFrame:
    """(id, simhash) — 60-bit SimHash over n-gram shingles.

    Bit-majority as 60 conditional-sum aggregates over the (id, shingle)
    relation: one shuffle, map-side combinable, no explode by bit.
    """
    toks = shingle_relation(df, id_col, text_col, ngram).select(
        id_col, hash60(F.col("shingle")).alias("h")
    )
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s_{j}")
            for j in range(N_SIMHASH_BITS)
        ]
    )
    fp = None
    for j in range(N_SIMHASH_BITS):
        term = F.when(F.col(f"s_{j}") > 0, F.lit(2**j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        fp = term if fp is None else fp + term
    return bit_sums.select(id_col, fp.alias("simhash"))


def simhash_candidate_pairs(
    fingerprints: DataFrame, id_col: str, max_hamming: int = 3, n_chunks: int = 4
) -> DataFrame:
    """(id_a, id_b, hamming) for pairs within ``max_hamming`` bits.

    Pigeonhole banding: a pair within h bits agrees exactly on ≥1 of
    (h+1) chunks — with 4 chunks of 15 bits any pair ≤3 bits apart collides
    in some chunk, so the join is chunk-bucket-local."""
    chunk_bits = N_SIMHASH_BITS // n_chunks
    chunks = fingerprints.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * chunk_bits)
                        .bitwiseAND(F.lit(2**chunk_bits - 1))
                        .alias("chunk_val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "simhash", "cc.chunk", "cc.chunk_val")
    a = chunks.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "chunk_val")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "chunk_val")
    return (
        a.join(b, ["chunk", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# -------------------------------------------------- cluster / canonicalize

_LAST_CC_STATS: dict[str, int] = {}


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 30,
    probe_interval: int = 2,
) -> DataFrame:
    """Cluster near-duplicate pairs: (id, cluster_id) where cluster_id is the
    minimum doc id reachable through the pair graph; singletons cluster with
    themselves.  This is the step that turns pairwise dedup output into a
    keep/drop decision per document.

    Alternating large-star/small-star (Kiveris et al., "Connected Components
    in MapReduce and Beyond", public algorithm): each round rewires every
    node's strictly-larger neighbors (large-star) then its smaller neighbors
    (small-star) onto the local minimum, which at least halves component
    "height" per round — O(log n) rounds on adversarial path graphs where
    plain min-label propagation needs O(diameter) rounds (a scale-killer on
    long near-dup chains at corpus size).  The fixed point is a star per
    component rooted at the component minimum.

    Scale notes: each round is two groupBy(node).min aggregations plus two
    node-keyed joins — all shuffles on the node id, map-side combinable, no
    data-size-dependent blowup.  The edge relation is localCheckpoint-ed per
    round so the plan does not grow with iterations; convergence detection
    (count + order-independent xxhash64 signature of the edge set) rides the
    same materialization but is only PROBED every ``probe_interval`` rounds
    — the probe is a synchronous 1-row driver round-trip, and at the fixed
    point the iteration is idempotent (the potential function of Kiveris et
    al. is monotone, so no oscillation can fake a repeat), so spacing
    probes trades redundant star-shaped rounds for proportionally fewer
    driver syncs on deep graphs.  Worst case ≈ ``2 * probe_interval - 1``
    extra rounds: up to ``probe_interval - 1`` rounds may run before the
    first probe AT the fixed point, and detection then needs a SECOND
    matching probe one interval later.  The probe is skipped on the final
    iteration — its result could not affect control flow there.
    """
    # undirected edge set as directed pairs, self-loops dropped
    e = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    rounds = probes = 0
    for i in range(max_iterations):
        # -- large-star: for every node u (seen from both edge directions),
        #    m = min(neighbors ∪ {u}); connect each neighbor v > u to m.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmin = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
        )
        ls = (
            sym.filter(F.col("v") > F.col("u"))
            .join(lmin, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small-star: orient edges child→smaller, m = min of the smaller
        #    neighborhood; connect those neighbors AND u itself to m.
        ss_in = ls.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        smin = ss_in.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ss_in.join(smin, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smin.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        e = ss
        rounds += 1
        if (i + 1) % probe_interval or i + 1 == max_iterations:
            # Skip the driver sync off-interval, and ALWAYS on the final
            # iteration: the loop ends either way, so that probe's result
            # cannot affect control flow — it would be a wasted sync.
            continue
        # order-independent edge-set signature; bit_xor cannot overflow
        # under ANSI (unlike a sum of full-range hashes)
        sig = tuple(
            ss.agg(
                F.count(F.lit(1)), F.expr("bit_xor(xxhash64(u, v))")
            ).first()
        )
        probes += 1
        if sig == prev_sig:
            break
        prev_sig = sig
    # test instrumentation: rounds executed / probes issued by the last call
    global _LAST_CC_STATS
    _LAST_CC_STATS = {"rounds": rounds, "probes": probes}
    # fixed point: every edge is (child, component-min); roots/singletons
    # appear only as dst (or not at all) and label themselves.
    roots = e.groupBy("u").agg(F.min("v").alias("label"))
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(roots.withColumnRenamed("u", "id"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("label", F.col("id")).alias("cluster_id"),
            (F.coalesce("label", F.col("id")) == F.col("id")).alias("keep"),
        )
    )


# -------------------------------------------------------- decontamination

def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    ngram: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Remove training documents that overlap an evaluation benchmark —
    the standard pre-training decontamination pass (n-gram collision, the
    published GPT-3/PaLM recipe: a document is contaminated if it shares
    any ``ngram``-gram with any benchmark example; 13 is the conventional
    width — long enough that natural re-use is rare, short enough to catch
    paraphrase-free inclusion).

    Scale shape: the benchmark side is tiny (thousands of eval examples vs
    a 100 TB corpus), so its distinct shingle set is BROADCAST and the
    corpus-side check is a map-side semi-join — the corpus never shuffles.
    Returns ``docs`` minus contaminated rows; pass ``min_hits > 1`` to
    require multiple colliding n-grams (looser, for noisy benchmarks).

    Both sides shingle through the same tokenizer contract
    (:func:`ngram_shingles`), so formatting/punctuation differences never
    mask a real overlap.
    """
    bench_shingles = (
        ngram_shingles(
            benchmark.select(F.lit(0).alias("__bid"), F.col(bench_text_col)),
            "__bid",
            bench_text_col,
            n=ngram,
        )
        .select("shingle")
        .distinct()
    )
    doc_shingles = ngram_shingles(docs, id_col, text_col, n=ngram)
    hits = (
        doc_shingles.join(F.broadcast(bench_shingles), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__hits"))
        .filter(F.col("__hits") >= min_hits)
        .select(id_col)
    )
    return docs.join(hits, id_col, "left_anti")


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    ngram: int = 13,
    min_hits: int = 1,
    fpp: float = 1e-6,
    num_bits: int | None = None,
    num_hashes: int | None = None,
) -> DataFrame:
    """:func:`decontaminate` for benchmark collections too large to
    broadcast as exact shingle strings: the benchmark's distinct n-gram
    set folds into a BLOOM FILTER bitmap, so the broadcast is ``m/8``
    bytes (~3 MB for a million shingles at fpp 1e-6) instead of tens of
    MB of strings — the same lever as the BM25 query-side guard, for the
    decontamination sweep direction.

    Error semantics are one-sided and SAFE for this use: a false positive
    only OVER-removes a clean training document (probability ~``fpp`` per
    shingle test); a contaminated document is NEVER missed (no false
    negatives).  Returns ``docs`` minus contaminated rows, like the exact
    operator.

    Scale shape:

    * benchmark side: one distinct-shingle count (benchmark-sized) to size
      the filter, then k bit positions per shingle -> distinct -> per-word
      ``bit_or`` masks — driver traffic is bounded by the BITMAP (m/64
      longs), never by benchmark size;
    * corpus side: pure map-side — shingles test k bits against the
      broadcast bitmap row with JVM expressions (no UDF); only hit doc ids
      (a benchmark-overlap-sized relation) ever shuffle, and the final
      anti-join is broadcast-sized;
    * pass ``num_bits``/``num_hashes`` to skip the sizing count when the
      benchmark cardinality is known.
    """
    import math
    from functools import reduce as _reduce

    bench_shingles = (
        ngram_shingles(
            benchmark.select(F.lit(0).alias("__bid"), F.col(bench_text_col)),
            "__bid",
            bench_text_col,
            n=ngram,
        )
        .select("shingle")
        .distinct()
    )
    if num_bits is None or num_hashes is None:
        n_distinct = max(bench_shingles.count(), 1)
    m = (
        int(num_bits)
        if num_bits is not None
        else max(64, int(-n_distinct * math.log(fpp) / (math.log(2) ** 2)) + 1)
    )
    k = (
        int(num_hashes)
        if num_hashes is not None
        else max(1, round(m / n_distinct * math.log(2)))
    )

    # Identical position expressions on both sides (seed folded in as a
    # LONG literal — the hash of INT 0 and LONG 0 differ).
    def _pos(i: int) -> str:
        return f"pmod(xxhash64(shingle, CAST({i} AS BIGINT)), CAST({m} AS BIGINT))"

    word_masks = (
        bench_shingles.select(
            F.explode(
                F.array(*[F.expr(_pos(i)) for i in range(k)])
            ).alias("p")
        )
        .distinct()
        .selectExpr(
            "CAST(p / 64 AS INT) AS w",
            "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)) AS mask",
        )
        .groupBy("w")
        .agg(F.expr("bit_or(mask)").alias("mask"))
        .collect()
    )
    bitmap = [0] * (m // 64 + 1)
    for row in word_masks:
        bitmap[row["w"]] = row["mask"]
    spark = docs.sparkSession
    bitmap_df = spark.createDataFrame([(bitmap,)], "__bloom array<long>")

    def _bit_set(i: int):
        p = _pos(i)
        return F.expr(
            f"(element_at(__bloom, CAST({p} / 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))) != 0"
        )

    doc_shingles = ngram_shingles(docs, id_col, text_col, n=ngram)
    might_contain = _reduce(lambda a, b: a & b, [_bit_set(i) for i in range(k)])
    hits = (
        doc_shingles.crossJoin(F.broadcast(bitmap_df))
        .filter(might_contain)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__hits"))
        .filter(F.col("__hits") >= min_hits)
        .select(id_col)
    )
    return docs.join(hits, id_col, "left_anti")


# ------------------------------------------------- duplicated substring spans


def _window_relation(docs: DataFrame, id_col: str, text_col: str, n: int):
    """(base, wins): per-doc tokens + ``(id, start, window-hash)`` — windows
    built map-side with let-bound HOFs, one md5 per window, docs shorter
    than ``n`` contributing no windows.

    Deliberately left fully lazy: callers consume ``wins`` twice and
    ``base`` once more (three tokenize passes, two window-md5 passes), but
    an r11 A/B REJECTED materializing them with local checkpoints (0.66x):
    both relations are map-only — re-derivation is an embarrassingly
    parallel pass with no exchange — while storing the token arrays and
    the per-window rows paid block-manager serialization + memory churn
    that degraded later runs in the same session."""
    from efficient_trees_spark.sources.io import fan_out_small_input

    docs = fan_out_small_input(docs)
    toks = text.tokens(text_col)
    # NULL text tokenizes to a NULL array: coalesce both so null-text docs
    # flow through as zero-token docs instead of emitting NULL stats.
    base = docs.select(
        F.col(id_col),
        F.coalesce(toks, F.array().cast("array<string>")).alias("__toks"),
    ).select(F.col(id_col), F.col("__toks"), F.size("__toks").alias("n_tokens"))

    wins = base.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.col("n_tokens") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.col("n_tokens") - n),
                    # unhex(md5): the window hash is an internal agg/join
                    # key only (no result exposes it), and 16-byte binary
                    # halves the dominant shuffle of this operator family
                    # — the (doc, start, h) window relation feeding the
                    # duplicated-hash aggregation (guide §2.3, r11).
                    # unhex is bijective on md5 hex, so the duplicated-
                    # window set and every downstream span is identical.
                    lambda i: F.struct(
                        i.cast("long").alias("start"),
                        F.unhex(
                            F.md5(F.concat_ws(" ", F.slice("__toks", i + 1, n)))
                        ).alias("h"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<start:bigint,h:binary>>"))
        ).alias("w"),
    ).select(F.col(id_col), F.col("w.start").alias("start"), F.col("w.h").alias("h"))
    return base, wins


def duplicate_window_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact duplicated-substring detection at token granularity (the
    span-level dedup of Lee et al., "Deduplicating Training Data Makes
    Language Models Better", 2021 — suffix-array duplicated spans,
    re-expressed as relational dataflow): every length-``n`` token window
    whose content appears in >= ``min_docs`` DISTINCT documents marks its
    ``n`` token positions as duplicated; overlapping marked windows merge
    into maximal spans per document.

    Returns one row per input document:
    ``(id, n_tokens, dup_windows, n_spans, covered_tokens, dup_token_frac)``
    — enough to strip or down-weight boilerplate spans downstream without
    re-deriving anything.

    Scale shape (no suffix array needed — the corpus never materializes a
    global sort):

    * window hashes are built map-side with let-bound array HOFs (tokenize
      once, one md5 per window) and exploded to ``(doc, start, hash)`` —
      linear in corpus tokens, the relational stand-in for suffix-array
      construction;
    * the duplicated-window set is ONE map-side-combined aggregation on the
      window hash (count of distinct docs, two-phase); a boilerplate window
      shared by millions of docs is still one group;
    * marking is an equi-join of the window relation with that set —
      each window row matches at most once, so no fan-out, no self-join;
    * span merging is per-document: sorted starts fold through a single
      ``aggregate`` HOF (intervals of equal length sorted by start merge
      left-to-right), so coverage needs no positional explode.
    """
    base, wins = _window_relation(docs, id_col, text_col, n)

    dup = (
        wins.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("h")
    )
    dupwins = wins.join(dup, "h").select(F.col(id_col), "start")

    acc0 = F.struct(
        F.lit(-1).cast("long").alias("end"),
        F.lit(0).cast("long").alias("cov"),
        F.lit(0).cast("long").alias("spans"),
    )

    def _merge(a: Column, s: Column) -> Column:
        new_span = s > a["end"]
        return F.struct(
            (s + F.lit(n - 1)).cast("long").alias("end"),
            (
                a["cov"]
                + F.when(new_span, F.lit(n)).otherwise(s + F.lit(n - 1) - a["end"])
            ).alias("cov"),
            (a["spans"] + F.when(new_span, F.lit(1)).otherwise(F.lit(0))).alias(
                "spans"
            ),
        )

    per_doc = (
        dupwins.groupBy(id_col)
        .agg(F.sort_array(F.collect_list("start")).alias("__starts"))
        .select(
            F.col(id_col),
            F.size("__starts").cast("long").alias("dup_windows"),
            F.aggregate(F.col("__starts"), acc0, _merge).alias("__m"),
        )
        .select(
            F.col(id_col),
            "dup_windows",
            F.col("__m.spans").alias("n_spans"),
            F.col("__m.cov").alias("covered_tokens"),
        )
    )

    return (
        base.select(F.col(id_col), F.col("n_tokens").cast("long").alias("n_tokens"))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.coalesce("covered_tokens", F.lit(0)) / F.col("n_tokens"), 9
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_token_frac"),
        )
    )


def strip_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Remove duplicated spans while KEEPING their first occurrence (the
    actual dedup step of Lee et al. 2021): for each window content shared
    by >= ``min_docs`` distinct docs, the LOWEST-id document containing it
    keeps its tokens; every other document drops the covered positions.

    Guarantee: every duplicated window survives INTACT in its keeper — a
    doc's removal spans never touch positions covered by windows that doc
    itself keeps (kept-window intervals are subtracted before removal), so
    content is deduplicated, never destroyed.  With chained overlapping
    windows (doc A keeps window W1 while being a non-keeper of overlapping
    W2) this protection can leave a non-keeper occurrence partially in
    place; the corpus therefore keeps AT LEAST one copy of every
    duplicated window, exactly one in the common non-chained case.

    Returns ``(id, n_tokens, kept_text, removed_tokens)``.

    Same scale shape as :func:`duplicate_window_spans` — the keeper choice
    adds only a ``min(id)`` to the existing window-hash aggregation, and
    span removal/protection is a per-row HOF over merged span arrays
    (positions are never exploded)."""
    base, wins = _window_relation(docs, id_col, text_col, n)

    dup = (
        wins.groupBy("h")
        .agg(
            F.count_distinct(F.col(id_col)).alias("__nd"),
            F.min(F.col(id_col)).alias("__keeper"),
        )
        .filter(F.col("__nd") >= min_docs)
        .select("h", "__keeper")
    )
    # Every duplicated-window occurrence, tagged: keeper occurrences become
    # PROTECTED intervals, non-keeper occurrences become removal candidates.
    marked = wins.join(dup, "h").select(
        F.col(id_col),
        "start",
        (F.col(id_col) == F.col("__keeper")).alias("__is_keeper"),
    )

    span_t = "array<struct<s:bigint,e:bigint>>"
    acc0 = F.struct(
        F.lit(-1).cast("long").alias("end"),
        F.array().cast(span_t).alias("spans"),
    )

    def _merge(a: Column, s: Column) -> Column:
        e = (s + F.lit(n - 1)).cast("long")
        grown = F.concat(
            F.slice(a["spans"], 1, F.size(a["spans"]) - 1),
            F.array(
                F.struct(
                    F.element_at(a["spans"], -1)["s"].alias("s"), e.alias("e")
                )
            ),
        )
        opened = F.concat(
            a["spans"], F.array(F.struct(s.cast("long").alias("s"), e.alias("e")))
        )
        return F.struct(
            e.alias("end"),
            F.when(s > a["end"], opened).otherwise(grown).alias("spans"),
        )

    per_doc = (
        marked.groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.when(~F.col("__is_keeper"), F.col("start")))
            ).alias("__rem_starts"),
            F.sort_array(
                F.collect_list(F.when(F.col("__is_keeper"), F.col("start")))
            ).alias("__prot_starts"),
        )
        .select(
            F.col(id_col),
            F.aggregate(F.col("__rem_starts"), acc0, _merge)["spans"].alias(
                "__spans"
            ),
            F.aggregate(F.col("__prot_starts"), acc0, _merge)["spans"].alias(
                "__kept_spans"
            ),
        )
    )

    joined = base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.col("__toks"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce(F.col("__spans"), F.array().cast(span_t)).alias("__spans"),
        F.coalesce(F.col("__kept_spans"), F.array().cast(span_t)).alias(
            "__kept_spans"
        ),
    )
    kept = F.filter(
        "__toks",
        lambda t, i: ~(
            F.exists(F.col("__spans"), lambda sp: (i >= sp["s"]) & (i <= sp["e"]))
            & ~F.exists(
                F.col("__kept_spans"), lambda sp: (i >= sp["s"]) & (i <= sp["e"])
            )
        ),
    )
    return joined.select(
        F.col(id_col),
        "n_tokens",
        F.concat_ws(" ", kept).alias("kept_text"),
        (F.col("n_tokens") - F.size(kept)).cast("long").alias("removed_tokens"),
    )
