"""Distributed BPE tokenizer training and encoding.

Byte-pair-encoding merge-table training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") expressed
Spark-first.  The scale design is the one every production BPE trainer
(fastBPE, HuggingFace tokenizers) uses, lifted to a cluster:

1. **Compress the corpus to its word-frequency table first.**  Pair
   statistics only depend on (distinct word, count), so the single
   corpus-sized shuffle happens once (`word_frequencies`); every one of the
   ``n_merges`` training rounds then runs on the vocabulary-sized relation
   (millions of rows at 100 TB, not trillions of tokens).
2. **One tiny driver sync per merge round.**  Each round is one hash
   aggregation over the cached vocabulary plus a 1-row argmax collect (the
   winning pair) — the merge itself is a pure JVM string ``replace`` on the
   symbol column, no Python workers anywhere.
3. **Encoding is expression-only.**  A trained merge list compiles to a
   nested chain of ``replace`` calls inside ``F.transform`` over the token
   array — whole-stage-codegen, zero shuffle, linear in the corpus.

Symbol representation (shared bit-for-bit with the DuckDB oracle in
``workloads/text_pipeline.py``): a word's symbol sequence is kept as a
single string with TWO-space separators and two-space padding, e.g.
``"  l  o  w  </w>  "``.  Applying merge ``(a, b)`` is then the literal
replace of ``" a  b "`` with ``" ab "``: the pattern consumes one space on
each side and the replacement restores it, so consecutive non-overlapping
occurrences all merge in a single left-to-right pass — exactly standard BPE
semantics ("a b a b" -> "ab ab", "a a a" -> "aa a"), identical in Spark's
``replace`` and DuckDB's (both scan forward from the end of the previous
replacement).  A single-space representation would eat the shared delimiter
and skip every second occurrence.

The reference engine has no tokenizer training; this is part of the
training-data-pipeline extension surface (SURVEY.md §7.1 step 8).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from efficient_trees_spark.functions import text

END_OF_WORD = "</w>"

# encode() strategy='auto' switch-over, MEASURED (tools/bpe_crossover.py,
# SCALE.md round 8): on a 277k-token / 1728-distinct-word corpus the
# expression form is FASTER at every merge count it can run (0.3-0.6 s
# through 256 merges vs the join form's 1.7-2.7 s fixed overhead) — but
# its plan construction dies at ~512 merges (JVM StackOverflowError
# converting the merges-deep nested replace column), while the join form
# keeps working (4.0 s at 512, chunked projections).  So this constant is
# a plan-VIABILITY guard with 2-4x margin below the measured cliff, not a
# throughput crossover; the join form's win at production merge counts is
# that it runs at all (and its corpus-side work stays O(tokens) while the
# expression form's is O(tokens x merges)).
_EXPR_MERGE_MAX = 128
# Measured plan-construction cliff for the expression form on a default
# JVM stack: 256 merges builds and runs, 512 stack-overflows.  bpe_encode
# warns above this so direct callers get a pointer instead of an opaque
# JVM error.
_EXPR_MERGE_HARD = 256

# encode_ids: above this vocabulary size the symbol->id mapping switches
# from a plan-literal map to a broadcast JOIN on the distinct-word
# segmentation relation.  MEASURED (SCALE.md round 8, re-measured round
# 9): the original create_map form (2 x |vocab| literal expressions) had
# ~quadratic plan cost — 4k entries 4.4 s, 16k 21.9 s, 64k 141 s, 262k
# hangs — which pinned this at 4096.  The literal now rides in as ONE
# from_json(lit(<json>), 'map<string,int>') expression (json handles any
# symbol content; Catalyst evaluates the parse once, not per row), which
# measures FLAT: 64k entries 4.1 s, 262k 3.7 s total for a 50k-word
# encode pass on a trivial frame — so the bound is no longer plan cost
# but plan SIZE: the materialized map ships inside every task closure,
# and a 1M-entry map OOMs a 1 GiB executor heap.  262,144 covers every
# published tokenizer vocabulary (GPT-2 50k, Llama 32k, the 100-256k
# modern range) with the broadcast join behind it for anything larger.
_ID_MAP_LITERAL_MAX = 262_144
# Entry count alone does not bound the closure: 262k LONG symbols can
# serialize to an arbitrarily large JSON literal.  The literal form is
# additionally gated on the serialized size of the json.dumps string —
# past this many bytes the broadcast join takes over regardless of entry
# count.  8 MiB keeps the executor-heap expansion of the parsed map in
# the same ~hundreds-of-MB ballpark the 262k-entry bound was sized for
# (the measured 1M-entry OOM on a 1 GiB heap ≈ 1 KB/entry in-heap).
_ID_MAP_LITERAL_MAX_BYTES = 8 * 1024 * 1024


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` over the tokenization contract — the ONE
    corpus-sized shuffle of BPE training."""
    return (
        docs.select(F.explode(text.tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_symbols(word: Column | str) -> Column:
    """Two-space-padded character symbols + end-of-word marker:
    ``"low"`` -> ``"  l  o  w  </w>  "``."""
    w = F.col(word) if isinstance(word, str) else word
    return F.concat(
        F.lit("  "), F.regexp_replace(w, "(.)", "$1  "), F.lit(END_OF_WORD + "  ")
    )


def symbols_array(syms: Column | str) -> Column:
    """Split the padded symbol string back to its symbol array."""
    s = F.col(syms) if isinstance(syms, str) else syms
    return F.filter(F.split(s, "  "), lambda x: x != F.lit(""))


def pair_counts(vocab: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency.

    ``pair`` is the space-joined symbol pair (symbols never contain
    spaces).  Vocabulary-sized aggregation — no corpus scan."""
    toks = symbols_array(syms_col)
    idx = F.sequence(F.lit(1), F.size(toks) - 1)
    pairs = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    return (
        vocab.filter(F.size(toks) >= 2)
        .select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def merge_expr(syms: Column | str, left: str, right: str) -> Column:
    """Apply one merge ``(left, right) -> left+right`` to a padded symbol
    string — a literal JVM replace, see module docstring for why the
    one-space-pattern / two-space-separator shape is exact."""
    s = F.col(syms) if isinstance(syms, str) else syms
    return F.replace(
        s, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    vocab: DataFrame | None = None,
    rematerialize_every: int = 24,
    timings: list[float] | None = None,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges; returns the ranked merge list.

    Tie-break: highest count, then lexicographically smallest pair (binary
    collation — identical in Spark and the SQL oracle).  Each round is one
    vocabulary-sized aggregation + a 1-row collect; the corpus is touched
    exactly once (``word_frequencies``).

    Scale discipline (the round-6 audit's quadratic-plan finding): naively,
    round k would re-execute a k-deep chain of ``replace``s over the cached
    base vocabulary AND re-analyze a k-deep Catalyst plan — total work
    quadratic in ``n_merges``, a wall at production merge counts (30k+).
    So every ``rematerialize_every`` rounds the merged vocabulary is
    re-materialized with ``localCheckpoint(eager=True)``: lineage truncates
    to a ``LogicalRDD`` scan, bounding both the executed replace chain and
    the analyzed plan at ``rematerialize_every`` regardless of round
    number — per-round cost stays FLAT (test-asserted in
    ``tests/test_bpe.py``).  Superseded checkpoint RDDs drop their last
    reference on rebinding and are unpersisted by Spark's ContextCleaner.
    Fully-merged words (single symbol) are dropped at each checkpoint:
    they can never contribute a pair again, and since the most frequent
    words merge earliest the working relation SHRINKS as training runs —
    the same pruning fastBPE applies to its word array.

    :param timings: optional list; when given, per-round wall seconds are
        appended (instrumentation for scale tests / tuning).
    """
    import time

    if rematerialize_every < 1:
        raise ValueError(
            f"rematerialize_every must be >= 1, got {rematerialize_every}"
        )
    if vocab is None:
        vocab = word_frequencies(docs, text_col)
    base = vocab.withColumn("syms", initial_symbols("word")).cache()
    base_live = True
    try:
        merges: list[tuple[str, str]] = []
        cur = base
        pending = 0  # merges applied since the last materialization
        for _ in range(n_merges):
            t0 = time.monotonic()
            top = (
                pair_counts(cur)
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not top:
                if timings is not None:
                    timings.append(time.monotonic() - t0)
                break  # every word fully merged — corpus exhausted
            left, right = top[0]["pair"].split(" ")
            merges.append((left, right))
            cur = cur.withColumn("syms", merge_expr("syms", left, right))
            pending += 1
            if pending >= rematerialize_every:
                cur = cur.filter(
                    F.size(symbols_array("syms")) >= 2
                ).localCheckpoint(eager=True)
                pending = 0
                if base_live:
                    # everything downstream now reads the checkpoint scan
                    base.unpersist()
                    base_live = False
            if timings is not None:
                timings.append(time.monotonic() - t0)
        return merges
    finally:
        if base_live:
            base.unpersist()


def segment_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Compile a merge list into a pure-expression word segmenter:
    char symbols -> fold of literal replaces -> symbol array."""
    s = initial_symbols(word)
    for left, right in merges:
        s = merge_expr(s, left, right)
    return symbols_array(s)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode each document to its BPE symbol sequence.

    Expression-only (the merge table is compiled into the plan as nested
    replaces inside ``F.transform``): zero shuffle, zero Python, linear
    scan.  Right for SMALL merge tables (dozens-hundreds): past that the
    compiled projection grows with the merge count and is re-evaluated per
    token occurrence — and past ~``_EXPR_MERGE_HARD`` merges the plan
    cannot be CONSTRUCTED at all on a default JVM stack (measured
    StackOverflowError at 512, tools/bpe_crossover.py) — use
    :func:`bpe_encode_joined`, which segments each DISTINCT word once in
    chunked bounded projections and joins the segmentation back
    (bit-identical output, the production shape for 30k-merge
    tokenizers)."""
    if len(merges) > _EXPR_MERGE_HARD:
        import warnings

        warnings.warn(
            f"bpe_encode with {len(merges)} merges exceeds the measured "
            f"expression-plan viability cliff (~{_EXPR_MERGE_HARD} on a "
            "default JVM stack — construction stack-overflows past it); "
            "use bpe_encode_joined / BpeTokenizer.encode(strategy='auto').",
            stacklevel=2,
        )
    return docs.select(
        id_col,
        F.flatten(
            F.transform(text.tokens(text_col), lambda w: segment_expr(w, merges))
        ).alias(out_col),
    )


def segment_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "syms",
    chunk: int = 64,
) -> DataFrame:
    """Segment a relation of distinct words under a merge list:
    ``(word) -> (word, syms array)``.

    The merge chain is applied in ``chunk``-sized projection slices with a
    (lazy) ``localCheckpoint`` between slices, so no single projection — and
    no analyzed plan — ever holds more than ``chunk`` nested replaces: a
    30k-merge table becomes ~470 modest stages over a words-sized relation
    instead of one codegen-hostile 30k-deep expression.  Total work is
    linear in ``len(merges)`` × distinct words."""
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    cur = words.withColumn(out_col, initial_symbols(word_col))
    for i in range(0, len(merges), chunk):
        for left, right in merges[i : i + chunk]:
            cur = cur.withColumn(out_col, merge_expr(out_col, left, right))
        if i + chunk < len(merges):
            # lazy checkpoint: truncates the analyzed plan now, computes
            # through the persisted chain in one pass on first use
            cur = cur.localCheckpoint(eager=False)
    return cur.select(word_col, symbols_array(out_col).alias(out_col))


def bpe_encode_joined(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
    chunk: int = 64,
    broadcast: bool = True,
    syms_transform=None,
    seg_transform=None,
) -> DataFrame:
    """:func:`bpe_encode` for LARGE merge tables — bit-identical output.

    Instead of evaluating the compiled merge chain once per token
    OCCURRENCE, the corpus's distinct words are segmented once
    (:func:`segment_words` — chunked projections, bounded plan) and the
    per-word segmentation is joined back by BROADCAST onto the
    position-exploded tokens; documents reassemble with a sort of
    (position, syms) structs.  Plan: one distinct shuffle (vocabulary), one
    broadcast join (corpus side never shuffles for it), one groupBy on the
    doc id — vs the expression form's zero shuffles but
    O(corpus tokens × merges) replace evaluations.  At a 30k-merge
    production tokenizer the join form wins by orders of magnitude; the
    segmentation relation is DISTINCT-WORD-sized, so the default broadcast
    is safe for curated corpora — but a raw web crawl's distinct-word set
    (typos, ids, urls: easily 100 M+) can exceed executor memory, so
    ``broadcast=False`` opts into a shuffled hash join on the word (one
    extra token-relation shuffle, identical output).

    ``syms_transform`` (Column -> Column), when given, rewrites each
    word's symbol array RIGHT AFTER segmentation — i.e. once per DISTINCT
    word, before the join back — so per-symbol post-processing (the
    token-id mapping in :meth:`BpeTokenizer.encode_ids`) costs
    vocabulary-sized work instead of once per token occurrence.
    ``seg_transform`` (DataFrame -> DataFrame) is the relation-level
    equivalent for rewrites a column expression can't state (e.g. a
    broadcast-join id mapping for vocabularies too large to inline as a
    plan literal); it must preserve the ``(word, syms)`` schema and the
    distinct-word row set, and applies after ``syms_transform``."""
    # A NULL text column tokenizes to a NULL array (the expression form then
    # emits NULL, not []); posexplode_outer collapses NULL and empty arrays
    # to the same single null row, so the array's nullness rides along as a
    # flag to keep the two forms bit-identical on NULL-text documents.
    toks = docs.select(
        F.col(id_col).alias("__id"),
        text.tokens(text_col).isNull().alias("__null_text"),
        F.posexplode_outer(text.tokens(text_col)).alias("__pos", "__word"),
    )
    seg = segment_words(
        toks.select(F.col("__word").alias("word")).where(
            F.col("__word").isNotNull()
        ).distinct(),
        merges,
        chunk=chunk,
    )
    if syms_transform is not None:
        seg = seg.withColumn("syms", syms_transform(F.col("syms")))
    if seg_transform is not None:
        seg = seg_transform(seg)
    seg_side = F.broadcast(seg) if broadcast else seg.hint("shuffle_hash")
    joined = toks.join(seg_side, toks["__word"] == seg["word"], "left")
    # collect_list skips nulls, so a zero-token document (posexplode_outer's
    # single null row) folds to an empty array — matching the expression
    # form's flatten over an empty token array.
    return (
        joined.groupBy("__id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__word").isNotNull(),
                        F.struct(F.col("__pos"), F.col("syms")),
                    )
                )
            ).alias("__a"),
            F.max("__null_text").alias("__null_text"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.when(F.col("__null_text"), F.lit(None))
            .otherwise(F.flatten(F.transform("__a", lambda s: s["syms"])))
            .alias(out_col),
        )
    )


@dataclass(frozen=True)
class BpeTokenizer:
    """Trained BPE merge table as a persistable driver-side artifact — the
    same discipline as the tree model (pickle/JSON of a plain object,
    independent of Spark) and :class:`~efficient_trees_spark.operators.\
retrieval.Bm25Index` (train once where the corpus lives, encode anywhere).

    ``encode(strategy='auto')`` picks the execution shape by merge count:
    the compiled-expression form (zero shuffle) below ``_EXPR_MERGE_MAX``
    merges, the distinct-word join form (:func:`bpe_encode_joined`) at and
    above it — both bit-identical."""

    merges: tuple[tuple[str, str], ...]

    def encode(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        out_col: str = "bpe_tokens",
        strategy: str = "auto",
        chunk: int = 64,
        broadcast: bool = True,
    ) -> DataFrame:
        if strategy == "auto":
            strategy = (
                "expression" if len(self.merges) < _EXPR_MERGE_MAX else "joined"
            )
        merges = [tuple(m) for m in self.merges]
        if strategy == "expression":
            return bpe_encode(
                docs, merges, text_col=text_col, id_col=id_col, out_col=out_col
            )
        if strategy == "joined":
            return bpe_encode_joined(
                docs,
                merges,
                text_col=text_col,
                id_col=id_col,
                out_col=out_col,
                chunk=chunk,
                broadcast=broadcast,
            )
        raise ValueError(
            f"strategy must be 'auto', 'expression', or 'joined'; got {strategy!r}"
        )

    def encode_ids(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        out_col: str = "bpe_ids",
        strategy: str = "auto",
        chunk: int = 64,
        broadcast: bool = True,
        unknown_id: int = -1,
    ) -> DataFrame:
        """Encode each document to INT TOKEN IDS per :meth:`vocab` order —
        what a pretraining pipeline actually shards (int arrays, not symbol
        strings).

        The execution shape is :meth:`encode`'s (same ``strategy``
        dispatch), then the symbol array maps through the vocabulary as a
        broadcast plan-literal map inside ``F.transform`` — zero extra
        shuffle, zero Python workers.  Symbols outside the vocabulary
        (characters that never appear in any merge pair — possible for
        rare characters under a small merge table) get ``unknown_id``
        (default -1), the explicit UNK contract; ids round-trip to symbols
        via ``vocab()[id]`` for every id >= 0 (test-asserted).  NULL text
        stays NULL, matching :meth:`encode`.

        Plan note: on the joined path the map applies RIGHT AFTER
        segmentation — once per DISTINCT word, vocabulary-sized work
        regardless of corpus token volume — as a plan-literal
        ``from_json`` map up to ``_ID_MAP_LITERAL_MAX`` symbols (262k —
        every published tokenizer vocabulary; flat plan cost, measured)
        and as a broadcast JOIN on the exploded segmentation past that
        (the bound is closure SIZE, not plan cost — see the constant's
        comment).  On the expression path (small merge
        tables by dispatch, hence small vocabularies) it applies per
        token occurrence, matching that form's O(tokens) shape."""
        vocab = self.vocab()

        if strategy == "auto":
            strategy = (
                "expression" if len(self.merges) < _EXPR_MERGE_MAX else "joined"
            )
        merges = [tuple(m) for m in self.merges]

        import json

        # The literal-map form is gated on BOTH entry count and the
        # serialized size of the JSON string it ships in every task
        # closure — 262k LONG symbols can blow the byte bound while
        # passing the count bound (see _ID_MAP_LITERAL_MAX_BYTES).
        id_map_json = None
        byte_gate_tripped = False
        if len(vocab) <= _ID_MAP_LITERAL_MAX:
            id_map_json = json.dumps(dict((s, i) for i, s in enumerate(vocab)))
            if len(id_map_json) > _ID_MAP_LITERAL_MAX_BYTES:
                byte_gate_tripped = True
        if strategy == "joined" and (id_map_json is None or byte_gate_tripped):
            def map_ids_rel(seg: DataFrame) -> DataFrame:
                vocab_df = seg.sparkSession.createDataFrame(
                    [(s, i) for i, s in enumerate(vocab)],
                    "__sym string, __sid int",
                )
                return (
                    seg.select("word", F.posexplode("syms").alias("__p", "__sym"))
                    .join(F.broadcast(vocab_df), "__sym", "left")
                    .groupBy("word")
                    .agg(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    "__p",
                                    F.coalesce("__sid", F.lit(unknown_id))
                                    .cast("int")
                                    .alias("__sid"),
                                )
                            )
                        ).alias("__a")
                    )
                    .select(
                        "word",
                        F.transform("__a", lambda x: x["__sid"]).alias("syms"),
                    )
                )

            return bpe_encode_joined(
                docs,
                merges,
                text_col=text_col,
                id_col=id_col,
                out_col=out_col,
                chunk=chunk,
                broadcast=broadcast,
                seg_transform=map_ids_rel,
            )

        # One from_json literal, not create_map: 2 x |vocab| literal
        # expressions cost quadratic plan work (the measured 4096 knee);
        # the json form is a 2-node expression Catalyst evaluates once,
        # flat to 262k entries (see _ID_MAP_LITERAL_MAX).  A forced
        # strategy='expression' keeps the literal even past the gates —
        # that path has no join fallback and its dispatch contract is
        # small merge tables.
        if id_map_json is None:
            id_map_json = json.dumps(dict((s, i) for i, s in enumerate(vocab)))
        id_map = F.from_json(F.lit(id_map_json), "map<string,int>")

        def to_ids(syms: Column) -> Column:
            return F.transform(
                syms,
                lambda s: F.coalesce(id_map[s], F.lit(unknown_id)).cast("int"),
            )

        if strategy == "joined":
            return bpe_encode_joined(
                docs,
                merges,
                text_col=text_col,
                id_col=id_col,
                out_col=out_col,
                chunk=chunk,
                broadcast=broadcast,
                syms_transform=to_ids,
            )
        sym_encoded = self.encode(
            docs,
            text_col=text_col,
            id_col=id_col,
            out_col="__syms",
            strategy=strategy,
            chunk=chunk,
            broadcast=broadcast,
        )
        return sym_encoded.select(
            id_col,
            to_ids(F.col("__syms")).alias(out_col),
        )

    def vocab(self) -> list[str]:
        """Subword vocabulary implied by the merge table: base symbols plus
        one merged symbol per rank, in merge order after the (sorted) base
        characters — the id assignment real BPE tokenizers publish.

        Distinct merge ranks can concatenate to the SAME string (('a','bc')
        and ('ab','c') both yield 'abc', reachable from different word
        contexts); the id belongs to the FIRST occurrence and later
        duplicates are dropped, so every symbol has exactly one id —
        without this, ``encode_ids``'s literal-map path would silently
        bind the duplicate to the wrong id and its join path would
        duplicate exploded rows."""
        base: set[str] = {END_OF_WORD}
        for left, right in self.merges:
            base.update(_base_chars(left))
            base.update(_base_chars(right))
        out = sorted(base)
        seen = set(out)
        for left, right in self.merges:
            sym = left + right
            if sym not in seen:
                seen.add(sym)
                out.append(sym)
        return out

    def save(self, path: str) -> None:
        """JSON artifact (version + merge list) — engine-independent."""
        with open(path, "w") as f:
            json.dump(
                {"format": "bpe-merges", "version": 1,
                 "merges": [list(m) for m in self.merges]},
                f,
            )

    @staticmethod
    def load(path: str) -> "BpeTokenizer":
        with open(path) as f:
            obj = json.load(f)
        if obj.get("format") != "bpe-merges":
            raise ValueError(f"not a BPE merge artifact: {path}")
        return BpeTokenizer(tuple(tuple(m) for m in obj["merges"]))


def _base_chars(sym: str) -> list[str]:
    """Base characters of a (possibly merged) symbol, treating the
    end-of-word marker as atomic."""
    body = sym[: -len(END_OF_WORD)] if sym.endswith(END_OF_WORD) else sym
    out = list(body)
    if sym.endswith(END_OF_WORD):
        out.append(END_OF_WORD)
    return out


def fit_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    rematerialize_every: int = 24,
) -> BpeTokenizer:
    """Train and wrap: :func:`train_bpe` -> :class:`BpeTokenizer`."""
    return BpeTokenizer(
        tuple(
            train_bpe(
                docs, n_merges, text_col=text_col,
                rematerialize_every=rematerialize_every,
            )
        )
    )
