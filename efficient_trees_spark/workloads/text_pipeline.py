"""Text-analysis workloads on the ``documents`` table, oracle-checked.

Each DuckDB oracle re-implements the exact expression contract of
``functions/text.py`` (same tokenization regex, same tie-breaks, same
rounding) so value-hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_trees_spark.functions import text
from efficient_trees_spark.workloads.base import REGISTRY, load, workload

# DuckDB twins of the tokenization contract in functions/text.py
_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_TOKS = f"list_filter(string_split({_NORM}, ' '), t -> t != '')"


def _sw_array(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + type-token ratio per document — pure expression
    plan, no shuffle, scales linearly with the corpus.  Registered via
    ``text_doc_profile``; kept callable for bench.py."""
    docs = load(spark, sf_dir, "documents")
    toks = F.col("__toks")
    return docs.select(
        "doc_id", "text", text.tokens("text").alias("__toks")
    ).select(
        "doc_id",
        text.token_count("text", toks=toks).alias("n_tokens"),
        text.char_count("text").alias("n_chars"),
        F.round(text.distinct_token_ratio("text", toks=toks), 9).alias("distinct_ratio"),
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score (length band, lexical diversity, alpha share,
    stopword presence) — the cheap pre-filter stage.  Registered via
    ``text_doc_profile``."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "text", text.tokens("text").alias("__toks")
    ).select(
        "doc_id",
        text.quality_score("text", toks=F.col("__toks")).alias("quality"),
    )


def _lang_id_oracle_case() -> str:
    """Nested CASE replicating lang_id()'s forward/strict-> fold exactly."""
    langs = sorted(text.LANG_STOPWORDS.items())
    score = {
        lang: f"len(list_filter({_TOKS}, t -> list_contains({_sw_array(words)}, t)))"
        for lang, words in langs
    }
    # iterative fold: best = 'und', best_score = 0
    best_expr, best_score_expr = "'und'", "0"
    for lang, _ in langs:
        s = score[lang]
        best_expr = f"(CASE WHEN {s} > {best_score_expr} THEN '{lang}' ELSE {best_expr} END)"
        best_score_expr = f"(CASE WHEN {s} > {best_score_expr} THEN {s} ELSE {best_score_expr} END)"
    return best_expr


# Unigram-LM leg: corpus-fit add-alpha(0.5) unigram, per-doc mean token
# log-prob, averaged per predicted language.  ln() may differ by an ulp
# between the JVM and libm, so the per-lang average is rounded to 6 dp on
# both sides.
_LM_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS}) AS token FROM documents
    ),
    counts AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
    totals AS (SELECT sum(n) AS total, count(*) AS vocab FROM counts),
    scored AS (
        SELECT tok.doc_id,
               ln((c.n + 0.5) / (totals.total + 0.5 * (totals.vocab + 1))) AS lp
        FROM tok JOIN counts c USING (token) CROSS JOIN totals
    ),
    -- LEFT JOIN from documents: zero-token docs must stay in the per-lang
    -- counts with a NULL mean (matching the Spark side, which left-joins
    -- scores back to all docs); avg() ignores the NULLs on both engines.
    perdoc AS (
        SELECT d.doc_id, s.mean_lp
        FROM documents d
        LEFT JOIN (
            SELECT doc_id, avg(lp) AS mean_lp FROM scored GROUP BY 1
        ) s USING (doc_id)
    ),
    langs AS (SELECT doc_id, {_lang_id_oracle_case()} AS lang_pred FROM documents)
    SELECT lang_pred, count(*) AS n, round(avg(mean_lp), 6) AS avg_logprob
    FROM perdoc JOIN langs USING (doc_id)
    GROUP BY lang_pred
"""


# ------------------------------------------------ BPE tokenizer-training legs
# DuckDB twin of operators/bpe.py: same two-space symbol representation,
# same literal-replace merge semantics (both engines' replace() scans
# forward from the end of the previous replacement), same
# (count DESC, pair ASC) binary-collation tie-break.  Each merge round is
# one MATERIALIZED CTE chain link — materialization keeps the n-round
# chain linear instead of exponentially re-inlining the vocabulary scan.
_BPE_MERGES = 8
_BPE_TOP_PAIRS = 15
_BPE_TOP_TOKENS = 20
_BPE_SYM0 = "'  ' || regexp_replace(word, '(.)', '\\1  ', 'g') || '</w>  '"


def _bpe_pair_rows(m: str) -> str:
    """Adjacent-pair rows (pair, freq) from the symbol column of CTE ``m``."""
    return (
        "SELECT l[i] || ' ' || l[i+1] AS pair, freq FROM ("
        "SELECT l, unnest(range(1, len(l))) AS i, freq FROM ("
        f"SELECT list_filter(string_split(s, '  '), x -> x != '') AS l, freq "
        f"FROM {m}))"
    )


def _bpe_oracle_parts() -> tuple[str, str]:
    """(WITH-clause body, UNION-ALL legs) for the BPE suite legs."""
    ctes = [
        "bpe_w AS MATERIALIZED (SELECT tok AS word, count(*) AS freq FROM "
        f"(SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY 1)",
        f"bpe_m0 AS MATERIALIZED (SELECT word, freq, {_BPE_SYM0} AS s FROM bpe_w)",
    ]
    for k in range(_BPE_MERGES):
        ctes.append(
            f"bpe_p{k} AS MATERIALIZED (SELECT pair, CAST(sum(freq) AS BIGINT) "
            f"AS cnt FROM ({_bpe_pair_rows(f'bpe_m{k}')}) GROUP BY 1)"
        )
        ctes.append(
            f"bpe_b{k} AS MATERIALIZED (SELECT pair, cnt FROM bpe_p{k} "
            "ORDER BY cnt DESC, pair LIMIT 1)"
        )
        ctes.append(
            f"bpe_m{k + 1} AS MATERIALIZED (SELECT word, freq, replace(s, "
            "(SELECT ' ' || string_split(pair, ' ')[1] || '  ' || "
            f"string_split(pair, ' ')[2] || ' ' FROM bpe_b{k}), "
            "(SELECT ' ' || string_split(pair, ' ')[1] || "
            f"string_split(pair, ' ')[2] || ' ' FROM bpe_b{k})) AS s "
            f"FROM bpe_m{k})"
        )
    merges_leg = " UNION ALL ".join(
        f"SELECT 'bpe_merge' AS kind, pair AS key, CAST({k + 1} AS BIGINT) AS n, "
        f"CAST(NULL AS DOUBLE) AS avg_logprob FROM bpe_b{k}"
        for k in range(_BPE_MERGES)
    )
    pairs_leg = f"""
        SELECT 'bpe_pair' AS kind, pair AS key, cnt AS n,
               CAST(NULL AS DOUBLE) AS avg_logprob
        FROM (SELECT pair, cnt,
                     row_number() OVER (ORDER BY cnt DESC, pair) AS rn
              FROM bpe_p0)
        WHERE rn <= {_BPE_TOP_PAIRS}
    """
    vocab_leg = f"""
        SELECT 'bpe_token' AS kind, sym AS key, total AS n,
               CAST(NULL AS DOUBLE) AS avg_logprob
        FROM (SELECT sym, CAST(sum(freq) AS BIGINT) AS total,
                     row_number() OVER
                         (ORDER BY CAST(sum(freq) AS BIGINT) DESC, sym) AS rn
              FROM (SELECT unnest(list_filter(string_split(s, '  '),
                                              x -> x != '')) AS sym, freq
                    FROM bpe_m{_BPE_MERGES})
              GROUP BY sym)
        WHERE rn <= {_BPE_TOP_TOKENS}
    """
    joined_leg = vocab_leg.replace("'bpe_token'", "'bpe_token_joined'")
    # Token-ID leg: re-derive the BpeTokenizer.vocab() id assignment —
    # base symbols (every character of any merge-pair symbol, '</w>'
    # atomic, plus '</w>' itself) sorted binary-collation first, then one
    # merged symbol per round in merge order — and count corpus token ids
    # under it.  Symbols outside the vocabulary (characters never touched
    # by a merge) take the UNK id -1, exactly encode_ids' contract.
    pairs_union = " UNION ALL ".join(
        f"SELECT pair, {k} AS k FROM bpe_b{k}" for k in range(_BPE_MERGES)
    )
    ctes.append(
        "bpe_msyms AS MATERIALIZED (SELECT string_split(pair, ' ')[1] || "
        f"string_split(pair, ' ')[2] AS sym, k FROM ({pairs_union}))"
    )
    ctes.append(
        "bpe_base AS MATERIALIZED (SELECT DISTINCT c AS sym FROM ("
        "SELECT unnest(string_split(CASE WHEN s LIKE '%</w>' "
        "THEN s[1:len(s)-4] ELSE s END, '')) AS c "
        f"FROM (SELECT unnest(string_split(pair, ' ')) AS s "
        f"FROM ({pairs_union})) "
        "UNION ALL SELECT '</w>') WHERE c != '')"
    )
    # First-occurrence dedup mirrors BpeTokenizer.vocab(): two merge ranks
    # concatenating to the same string keep the EARLIER rank's id.
    ctes.append(
        "bpe_vocab AS MATERIALIZED ("
        "SELECT sym, row_number() OVER (ORDER BY grp, k, sym) - 1 AS id "
        "FROM (SELECT sym, grp, k FROM ("
        "SELECT sym, grp, k, row_number() OVER "
        "(PARTITION BY sym ORDER BY grp, k) AS dup_rn "
        "FROM (SELECT sym, 0 AS grp, 0 AS k FROM bpe_base "
        "UNION ALL SELECT sym, 1 AS grp, k FROM bpe_msyms)) "
        "WHERE dup_rn = 1))"
    )
    ids_leg = f"""
        SELECT 'bpe_id' AS kind, CAST(id AS VARCHAR) AS key,
               CAST(sum(total) AS BIGINT) AS n,
               CAST(NULL AS DOUBLE) AS avg_logprob
        FROM (
            SELECT coalesce(v.id, -1) AS id, t.total
            FROM (SELECT sym, CAST(sum(freq) AS BIGINT) AS total
                  FROM (SELECT unnest(list_filter(string_split(s, '  '),
                                                  x -> x != '')) AS sym, freq
                        FROM bpe_m{_BPE_MERGES})
                  GROUP BY sym) t
            LEFT JOIN bpe_vocab v USING (sym)
        )
        GROUP BY id
    """
    legs = (
        f"{merges_leg} UNION ALL {pairs_leg} UNION ALL {vocab_leg} "
        f"UNION ALL {joined_leg} UNION ALL {ids_leg}"
    )
    return ", ".join(ctes), legs


_BPE_CTES, _BPE_LEGS = _bpe_oracle_parts()


@workload(
    "text_lang_id",
    oracle=f"""
        WITH {_BPE_CTES}
        SELECT 'lang' AS kind, lang_pred AS key, n,
               CAST(NULL AS DOUBLE) AS avg_logprob
        FROM (
            SELECT {_lang_id_oracle_case()} AS lang_pred, count(*) AS n
            FROM documents
            GROUP BY 1
        )
        UNION ALL
        SELECT 'lm', lang_pred, n, avg_logprob FROM ({_LM_ORACLE})
        UNION ALL {_BPE_LEGS}
    """,
    description="Corpus-level text-signal suite: kind='lang' is "
    "stopword-overlap language ID (argmax with lexicographic tie-break) "
    "aggregated to a distribution; kind='lm' is the statistical-LM quality "
    "signal (operators/lm.py, CCNet-style bucketing first pass: corpus-fit "
    "add-alpha unigram, per-doc mean token log-prob) averaged per predicted "
    "language — the full fit + score re-derived in SQL; "
    "kind='bpe_pair'/'bpe_merge'/'bpe_token'/'bpe_token_joined'/'bpe_id' "
    "are distributed BPE tokenizer "
    "training (operators/bpe.py — word-frequency-compressed, one corpus "
    "shuffle, vocabulary-sized merge rounds): the initial top pair counts, "
    f"the full {_BPE_MERGES}-round merge table, the trained subword "
    "vocabulary's top token frequencies, and the int-token-id distribution "
    "under BpeTokenizer.vocab() order (UNK=-1) — every merge round AND the "
    "id assignment re-derived in SQL via a materialized CTE chain",
    tags=("text", "suite", "bpe"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from efficient_trees_spark.operators import bpe, lm
    from efficient_trees_spark.sources.io import fan_out_small_input

    # Shared fan-out for every leg (cluster no-op): the lang leg's stopword
    # scoring and the BPE word-frequency pass tokenized a single-split
    # local scan on one core (r11); lm already fans internally (now a
    # no-op on this pre-fanned relation).  All legs' aggregates are exact
    # integers / pinned orders — results partition-invariant.
    docs = fan_out_small_input(load(spark, sf_dir, "documents"))
    lang = (
        docs.select(text.tokens("text").alias("__toks"))
        .select(text.lang_id(F.lit(""), toks=F.col("__toks")).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("lang").alias("kind"),
            "key",
            "n",
            F.lit(None).cast("double").alias("avg_logprob"),
        )
    )
    model = lm.fit_unigram(docs)
    scores = lm.score_unigram_logprob(docs, model)
    langs = docs.select(
        "doc_id",
        text.lang_id(F.lit(""), toks=text.tokens("text")).alias("key"),
    )
    lm_leg = (
        scores.join(langs, "doc_id")
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("mean_logprob"), 6).alias("avg_logprob"),
        )
        .select(F.lit("lm").alias("kind"), "key", "n", "avg_logprob")
    )

    # BPE legs — train once, derive all three from the shared vocab.
    vocab = bpe.word_frequencies(docs)
    merges = bpe.train_bpe(docs, _BPE_MERGES, vocab=vocab)
    null_lp = F.lit(None).cast("double").alias("avg_logprob")
    pairs_leg = (
        bpe.pair_counts(vocab.withColumn("syms", bpe.initial_symbols("word")))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(_BPE_TOP_PAIRS)
        .select(
            F.lit("bpe_pair").alias("kind"),
            F.col("pair").alias("key"),
            F.col("cnt").cast("long").alias("n"),
            null_lp,
        )
    )
    merges_leg = spark.createDataFrame(
        [("bpe_merge", f"{l} {r}", i + 1, None) for i, (l, r) in enumerate(merges)],
        "kind string, key string, n long, avg_logprob double",
    )
    final_syms = vocab.withColumn(
        "syms", bpe.segment_expr(F.col("word"), merges)
    )
    vocab_leg = (
        final_syms.select(F.explode("syms").alias("sym"), "freq")
        .groupBy("sym")
        .agg(F.sum("freq").cast("long").alias("total"))
        .orderBy(F.desc("total"), F.asc("sym"))
        .limit(_BPE_TOP_TOKENS)
        .select(
            F.lit("bpe_token").alias("kind"),
            F.col("sym").alias("key"),
            F.col("total").alias("n"),
            null_lp,
        )
    )
    # Corpus-encode leg through bpe_encode_joined (distinct-word broadcast
    # join + per-doc reassembly — the large-merge-table production path):
    # per-symbol occurrence counts over the encoded corpus equal the
    # freq-weighted vocabulary totals, so the SQL twin is the vocab leg's —
    # but the Spark execution path is entirely different, oracle-checking
    # the join encode end-to-end on real documents.
    joined_vocab_leg = (
        bpe.bpe_encode_joined(docs, merges, chunk=3)  # force multi-chunk
        .select(F.explode("bpe_tokens").alias("sym"))
        .groupBy("sym")
        .agg(F.count(F.lit(1)).cast("long").alias("total"))
        .orderBy(F.desc("total"), F.asc("sym"))
        .limit(_BPE_TOP_TOKENS)
        .select(
            F.lit("bpe_token_joined").alias("kind"),
            F.col("sym").alias("key"),
            F.col("total").alias("n"),
            null_lp,
        )
    )
    # Token-ID leg: the pretraining deliverable (int ids per vocab() order,
    # UNK = -1 for symbols outside the merge-derived vocabulary), counted
    # over the encoded corpus; the SQL twin re-derives the full id
    # assignment from the merge CTEs.
    ids_leg = (
        bpe.BpeTokenizer(tuple(merges))
        .encode_ids(docs)
        .select(F.explode("bpe_ids").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.lit("bpe_id").alias("kind"),
            F.col("id").cast("string").alias("key"),
            "n",
            null_lp,
        )
    )
    return (
        lang.unionByName(lm_leg)
        .unionByName(pairs_leg)
        .unionByName(merges_leg)
        .unionByName(vocab_leg)
        .unionByName(joined_vocab_leg)
        .unionByName(ids_leg)
    )


def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text) + order-insensitive bag
    fingerprint (md5 of sorted distinct tokens).  Registered via
    ``text_doc_profile``."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.content_fingerprint("text").alias("content_fp"),
        text.bag_fingerprint("text").alias("bag_fp"),
    )


# ------------------------------------------------ composed curation pipeline

_QUALITY = f"""
    round(0.3 * (CASE WHEN len({_TOKS}) < 5 THEN len({_TOKS}) / 10.0
                 ELSE least(1.0, len({_TOKS}) / 50.0) END)
        + 0.3 * (CASE WHEN len({_TOKS}) > 0
                 THEN CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS})
                 ELSE 0.0 END)
        + 0.2 * (CASE WHEN length(lower(text)) > 0
                 THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                      / length(lower(text))
                 ELSE 0.0 END)
        + 0.2 * least(1.0, (CASE WHEN len({_TOKS}) > 0
                 THEN CAST(len(list_filter({_TOKS},
                      t -> list_contains(__SW__, t))) AS DOUBLE) / len({_TOKS})
                 ELSE 0.0 END) * 5), 9)
"""


@workload(
    "docs_curation_pipeline",
    oracle=None,  # set below — needs the lang-ID CASE built at import time
    description="The end-to-end training-corpus curation pass, composed from "
    "the pipeline's own stages: quality-score filter → exact dedup keyed on "
    "content fingerprint (canonical = min doc_id, payload carried by min_by "
    "so there is no join-back) → per-language corpus stats. Two shuffles "
    "total for the whole pipeline (dedup groupBy, language groupBy); every "
    "stage before them is a pure projection over the scan",
    tags=("text", "dedup", "bench"),
)
def docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from efficient_trees_spark.sources.io import fan_out_small_input

    # Fan out the few-split local scan before the scoring projection
    # (cluster no-op, splits >> cores there): tokenize + quality + lang-ID
    # are the pipeline's entire map-side cost and ran 1-of-32 cores on the
    # single-split sf0.1 documents parquet (r11; measured 2.75 -> 1.4 s,
    # outputs bit-identical at sf0.001/0.01/0.1 — every aggregate here is
    # exact-integer or a deterministic min_by total order, and the avg is
    # unchanged because partial-agg inputs are identical rows).
    docs = fan_out_small_input(load(spark, sf_dir, "documents"))
    # Tokenize/normalize ONCE as named columns; every stat reuses them
    # (Catalyst won't share the regexp across separate expression trees —
    # this binding is a measured 2.3x on the projection stage).
    bound = docs.select(
        "doc_id",
        "text",
        text.tokens("text").alias("__toks"),
        text.normalized("text").alias("__norm"),
    )
    toks = F.col("__toks")
    score_fields = [
        F.round(text.quality_score("text", toks=toks), 9).alias("quality"),
        text.token_count("text", toks=toks).alias("n_tokens"),
        text.content_fingerprint("text", norm=F.col("__norm")).alias("fp"),
        text.lang_id("text", toks=toks).alias("lang"),
    ]
    # The scored fields go through a single-element explode(array(struct))
    # — semantically the identity, and a PUSHDOWN BARRIER (r12): a filter
    # on generator output cannot be pushed below the Generate.  Without
    # it, PushDownPredicates substitutes quality/n_tokens into the filter
    # condition (re-inlining the tokenizer ~6x per row — project
    # collapse's expensive-expression guard does not apply to filter
    # substitution) and then pushes the filter below the fan-out Exchange,
    # so the whole scoring pass ran on the source's single split.  The
    # r12 before-plan shows exactly that shape; with the barrier the
    # tokenize/score projection runs once per row, post-fan-out.
    # Interleaved A/B at sf0.1: 1.156 -> 0.880 s median, rows identical.
    scored = bound.select(
        "doc_id", F.explode(F.array(F.struct(*score_fields))).alias("__s")
    ).select("doc_id", "__s.*")
    kept = scored.filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 5))
    payload = F.struct("lang", "n_tokens", "quality")
    canonical = kept.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by(payload, "doc_id").alias("p"),
    )
    return (
        canonical.groupBy(F.col("p.lang").alias("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("p.n_tokens").alias("total_tokens"),
            F.round(F.avg("p.quality"), 6).alias("avg_quality"),
        )
    )


# The oracle mirrors the Spark pipeline stage by stage: same quality formula
# (rounded to 9 dp BEFORE the >= 0.5 filter in both engines, so boundary docs
# route identically), same min-doc_id canonicalization via min_by.
REGISTRY["docs_curation_pipeline"].oracle = f"""
    WITH scored AS (
        SELECT doc_id,
               {_QUALITY.replace("__SW__", _sw_array(text.LANG_STOPWORDS["en"]))} AS quality,
               len({_TOKS}) AS n_tokens,
               md5({_NORM}) AS fp,
               {_lang_id_oracle_case()} AS lang
        FROM documents
    ),
    kept AS (
        SELECT * FROM scored WHERE quality >= 0.5 AND n_tokens >= 5
    ),
    canonical AS (
        SELECT fp, min(doc_id) AS doc_id,
               min_by(lang, doc_id) AS lang,
               min_by(n_tokens, doc_id) AS n_tokens,
               min_by(quality, doc_id) AS quality
        FROM kept GROUP BY fp
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(quality), 6) AS avg_quality
    FROM canonical GROUP BY lang
"""


_SUBWORD_RE_SQL = "[a-zA-Z]{1,12}|[0-9]|[^a-zA-Z0-9\\s]"


def text_subword_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword token counting (letter chunks <=12 chars, single
    digits, single punctuation) + fertility vs whitespace words — the
    corpus-budgeting estimate a real tokenizer count would refine.
    Registered via ``text_doc_profile``."""
    docs = load(spark, sf_dir, "documents")
    n_sub = text.subword_count("text")
    n_words = text.token_count("text")
    return docs.select(
        "doc_id",
        n_sub.alias("n_subwords"),
        n_words.alias("n_words"),
        F.round(n_sub.cast("double") / F.greatest(n_words, F.lit(1)), 9).alias("fertility"),
    )


def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) rolling-hash fingerprints: min-hash of each window
    of 4 consecutive 8-char-gram hashes — near-identical docs share most
    fingerprints under local edits.  Pure collection expressions, no
    shuffle, no UDF.  Registered via ``text_doc_profile``."""
    docs = load(spark, sf_dir, "documents")
    fp = text.winnowing_fingerprints("text", k=8, w=4)
    return docs.select(
        "doc_id",
        F.size(fp).alias("n_fp"),
        F.array_join(fp, ",").alias("fps_str"),
    )


# The quality formula over a pre-bound token list (same arithmetic as
# ``_QUALITY``, which inlines the tokenizer on every reference).
_QUALITY_TOKS = """
    round(0.3 * (CASE WHEN len(toks) < 5 THEN len(toks) / 10.0
                 ELSE least(1.0, len(toks) / 50.0) END)
        + 0.3 * (CASE WHEN len(toks) > 0
                 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                 ELSE 0.0 END)
        + 0.2 * (CASE WHEN length(lower(text)) > 0
                 THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                      / length(lower(text))
                 ELSE 0.0 END)
        + 0.2 * least(1.0, (CASE WHEN len(toks) > 0
                 THEN CAST(len(list_filter(toks,
                      t -> list_contains(__SW__, t))) AS DOUBLE) / len(toks)
                 ELSE 0.0 END) * 5), 9)
"""


def _contact_text() -> "F.Column":
    """Deterministic PII-bearing text derived from doc_id — the corpus
    itself contains no digits, so PII evidence is synthesized inside the
    query (both engines derive the identical string, then each runs its own
    regex engine over it: Java regex here, RE2 in the DuckDB twin — the
    strict value-hash equality is exactly the cross-engine semantics check).
    doc_id-mod gates vary which PII kinds each doc carries, so the counts
    and the redacted md5 are discriminating, not constant."""
    did = F.col("doc_id")
    pad4 = F.lpad((did % 10000).cast("string"), 4, "0")
    email = F.when(
        did % 2 == 0,
        F.concat(F.lit("user"), did.cast("string"), F.lit("@example.com ")),
    ).otherwise(F.lit(""))
    ipv4 = F.when(
        did % 3 == 0,
        F.concat(F.lit("src 10."), (did % 256).cast("string"), F.lit(".0.1 ")),
    ).otherwise(F.lit(""))
    ssn = F.when(
        did % 5 == 0, F.concat(F.lit("ssn 123-45-"), pad4, F.lit(" "))
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 4 == 0, F.concat(F.lit("tel +1 (555) 123-"), pad4, F.lit(" "))
    ).otherwise(F.lit(""))
    return F.concat(email, ipv4, ssn, phone, F.col("text"))


@workload(
    "text_doc_profile",
    oracle=None,  # set below (needs the stopword array literal)
    description="Per-document text-analysis profile — token counting + "
    "type-token ratio, heuristic quality score (length band, lexical "
    "diversity, alpha share, stopword presence), content + bag "
    "fingerprints, BPE-ish subword count with fertility, winnowing (MOSS) "
    "rolling-hash fingerprints, PII detection + redaction over synthesized "
    "doc_id-keyed contact text (per-kind counts and the redacted md5 — "
    "Java-regex vs RE2 twin), Gopher-style repetition signals (duplicate-"
    "line fraction, top-bigram coverage), and token-window chunking "
    "(32-token chunks, 8 overlap: chunk count + first-chunk md5) — in ONE "
    "projection that tokenizes/normalizes once and reuses the bound "
    "columns (measured 2.3x vs naive re-tokenization).  Pure Catalyst "
    "expressions: no UDF, no shuffle, scales linearly with the corpus",
    tags=("text", "dedup", "suite"),
)
def text_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bound = docs.select(
        "doc_id",
        "text",
        text.tokens("text").alias("__toks"),
        text.normalized("text").alias("__norm"),
        _contact_text().alias("__contact"),
    )
    toks = F.col("__toks")
    n_sub = text.subword_count("text")
    win = text.winnowing_fingerprints("text", k=8, w=4)
    pii = text.pii_counts(F.col("__contact"))
    chunks = text.token_chunks("text", chunk_tokens=32, overlap=8, toks=toks)
    # multi-line view for the duplicate-line signal: the corpus is
    # single-line, so derive lines as consecutive token PAIRS (discriminating
    # on this vocabulary — ~36% of docs repeat a pair; splitting on filler
    # words left every line unique).  Guard the sequence: sequence(1, 0) is
    # DESCENDING in Spark, not empty.
    n_pairs = F.floor(F.size(toks) / 2).cast("int")
    pair_idx = F.when(n_pairs >= 1, F.sequence(F.lit(1), n_pairs)).otherwise(
        F.array().cast("array<int>")
    )
    lines = F.array_join(
        F.transform(
            pair_idx,
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i * 2 - 1), F.element_at(toks, i * 2)
            ),
        ),
        "\n",
    )
    return bound.select(
        "doc_id",
        text.token_count("text", toks=toks).alias("n_tokens"),
        text.char_count("text").alias("n_chars"),
        F.round(text.distinct_token_ratio("text", toks=toks), 9).alias("distinct_ratio"),
        text.quality_score("text", toks=toks).alias("quality"),
        text.content_fingerprint("text", norm=F.col("__norm")).alias("content_fp"),
        text.bag_fingerprint("text").alias("bag_fp"),
        n_sub.alias("n_subwords"),
        F.round(
            n_sub.cast("double")
            / F.greatest(text.token_count("text", toks=toks), F.lit(1)),
            9,
        ).alias("fertility"),
        F.size(win).alias("n_fp"),
        F.array_join(win, ",").alias("fps_str"),
        pii.getField("email").alias("pii_email"),
        pii.getField("ipv4").alias("pii_ipv4"),
        pii.getField("ssn").alias("pii_ssn"),
        pii.getField("phone").alias("pii_phone"),
        F.md5(F.encode(text.redact_pii(F.col("__contact")), "utf-8")).alias(
            "redacted_md5"
        ),
        F.round(text.duplicate_line_fraction(lines), 9).alias("dup_line_frac"),
        F.round(text.top_bigram_fraction("text", toks=toks), 9).alias(
            "top_bigram_frac"
        ),
        F.size(chunks).alias("n_chunks"),
        # F.get is 0-based and NULL-safe on empty arrays (ANSI element_at throws)
        F.coalesce(
            F.md5(F.encode(F.get(chunks, 0).getField("chunk_text"), "utf-8")),
            F.lit(""),
        ).alias("chunk0_md5"),
    )


# RE2 twins of the Java-regex PII patterns (functions/text.py): DuckDB's
# regexp functions are RE2, which has no lookarounds — on the synthesized
# contact corpus (space-delimited PII islands, digit-free base text) the
# boundary guards are vacuous, so the plain shapes match the identical
# spans.  The strict value-hash equality of counts + redacted md5 IS the
# cross-engine proof of that equivalence.
_EMAIL_RE2 = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE2 = r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}"
_SSN_RE2 = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
_PHONE_RE2 = r"\+?[0-9]{1,3}[-. (]{0,2}[0-9]{3}[-. )]{0,2}[0-9]{3}[-. ]?[0-9]{2,4}"

# doc_id-keyed contact text — MUST mirror _contact_text() byte for byte
_CONTACT_SQL = """
    (CASE WHEN doc_id % 2 = 0
          THEN 'user' || CAST(doc_id AS VARCHAR) || '@example.com ' ELSE '' END)
    || (CASE WHEN doc_id % 3 = 0
          THEN 'src 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 ' ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0
          THEN 'ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' ELSE '' END)
    || (CASE WHEN doc_id % 4 = 0
          THEN 'tel +1 (555) 123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' ELSE '' END)
    || text
"""

_REDACT_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(contact, "
    f"'{_EMAIL_RE2}', '<email>', 'g'), "
    f"'{_IPV4_RE2}', '<ipv4>', 'g'), "
    f"'{_SSN_RE2}', '<ssn>', 'g'), "
    f"'{_PHONE_RE2}', '<phone>', 'g')"
)

# multi-line view for the duplicate-line signal: consecutive token pairs
# (mirrors the Spark side's pair-line construction; pairs are non-empty and
# pre-trimmed, so the function's trim/drop-empty normalization is identity)
_LINES_SQL = (
    "list_transform(range(1, CAST(len({t})//2 AS BIGINT) + 1), "
    "i -> {t}[CAST(2*i-1 AS INT)] || ' ' || {t}[CAST(2*i AS INT)])"
).format(t=_TOKS)

REGISTRY["text_doc_profile"].oracle = f"""
    WITH base AS (
        SELECT doc_id, text, {_NORM} AS norm, {_TOKS} AS toks,
               {_CONTACT_SQL} AS contact,
               {_LINES_SQL} AS lines
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_transform(range(1, CAST(greatest(length(norm) - 7, 1) AS BIGINT) + 1),
                   i -> substring(md5(substring(norm, CAST(i AS INT), 8)), 1, 12)) AS gh
        FROM base
    ),
    s AS (
        SELECT doc_id,
               list_sort(list_distinct(
                   list_transform(range(1, CAST(greatest(len(gh) - 3, 1) AS BIGINT) + 1),
                       j -> list_min(gh[CAST(j AS INT):CAST(j + 3 AS INT)])))) AS fps
        FROM g
    ),
    prof AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               length(text) AS n_chars,
               round(CASE WHEN len(toks) > 0
                     THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                     ELSE 0.0 END, 9) AS distinct_ratio,
               {_QUALITY_TOKS.replace("__SW__", _sw_array(text.LANG_STOPWORDS["en"]))} AS quality,
               md5(norm) AS content_fp,
               md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS bag_fp,
               len(regexp_extract_all(text, '{_SUBWORD_RE_SQL}')) AS n_subwords,
               round(CAST(len(regexp_extract_all(text, '{_SUBWORD_RE_SQL}')) AS DOUBLE)
                     / greatest(len(toks), 1), 9) AS fertility,
               len(regexp_extract_all(contact, '{_EMAIL_RE2}')) AS pii_email,
               len(regexp_extract_all(contact, '{_IPV4_RE2}')) AS pii_ipv4,
               len(regexp_extract_all(contact, '{_SSN_RE2}')) AS pii_ssn,
               len(regexp_extract_all(contact, '{_PHONE_RE2}')) AS pii_phone,
               md5({_REDACT_SQL}) AS redacted_md5,
               round(CASE WHEN len(lines) > 0
                     THEN CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines)
                     ELSE 0.0 END, 9) AS dup_line_frac,
               CASE WHEN len(toks) <= 0 THEN 0
                    ELSE 1 + CAST(ceil(greatest(len(toks) - 32, 0) / 24.0) AS INT)
               END AS n_chunks,
               CASE WHEN len(toks) > 0
                    THEN md5(array_to_string(toks[1:32], ' '))
                    ELSE '' END AS chunk0_md5
        FROM base
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, CAST(len(toks) AS BIGINT)),
                   i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])) AS g
        FROM base WHERE len(toks) >= 2
    ),
    bgc AS (
        SELECT doc_id, max(cnt) AS best
        FROM (SELECT doc_id, g, count(*) AS cnt FROM bg GROUP BY doc_id, g)
        GROUP BY doc_id
    )
    SELECT prof.*,
           round(CASE WHEN prof.n_tokens >= 2
                 THEN least(1.0, 2.0 * coalesce(bgc.best, 0) / prof.n_tokens)
                 ELSE 0.0 END, 9) AS top_bigram_frac,
           len(s.fps) AS n_fp, array_to_string(s.fps, ',') AS fps_str
    FROM prof
    JOIN s USING (doc_id)
    LEFT JOIN bgc USING (doc_id)
"""
