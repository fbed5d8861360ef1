"""Span-level exact substring dedup (dedup.duplicate_window_spans)."""

from pyspark.sql import functions as F

from efficient_trees_spark.operators.dedup import duplicate_window_spans

DOCS = [
    (1, "a b c d e f g h i j"),                # fully shared with doc 2
    (2, "x x a b c d e f g h i j y"),          # carries doc 1 verbatim inside
    (3, "p q r s t u v w"),                    # clean
    (4, "a b c d z z z g h i j k"),            # two disjoint shared spans
    (5, "m n o p m n o p"),                    # repeats ONLY within itself
    (6, "q"),                                  # shorter than the window
]


def _stats(spark, n=4, min_docs=2, repartition=None):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    if repartition:
        df = df.repartition(repartition)
    rows = duplicate_window_spans(df, "doc_id", "text", n=n, min_docs=min_docs).collect()
    return {r.doc_id: r for r in rows}


def test_shared_run_marks_maximal_span(spark):
    s = _stats(spark)
    # doc 1: all 7 of its 4-gram windows recur in doc 2 -> one span covering
    # every token.
    assert (s[1].dup_windows, s[1].n_spans, s[1].covered_tokens) == (7, 1, 10)
    assert s[1].dup_token_frac == 1.0
    # doc 2: the same 7 windows sit at starts 2..8 -> one merged span of 10
    # tokens out of 13.
    assert (s[2].dup_windows, s[2].n_spans, s[2].covered_tokens) == (7, 1, 10)
    assert s[2].dup_token_frac == round(10 / 13, 9)


def test_disjoint_shared_windows_stay_separate_spans(spark):
    s = _stats(spark)
    # doc 4 shares 'a b c d' (start 0) and 'g h i j' (start 7): two spans,
    # 8 covered tokens of 12.
    assert (s[4].dup_windows, s[4].n_spans, s[4].covered_tokens) == (2, 2, 8)
    assert s[4].dup_token_frac == round(8 / 12, 9)


def test_clean_and_short_docs_report_zero(spark):
    s = _stats(spark)
    for d in (3, 6):
        assert (s[d].dup_windows, s[d].n_spans, s[d].covered_tokens) == (0, 0, 0)
        assert s[d].dup_token_frac == 0.0
    assert s[6].n_tokens == 1  # short doc still present in the output


def test_within_doc_repetition_alone_does_not_mark(spark):
    # 'm n o p' repeats twice in doc 5 but in no OTHER doc: min_docs counts
    # DISTINCT documents, so nothing is flagged.
    s = _stats(spark)
    assert (s[5].dup_windows, s[5].covered_tokens) == (0, 0)


def test_every_input_doc_appears_once(spark):
    s = _stats(spark)
    assert sorted(s) == [1, 2, 3, 4, 5, 6]


def test_partitioning_invariance(spark):
    a = _stats(spark)
    b = _stats(spark, repartition=7)
    assert {k: tuple(v) for k, v in a.items()} == {k: tuple(v) for k, v in b.items()}


def test_no_self_join_of_the_corpus(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        duplicate_window_spans(df, "doc_id", "text", n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


# ----------------------------------------------------- strip (keep-first)


def _strip(spark, n=4, min_docs=2):
    from efficient_trees_spark.operators.dedup import strip_duplicate_spans

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = strip_duplicate_spans(df, "doc_id", "text", n=n, min_docs=min_docs).collect()
    return {r.doc_id: r for r in rows}


def test_strip_keeps_first_occurrence_and_removes_the_rest(spark):
    s = _strip(spark)
    # doc 1 is the lowest id containing every shared window: it keeps all.
    assert s[1].kept_text == "a b c d e f g h i j"
    assert s[1].removed_tokens == 0
    # doc 2 loses the embedded copy of doc 1, keeps its own frame.
    assert s[2].kept_text == "x x y"
    assert s[2].removed_tokens == 10
    # doc 4 loses both shared spans, keeps the middle + tail.
    assert s[4].kept_text == "z z z k"
    assert s[4].removed_tokens == 8


def test_strip_leaves_clean_and_within_doc_repeats_untouched(spark):
    s = _strip(spark)
    assert s[3].kept_text == "p q r s t u v w"
    assert s[5].kept_text == "m n o p m n o p"
    assert s[6].kept_text == "q"
    assert s[3].removed_tokens == s[5].removed_tokens == s[6].removed_tokens == 0


def test_corpus_keeps_exactly_one_copy_of_each_duplicated_span(spark):
    # After stripping, the shared run 'a b c d e f g h i j' must appear in
    # exactly one surviving document.
    s = _strip(spark)
    survivors = " | ".join(r.kept_text for r in s.values())
    assert survivors.count("a b c d e f g h i j") == 1


def test_chained_overlapping_windows_never_destroy_content(spark):
    # Regression: docs 'a b', 'a b c', 'b c' with n=2.  Window 'a b' keeps in
    # doc 1, 'b c' keeps in doc 2 — but doc 2's removal span for 'a b'
    # overlaps its OWN kept window 'b c'.  Kept-window intervals must be
    # protected from removal so 'b c' survives somewhere in the corpus.
    from efficient_trees_spark.operators.dedup import strip_duplicate_spans

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c"), (3, "b c")], "doc_id long, text string"
    )
    s = {r.doc_id: r for r in strip_duplicate_spans(df, n=2).collect()}
    assert s[1].kept_text == "a b"          # keeper of 'a b'
    assert s[2].kept_text == "b c"          # keeper of 'b c'; loses only 'a'
    assert s[3].kept_text == ""             # non-keeper of 'b c'
    survivors = " | ".join(r.kept_text for r in s.values())
    assert "a b" in survivors and "b c" in survivors


def test_null_text_docs_report_zero_not_null(spark):
    from efficient_trees_spark.operators.dedup import strip_duplicate_spans

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, None), (3, "a b c d")], "doc_id long, text string"
    )
    spans = {r.doc_id: r for r in duplicate_window_spans(df, n=2).collect()}
    assert (spans[2].n_tokens, spans[2].dup_windows, spans[2].dup_token_frac) == (0, 0, 0.0)
    stripped = {r.doc_id: r for r in strip_duplicate_spans(df, n=2).collect()}
    assert (stripped[2].n_tokens, stripped[2].kept_text, stripped[2].removed_tokens) == (0, "", 0)
