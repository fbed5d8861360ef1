"""PII detection/redaction: counts, typed placeholders, non-PII text
untouched, and plan shape (pure expressions, no shuffle, no Python)."""

from __future__ import annotations

from pyspark.sql import functions as F

from efficient_trees_spark.functions import text


def _df(spark):
    rows = [
        (1, "contact me at jane.doe+spam@example.co.uk or on +1 (555) 123-4567."),
        (2, "server 192.168.0.1 refused; ssn 123-45-6789 leaked"),
        (3, "no pii here, just order 12345 and price 19.99"),
        (4, ""),
        # 3-digit-octet IP must redact as <ipv4>, NOT <phone> (ADVICE r3:
        # the phone pattern used to claim dotted-quads first)
        (5, "gateway 192.168.100.200 timed out"),
        # dotted phone with a 4-digit tail is still a phone, not an IP
        (6, "fax 1.555.123.4567 available"),
        (7, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, body string")


def test_pii_counts(spark):
    got = {
        r["doc_id"]: r["c"].asDict()
        for r in _df(spark).select("doc_id", text.pii_counts("body").alias("c")).collect()
    }
    assert got[1] == {"email": 1, "phone": 1, "ipv4": 0, "ssn": 0}
    assert got[2] == {"email": 0, "phone": 0, "ipv4": 1, "ssn": 1}
    assert got[3] == {"email": 0, "phone": 0, "ipv4": 0, "ssn": 0}
    assert got[4] == {"email": 0, "phone": 0, "ipv4": 0, "ssn": 0}
    # a dotted-quad is exactly one ipv4 hit — never double-counted as phone
    assert got[5] == {"email": 0, "phone": 0, "ipv4": 1, "ssn": 0}
    assert got[6] == {"email": 0, "phone": 1, "ipv4": 0, "ssn": 0}
    # NULL text counts as zero (coalesced), not NULL — policy filters like
    # counts.email > t must not silently drop null-text docs
    assert got[7] == {"email": 0, "phone": 0, "ipv4": 0, "ssn": 0}


def test_redaction_replaces_with_typed_tokens(spark):
    got = {
        r["doc_id"]: r["red"]
        for r in _df(spark).select("doc_id", text.redact_pii("body").alias("red")).collect()
    }
    assert got[1] == "contact me at <email> or on <phone>."
    assert got[2] == "server <ipv4> refused; ssn <ssn> leaked"
    # non-PII text — including digit runs that are NOT phone-shaped in
    # context — passes through byte-identical
    assert got[3] == "no pii here, just order 12345 and price 19.99"
    assert got[4] == ""
    assert got[5] == "gateway <ipv4> timed out"
    assert got[6] == "fax <phone> available"
    assert got[7] is None


def test_redacted_text_is_pii_free(spark):
    red = _df(spark).select(text.pii_counts(text.redact_pii("body")).alias("c"))
    for r in red.collect():
        assert all(v == 0 for v in r["c"].asDict().values())


def test_pii_is_pure_projection(spark):
    out = _df(spark).select(
        text.redact_pii("body").alias("red"),
        text.pii_counts("body").alias("c"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
