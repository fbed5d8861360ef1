"""Per-query shuffle/input byte audit of the bench set — measured, not guessed.

For every bench query (the same 16 plans bench.py times), run one warmup
pass and one audited pass at $SPARK_GRAFT_SF_DIR (default sf0.1), and read
Spark's own stage metrics (the UI REST API, enabled for this session only)
to report the DELTA of:

  input_bytes          — bytes read from sources (parquet scans)
  shuffle_write_bytes  — bytes written into exchanges
  shuffle_read_bytes   — bytes read out of exchanges
  stages               — completed stage count

per audited pass.  This is the scale question in byte form: a query whose
shuffle_write is a large multiple of its input re-materializes the data
across the cluster network at 100 TB, however fast it looks at sf0.1;
one whose shuffle bytes are near zero scales with scan bandwidth alone.
The audit records both the absolute bytes and the shuffle/input ratio so
SCALE.md can hold a per-query shuffle budget the same way it holds wall
bands — and so a future plan change that quietly adds an exchange shows
up as a byte-count regression, not a 2-am cluster bill.

Metrics come from the REST endpoint (/api/v1/applications/<id>/stages)
rather than a Python SparkListener: the listener bridge serializes every
task end over py4j (measurable overhead on 32-way stages), while one REST
read after the pass costs nothing.  Stage eviction is bounded away by
raising spark.ui.retainedStages above the audit's total stage count.

Warmup matters for fidelity: AQE replans mid-query, and the FIRST pass of
a tree fit also materializes its packed-code cache (an extra scan the
steady state never pays).  The audited pass therefore measures the same
steady-state regime bench.py times.  Caveat, documented rather than
hidden: stages SKIPPED via exchange reuse report zero bytes on the reused
read side, and cached-relation reads (the tree fits' code cache) appear
as neither input nor shuffle — the audit measures bytes MOVED this pass,
which is exactly the 100 TB-relevant quantity.

Output: one JSON line per query on stdout + a markdown table on stderr.

Usage:  python tools/shuffle_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from efficient_trees_spark.session import get_spark  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as resp:
        return json.load(resp)


def _drain_listener_bus(spark) -> None:
    """The REST store is fed by an ASYNC listener queue — an action can
    return before its stages' metrics land, which undercounts the pass
    that just ran and smears its bytes into the next query's delta
    (observed: a 10.8 MB lineitem scan reporting 17 KiB).  Block until
    the bus is empty before reading totals."""
    bus = spark.sparkContext._jsc.sc().listenerBus()
    try:
        bus.waitUntilEmpty()
    except TypeError:  # older signature requires a timeout
        bus.waitUntilEmpty(30_000)


def _totals(spark, base: str, app_id: str) -> dict:
    """Cumulative byte totals over all completed stages of the app."""
    _drain_listener_bus(spark)
    stages = _api(base, f"/api/v1/applications/{app_id}/stages?status=COMPLETE")
    tot = {
        "input_bytes": 0,
        "shuffle_write_bytes": 0,
        "shuffle_read_bytes": 0,
        "stages": 0,
    }
    for s in stages:
        tot["input_bytes"] += s.get("inputBytes", 0)
        tot["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
        tot["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
        tot["stages"] += 1
    return tot


def _fmt_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024 or unit == "GiB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024
    return f"{n:.1f} GiB"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(
        app_name="shuffle-audit",
        extra_conf={
            "spark.ui.enabled": "true",
            # keep every stage of the audit resident so cumulative deltas
            # never lose a term to eviction (default retention is 1000)
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
            # parquet VECTORED IO reads bypass the FileSystem statistics
            # the inputBytes metric is built from (measured: a lineitem
            # single-column scan reports 17.8 KiB vectored vs 169 KiB — the
            # true pruned column chunk — with it off).  Disable it for the
            # AUDIT session only: byte ACCOUNTING fidelity; plans and
            # shuffle volumes are unchanged, and nothing here is timed.
            "spark.hadoop.parquet.hadoop.vectored.io.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    for name, fn in BENCH_QUERIES.items():
        prep = getattr(fn, "prepare", None)
        if prep is not None:
            prep(spark, sf_dir)

    rows = []
    for name, fn in BENCH_QUERIES.items():
        # warmup: steady-state regime (AQE settled, tree code caches built)
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        before = _totals(spark, base, app_id)
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        after = _totals(spark, base, app_id)
        delta = {k: after[k] - before[k] for k in before}
        delta["name"] = name
        delta["shuffle_over_input"] = (
            round(delta["shuffle_write_bytes"] / delta["input_bytes"], 4)
            if delta["input_bytes"]
            else None
        )
        rows.append(delta)
        print(json.dumps(delta), flush=True)

    print(
        "\n| query | input | shuffle write | shuffle read | stages |"
        " shuffle/input |",
        file=sys.stderr,
    )
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for d in rows:
        print(
            f"| {d['name']} | {_fmt_bytes(d['input_bytes'])} |"
            f" {_fmt_bytes(d['shuffle_write_bytes'])} |"
            f" {_fmt_bytes(d['shuffle_read_bytes'])} | {d['stages']} |"
            f" {d['shuffle_over_input']} |",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
