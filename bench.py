"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.  Each query is fully materialized via the
noop sink (no driver collect bottleneck, no disk write skew).

The bench set is pinned EXPLICITLY (not derived from the correctness
registry) so query names and scopes stay comparable across rounds even as
the registry consolidates singleton workloads into suites: these are the
same 13 queries BENCH_r01/BENCH_r02 timed.

Per-query times are the MEDIAN of $SPARK_GRAFT_BENCH_RUNS (default 5) timed
runs after untimed warmup passes (smallest scale, then the target scale —
steady-state measurement, the regime a long-lived cluster runs in) —
single-run timings in this sandbox show ±20-30% noise, which medians absorb.
The JSON line also carries per-query DISPERSION (min/median/max) and the
machine's loadavg before and after the run: round 5's record showed a
uniform +10.6% drift on queries no commit had touched, so a bench sample
without its dispersion and load context is not interpretable.  When the
1-minute loadavg at startup exceeds $SPARK_GRAFT_BENCH_MAX_LOAD (default
nproc/4), the harness waits up to $SPARK_GRAFT_BENCH_LOAD_WAIT seconds
(default 120) for it to settle and ANNOTATES the output either way
("load_exceeded": true) rather than refusing — the driver always gets a
record, but a poisoned one says so on its face.  The record also carries
"cpu_accounting" (this container's self-CPU seconds, wall, avg cores
used): same self-CPU over a longer wall separates host starvation from
genuinely more expensive work, which loadavg alone cannot do — round 9's
poisoned series was adjudicated by hand with a commit-level A/B; this
field makes the next adjudication readable off the record.

Round 10 adds "calibration": two FIXED-WORK probes — single-threaded
SHA-256 over a constant buffer, and a 32-way embarrassingly parallel
Spark stage (range -> chained xxhash64 -> bit_xor) — timed before AND
after the query sweep.  Round 9 proved byte-identical code ran 17.2 s in
one host window and 32-58 s in another, so raw wall-times across records
are not comparable; medians divided by the SAME record's probe time are.
"total_over_mt_probe" carries that normalized headline on the record.

Round 11 makes the record SELF-ADJUDICATING: the triangulation rule that
had to be computed by hand across BENCH_r10 and its pin is now stamped on
the record as "calibration_verdict" with its full numeric basis.  The rule
(from the round-10 three-record experiment): fixed-work probes slow vs the
pinned reference window => the host's CPU throughput itself drifted =>
"cpu_drift" (raw walls are stale; compare via total_over_mt_probe).
Probes CALM but self-CPU inflated vs the pinned band for identical work =>
memory-bandwidth contention the short cache-light probes cannot see =>
"contention" (distrust the record).  Both calm => "clean" (trust raw
walls).  A config that doesn't match the pinned one (different sf, runs or
query set), or a container without CPU accounting, stamps "unpinned".
The sweep also samples self-CPU around EVERY timed query run
("query_self_cpu_sec": per-query min/median/max CPU-seconds per run), so a
poisoned window localizes to the queries it hit instead of poisoning the
whole record anonymously.  Thresholds and pins are documented in SCALE.md.

Round 11 (late) adds the probe class the field report showed was missing:
a memory-BANDWIDTH probe (N threads streaming-summing private 128 MiB
mmap-backed arrays — saturates the socket, so its wall tracks effective
bandwidth) — the round's contention-stamped sweeps all had CALM CPU
probes, because SHA-256 and chained xxhash64 on register values never
touch memory; bandwidth contention was only inferrable from self-CPU
after a full sweep.  The bw probe makes it visible in seconds: brackets
before/after the sweep, one sample per interleaved round
("bw_probe_rounds" — mid-sweep bursts localize), and the new pre-Spark
CALM-WINDOW GATE ($SPARK_GRAFT_BENCH_CALM_WAIT, default 600 s, 0
disables) polls st+bw probes and delays the sweep — bounded, annotated,
never counted against the record's wall/self-CPU — until a calm window or
budget exhaustion, so landing a clean record is automatic instead of
retry luck.  The probe is EVIDENCE, not a verdict authority: self-CPU on
the record's own work decides contention; the bw basis ratios say whether
the environment corroborates (slow => environmental) or contradicts
(calm => the work itself got more expensive).  Only the PRE-Spark bracket
is pin-comparable — a resident idle JVM shifts the probe ~1.2-1.3x
(measured), so the after-bracket and rounds read comparatively.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from efficient_trees_spark.session import get_spark  # noqa: E402
from efficient_trees_spark.workloads.dedup_queries import (  # noqa: E402
    dedup_exact_bag,
    dedup_minhash_lsh,
    dedup_substring_span_stats,
)
from efficient_trees_spark.workloads.relational import (  # noqa: E402
    q1_pricing_summary,
    q3_top_revenue_orders,
    q5_region_nation_volume,
)
from efficient_trees_spark.workloads.similarity_queries import (  # noqa: E402
    ann_bm25_topk,
    ann_cosine_threshold,
    ann_cosine_topk,
)
from efficient_trees_spark.workloads.text_pipeline import (  # noqa: E402
    docs_curation_pipeline,
    text_token_stats,
)
from efficient_trees_spark.workloads.timeseries import (  # noqa: E402
    events_tumbling_window,
)
from efficient_trees_spark.workloads.tree_queries import (  # noqa: E402
    split_candidate_gains_gini,
    tree_fit_binned_distribution,
    tree_fit_predict_distribution,
)
from efficient_trees_spark.workloads.wide_fit import tree_fit_wide  # noqa: E402

BENCH_QUERIES = {
    # Round-4 additions: BM25 lexical retrieval and span-level substring
    # dedup — the two new corpus operators, timed alongside the originals.
    "ann_bm25_topk": ann_bm25_topk,
    "ann_cosine_threshold": ann_cosine_threshold,
    "ann_cosine_topk": ann_cosine_topk,
    "dedup_exact_bag": dedup_exact_bag,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    # stats leg only — comparable to earlier rounds; the registered
    # workload adds the strip leg for the correctness gate
    "dedup_substring_spans": dedup_substring_span_stats,
    "docs_curation_pipeline": docs_curation_pipeline,
    "events_tumbling_window": events_tumbling_window,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_revenue_orders": q3_top_revenue_orders,
    "q5_region_nation_volume": q5_region_nation_volume,
    "split_candidate_gains_gini": split_candidate_gains_gini,
    "text_token_stats": text_token_stats,
    "tree_fit_binned_distribution": tree_fit_binned_distribution,
    "tree_fit_predict_distribution": tree_fit_predict_distribution,
    # Round-4 addition: the reference's actual benchmark shape (~190 float
    # features, depth-4 entropy fit — examples/memory_profiling.py) rather
    # than the ~7-column testdata width.  Input table is materialized by the
    # prepare hook below, OUTSIDE the timed region.
    "tree_fit_wide": tree_fit_wide,
}


def _st_probe_sec() -> float:
    """Single-threaded calibration probe: SHA-256 over a fixed 1 MiB
    buffer, fixed rep count — constant work, C-speed (hashlib), no JIT
    warmup concerns.  Its wall time tracks effective single-core speed
    (frequency scaling, host contention), so dividing any query median
    by the probe time of ITS OWN record makes two records from
    different host windows comparable.  Median of 3 reps."""
    import hashlib

    buf = b"\x5a" * (1 << 20)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        h = hashlib.sha256()
        for _ in range(_ST_PROBE_MB):
            h.update(buf)
        h.digest()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


_ST_PROBE_MB = 1024  # 1 GiB hashed: ~1-2 s on a calm core


_BW_PROBE_THREADS = min(32, os.cpu_count() or 8)
_BW_PROBE_MB = 128  # per thread; threads x 128 MiB resident during the probe
_BW_PROBE_PASSES = 8


def _bw_probe_sec() -> float:
    """Memory-BANDWIDTH calibration probe: N threads each streaming-summing
    a private 128 MiB float64 array (numpy releases the GIL, the sums are
    memory-bound, and N x ~15 GB/s of aggregate demand saturates the socket)
    — fixed work whose wall time tracks effective memory bandwidth, the
    resource the cache-light CPU probes (SHA-256, chained xxhash64 on a
    register value) are BLIND to.  Round 11's field report showed five
    sweeps with calm CPU probes and self-CPU inflated 1.46-1.92x — bandwidth
    contention that could only be inferred from CPU accounting after the
    fact; this probe makes it visible in seconds, before Spark even starts.

    The buffers are anonymous mmaps viewed through numpy, NOT np.ones:
    numpy madvises MADV_HUGEPAGE on large allocations, and with THP
    defrag=madvise (this host) every faulted huge page pays SYNCHRONOUS
    direct compaction — measured here as an allocation running ~25 minutes
    of pure system time on a fragmented post-Spark host.  Plain mmap is
    never madvised, so pages are ordinary 4K faults; the untimed fill
    below makes them resident before the first timed pass.  Median of 3
    reps."""
    import mmap
    import threading

    import numpy as np

    n = _BW_PROBE_THREADS
    size = _BW_PROBE_MB * (1 << 20)
    maps = [mmap.mmap(-1, size) for _ in range(n)]
    arrays = [np.frombuffer(m, dtype=np.float64) for m in maps]
    for a in arrays:
        a[:] = 1.0  # untimed: fault every page in

    def work(a: "np.ndarray") -> None:
        for _ in range(_BW_PROBE_PASSES):
            float(a.sum())

    times = []
    for _ in range(3):
        threads = [threading.Thread(target=work, args=(a,)) for a in arrays]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        times.append(time.perf_counter() - t0)
    # no explicit mmap close: thread closures and loop vars still hold
    # exported buffer views; refcounting frees maps at scope exit
    return round(statistics.median(times), 3)


_MT_PROBE_ROWS = 512_000_000
_MT_PROBE_DEPTH = 12  # chained xxhash64 calls per row: CPU-bound codegen


def _mt_probe_once(spark) -> None:
    """One untimed-by-caller run of the parallel probe stage (the caller
    times it): the per-round drift sample."""
    from pyspark.sql import functions as F

    parts = int(spark.sparkContext.defaultParallelism) or 32
    df = spark.range(0, _MT_PROBE_ROWS, 1, parts).select(
        F.xxhash64("id").alias("h")
    )
    for _ in range(_MT_PROBE_DEPTH):
        df = df.select(F.xxhash64("h").alias("h"))
    # bit_xor, not sum: ANSI mode throws on long-sum overflow
    df.agg(F.bit_xor("h")).collect()


def _mt_probe_sec(spark) -> float:
    """32-way calibration probe: an embarrassingly parallel Spark stage
    over constant generated data (range -> chained xxhash64 -> sum), one
    partition per core, no shuffle beyond the single-row final agg.  Its
    wall time tracks the machine's effective N-way throughput — the
    quantity that swung ~2x between round-8 and round-9 windows on
    byte-identical code and broke the raw wall-time series.  Callers run
    it once untimed first (codegen compile); timed value is the median
    of 3 reps."""
    _mt_probe_once(spark)  # untimed: Janino compile of the projection
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _mt_probe_once(spark)
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


# ---------------------------------------------------------------- verdict
#
# Pinned reference window.  PROBE pins (st/mt/bw) come from the calmest
# verdict-clean record of the round, BENCH_PIN_r11.json (loadavg 0.09 at
# start, calm-gate passed first attempt) — they are HOST-window
# properties, so they track the observed floor.  The SELF-CPU pin is a
# CODE property ("what does the identical sweep cost on this code") and
# tracks the code: it is re-pinned from BENCH_FINAL_r11.json, the
# verdict-clean record at the round's FINAL head (3295 s — 0.754x the
# mid-round pin record's 4372 s after the local-gains/partition-probe
# commits, and 0.51x the r10 code's 6462 s).  Re-pinned from the r10
# window (st 0.914 / mt 1.694 / self-CPU 6462, BENCH_PIN_r10.json)
# because the round-11 rewrites changed how much CPU the "identical
# work" costs: a post-optimization record compared against the old-code
# CPU pin would need ~2x real contention before the 1.25x threshold
# fired.  The pins are only meaningful for THAT configuration, so the
# verdict degrades to "unpinned" when sf/runs/query-set differ — and,
# from r12, when the CORE COUNT differs: the 8-core ladder sweep used to
# stamp "cpu_drift" (its mt probe is legitimately ~2.5x slower at 8
# cores) because the pin carried no core count; off-core sweeps now read
# "unpinned", which is what they are.  Records older than r12 carry no
# "cpus" field and keep reading against the other three fields.
_PIN_CONFIG = {"sf": 0.1, "runs": 5, "queries": 16, "cpus": 32}
_PIN_ST_PROBE_SEC = 0.711  # mean of the pin record's before/after brackets
_PIN_MT_PROBE_SEC = 1.654
_PIN_SELF_CPU_SEC = 3295.0
# A bracketed probe (3-rep median) more than 25% over its pin is "slow";
# single-rep mid-sweep rounds get 40% headroom (one rep, noisier).  The
# self-CPU band is 25% too: the poisoned r10 driver record sat at 1.63x
# with probes at 1.07-1.13x, the calm pin at 1.00x — both sides clear the
# thresholds with margin.  Documented in SCALE.md.
_PROBE_SLOW_RATIO = 1.25
_PROBE_ROUND_SLOW_RATIO = 1.40
_SELF_CPU_INFLATED_RATIO = 1.25
# Bandwidth probe pin: from BENCH_PIN_r11.json's clean window (bracket
# mean 0.244 s; mid-sweep rounds 0.228-0.277).  The provisional r11
# cross-window minimum was 0.29; the clean pin confirms and tightens it.
# A concurrent tree_fit_wide inflates the probe to 0.93-2.45 s (3.2-8.4x)
# while the st probe barely moves — hence the generous 1.5x threshold:
# clear separation from real load, headroom over the probe's own
# calm-window dispersion.  Set to None to disable the calm-wait gate's bw
# check.  The probe is EVIDENCE (basis ratios + the gate), not a verdict
# authority: self-CPU on the record's own work decides contention.
# Provenance in SCALE.md.
_PIN_BW_PROBE_SEC: "float | None" = 0.244
_BW_SLOW_RATIO = 1.5


def calibration_verdict(
    st_mean: float,
    mt_mean: float,
    mt_rounds: list[float],
    self_cpu_sec: "float | None",
    sf: "float | None",
    runs: int,
    n_queries: int,
    bw_pre: "float | None" = None,
    bw_rounds: "list[float] | None" = None,
    pins: "dict | None" = None,
    cpus: "int | None" = None,
) -> dict:
    """The round-10 triangulation rule, computed from the record's own
    fields: {"verdict": "clean" | "cpu_drift" | "contention" | "unpinned",
    "basis": {...ratios, pins, thresholds...}}.

    ``pins`` selects the reference window (defaults to the module's
    CURRENT pins, read at call time).  The rule is window-relative by
    construction — a record is adjudicated against the pin window its
    series was measured in — so re-pinning for a new code generation
    (r11: the optimized code burns 0.677x the CPU of the r10 pin's
    "identical work") must not silently re-stamp historical records;
    tests replay the r10 records against the r10 pins explicitly.

    cpu_drift  — a fixed-work probe ran slow vs the pinned window (bracket
                 over _PROBE_SLOW_RATIO, or any single mid-sweep round over
                 _PROBE_ROUND_SLOW_RATIO): the host's effective CPU
                 throughput drifted, raw walls are stale; compare records
                 via total_over_mt_probe.
    contention — probes calm but self-CPU inflated vs the pinned band for
                 identical work: contention the short cache-light probes
                 cannot see (the BENCH_r10 signature: probes 1.07-1.13x,
                 self-CPU 1.63x).  Distrust the record.  The bw_ratio /
                 bw_rounds_max_ratio basis fields say whether the
                 bandwidth probe corroborates (slow => environmental) or
                 contradicts (all calm => the work itself got more
                 expensive: investigate the code).
    clean      — both calm: trust raw walls.
    unpinned   — the sweep isn't the pinned configuration (sf/runs/query
                 count) or the container exposes no CPU accounting; the
                 pins don't apply.
    """
    if pins is None:
        pins = {
            "st_probe_sec": _PIN_ST_PROBE_SEC,
            "mt_probe_sec": _PIN_MT_PROBE_SEC,
            "self_cpu_sec": _PIN_SELF_CPU_SEC,
            "bw_probe_sec": _PIN_BW_PROBE_SEC,
            "config": _PIN_CONFIG,
        }
    pin_bw = pins.get("bw_probe_sec")
    basis = {
        "st_ratio": round(st_mean / pins["st_probe_sec"], 3),
        "mt_ratio": round(mt_mean / pins["mt_probe_sec"], 3),
        "mt_rounds_max_ratio": (
            round(max(mt_rounds) / pins["mt_probe_sec"], 3)
            if mt_rounds
            else None
        ),
        "self_cpu_ratio": (
            round(self_cpu_sec / pins["self_cpu_sec"], 3)
            if self_cpu_sec is not None
            else None
        ),
        # pre-Spark bracket only: the pin is a pre-Spark floor, and a
        # RESIDENT idle JVM shifts the probe ~1.2-1.3x (measured) — the
        # after-bracket and rounds are a comparative series, not
        # pin-comparable absolutes
        "bw_ratio": (
            round(bw_pre / pin_bw, 3)
            if bw_pre is not None and pin_bw is not None
            else None
        ),
        "bw_rounds_max_ratio": (
            round(max(bw_rounds) / pin_bw, 3)
            if bw_rounds and pin_bw is not None
            else None
        ),
        "pins": pins,
        "thresholds": {
            "probe_slow": _PROBE_SLOW_RATIO,
            "probe_round_slow": _PROBE_ROUND_SLOW_RATIO,
            "self_cpu_inflated": _SELF_CPU_INFLATED_RATIO,
            "bw_probe_slow": _BW_SLOW_RATIO,
        },
    }
    # Core-count comparison is lenient in BOTH missing directions: records
    # and pins older than r12 carry no "cpus", and re-stamping them
    # "unpinned" retroactively would break the historical replay tests.
    pin_cpus = pins["config"].get("cpus")
    config_matches = (
        sf == pins["config"]["sf"]
        and runs == pins["config"]["runs"]
        and n_queries == pins["config"]["queries"]
        and (cpus is None or pin_cpus is None or cpus == pin_cpus)
    )
    if not config_matches or self_cpu_sec is None:
        return {"verdict": "unpinned", "basis": basis}
    probes_slow = (
        basis["st_ratio"] > _PROBE_SLOW_RATIO
        or basis["mt_ratio"] > _PROBE_SLOW_RATIO
        or (
            basis["mt_rounds_max_ratio"] is not None
            and basis["mt_rounds_max_ratio"] > _PROBE_ROUND_SLOW_RATIO
        )
    )
    if probes_slow:
        return {"verdict": "cpu_drift", "basis": basis}
    # Self-CPU on the record's OWN work is the contention authority — a
    # slow bw probe with self-CPU in band means bandwidth contention
    # existed around the brackets but did not materially touch the sweep
    # (trust the record); bw_ratio stays in the basis as evidence.  The
    # converse reading matters more: self-CPU inflated with EVERY bw
    # sample calm (brackets and rounds) says the work itself got more
    # expensive — investigate the code, not the host (SCALE.md).
    if basis["self_cpu_ratio"] > _SELF_CPU_INFLATED_RATIO:
        return {"verdict": "contention", "basis": basis}
    return {"verdict": "clean", "basis": basis}


def read_self_cpu_sec() -> float | None:
    """This container's cumulative CPU seconds (cgroup cpuacct / cpu.stat).

    Recorded so bench runs are comparable across sessions: identical
    queries burning the SAME self-CPU over a longer wall means the run
    was starved by the host (external tenants / frequency — invisible
    from inside: /proc/stat here is container-namespaced, so a
    host-minus-self subtraction measures nothing), while inflated
    self-CPU means the work itself got more expensive.  loadavg stays the
    only host-scoped signal available in-container."""
    for path in ("/sys/fs/cgroup/cpuacct/cpuacct.usage",  # cgroup v1
                 "/sys/fs/cgroup/cpu.stat"):  # cgroup v2
        try:
            raw = open(path).read()
        except OSError:
            continue
        if path.endswith("cpuacct.usage"):
            return int(raw.strip()) / 1e9
        m = re.search(r"usage_usec (\d+)", raw)
        if m is not None:
            return int(m.group(1)) / 1e6
    return None


def read_loadavg() -> list[float] | None:
    try:
        with open("/proc/loadavg") as fh:
            return [float(x) for x in fh.read().split()[:3]]
    except (OSError, ValueError):  # non-Linux: no guard, no annotation
        return None


def wait_for_quiet_machine() -> tuple[list[float] | None, bool]:
    """Sample loadavg BEFORE Spark starts; if the machine is already busy,
    wait (bounded) for it to settle.  Returns (loadavg, exceeded_flag)."""
    nproc = os.cpu_count() or 8
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", nproc / 4))
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "120"))
    load = read_loadavg()
    waited = 0.0
    while load is not None and load[0] > max_load and waited < wait_budget:
        print(
            f"bench: loadavg {load[0]:.2f} > {max_load:.2f}, waiting "
            f"({waited:.0f}/{wait_budget:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(15.0)
        waited += 15.0
        load = read_loadavg()
    exceeded = load is not None and load[0] > max_load
    if exceeded:
        print(
            f"bench: loadavg still {load[0]:.2f} > {max_load:.2f} after "
            f"{waited:.0f}s — proceeding, output annotated load_exceeded",
            file=sys.stderr,
        )
    return load, exceeded


def wait_for_calm_window() -> "dict | None":
    """Poll the pre-Spark fixed-work probes (single-threaded SHA-256 and
    the memory-bandwidth streaming sum) and wait — bounded by
    $SPARK_GRAFT_BENCH_CALM_WAIT seconds (default 600; 0 disables) — for a
    window where both sit inside their pinned thresholds.  loadavg only
    sees in-container competitors; these probes see the HOST (frequency
    drift and bandwidth contention from other tenants), which is what
    actually poisoned the round-11 sweep series.  Runs BEFORE the record's
    wall/self-CPU baseline, so waiting never counts against the record.
    Returns an annotation dict for the calibration block, or None when
    disabled.  Proceeds (annotated) on budget exhaustion — the driver
    always gets a record."""
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_CALM_WAIT", "600"))
    if budget <= 0:
        return None
    poll = 45.0
    waited = 0.0
    attempts = 0
    last = {}
    calm = False
    while True:
        st = _st_probe_sec()
        bw = _bw_probe_sec()
        attempts += 1
        last = {"st_probe_sec": st, "bw_probe_sec": bw}
        st_ok = st <= _PIN_ST_PROBE_SEC * _PROBE_SLOW_RATIO
        bw_ok = (
            _PIN_BW_PROBE_SEC is None
            or bw <= _PIN_BW_PROBE_SEC * _BW_SLOW_RATIO
        )
        if st_ok and bw_ok:
            calm = True
            break
        if waited + poll > budget:
            break
        print(
            f"bench: window not calm (st {st:.2f}s"
            f"{'' if st_ok else ' SLOW'}, bw {bw:.2f}s"
            f"{'' if bw_ok else ' SLOW'}), waiting "
            f"({waited:.0f}/{budget:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(poll)
        waited += poll
    return {
        "calm": calm,
        "waited_sec": round(waited, 0),
        "attempts": attempts,
        "final_probes": last,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1)) if match else None
    # The sweep's core count (the master is local[$SPARK_GRAFT_CPUS]):
    # recorded on the output and compared against the pin config so an
    # off-core ladder sweep stamps "unpinned" instead of "cpu_drift".
    try:
        cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    except (KeyError, ValueError):
        cpus = os.cpu_count()

    load_start, load_exceeded = wait_for_quiet_machine()
    calm_wait = wait_for_calm_window()
    cpu0 = read_self_cpu_sec()
    wall0 = time.monotonic()
    st_before = _st_probe_sec()
    bw_before = _bw_probe_sec()

    spark = get_spark(app_name="efficient-trees-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/whole-stage-codegen paths outside the timed region: run
    # every bench plan once at the smallest scale factor, so the timed runs
    # measure steady-state execution (the regime a long-lived cluster is in),
    # not first-call Janino compilation (~5s on the tree-fit plan alone).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    # One-time input materialization (e.g. the wide-fit table) runs before
    # anything is timed; queries expose it as a `prepare` attribute.
    for name, fn in BENCH_QUERIES.items():
        prep = getattr(fn, "prepare", None)
        if prep is None:
            continue
        for d in {warm_dir, sf_dir}:
            try:
                prep(spark, d)
            except Exception as exc:  # prepare must never fail the bench
                print(f"prepare {name} ({d}) failed: {exc}", file=sys.stderr)
    # Two warmup passes: the smallest scale compiles the generic codegen
    # paths cheaply, then ONE untimed pass at the TARGET scale — tree-fit
    # plans embed scale-specific split literals, so their Janino compiles
    # recur at the target shape and would otherwise land in timed run 1.
    for d in dict.fromkeys([warm_dir, sf_dir]):
        for name, fn in BENCH_QUERIES.items():
            try:
                fn(spark, d).write.mode("overwrite").format("noop").save()
            except Exception as exc:  # warmup must never fail the bench
                print(f"warmup {name} ({d}) failed: {exc}", file=sys.stderr)

    # Fixed-work calibration probes bracket the sweep: the raw wall-time
    # series r1-r9 lost comparability when the host's effective 32-way
    # throughput swung ~2x between rounds on byte-identical code.  A
    # record's medians divided by ITS OWN probe times are comparable
    # across host windows; before/after disagreement flags mid-run drift.
    mt_before = _mt_probe_sec(spark)

    # Interleave rounds (run 1 of every query, then run 2, ...) so a
    # transient sandbox slowdown hits one SAMPLE of many queries, not every
    # sample of one query.
    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    cpu_samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    mt_rounds: list[float] = []
    bw_rounds: list[float] = []
    for _ in range(runs):
        for name, fn in BENCH_QUERIES.items():
            # self-CPU around each run (a cgroup-file read, ~µs): a
            # poisoned window localizes to the queries whose CPU it
            # inflated instead of poisoning the record anonymously
            qc0 = read_self_cpu_sec()
            start = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - start)
            qc1 = read_self_cpu_sec()
            if qc0 is not None and qc1 is not None:
                cpu_samples[name].append(qc1 - qc0)
        # one single-rep probe per interleaved round: contention arriving
        # MID-sweep (the pin-2 failure mode) shows up as a step in this
        # series where before/after brackets would average it away
        t0 = time.perf_counter()
        _mt_probe_once(spark)
        mt_rounds.append(round(time.perf_counter() - t0, 3))
        # one bandwidth probe per round too: a mid-sweep bandwidth burst
        # that the CPU probes can't see localizes to the rounds it hit
        # (untimed, threads joined before the next query; its ~30 CPU-s
        # per round land in self_cpu_sec — ~2% of the pinned band)
        bw_rounds.append(_bw_probe_sec())

    mt_after = _mt_probe_sec(spark)
    st_after = _st_probe_sec()
    bw_after = _bw_probe_sec()

    timings = {name: round(statistics.median(ts), 3) for name, ts in samples.items()}
    total = round(sum(timings.values()), 3)
    mt_mean = (mt_before + mt_after) / 2
    calibration = {
        # single-threaded: 3-rep median of SHA-256 over _ST_PROBE_MB MiB
        "st_probe_sec": {"before": st_before, "after": st_after},
        # 32-way: 3-rep median of range -> chained xxhash64 -> bit_xor
        "mt_probe_sec": {"before": mt_before, "after": mt_after},
        # one single-rep probe after EACH interleaved round: a step in
        # this series localizes mid-sweep contention to the rounds it
        # poisoned (the before/after brackets average it away)
        "mt_probe_rounds": mt_rounds,
        # memory-bandwidth probe: N threads streaming-summing private
        # 256 MiB arrays — sees the bandwidth contention the cache-light
        # CPU probes are blind to (round-11 field report)
        "bw_probe_sec": {"before": bw_before, "after": bw_after},
        "bw_probe_rounds": bw_rounds,
        "bw_probe_threads": _BW_PROBE_THREADS,
        "bw_probe_mb": _BW_PROBE_MB,
        # calm-window gate: pre-Spark probe polling (bounded) before the
        # record's baseline — None when disabled via CALM_WAIT=0
        "calm_wait": calm_wait,
        "st_probe_mb": _ST_PROBE_MB,
        "mt_probe_rows": _MT_PROBE_ROWS,
        "mt_probe_depth": _MT_PROBE_DEPTH,
        # headline total in units of the parallel probe: the
        # host-window-independent shape of the record
        "total_over_mt_probe": round(total / mt_mean, 2) if mt_mean else None,
    }
    dispersion = {
        name: {
            "min": round(min(ts), 3),
            "median": round(statistics.median(ts), 3),
            "max": round(max(ts), 3),
        }
        for name, ts in samples.items()
    }
    cpu1 = read_self_cpu_sec()
    cpu_accounting = None
    self_cpu = None
    if cpu0 is not None and cpu1 is not None:
        wall = time.monotonic() - wall0
        self_cpu = cpu1 - cpu0
        # avg_cores_used = self CPU / wall: the series-comparable shape.
        # Same self_cpu_sec, longer wall => host starvation; inflated
        # self_cpu_sec => the work itself changed.
        cpu_accounting = {
            "self_cpu_sec": round(self_cpu, 1),
            "wall_sec": round(wall, 1),
            "avg_cores_used": round(self_cpu / wall, 1) if wall else None,
        }
    query_self_cpu = {
        name: {
            "min": round(min(cs), 1),
            "median": round(statistics.median(cs), 1),
            "max": round(max(cs), 1),
        }
        for name, cs in cpu_samples.items()
        if cs
    }
    verdict = calibration_verdict(
        (st_before + st_after) / 2,
        mt_mean,
        mt_rounds,
        self_cpu,
        sf,
        runs,
        len(BENCH_QUERIES),
        bw_pre=bw_before,
        bw_rounds=bw_rounds,
        cpus=cpus,
    )
    calibration["calibration_verdict"] = verdict["verdict"]
    calibration["verdict_basis"] = verdict["basis"]
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "dispersion": dispersion,
                "query_self_cpu_sec": query_self_cpu or None,
                "loadavg_start": load_start,
                "loadavg_end": read_loadavg(),
                "load_exceeded": load_exceeded,
                "cpu_accounting": cpu_accounting,
                "calibration": calibration,
                "sf": sf,
                "cpus": cpus,
                "runs_per_query": runs,
                "aggregation": "median",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
