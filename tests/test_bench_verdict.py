"""bench.py's calibration_verdict — the round-10 triangulation rule as code.

The rule was established by hand across three records (the driver's
BENCH_r10.json, the probe-verified BENCH_PIN_r10.json, and an isolated
re-run): fixed-work probes slow vs the pinned window => cpu_drift
(normalize); probes calm but self-CPU inflated => bandwidth contention
(distrust); both calm => clean (trust).  These tests pin that the verdict
now reproduces MECHANICALLY from each record's own fields — including the
two historical round-10 records read straight from disk.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import calibration_verdict  # noqa: E402


def _verdict_of_record(rec: dict) -> dict:
    cal = rec["calibration"]
    st = (cal["st_probe_sec"]["before"] + cal["st_probe_sec"]["after"]) / 2
    mt = (cal["mt_probe_sec"]["before"] + cal["mt_probe_sec"]["after"]) / 2
    return calibration_verdict(
        st,
        mt,
        cal.get("mt_probe_rounds", []),
        rec["cpu_accounting"]["self_cpu_sec"],
        rec["sf"],
        rec["runs_per_query"],
        len(rec["queries"]),
    )


def test_r10_pin_record_reads_clean_from_its_own_fields():
    rec = json.loads((REPO / "BENCH_PIN_r10.json").read_text())
    v = _verdict_of_record(rec)
    assert v["verdict"] == "clean"
    assert v["basis"]["self_cpu_ratio"] == 1.0


def test_r10_driver_record_reads_contention_from_its_own_fields():
    """BENCH_r10.json is the driver's tail-truncated capture, so the fields
    are regex-extracted from the raw text — the point stands: near-calm
    probes (1.07-1.13x the pin) with self-CPU at 1.63x the pinned band for
    identical work is the bandwidth-contention signature, and the verdict
    computes it from the record alone."""
    outer = json.loads((REPO / "BENCH_r10.json").read_text())
    # the driver's capture wrapped the record's surviving tail in a
    # "tail" string field; json.loads unescapes it back to record text
    raw = outer["tail"] if "tail" in outer else json.dumps(outer)
    cpu = float(re.search(r'"self_cpu_sec": ([0-9.]+)', raw).group(1))
    st_m = re.search(
        r'"st_probe_sec": \{"before": ([0-9.]+), "after": ([0-9.]+)\}', raw
    )
    mt_m = re.search(
        r'"mt_probe_sec": \{"before": ([0-9.]+), "after": ([0-9.]+)\}', raw
    )
    rounds = json.loads(
        re.search(r'"mt_probe_rounds": (\[[^\]]*\])', raw).group(1)
    )
    st = (float(st_m.group(1)) + float(st_m.group(2))) / 2
    mt = (float(mt_m.group(1)) + float(mt_m.group(2))) / 2
    v = calibration_verdict(st, mt, rounds, cpu, 0.1, 5, 16)
    assert v["verdict"] == "contention"
    assert v["basis"]["self_cpu_ratio"] > 1.6
    assert v["basis"]["mt_ratio"] < 1.25


def test_slow_bracket_probe_reads_cpu_drift():
    # mt probe 2x the pin: the round-8/round-9 window shift signature —
    # even with self-CPU inflated too, the probe signal takes precedence
    # (raw walls are stale either way; normalization is the remedy)
    v = calibration_verdict(0.92, 3.4, [3.3, 3.5], 11000.0, 0.1, 5, 16)
    assert v["verdict"] == "cpu_drift"


def test_mid_sweep_round_spike_reads_cpu_drift():
    # brackets calm, one interleaved round at 1.5x the pin: contention
    # arrived mid-sweep and the probes DID see it
    v = calibration_verdict(0.92, 1.70, [1.7, 2.55, 1.69], 6500.0, 0.1, 5, 16)
    assert v["verdict"] == "cpu_drift"


def test_calm_record_reads_clean():
    v = calibration_verdict(0.93, 1.72, [1.7, 1.75], 6600.0, 0.1, 5, 16)
    assert v["verdict"] == "clean"


def test_off_config_or_missing_cpu_reads_unpinned():
    assert (
        calibration_verdict(0.9, 1.7, [], 6400.0, 0.01, 5, 16)["verdict"]
        == "unpinned"
    )
    assert (
        calibration_verdict(0.9, 1.7, [], 6400.0, 0.1, 3, 16)["verdict"]
        == "unpinned"
    )
    assert (
        calibration_verdict(0.9, 1.7, [], 6400.0, 0.1, 5, 12)["verdict"]
        == "unpinned"
    )
    assert (
        calibration_verdict(0.9, 1.7, [], None, 0.1, 5, 16)["verdict"]
        == "unpinned"
    )
