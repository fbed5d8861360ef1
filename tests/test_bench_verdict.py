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

# The rule is window-relative: a record is adjudicated against the pin
# window its series was measured in.  bench.py's CURRENT pins moved to the
# round-11 optimized code's clean record (BENCH_PIN_r11.json — the rewrites
# cut the sweep's self-CPU to 0.677x, so the old CPU band would need 1.85x
# real contention before firing); the r10 records below replay against the
# r10 pins they were measured under.
R10_PINS = {
    "st_probe_sec": 0.914,
    "mt_probe_sec": 1.694,
    "self_cpu_sec": 6462.0,
    "bw_probe_sec": 0.29,
    "config": {"sf": 0.1, "runs": 5, "queries": 16},
}


def _verdict_of_record(rec: dict, pins: dict | None = None) -> dict:
    cal = rec["calibration"]
    st = (cal["st_probe_sec"]["before"] + cal["st_probe_sec"]["after"]) / 2
    mt = (cal["mt_probe_sec"]["before"] + cal["mt_probe_sec"]["after"]) / 2
    bw = cal.get("bw_probe_sec") or {}
    return calibration_verdict(
        st,
        mt,
        cal.get("mt_probe_rounds", []),
        rec["cpu_accounting"]["self_cpu_sec"],
        rec["sf"],
        rec["runs_per_query"],
        len(rec["queries"]),
        bw_pre=bw.get("before"),
        bw_rounds=cal.get("bw_probe_rounds"),
        pins=pins,
    )


def test_r10_pin_record_reads_clean_from_its_own_fields():
    rec = json.loads((REPO / "BENCH_PIN_r10.json").read_text())
    v = _verdict_of_record(rec, pins=R10_PINS)
    assert v["verdict"] == "clean"
    assert v["basis"]["self_cpu_ratio"] == 1.0


# The mid-round clean record's window: probe pins shared with the current
# defaults, but the SELF-CPU band is the code generation it measured
# (4372 s — before the local-gains / partition-probe commits cut the
# sweep to 3295 s, the current pin).
R11_PIN_ERA_PINS = {
    "st_probe_sec": 0.711,
    "mt_probe_sec": 1.654,
    "self_cpu_sec": 4372.0,
    "bw_probe_sec": 0.244,
    "config": {"sf": 0.1, "runs": 5, "queries": 16},
}


def test_r11_pin_record_reads_clean_under_its_own_window():
    """BENCH_PIN_r11.json is the round-11 mid-round verdict-clean record
    and the source of the current PROBE pins; its self-CPU band is its own
    code generation (the window-relative rule again — the post-close
    commits cut the sweep CPU further, so the CURRENT cpu pin is newer)."""
    rec = json.loads((REPO / "BENCH_PIN_r11.json").read_text())
    v = _verdict_of_record(rec, pins=R11_PIN_ERA_PINS)
    assert v["verdict"] == "clean"
    assert v["basis"]["self_cpu_ratio"] == 1.0
    assert v["basis"]["st_ratio"] <= 1.01
    assert v["basis"]["bw_ratio"] is not None and v["basis"]["bw_ratio"] <= 1.01


def test_r11_final_record_reads_clean_under_current_pins():
    """BENCH_FINAL_r11.json — the verdict-clean record at the round's
    final HEAD and the source of the current self-CPU pin — must read
    clean under bench.py's current defaults (probes inside the 1.25x
    bracket band, self-CPU ratio 1.0 up to rounding)."""
    rec = json.loads((REPO / "BENCH_FINAL_r11.json").read_text())
    v = _verdict_of_record(rec)  # default = current pins
    assert v["verdict"] == "clean"
    assert v["basis"]["self_cpu_ratio"] == 1.0
    assert v["basis"]["mt_ratio"] < 1.25
    assert v["basis"]["bw_ratio"] is not None and v["basis"]["bw_ratio"] <= 1.01


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
    v = calibration_verdict(st, mt, rounds, cpu, 0.1, 5, 16, pins=R10_PINS)
    assert v["verdict"] == "contention"
    assert v["basis"]["self_cpu_ratio"] > 1.6
    assert v["basis"]["mt_ratio"] < 1.25


def test_slow_bracket_probe_reads_cpu_drift():
    # mt probe 2x the pin: the round-8/round-9 window shift signature —
    # even with self-CPU inflated too, the probe signal takes precedence
    # (raw walls are stale either way; normalization is the remedy)
    v = calibration_verdict(
        0.92, 3.4, [3.3, 3.5], 11000.0, 0.1, 5, 16, pins=R10_PINS
    )
    assert v["verdict"] == "cpu_drift"


def test_mid_sweep_round_spike_reads_cpu_drift():
    # brackets calm, one interleaved round at 1.5x the pin: contention
    # arrived mid-sweep and the probes DID see it
    v = calibration_verdict(
        0.92, 1.70, [1.7, 2.55, 1.69], 6500.0, 0.1, 5, 16, pins=R10_PINS
    )
    assert v["verdict"] == "cpu_drift"


def test_calm_record_reads_clean():
    v = calibration_verdict(
        0.93, 1.72, [1.7, 1.75], 6600.0, 0.1, 5, 16, pins=R10_PINS
    )
    assert v["verdict"] == "clean"


def test_off_config_or_missing_cpu_reads_unpinned():
    assert (
        calibration_verdict(0.9, 1.7, [], 6400.0, 0.01, 5, 16, pins=R10_PINS)[
            "verdict"
        ]
        == "unpinned"
    )
    assert (
        calibration_verdict(0.9, 1.7, [], 6400.0, 0.1, 3, 16, pins=R10_PINS)[
            "verdict"
        ]
        == "unpinned"
    )
    assert (
        calibration_verdict(0.9, 1.7, [], 6400.0, 0.1, 5, 12, pins=R10_PINS)[
            "verdict"
        ]
        == "unpinned"
    )
    assert (
        calibration_verdict(0.9, 1.7, [], None, 0.1, 5, 16, pins=R10_PINS)[
            "verdict"
        ]
        == "unpinned"
    )


def test_bw_probe_is_evidence_not_authority(monkeypatch):
    """The bandwidth probe corroborates or contradicts — it never decides.
    Self-CPU on the record's OWN work is the contention authority: a slow
    bw bracket with self-CPU in band means the contention missed the sweep
    (clean); self-CPU inflated with every bw sample calm points at the
    code, not the host — both readings live in the basis ratios."""
    import bench

    pins_bw = dict(R10_PINS, bw_probe_sec=0.30)
    # slow bw, self-CPU in band: the sweep itself was untouched => clean,
    # with the bw evidence on the basis
    v = bench.calibration_verdict(
        0.93, 1.72, [1.7], 6400.0, 0.1, 5, 16, bw_pre=0.60, bw_rounds=[0.9],
        pins=pins_bw,
    )
    assert v["verdict"] == "clean"
    assert v["basis"]["bw_ratio"] == 2.0
    assert v["basis"]["bw_rounds_max_ratio"] == 3.0
    # self-CPU inflated, bw calm everywhere: still "contention" (distrust
    # raw walls) but the basis shows the contradiction that says
    # "investigate the code"
    v2 = bench.calibration_verdict(
        0.93, 1.72, [1.7], 9800.0, 0.1, 5, 16, bw_pre=0.30, bw_rounds=[0.31],
        pins=pins_bw,
    )
    assert v2["verdict"] == "contention"
    assert v2["basis"]["bw_ratio"] == 1.0
    # no bw pin: ratios are None, verdicts unchanged
    v3 = bench.calibration_verdict(
        0.93, 1.72, [1.7], 6400.0, 0.1, 5, 16, bw_pre=0.60, bw_rounds=[0.9],
        pins=dict(R10_PINS, bw_probe_sec=None),
    )
    assert v3["verdict"] == "clean"
    assert v3["basis"]["bw_ratio"] is None
    assert v3["basis"]["bw_rounds_max_ratio"] is None


def test_calm_wait_gate_disabled_and_calm_paths(monkeypatch):
    import bench

    # CALM_WAIT=0 disables the gate entirely
    monkeypatch.setenv("SPARK_GRAFT_BENCH_CALM_WAIT", "0")
    assert bench.wait_for_calm_window() is None
    # calm probes return immediately (attempt 1, zero wait) without sleep
    # (the gate compares against the CURRENT module pins, so pin st too —
    # the values here predate the r11 re-pin)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_CALM_WAIT", "600")
    monkeypatch.setattr(bench, "_PIN_ST_PROBE_SEC", 0.914)
    monkeypatch.setattr(bench, "_st_probe_sec", lambda: 0.93)
    monkeypatch.setattr(bench, "_bw_probe_sec", lambda: 0.40)
    monkeypatch.setattr(bench, "_PIN_BW_PROBE_SEC", 0.40)
    out = bench.wait_for_calm_window()
    assert out["calm"] is True
    assert out["attempts"] == 1
    assert out["waited_sec"] == 0
    assert out["final_probes"] == {"st_probe_sec": 0.93, "bw_probe_sec": 0.40}
    # a hot window with a zero budget records not-calm without sleeping:
    # budget exhausted on the first sample (poll loop never sleeps past it)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_CALM_WAIT", "0.001")
    monkeypatch.setattr(bench, "_st_probe_sec", lambda: 9.9)
    out2 = bench.wait_for_calm_window()
    assert out2["calm"] is False
    assert out2["attempts"] == 1


def test_off_core_count_reads_unpinned_lenient_when_unrecorded():
    """r12: the pin config carries the core count, so the 8-core ladder
    sweep stamps "unpinned" (its mt probe is legitimately ~2.5x slower —
    it used to stamp "cpu_drift").  Leniency in both missing directions:
    records/pins from before r12 carry no cpus field and keep reading
    against the other three config fields."""
    # current default pins carry cpus=32: an 8-core sweep is off-config
    v = calibration_verdict(0.72, 4.2, [], 3300.0, 0.1, 5, 16, cpus=8)
    assert v["verdict"] == "unpinned"
    # same sweep at the pinned core count adjudicates normally
    v32 = calibration_verdict(0.72, 1.66, [1.7], 3300.0, 0.1, 5, 16, cpus=32)
    assert v32["verdict"] == "clean"
    # pre-r12 pins (no cpus key) never gate on the core count
    v_old = calibration_verdict(
        0.92, 1.70, [1.7], 6500.0, 0.1, 5, 16, pins=R10_PINS, cpus=8
    )
    assert v_old["verdict"] == "clean"
    # pre-r12 RECORD (cpus unknown) against current pins: lenient too
    v_rec = calibration_verdict(0.72, 1.66, [1.7], 3300.0, 0.1, 5, 16)
    assert v_rec["verdict"] == "clean"
