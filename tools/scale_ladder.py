"""Scale-factor ladder: run the headline bench at each testdata sf and fit
per-query scaling exponents.

This is the local stand-in for the 100x question the sandbox can't run: for
each bench query, time(sf) is measured at every available scale factor and
the growth exponent alpha is fit on the LARGEST TWO points
(alpha = log(t_hi/t_lo) / log(sf_hi/sf_lo)) — the smallest sf is dominated
by fixed scheduling overhead, so a full regression would understate growth.

alpha ~ 1.0 means linear in data size (what a scan/shuffle pipeline should
be); alpha << 1 means still overhead-bound at these scales; alpha > 1.3 is
flagged as super-linear and needs a design answer in SCALE.md.

Usage: python tools/scale_ladder.py [sf_dir ...]   (default: the three
driver-generated scale factors).  Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
SUPERLINEAR = 1.3


def run_bench(sf_dir: str, runs: int) -> dict:
    env = dict(
        os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_BENCH_RUNS=str(runs)
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench failed at {sf_dir}:\n{proc.stderr[-4000:]}")
    # bench prints exactly one JSON line on stdout (Spark may add noise lines)
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in bench output at {sf_dir}")


def main() -> None:
    sf_dirs = sys.argv[1:] or [d for d in DEFAULT_DIRS if os.path.isdir(d)]
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    results = {}
    for d in sf_dirs:
        match = re.search(r"sf([0-9.]+)", d)
        sf = float(match.group(1)) if match else None
        print(f"# running bench at {d} (sf={sf}) ...", file=sys.stderr)
        results[sf] = run_bench(d, runs)

    sfs = sorted(results)
    queries = list(results[sfs[-1]]["queries"])
    sf_lo, sf_hi = sfs[-2], sfs[-1]
    ratio = math.log(sf_hi / sf_lo)

    rows = []
    for q in queries:
        times = {sf: results[sf]["queries"].get(q) for sf in sfs}
        t_lo, t_hi = times[sf_lo], times[sf_hi]
        alpha = (
            round(math.log(t_hi / t_lo) / ratio, 2)
            if t_lo and t_hi and t_lo > 0
            else None
        )
        rows.append((q, times, alpha))

    # markdown table
    header = "| query | " + " | ".join(f"sf{sf} (s)" for sf in sfs) + " | alpha | note |"
    sep = "|---" * (len(sfs) + 3) + "|"
    print(header)
    print(sep)
    for q, times, alpha in sorted(rows, key=lambda r: -(r[2] or 0)):
        note = ""
        if alpha is not None and alpha > SUPERLINEAR:
            note = "**super-linear**"
        elif alpha is not None and alpha < 0.35:
            note = "overhead-bound"
        cells = " | ".join(
            f"{times[sf]:.2f}" if times[sf] is not None else "-" for sf in sfs
        )
        print(f"| {q} | {cells} | {alpha if alpha is not None else '-'} | {note} |")

    print(
        json.dumps(
            {
                "metric": "scale_ladder",
                "sfs": sfs,
                "alpha_window": [sf_lo, sf_hi],
                "queries": {
                    q: {"times": {str(sf): t for sf, t in times.items()}, "alpha": alpha}
                    for q, times, alpha in rows
                },
            }
        )
    )


if __name__ == "__main__":
    main()
