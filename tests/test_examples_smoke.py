"""Smoke-run the ported examples (reference: examples/*.py) end to end.

Each example is a standalone script that builds its own SparkSession, so they
run here as subprocesses at the smallest scale factor.  The point is that the
ported examples are EXECUTED, not just shipped: a bitrotted import or a
schema drift in testdata fails this suite, not a user.

Skipped cleanly when the driver-generated testdata is absent (e.g. a bare
checkout without /root/testdata).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE_SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

EXAMPLES = [
    "iris.py",
    "heart_disease.py",
    "amex_default.py",
    "corpus_pipeline.py",
    "memory_profiling.py",
    "quality_filter.py",
    "ann_retrieval.py",
    "pretraining_shards.py",
    "incremental_corpus_dedup.py",
]


@pytest.mark.skipif(
    not os.path.isdir(SMOKE_SF_DIR),
    reason=f"driver testdata absent: {SMOKE_SF_DIR}",
)
@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs(script, tmp_path):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SMOKE_SF_DIR)
    # Examples write artifacts (model pickle, tree rendering) to cwd; keep
    # them in the test's tmp dir.
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}"
    )
