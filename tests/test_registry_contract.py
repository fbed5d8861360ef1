"""Driver-contract guards.

The correctness gate checks only the FIRST 50 registered workloads in
registration order — round 2 shipped 17 workloads past that window and got
zero evidence for them.  The registry size is therefore load-bearing: new
capabilities must merge into an existing suite or consolidate something
else, never silently push coverage out of the window.
"""

from __future__ import annotations

from efficient_trees_spark.workloads import REGISTRY

DRIVER_WINDOW = 50


def test_registry_fits_driver_window():
    assert len(REGISTRY) <= DRIVER_WINDOW, (
        f"{len(REGISTRY)} workloads registered but the driver checks only the "
        f"first {DRIVER_WINDOW}: consolidate into a suite (see COVERAGE.md) "
        "instead of appending"
    )


def test_every_workload_names_an_oracle_or_declares_why():
    # Round 4 closed the last rows-only gap (mm_fake_image_features gained
    # an exact ascii()-twin oracle): every registered workload must now ship
    # a DuckDB oracle — any regression here loses driver evidence.
    missing = [n for n, wl in REGISTRY.items() if wl.oracle is None]
    assert missing == [], missing


def test_workloads_have_descriptions():
    empty = [n for n, wl in REGISTRY.items() if not wl.description.strip()]
    assert not empty, empty


def test_pinned_values_oracle_fails_loudly_off_scale(spark):
    """model_fit_distributions pins seeded VALUES valid only at sf0.01; at
    any other scale it must raise a config error instead of letting the gate
    report a mysterious value-hash mismatch (ADVICE r3)."""
    import pytest

    from efficient_trees_spark.workloads.base import PinnedOracleScaleError

    with pytest.raises(PinnedOracleScaleError, match="sf0.01"):
        REGISTRY["model_fit_distributions"].fn(spark, "/root/testdata/sf0.001")
