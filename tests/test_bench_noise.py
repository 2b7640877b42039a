"""Unit tests for the interleaved-CPU-bench noise-band classification.

The RESULTS_r3 artifact's claim structure — every native loss is either
real or within the measured rep-noise band — rests on
`classify_interleaved_row` (bench/bench_lib.py).  These tests pin its
semantics on synthetic rep lists; the bench itself (subprocess reference
builds, real timing) lives in the slow tier."""

from bench.bench_lib import classify_interleaved_row

W, H = 352, 288


def test_native_win_is_not_a_loss():
    row = classify_interleaved_row([1.0, 1.2], [1.1, 1.3], W, H)
    assert row["native_wins"]
    assert not row["loss_within_noise"]
    assert row["native_over_reference"] == 1.1


def test_tie_counts_as_win():
    row = classify_interleaved_row([1.0, 1.5], [1.0, 1.4], W, H)
    assert row["native_wins"]


def test_small_loss_inside_either_spread_is_noise():
    # native best 1.02 vs ref best 1.00 (2% loss); native spread 30%
    row = classify_interleaved_row([1.02, 1.33], [1.00, 1.01], W, H)
    assert not row["native_wins"]
    assert row["loss_within_noise"]
    # ... also when only the REFERENCE side is noisy
    row = classify_interleaved_row([1.02, 1.03], [1.00, 1.40], W, H)
    assert row["loss_within_noise"]


def test_loss_beyond_both_spreads_is_real():
    # 20% loss, both sides repeat within 1% -- a real deficit
    row = classify_interleaved_row([1.20, 1.21], [1.00, 1.01], W, H)
    assert not row["native_wins"]
    assert not row["loss_within_noise"]


def test_best_of_reps_and_rates():
    row = classify_interleaved_row([2.0, 1.0], [4.0, 3.0], W, H)
    assert row["native_s"] == 1.0 and row["reference_s"] == 3.0
    assert row["native_rep_spread"] == 1.0  # (2.0 - 1.0) / 1.0
    assert row["native_mpix_s"] == round(W * H / 1e6, 1)
