"""Pure-Python contracts for the scaling-evidence harness in bench.py.

The campaign (scripts/scaling_campaign.sh) leans on three render-time
behaviors that must not drift: the clean-window median basis switch, the
per-barrier two-point Amdahl fit, and the gate-probe evidence line. None
of these touch Spark, so the tests run in milliseconds and are safe to
run next to a live measurement campaign.
"""
import bench


def _run(fps, steal, ok, probe=1.2, wall=100.0, barriers=None):
    return {"files": 200000, "wall_s": wall, "files_per_sec": fps,
            "steal_jiffies": steal, "window_ok": ok,
            "ceil_gemm_pre": probe, "barriers": barriers or []}


def _pair(lo_runs, hi_runs, n_lo=2):
    return {"n_lo": n_lo, "n_hi": 4 * n_lo,
            "runs": {str(n_lo): lo_runs, str(4 * n_lo): hi_runs},
            "stage_runs": {}, "ceil_alu": 3.5, "ceil_gemm": 3.8,
            "ceil_attempts": [3.8], "ceil_required": 3.0,
            "clean_steal_max": 5000, "qualified": True}


def test_render_all_runs_basis_when_no_clean_run():
    # no window_ok run at the low level -> medians must use ALL runs
    p = _pair([_run(1000, 9000, False), _run(800, 9000, False)],
              [_run(3000, 50, True, 3.2), _run(2800, 60, True, 3.1)])
    md, stats = bench._render_pair(p)
    assert stats["median_basis"] == "all-runs"
    assert stats["med_lo"] == 900        # median of 1000, 800
    assert "all-runs basis" in md


def test_render_strict_basis_at_two_clean_per_level():
    # all window_ok runs are also under the absolute bar -> strict basis
    p = _pair([_run(1000, 100, True, 3.5), _run(500, 40000, False),
               _run(1100, 200, True, 3.2)],
              [_run(3000, 50, True, 3.4), _run(1500, 30000, False),
               _run(3200, 60, True, 3.1)])
    md, stats = bench._render_pair(p)
    assert stats["median_basis"] == "strict-clean"
    # dirty runs (500, 1500 f/s) excluded from the medians
    assert stats["med_lo"] == 1050 and stats["med_hi"] == 3100
    assert abs(stats["eff"] - (3100 / 1050) / 4) < 1e-9
    # ...but every attempt stays on the books in the rendered table
    assert "40000" in md and "30000" in md
    # strict == ✓ basis here: no exclusion note, no eff_clean
    assert "eff_clean" not in stats


def test_render_strict_excludes_tagged_run_over_absolute_bar():
    # a long low-parallelism run can be ✓ under the machine-normalized
    # share yet carry 55k stolen jiffies (VERDICT r4 #2's bar is <5k):
    # with >=2 strict runs per level it must drop out of the medians,
    # and the normalized-basis efficiency must be published alongside
    p = _pair([_run(852, 1852, True, 3.3, wall=1174.0),
               _run(639, 55205, True, 3.25, wall=1565.0),
               _run(900, 1000, True, 3.4, wall=1100.0)],
              [_run(2380, 1665, True, 4.0, wall=420.0),
               _run(1894, 2000, True, 3.9, wall=528.0)])
    md, stats = bench._render_pair(p)
    assert stats["median_basis"] == "strict-clean"
    assert stats["n_strict"] == {"2": 2, "8": 2}
    # 639 excluded: strict lo median = median(852, 900)
    assert stats["med_lo"] == 876
    # the ✓-basis number is on the books for comparison
    assert stats["eff_clean"] == round((2137 / 852) / 4, 3)
    assert "normalized-basis medians" in md
    # the excluded run's raw row stays in the table
    assert "55205" in md


def test_render_single_strict_run_engages_strict_basis():
    # 1 strict run at the low level is enough: the judge's bar binds
    # EVERY counted run, and a contaminated low-level run would inflate
    # the efficiency by dragging the denominator down
    p = _pair([_run(1000, 100, True, 3.5), _run(800, 9000, True, 3.2)],
              [_run(3000, 50, True, 3.4), _run(2800, 60, True, 3.1)])
    _, stats = bench._render_pair(p)
    assert stats["median_basis"] == "strict-clean"
    assert stats["med_lo"] == 1000
    assert stats["eff_clean"] == round((2900 / 900) / 4, 3)


def test_render_falls_back_to_clean_when_no_strict_run():
    # zero strict runs at the low level -> normalized ✓ basis
    p = _pair([_run(1000, 8000, True, 3.5), _run(800, 9000, True, 3.2)],
              [_run(3000, 50, True, 3.4), _run(2800, 60, True, 3.1)])
    _, stats = bench._render_pair(p)
    assert stats["median_basis"] == "clean-window"
    assert stats["med_lo"] == 900


def test_barrier_amdahl_fit_and_serial_sum():
    # wall(c) = S + P/c with S=2, P=16: lo(2)=10, hi(8)=4
    b = [{"name": "x", "t0": 0.0, "s": 10.0}]
    h = [{"name": "x", "t0": 0.0, "s": 4.0}]
    p = _pair([_run(1000, 10, True, 3.5, barriers=b)] * 2,
              [_run(3000, 10, True, 3.5, barriers=h)] * 2)
    _, stats = bench._render_pair(p)
    assert stats["fitted_serial_s"] == 2.0


def test_barrier_fact_rows_excluded_from_medians():
    # note() rows carry "value" (facts, not time) and must not count
    b = [{"name": "n_pairs", "t0": 1.0, "s": 0.0, "value": 123},
         {"name": "x", "t0": 0.0, "s": 6.0},
         {"name": "x", "t0": 6.0, "s": 4.0}]   # same name sums within run
    p = _pair([_run(1000, 10, True, 3.5, barriers=b)] * 2,
              [_run(3000, 10, True, 3.5,
                    barriers=[{"name": "x", "t0": 0.0, "s": 10.0}])] * 2)
    md, _ = bench._render_pair(p)
    assert "n_pairs" not in md
    assert "| x | 10.00 | 10.00 | 10.00 |" in md


def test_gate_probe_line_counts_in_window_probes():
    p = _pair([], [])
    p["gate_probes"] = [1.1, 3.5, 4.4, 3.0, 10.7]   # 3.5 and 3.0 in [3, 4]
    line = bench._gate_probe_line(p)
    assert "5 pre-launch" in line and "2 probe(s)" in line
    assert bench._gate_probe_line(_pair([], [])) == ""
