"""tools/bench_compare loading + gating rules (round-7 review fixes):
compact-file pointer following, loud degradation when the pointer is
unresolvable, and the ALLOWED_TRADES exemption staying scoped to
genuinely pre-r6 (min-only, non-compact) baselines."""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench_compare",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "bench_compare.py"))
bc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bc)


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_load_follows_full_results_pointer(tmp_path):
    full = {"queries": {"a": 1.0, "b": 2.0}, "queries_min": {"a": 0.9}}
    _write(tmp_path, "FULL.json", full)
    compact = {"queries": {"a": 1.0}, "full_results_file": "FULL.json"}
    d = bc._load(_write(tmp_path, "COMPACT.json", compact))
    assert d["queries"] == full["queries"]          # followed the pointer
    assert "queries_min" in d


def test_load_warns_but_survives_missing_pointer(tmp_path, capsys):
    compact = {"queries": {"a": 1.0}, "full_results_file": "GONE.json"}
    d = bc._load(_write(tmp_path, "COMPACT.json", compact))
    assert d["queries"] == {"a": 1.0}               # anchor subset kept
    assert "WARNING" in capsys.readouterr().out     # ...but LOUDLY


def test_load_driver_wrapper_parsed_pointer(tmp_path):
    full = {"queries": {"a": 1.0}, "queries_min": {"a": 0.9}}
    _write(tmp_path, "FULL.json", full)
    wrapper = {"rc": 0, "parsed": {"queries": {"a": 1.0},
                                   "full_results_file": "FULL.json"}}
    d = bc._load(_write(tmp_path, "WRAP.json", wrapper))
    assert d.get("queries_min") == {"a": 0.9}


def _run_main(monkeypatch, old_p, new_p):
    monkeypatch.setattr(bc.sys, "argv",
                        ["bench_compare", old_p, new_p, "--no-remeasure"])
    return bc.main()


def test_exemption_scope_pre_r6_only(tmp_path, capsys, monkeypatch):
    """The two-phase trade exemption applies ONLY when the old file is a
    pre-r6 min-only bench: r6+ files carry queries_min, r7+ compact
    files carry full_results_file — both must gate normally. Exercised
    through main() itself (round-7 ADVICE): a local re-implementation of
    the predicate could not fail when bench_compare's real condition
    drifts."""
    q = next(iter(bc.ALLOWED_TRADES))
    new_p = _write(tmp_path, "NEW.json",
                   {"queries": {q: 4.0}, "queries_min": {q: 4.0}})

    # pre-r6 min-only old baseline: the 2x flag is a sanctioned trade
    old_pre = _write(tmp_path, "OLD_pre_r6.json", {"queries": {q: 2.0}})
    assert _run_main(monkeypatch, old_pre, new_p) == 0
    assert "DELIBERATE" in capsys.readouterr().out

    # r6+ old baseline (has queries_min): same flag is a real regression
    old_r6 = _write(tmp_path, "OLD_r6.json",
                    {"queries": {q: 2.0}, "queries_min": {q: 2.0}})
    assert _run_main(monkeypatch, old_r6, new_p) == 1
    assert "REGRESSION" in capsys.readouterr().out

    # r7+ compact old (full_results_file pointer, even unresolvable):
    # never exempt — the two-phase cost is priced into r6+ numbers
    old_compact = _write(tmp_path, "OLD_compact.json",
                         {"queries": {q: 2.0},
                          "full_results_file": "GONE.json"})
    assert _run_main(monkeypatch, old_compact, new_p) == 1
    assert "REGRESSION" in capsys.readouterr().out


def test_same_full_results_file_is_vacuous_error(tmp_path, capsys,
                                                 monkeypatch):
    """Two compact summaries pointing at ONE full-results file would
    compare a file against itself (every ratio 1.0) — main() must refuse
    instead of reporting a clean gate (round-7 ADVICE)."""
    _write(tmp_path, "FULL.json",
           {"queries": {"a": 1.0}, "queries_min": {"a": 1.0}})
    old_p = _write(tmp_path, "OLD.json",
                   {"queries": {"a": 1.0}, "full_results_file": "FULL.json"})
    new_p = _write(tmp_path, "NEW.json",
                   {"queries": {"a": 1.0}, "full_results_file": "FULL.json"})
    assert _run_main(monkeypatch, old_p, new_p) == 2
    assert "SAME results file" in capsys.readouterr().out


def test_distinct_full_results_files_still_gate(tmp_path, capsys,
                                                monkeypatch):
    """Control for the same-file guard: two compacts pointing at two
    DISTINCT full files compare normally."""
    _write(tmp_path, "FULL_OLD.json",
           {"queries": {"a": 1.0}, "queries_min": {"a": 1.0}})
    _write(tmp_path, "FULL_NEW.json",
           {"queries": {"a": 1.1}, "queries_min": {"a": 1.1}})
    old_p = _write(tmp_path, "OLD.json",
                   {"queries": {"a": 1.0},
                    "full_results_file": "FULL_OLD.json"})
    new_p = _write(tmp_path, "NEW.json",
                   {"queries": {"a": 1.1},
                    "full_results_file": "FULL_NEW.json"})
    assert _run_main(monkeypatch, old_p, new_p) == 0
    assert "no per-query regressions" in capsys.readouterr().out


def test_estimator_pick_fresh_jvm_min(tmp_path, capsys, monkeypatch):
    """r10+ files tagged basis=fresh_jvm_min compare their ``queries``
    directly (fresh-jvm-min estimator); a fresh-min file vs an r6-r9
    median file falls back to min-vs-min via the old file's
    ``queries_min`` — a median never gates against a min."""
    new_p = _write(tmp_path, "NEW.json",
                   {"basis": "fresh_jvm_min", "queries": {"a": 1.0}})
    old_fresh = _write(tmp_path, "OLD_fresh.json",
                       {"basis": "fresh_jvm_min", "queries": {"a": 1.0}})
    assert _run_main(monkeypatch, old_fresh, new_p) == 0
    assert "fresh-jvm-min" in capsys.readouterr().out

    # r6-r9 old: median in queries (would spuriously flag), min in
    # queries_min (parity) — the pick must use queries_min.
    old_r6 = _write(tmp_path, "OLD_r6.json",
                    {"queries": {"a": 0.4}, "queries_min": {"a": 1.0}})
    assert _run_main(monkeypatch, old_r6, new_p) == 0
    out = capsys.readouterr().out
    assert "(min estimator)" in out and "no per-query regressions" in out


def test_trade_exemption_excludes_fresh_min_files(tmp_path, capsys,
                                                  monkeypatch):
    """A basis-tagged (r10+) old file has neither queries_min nor a
    full_results_file pointer, but it is NOT pre-r6 — the two-phase
    trade exemption must not resurrect for it."""
    q = next(iter(bc.ALLOWED_TRADES))
    old_p = _write(tmp_path, "OLD.json",
                   {"basis": "fresh_jvm_min", "queries": {q: 2.0}})
    new_p = _write(tmp_path, "NEW.json",
                   {"basis": "fresh_jvm_min", "queries": {q: 4.0}})
    assert _run_main(monkeypatch, old_p, new_p) == 1
    assert "REGRESSION" in capsys.readouterr().out


def test_trade_exemption_round_scoped_by_filename(tmp_path, capsys,
                                                  monkeypatch):
    """Round-11 generalization: each ALLOWED_TRADES entry carries its
    rewrite round, and the exemption is judged by the OLD file's round
    parsed from a CANONICAL artifact name — BENCH_LOCAL_r03 predates the
    r11 HLL promotion (exempt), BENCH_LOCAL_r11 prices it in
    (regression). Non-canonical names never parse a round."""
    q = "daily_genre_kpis_approx"
    assert bc.ALLOWED_TRADES[q][0] == 11
    new_p = _write(tmp_path, "BENCH_r12.json",
                   {"basis": "fresh_jvm_min", "queries": {q: 6.0}})
    old_r3 = _write(tmp_path, "BENCH_LOCAL_r03.json", {"queries": {q: 1.3}})
    assert _run_main(monkeypatch, old_r3, new_p) == 0
    assert "DELIBERATE" in capsys.readouterr().out
    old_r11 = _write(tmp_path, "BENCH_LOCAL_r11.json",
                     {"basis": "fresh_jvm_min", "queries": {q: 1.3}})
    assert _run_main(monkeypatch, old_r11, new_p) == 1
    assert "REGRESSION" in capsys.readouterr().out


def _fresh_min_file(tmp_path, name, queries, calib=None):
    d = {"basis": "fresh_jvm_min", "queries": queries}
    if calib is not None:
        d["batches"] = [{"queries": queries,
                         "env": {"calib_secs": calib,
                                 "calib_secs_end": calib}}]
    return _write(tmp_path, name, d)


def test_calibration_normalization_widens_gate(tmp_path, capsys,
                                               monkeypatch):
    """round-12 (VERDICT r11 item 3): when both files carry the CPU
    calibration kernel, a flag explained by the measured contention
    ratio is suppressed — and without calibration data the raw gate
    still applies."""
    old_p = _fresh_min_file(tmp_path, "OLD.json", {"a": 2.0}, calib=1.0)
    # 1.9x inflation, calibration says the new box was 2x slower -> OK
    new_p = _fresh_min_file(tmp_path, "NEW.json", {"a": 3.8}, calib=2.0)
    assert _run_main(monkeypatch, old_p, new_p) == 0
    out = capsys.readouterr().out
    assert "gate widened 2.00x" in out
    assert "no per-query regressions" in out
    # same numbers, no calibration in the old file -> raw gate flags
    old_nc = _fresh_min_file(tmp_path, "OLD_NC.json", {"a": 2.0})
    assert _run_main(monkeypatch, old_nc, new_p) == 1
    assert "REGRESSION" in capsys.readouterr().out


def test_calibration_clamped_and_never_tightens(tmp_path, capsys,
                                                monkeypatch):
    """The factor is clamped to <=3x (a broken probe cannot mask an
    arbitrary regression) and >=1x (a quieter new box must still beat
    the raw bar)."""
    old_p = _fresh_min_file(tmp_path, "OLD.json", {"a": 2.0}, calib=1.0)
    # 10x calibration ratio but 8x inflation: clamp at 3x -> still flags
    new_hot = _fresh_min_file(tmp_path, "NEW_HOT.json", {"a": 16.0},
                              calib=10.0)
    assert _run_main(monkeypatch, old_p, new_hot) == 1
    assert "REGRESSION" in capsys.readouterr().out
    # quieter new box (ratio 0.5) must NOT tighten the 1.5x gate:
    # 1.4x inflation stays under the raw bar
    new_quiet = _fresh_min_file(tmp_path, "NEW_QUIET.json", {"a": 2.8},
                                calib=0.5)
    assert _run_main(monkeypatch, old_p, new_quiet) == 0
    assert "no per-query regressions" in capsys.readouterr().out
