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


def test_exemption_scope_pre_r6_only():
    """The two-phase trade exemption applies ONLY when the old file is a
    pre-r6 min-only bench: r6+ files carry queries_min, r7+ compact
    files carry full_results_file — both must gate normally."""
    q = next(iter(bc.ALLOWED_TRADES))
    pre_r6 = {"queries": {q: 1.0}}
    r6 = {"queries": {q: 1.0}, "queries_min": {q: 1.0}}
    compact = {"queries": {q: 1.0}, "full_results_file": "GONE.json"}

    def exempt(old):
        return ("queries_min" not in old
                and "full_results_file" not in old
                and "full_results_file" not in (old.get("parsed") or {}))

    assert exempt(pre_r6)
    assert not exempt(r6)
    assert not exempt(compact)
