"""Degraded-session detection in the bench triage tool (r11, VERDICT
r10 item 5): when the sentinel set is slow, NO flag may be
adjudicated — every row gets SESSION_DEGRADED and the exit code is
nonzero. No Spark: retime is stubbed."""

from __future__ import annotations

import json
import sys


def _run_triage(tmp_path, monkeypatch, clean_times):
    import tools.bench_triage as bt

    base = json.load(open("bench_baseline.json"))["queries"]
    # a bench with one artificial flag
    flag_q = "j2_asof_join"
    bench = {"queries": dict(base)}
    bench["queries"][flag_q] = base[flag_q] * 10
    bench_path = tmp_path / "bench.json"
    bench_path.write_text(json.dumps(bench))

    def fake_retime(names, runs=3):
        return {
            n: {"median": clean_times[n], "spread": [clean_times[n]] * 2}
            for n in names
        }

    monkeypatch.setattr(bt, "retime", fake_retime)
    out_path = tmp_path / "triage.json"
    monkeypatch.setattr(
        sys, "argv",
        ["bench_triage.py", "--json", str(out_path), str(bench_path)],
    )
    code = bt.main()
    return code, json.load(open(out_path)), base, flag_q


def test_healthy_session_adjudicates(tmp_path, monkeypatch):
    import tools.bench_triage as bt

    base = json.load(open("bench_baseline.json"))["queries"]
    clean = {s: base[s] * 1.0 for s in bt.SENTINELS}
    clean["j2_asof_join"] = base["j2_asof_join"] * 0.9  # back in gate
    code, art, _, flag_q = _run_triage(tmp_path, monkeypatch, clean)
    assert code == 0
    assert art["session_degraded"] is False
    assert [r["verdict"] for r in art["rows"]] == ["NOISE"]


def test_degraded_session_refuses_verdicts(tmp_path, monkeypatch):
    """All three sentinels 1.6x over pin -> the clean median of the
    flagged query is IRRELEVANT: even a still-out-of-gate retime must
    not become a REGRESSION claim on a degraded host."""
    import tools.bench_triage as bt

    base = json.load(open("bench_baseline.json"))["queries"]
    clean = {s: base[s] * 1.6 for s in bt.SENTINELS}
    clean["j2_asof_join"] = base["j2_asof_join"] * 5  # way out of gate
    code, art, _, flag_q = _run_triage(tmp_path, monkeypatch, clean)
    assert code != 0
    assert art["session_degraded"] is True
    assert [r["verdict"] for r in art["rows"]] == ["SESSION_DEGRADED"]
    assert "REGRESSION" not in json.dumps(art)
    assert art["sentinel_median_ratio"] > bt.SENTINEL_BAND


def test_single_slow_sentinel_does_not_trip(tmp_path, monkeypatch):
    """One outlier sentinel (e.g. an unlucky first run) must not
    declare the session degraded — the MEDIAN rules."""
    import tools.bench_triage as bt

    base = json.load(open("bench_baseline.json"))["queries"]
    clean = {s: base[s] * 1.0 for s in bt.SENTINELS}
    clean[bt.SENTINELS[0]] = base[bt.SENTINELS[0]] * 3.0
    clean["j2_asof_join"] = base["j2_asof_join"] * 5  # real regression
    code, art, _, flag_q = _run_triage(tmp_path, monkeypatch, clean)
    assert art["session_degraded"] is False
    assert [r["verdict"] for r in art["rows"]] == ["REGRESSION"]
    assert code == 1
