"""Degraded-session detection in the bench triage tool (r11, VERDICT
r10 item 5): when the sentinel set is slow, NO flag may be
adjudicated — every row gets SESSION_DEGRADED and the exit code is
nonzero. No Spark: retime is stubbed."""

from __future__ import annotations

import json
import sys

_IDLE_OK = {
    "load1": 0.5, "ncpu": 32, "load_ok": True,
    "noop_median_sec": 0.3, "noop_samples": [0.3, 0.3, 0.3],
    "noop_pin_sec": 0.3, "noop_ratio": 1.0, "noop_ok": True,
    "idle": True,
}
_IDLE_BAD = dict(_IDLE_OK, noop_median_sec=1.4, noop_ratio=4.67,
                 noop_ok=False, idle=False)


def _run_triage(tmp_path, monkeypatch, clean_times):
    import tools.bench_triage as bt

    base = json.load(open("bench_baseline.json"))["queries"]
    # a bench with one artificial flag
    flag_q = "j2_asof_join"
    bench = {"queries": dict(base)}
    bench["queries"][flag_q] = base[flag_q] * 10
    bench_path = tmp_path / "bench.json"
    bench_path.write_text(json.dumps(bench))

    def fake_retime(names, runs=None):
        return {
            n: {"median": clean_times[n], "spread": [clean_times[n]] * 2}
            for n in names
        }

    monkeypatch.setattr(bt, "retime", fake_retime)
    monkeypatch.setattr(bt, "probe_idle", lambda: _IDLE_OK)
    monkeypatch.setattr(bt, "REPIN_STATE", str(tmp_path / "repin.json"))
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


def test_not_idle_refuses_all_verdicts(tmp_path, monkeypatch):
    """Idle probe fails (r12, VERDICT r11 item 2) -> NOTHING is
    adjudicated, not even sentinels; exit code = flag count; the
    artifact carries the probe evidence; no repin state is written."""
    import tools.bench_triage as bt

    base = json.load(open("bench_baseline.json"))["queries"]
    flag_q = "j2_asof_join"
    bench = {"queries": dict(base)}
    bench["queries"][flag_q] = base[flag_q] * 10
    bench_path = tmp_path / "bench.json"
    bench_path.write_text(json.dumps(bench))

    def boom(names, runs=None):  # retime must never be reached
        raise AssertionError("retime called on a non-idle host")

    monkeypatch.setattr(bt, "retime", boom)
    monkeypatch.setattr(bt, "probe_idle", lambda: _IDLE_BAD)
    repin_path = tmp_path / "repin.json"
    monkeypatch.setattr(bt, "REPIN_STATE", str(repin_path))
    out_path = tmp_path / "triage.json"
    monkeypatch.setattr(
        sys, "argv",
        ["bench_triage.py", "--json", str(out_path), str(bench_path)],
    )
    code = bt.main()
    art = json.load(open(out_path))
    assert code == 1
    assert art["idle"]["idle"] is False
    assert [r["verdict"] for r in art["rows"]] == ["SESSION_NOT_IDLE"]
    assert "REGRESSION" not in json.dumps(art)
    assert not repin_path.exists()


def test_clean_session_appends_repin_state(tmp_path, monkeypatch):
    """A healthy idle session records its adjudicated rows in the
    repin state file, with the idle evidence attached."""
    import tools.bench_triage as bt

    base = json.load(open("bench_baseline.json"))["queries"]
    clean = {s: base[s] * 1.0 for s in bt.SENTINELS}
    clean["j2_asof_join"] = base["j2_asof_join"] * 0.9
    code, art, _, flag_q = _run_triage(tmp_path, monkeypatch, clean)
    state = json.load(open(tmp_path / "repin.json"))
    assert len(state["sessions"]) == 1
    sess = state["sessions"][0]
    assert sess["idle"]["idle"] is True
    assert [r["query"] for r in sess["rows"]] == [flag_q]
    assert sess["rows"][0]["verdict"] == "NOISE"
    assert art["repins_proposed"] == []


def test_repin_rule_two_streaked_sessions(tmp_path, monkeypatch):
    """Pure rule: HOST_DRIFT in 2 consecutive clean sessions ->
    ab_exonerated re-pin proposal at the median of the clean medians;
    a NOISE row in between breaks the streak; REGRESSION streaks
    propose but are NOT ab_exonerated."""
    import tools.bench_triage as bt

    base = {"qa": 1.0, "qb": 1.0, "qc": 1.0}
    state = {"sessions": []}
    rows1 = [
        {"query": "qa", "clean_median": 2.4, "verdict": "HOST_DRIFT"},
        {"query": "qb", "clean_median": 2.0, "verdict": "HOST_DRIFT"},
        {"query": "qc", "clean_median": 3.0, "verdict": "REGRESSION"},
    ]
    rows2 = [
        {"query": "qa", "clean_median": 2.6, "verdict": "HOST_DRIFT"},
        {"query": "qb", "clean_median": 1.1, "verdict": "NOISE"},
        {"query": "qc", "clean_median": 3.2, "verdict": "REGRESSION"},
    ]
    bt.record_session(state, rows1, _IDLE_OK)
    assert bt.propose_repins(state, base) == []  # 1 session < REPIN_SESSIONS
    bt.record_session(state, rows2, _IDLE_OK)
    props = {p["query"]: p for p in bt.propose_repins(state, base)}
    assert set(props) == {"qa", "qc"}  # qb's NOISE broke the streak
    assert props["qa"]["ab_exonerated"] is True
    assert props["qa"]["new_pin"] == 2.6  # median of [2.4, 2.6]
    assert props["qa"]["old_pin"] == 1.0
    assert props["qc"]["ab_exonerated"] is False
