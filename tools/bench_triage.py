"""Automated bench-flag disposition (VERDICT r9 item 6): re-time every
query `check_bench` flags in a CLEAN session (warmed 3-run medians via
the same protocol as tools/retime.py) and emit the disposition table
SCALING.md §r9 produced by hand — so driver-session noise is
adjudicated by machinery, not prose.

Usage:
    python tools/bench_triage.py [bench.json]   # default bench_full.json
    python tools/bench_triage.py --json out.json bench_full.json
    python tools/bench_triage.py --ab <git-ref> bench_full.json

``--ab <git-ref>`` (r11): every flag that survives the clean re-time
as REGRESSION is re-timed AGAIN on a worktree of ``git-ref`` (the
same retime.py protocol, subprocess session). If the old tree's
median is at least ~as slow (>= 90% of the new clean median), the
code cannot be the cause — verdict becomes HOST_DRIFT with both
medians in the artifact, and the row does not count toward the exit
code. This closes the last prose gap: "byte-identical old code is
just as slow today" is now a machine-emitted verdict, not a
SCALING.md narrative.

For each flagged query the verdict is:
  - NOISE      — clean median back inside the gate (ratio ≤ 1.3× or
                 delta ≤ +0.5 s): the session measurement, not the
                 tree, regressed.
  - REGRESSION — clean median still outside the gate: real; fix or
                 re-pin with rationale.
  - SESSION_DEGRADED — (r11, VERDICT r10 item 5) the SENTINEL check
                 failed: before any flag is adjudicated, three
                 pin-stable IO-light sentinel queries re-time in the
                 same clean session; if their MEDIAN clean/pin ratio
                 exceeds the sentinel band the host itself is slow
                 (thermal, co-tenant, IO contention) and NO verdict
                 this session is trustworthy — every row gets
                 SESSION_DEGRADED and the tool exits nonzero without
                 emitting a single REGRESSION/NOISE claim. This makes
                 the r10 failure mode (committed REGRESSION verdicts
                 overridden in prose because the evening host was
                 degraded) machine-checkable: the artifact can no
                 longer disagree with the shipped disposition without
                 a machine-readable reason.

Round 12 (VERDICT r11 items 1/2/8) adds two machine-checkable layers:

  - IDLE GATE: before any retiming, a host idleness probe (load
    average + a fixed no-op Spark job timed against a pinned
    constant, tools/retime.idle_probe) must pass — otherwise every
    row is SESSION_NOT_IDLE, nothing is adjudicated, and no medians
    count as clean. The r11 failure this closes: sentinel "clean"
    medians recorded while the host was still draining a test suite.
  - RE-PIN RULE: rows adjudicated in clean (idle + sentinel-healthy)
    sessions accumulate in bench_repin_state.json; a query outside
    the band in REPIN_SESSIONS consecutive clean sessions emits a
    machine-generated re-pin proposal (new_pin = median of the clean
    medians), flagged ab_exonerated when every session's A/B cleared
    the code. Pins are only ever rewritten against such a row.

The clean-retime protocol itself is shared with tools/retime.py and
includes PER-QUERY untimed warm runs: a fresh session's JIT warmup
zone lasts 2-3 runs for sub-second window-shaped plans, so unwarmed
3-run medians time the C2 compiler, not the plan (that is the whole
j2_asof_join r11 story — see tools/retime.py's docstring).

The exit code is the number of REGRESSION rows (or the flag count on
a degraded/not-idle session), so CI can gate on "every flag either
noise-dispositioned or acknowledged".

The re-time runs in THIS process (one Spark session for all flagged
queries) — clean by construction: no preceding 147-query session
state, bench.py's warmup set first.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RATIO = 1.3
FLOOR_SEC = 0.5

# Pin-stable, IO-light sentinels spanning three execution shapes
# (merge/as-of join, text aggregation, narrow Arrow/rolling-hash CPU
# pass). The session is DEGRADED when the median clean/pin ratio
# across them exceeds SENTINEL_BAND — deliberately tighter than the
# 1.3x flag gate: a host that can't hold known-stable sub-second
# queries within 25% of pin can't adjudicate anything.
#
# Selection is itself measured (r11): candidates were scored across
# the round's two independent full bench sessions; the initial third
# sentinel (ann_pca_power) ranged 0.98x-2.51x across sessions —
# session-noise-sensitive, so it biased the gate toward degraded on
# healthy hosts — and was replaced by text_fingerprint (0.85x/0.88x
# across the same sessions; j2_asof_join 0.95x/0.99x,
# text_heavy_hitters 0.66x/0.72x).
SENTINELS = ["j2_asof_join", "text_heavy_hitters", "text_fingerprint"]
SENTINEL_BAND = 1.25


def flagged_queries(bench_path: str) -> list[tuple[str, float, float]]:
    """(name, baseline_sec, session_sec) for every gate failure."""
    from tools.check_bench import load_bench

    bench = load_bench(bench_path)
    base = json.load(open(os.path.join(REPO, "bench_baseline.json")))[
        "queries"
    ]
    out = []
    for q, t in sorted(bench["queries"].items()):
        b = base.get(q)
        if b is not None and t > max(b * RATIO, b + FLOOR_SEC):
            out.append((q, b, t))
    return out


_SPARK = None


def _triage_spark():
    """One warmed session shared by probe_idle() and retime()."""
    global _SPARK
    if _SPARK is None:
        from tools.retime import warmup_session
        from var_elasticnet_bigdata_spark.session import get_spark

        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        _SPARK = get_spark("bench_triage")
        _SPARK.sparkContext.setLogLevel("ERROR")
        warmup_session(_SPARK, sf_dir)
    return _SPARK


def probe_idle() -> dict:
    """Host idleness evidence (tools/retime.idle_probe): load average
    + a fixed no-op Spark job timed against a pinned constant. Clean
    medians only count when this passes (r12, VERDICT r11 item 2 —
    the r11 sentinel calibration was itself taken on a still-loaded
    host, which two judge retimes refuted)."""
    from tools.retime import idle_probe

    return idle_probe(_triage_spark())


def retime(names: list[str], runs: int | None = None) -> dict[str, dict]:
    """Warmed clean-session medians for the named queries — the
    SHARED tools/retime protocol: per-query untimed warm runs (the
    JIT warmup zone of a fresh session lasts 2-3 runs for sub-second
    window plans; see tools/retime.py's module docstring and the r12
    j2_asof_join root-cause), then N timed runs, median reported."""
    from tools.retime import time_queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    return time_queries(_triage_spark(), sf_dir, names, runs=runs)


# ---- machine-checkable re-pin rule (r12, VERDICT r11 item 2) ----
# A pin may be rewritten only when the SAME query lands outside the
# gate band in REPIN_SESSIONS consecutive clean (idle-verified,
# sentinel-healthy) triage sessions. NOISE rows break the streak; a
# streak of A/B-exonerated HOST_DRIFT rows marks the proposal
# ab_exonerated (environment drift — re-pin freely); a REGRESSION
# streak still emits the row but flags it for a code-fix-or-override
# decision. State lives in bench_repin_state.json at the repo root.
REPIN_SESSIONS = 2
REPIN_STATE = os.path.join(REPO, "bench_repin_state.json")


def load_repin_state(path: str | None = None) -> dict:
    try:
        with open(path or REPIN_STATE) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"sessions": []}


def record_session(state: dict, rows: list[dict], idle: dict) -> dict:
    """Append one adjudicated clean session's rows to the state."""
    state.setdefault("sessions", []).append(
        {
            "id": len(state.get("sessions", [])) + 1,
            "idle": idle,
            "rows": [
                {
                    "query": r["query"],
                    "clean_median": r["clean_median"],
                    "verdict": r["verdict"],
                }
                for r in rows
            ],
        }
    )
    return state


def propose_repins(state: dict, base: dict) -> list[dict]:
    """Pure rule: for each query, look at its last REPIN_SESSIONS
    adjudicated rows across sessions; if ALL are outside the band
    (REGRESSION or HOST_DRIFT), emit a re-pin row whose new_pin is
    the median of those clean medians."""
    hist: dict[str, list[dict]] = {}
    for sess in state.get("sessions", []):
        for r in sess.get("rows", []):
            hist.setdefault(r["query"], []).append(r)
    out = []
    for q in sorted(hist):
        tail = hist[q][-REPIN_SESSIONS:]
        if len(tail) < REPIN_SESSIONS:
            continue
        if all(r["verdict"] in ("REGRESSION", "HOST_DRIFT") for r in tail):
            meds = sorted(r["clean_median"] for r in tail)
            out.append(
                {
                    "query": q,
                    "old_pin": base.get(q),
                    "new_pin": meds[len(meds) // 2],
                    "evidence_sessions": len(tail),
                    "ab_exonerated": all(
                        r["verdict"] == "HOST_DRIFT" for r in tail
                    ),
                }
            )
    return out


def ab_retime(ref: str, names: list[str]) -> dict[str, float]:
    """Re-time ``names`` on a worktree of ``ref`` (subprocess retime.py
    — its own clean Spark session, same warmup protocol). Returns
    {query: median_sec}."""
    import subprocess
    import tempfile

    wt = os.path.join(tempfile.gettempdir(), f"bench_ab_{ref[:12]}")
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", wt, ref],
            cwd=REPO, check=True, capture_output=True,
        )
    out = subprocess.run(
        [sys.executable, os.path.join(wt, "tools", "retime.py"), *names],
        cwd=wt, capture_output=True, text=True, timeout=900,
    )
    for line in reversed(out.stdout.splitlines()):
        if '"medians"' in line:
            start = line.index("{")
            return json.loads(line[start:])["medians"]
    raise RuntimeError(
        f"ab_retime: no medians line from {ref} retime; stderr tail: "
        + out.stderr[-500:]
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
        if json_out in args:
            args.remove(json_out)
    ab_ref = None
    if "--ab" in sys.argv:
        ab_ref = sys.argv[sys.argv.index("--ab") + 1]
        if ab_ref in args:
            args.remove(ab_ref)
    bench_path = args[0] if args else os.path.join(REPO, "bench_full.json")
    flags = flagged_queries(bench_path)
    if not flags:
        print(f"0 gate flags in {bench_path} — nothing to triage")
        return 0
    base = json.load(open(os.path.join(REPO, "bench_baseline.json")))[
        "queries"
    ]
    # idleness gate FIRST: no median taken on a loaded host counts as
    # clean (r12, VERDICT r11 item 2)
    idle = probe_idle()
    print(
        f"idle probe: load1 {idle['load1']} / {idle['ncpu']} cpus, "
        f"noop job {idle['noop_median_sec']:.2f}s "
        f"({idle['noop_ratio']:.2f}x pin) -> "
        + ("IDLE" if idle["idle"] else "NOT IDLE")
    )
    if not idle["idle"]:
        if json_out:
            with open(json_out, "w") as f:
                json.dump(
                    {
                        "bench": bench_path,
                        "idle": idle,
                        "session_degraded": True,
                        "rows": [
                            {
                                "query": q,
                                "baseline": b,
                                "session": t,
                                "verdict": "SESSION_NOT_IDLE",
                            }
                            for q, b, t in flags
                        ],
                    },
                    f,
                    indent=1,
                )
                f.write("\n")
            print(f"disposition written to {json_out}")
        print(
            f"{len(flags)} flag(s) NOT adjudicated — host not idle; "
            "re-run on a quiet host"
        )
        return len(flags)
    print(
        f"{len(flags)} gate flag(s) in {bench_path}; re-timing clean "
        "(warmed medians, sentinels first)..."
    )
    flag_names = [q for q, _, _ in flags]
    names = SENTINELS + [q for q in flag_names if q not in SENTINELS]
    clean = retime(names)

    # sentinel gate BEFORE any adjudication (r11, VERDICT r10 item 5)
    sent_ratios = sorted(
        clean[s]["median"] / base[s] for s in SENTINELS if s in base
    )
    sent_median = sent_ratios[len(sent_ratios) // 2]
    sentinel_report = {
        s: {
            "pin": base.get(s),
            "clean_median": clean[s]["median"],
            "ratio": round(clean[s]["median"] / base[s], 2)
            if s in base
            else None,
        }
        for s in SENTINELS
    }
    degraded = sent_median > SENTINEL_BAND
    for s in SENTINELS:
        r = sentinel_report[s]
        print(
            f"sentinel   {s}: pin {r['pin']:.2f}s, clean "
            f"{r['clean_median']:.2f}s ({r['ratio']:.2f}x)"
        )
    print(
        f"sentinel median ratio {sent_median:.2f}x "
        f"(band {SENTINEL_BAND}x) -> "
        + ("SESSION DEGRADED" if degraded else "session healthy")
    )

    rows = []
    n_real = 0
    for q, b, t in flags:
        med = clean[q]["median"]
        lo, hi = clean[q]["spread"]
        if degraded:
            verdict = "SESSION_DEGRADED"
        else:
            ok = med <= max(b * RATIO, b + FLOOR_SEC)
            verdict = "NOISE" if ok else "REGRESSION"
            n_real += 0 if ok else 1
        rows.append(
            {
                "query": q,
                "baseline": b,
                "session": t,
                "clean_median": med,
                "clean_spread": [lo, hi],
                "ratio_session": round(t / b, 2),
                "ratio_clean": round(med / b, 2),
                "verdict": verdict,
            }
        )
        print(
            f"{verdict:16s} {q}: pin {b:.2f}s, session {t:.2f}s "
            f"({t / b:.2f}x), clean median {med:.2f}s ({med / b:.2f}x, "
            f"spread {lo:.2f}-{hi:.2f})"
        )
    # --ab arm: a surviving REGRESSION on code that is just as slow
    # at the reference tree is host drift, not a code regression
    if ab_ref is not None and not degraded:
        suspects = [r for r in rows if r["verdict"] == "REGRESSION"]
        if suspects:
            print(f"A/B re-time of {len(suspects)} suspect(s) at {ab_ref}...")
            old = ab_retime(ab_ref, [r["query"] for r in suspects])
            for r in suspects:
                r["ab_ref"] = ab_ref
                r["ab_median"] = old[r["query"]]
                if old[r["query"]] >= r["clean_median"] * 0.9:
                    r["verdict"] = "HOST_DRIFT"
                    n_real -= 1
                print(
                    f"{r['verdict']:16s} {r['query']}: {ab_ref} median "
                    f"{old[r['query']]:.2f}s vs HEAD clean "
                    f"{r['clean_median']:.2f}s"
                )
    repins: list[dict] = []
    if degraded:
        print(
            f"{len(flags)} flag(s) NOT adjudicated — degraded session; "
            "re-run on a quiet host"
        )
    else:
        from collections import Counter

        counts = Counter(r["verdict"] for r in rows)
        print(
            f"{n_real} real regression(s); "
            + ", ".join(f"{v} {k}" for k, v in sorted(counts.items()))
        )
        # re-pin rule: only idle + sentinel-healthy sessions count
        state = record_session(load_repin_state(), rows, idle)
        repins = propose_repins(state, base)
        with open(REPIN_STATE, "w") as f:
            json.dump(state, f, indent=1)
            f.write("\n")
        for p in repins:
            print(
                f"RE-PIN proposed   {p['query']}: {p['old_pin']} -> "
                f"{p['new_pin']} ({p['evidence_sessions']} clean "
                f"sessions outside band"
                + (", A/B-exonerated)" if p["ab_exonerated"] else ")")
            )
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "bench": bench_path,
                    "idle": idle,
                    "sentinels": sentinel_report,
                    "sentinel_median_ratio": round(sent_median, 3),
                    "session_degraded": degraded,
                    "rows": rows,
                    "repins_proposed": repins,
                },
                f,
                indent=1,
            )
            f.write("\n")
        print(f"disposition written to {json_out}")
    return len(flags) if degraded else n_real


if __name__ == "__main__":
    raise SystemExit(main())
