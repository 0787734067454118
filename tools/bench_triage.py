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

The exit code is the number of REGRESSION rows (or the flag count on
a degraded session), so CI can gate on "every flag either
noise-dispositioned or acknowledged".

The re-time runs in THIS process (one Spark session for all flagged
queries) — clean by construction: no preceding 147-query session
state, bench.py's warmup set first.
"""

from __future__ import annotations

import json
import os
import sys
import time

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


def retime(names: list[str], runs: int = 3) -> dict[str, dict]:
    """Warmed clean-session 3-run medians for the named queries
    (the retime.py protocol, in-process)."""
    from var_elasticnet_bigdata_spark import queries as Q
    from var_elasticnet_bigdata_spark.session import get_spark
    from var_elasticnet_bigdata_spark.sources import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_triage")
    spark.sparkContext.setLogLevel("ERROR")
    Q.flagship_quarterly_revenue_growth(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).write.format("noop").mode("overwrite").save()
    tiny = spark.createDataFrame([(1, 1.0)], "k int, v double")
    tiny.groupBy("k").applyInPandas(
        lambda pdf: pdf, "k int, v double"
    ).write.format("noop").mode("overwrite").save()
    for t in ("documents", "embeddings", "events", "orders", "lineitem"):
        load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()
    Q.QUERIES["w4_lag_embed"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for name in names:
        samples: list[float] = []
        for _ in range(runs):
            t0 = time.time()
            Q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        samples.sort()
        out[name] = {
            "median": samples[len(samples) // 2],
            "spread": [samples[0], samples[-1]],
        }
    spark.stop()
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
    print(
        f"{len(flags)} gate flag(s) in {bench_path}; re-timing clean "
        f"({3}-run medians, sentinels first)..."
    )
    base = json.load(open(os.path.join(REPO, "bench_baseline.json")))[
        "queries"
    ]
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
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "bench": bench_path,
                    "sentinels": sentinel_report,
                    "sentinel_median_ratio": round(sent_median, 3),
                    "session_degraded": degraded,
                    "rows": rows,
                },
                f,
                indent=1,
            )
            f.write("\n")
        print(f"disposition written to {json_out}")
    return len(flags) if degraded else n_real


if __name__ == "__main__":
    raise SystemExit(main())
