"""Clean-session re-time of specific queries: bench.py's session
warmups, PER-QUERY untimed warm runs, then N-run medians, for only
the queries named on the CLI — the tool the pin discipline uses when
a query needs a (re-)pin without paying a full-registry bench
session.

    python tools/retime.py text_kn_perplexity [more...]

Prints one JSON line {query: median_sec} plus per-query spread and
the host idleness evidence.

Why per-query warm runs (r12, VERDICT r11 item 1): pins are
median-of-3 CONSECUTIVE runs recorded deep inside a full bench
session, where hundreds of earlier queries have already C2-compiled
the shared WindowExec/join/aggregate codegen. In a fresh session that
JIT warmup zone lasts 2-3 runs for sub-second window-shaped plans —
measured on `j2_asof_join` (byte-identical code at HEAD and at its
pinning commit 4dcffab): runs 1-3 land at 1.8-3.6 s, runs 4+ settle
at 0.58-0.73 s against a 0.683 s pin. A 3-run median with no
per-query warmup therefore times the JIT, not the plan — that is the
exact mechanism behind the r11 "j2_asof_join 3.0x on an idle host"
reading. Warm runs make a clean-session median comparable to a
bench-session pin.

Env knobs: SPARK_GRAFT_BENCH_RUNS (timed runs, default 5),
SPARK_GRAFT_RETIME_WARM (untimed per-query warm runs, default 2),
SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Idle gate for "clean" medians (r12, VERDICT r11 item 2): a fixed
# CPU-bound no-op Spark job (no IO, constant input) timed against a
# constant. IDLE_JOB_PIN_SEC was calibrated on this host with the
# suite idle (median of 5); a loaded host (co-tenant bench, pytest
# still draining, thermal throttle) runs it well above the band.
# os.getloadavg() alone is NOT sufficient — load average trails a
# just-finished test suite by minutes while cores are already free,
# and misses cgroup-external contention; the probe job measures what
# actually matters (can this JVM get its cores NOW).
IDLE_JOB_PIN_SEC = 0.30
IDLE_JOB_BAND = 2.0
IDLE_LOAD_PER_CPU = 0.5


def idle_probe(spark) -> dict:
    """Measure host idleness: 1-min load average per CPU plus the
    median of 3 runs (after 1 untimed warm run) of a fixed no-op
    Spark job against its pinned constant. Returns the evidence
    dict; ``idle`` is the verdict."""
    ncpu = os.cpu_count() or 1
    load1 = os.getloadavg()[0]
    spark.range(0, 64_000_000, 1, 64).selectExpr(
        "sum(id % 1000003) AS s"
    ).collect()
    samples = []
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 64_000_000, 1, 64).selectExpr(
            "sum(id % 1000003) AS s"
        ).collect()
        samples.append(round(time.time() - t0, 3))
    samples.sort()
    med = samples[1]
    return {
        "load1": round(load1, 2),
        "ncpu": ncpu,
        "load_ok": load1 / ncpu <= IDLE_LOAD_PER_CPU,
        "noop_median_sec": med,
        "noop_samples": samples,
        "noop_pin_sec": IDLE_JOB_PIN_SEC,
        "noop_ratio": round(med / IDLE_JOB_PIN_SEC, 2),
        "noop_ok": med <= IDLE_JOB_PIN_SEC * IDLE_JOB_BAND,
        "idle": load1 / ncpu <= IDLE_LOAD_PER_CPU
        and med <= IDLE_JOB_PIN_SEC * IDLE_JOB_BAND,
    }


def warmup_session(spark, sf_dir: str) -> None:
    """bench.py's session warmup set, abbreviated: JVM/codegen +
    Arrow pools + page cache for the big tables + representative
    window plan shape."""
    from var_elasticnet_bigdata_spark import queries as Q
    from var_elasticnet_bigdata_spark.sources import load_table

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


def time_queries(
    spark,
    sf_dir: str,
    names: list[str],
    runs: int | None = None,
    warm_runs: int | None = None,
) -> dict[str, dict]:
    """Per-query: ``warm_runs`` untimed executions (JIT/codegen for
    THIS plan shape — see module docstring), then ``runs`` timed
    executions; report median + spread. This is THE clean-retime
    protocol; bench_triage.py adjudicates with exactly this
    function so "clean median" always means warmed-median."""
    from var_elasticnet_bigdata_spark import queries as Q

    if runs is None:
        runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    if warm_runs is None:
        warm_runs = max(0, int(os.environ.get("SPARK_GRAFT_RETIME_WARM", "2")))
    out: dict[str, dict] = {}
    for name in names:
        for _ in range(warm_runs):
            Q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
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
            "samples": samples,
        }
    return out


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: retime.py <query> [query...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from var_elasticnet_bigdata_spark.session import get_spark

    spark = get_spark("retime")
    spark.sparkContext.setLogLevel("ERROR")
    warmup_session(spark, sf_dir)
    idle = idle_probe(spark)
    timed = time_queries(spark, sf_dir, names)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "idle": idle,
                "medians": {n: r["median"] for n, r in timed.items()},
                "spread": {n: r["spread"] for n, r in timed.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
