"""Physical-plan audit over EVERY registered query — the 100 TB
readiness sweep, mechanized.

For each ``queries()`` entry, builds the plan at the given sf dir and
scans ``explain("formatted")`` output for scale-killers:

- ``CartesianProduct`` — an unbucketed all-pairs join (broadcast
  nested-loop joins against tiny literal tables are allowed and
  listed separately).
- Un-partitioned window sorts (``Window`` with an empty partition
  spec) — a global single-partition sort; allowed only on declared
  time-axis frontiers (see ALLOW_GLOBAL_WINDOW).
- Row-at-a-time Python UDFs (``BatchEvalPython``) — never allowed;
  Arrow paths (``ArrowEvalPython``/``FlatMapGroupsInPandas``/
  ``MapInPandas``) are reported as info.

Exit code 1 if any query trips a rule. Usage:

    python tools/plan_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose plan legitimately contains a global (un-partitioned)
# window: single-series time-axis frontiers, bounded by the
# post-aggregation quarter/day count — the same frontier the
# reference materializes wholesale. Everything else must partition.
ALLOW_GLOBAL_WINDOW = {
    # r11: every window input is a <=20-row top-k frame (dense arm
    # ranks AFTER TakeOrderedAndProject; sparse arm ranks bm25_topk's
    # limit(20) output; the fuse ranks the <=40-row outer join)
    "retrieval_hybrid_rrf",
    "flagship_quarterly_revenue_growth",  # ~40 quarter rows
    "a1_quarterly_rollup",
    "w5_rolling_origin_errors",  # quarterly axis
    "a3_msfe_by_horizon",
    "e5_pivot_reshape",
    "ml_modeltrain_msfe",  # cumulative AR(1) moments over one series
    "ml_theils_u_ar1",  # same cumulative frame (M23 table form)
    "ml_ar1_coefs",
    "j1_align_join",
    "w7_reconstruct_levels",  # per-series via partitionBy; checked below
    "stat_hosking",  # demeaned pair, ~40 rows
    "ml_lasso_soft_threshold",  # one lag over the quarterly axis
    "w4_lag_embed",  # VAR.Z over ONE wide series frame — the
    # post-aggregation estimation frontier (§4.3); the ML fits that
    # embed the same frame reduce it to moments immediately
}


def audit(name: str, df) -> tuple[list[str], list[str]]:
    """Returns (violations, notes) for one query plan."""
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    violations: list[str] = []
    notes: list[str] = []

    if "CartesianProduct" in plan:
        violations.append("CartesianProduct in physical plan")
    if "BatchEvalPython" in plan:
        violations.append("row-at-a-time Python UDF (BatchEvalPython)")

    # window specs: formatted mode prints "(N) Window" followed by an
    # Arguments line with top-level bracket groups
    # [exprs], [partition], [order] — the PARTITION GROUP IS OMITTED
    # ENTIRELY when empty (global single-partition sort), so an
    # un-partitioned window shows only 2 groups
    def _top_groups(s: str) -> list[str]:
        depth = 0
        groups: list[str] = []
        for ch in s:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth = max(depth - 1, 0)
            elif depth > 0:
                groups[-1] += ch
        return groups

    for m in re.finditer(
        r"\(\d+\) Window\s*\n(?:Input[^\n]*\n)?Arguments: (.*)", plan
    ):
        groups = _top_groups(m.group(1))
        # Arguments: [exprs] (+ [partition] if nonempty) (+ [order]
        # if nonempty). A 2-group form is unpartitioned ONLY when the
        # 2nd group is an ORDERING spec (ASC/DESC entries); a
        # partition-only window (e.g. min over partitionBy) also has
        # 2 groups but no sort — and no skew risk beyond the key.
        unpartitioned = len(groups) < 2 or (
            len(groups) == 2
            and (" ASC" in groups[1] or " DESC" in groups[1])
        )
        if unpartitioned and name not in ALLOW_GLOBAL_WINDOW:
            violations.append("un-partitioned Window (global sort)")
            break

    # InferFiltersFromGenerate tax: a lambda-free explode child gets a
    # size()>0 filter inferred, and predicate pushdown re-inlines the
    # full expression chain into that Filter — if the chain contains
    # the text-normalize pipeline inside a lambda, the filter
    # re-evaluates regexp normalization PER ARRAY ELEMENT per row
    # (measured 10× on the sf0.1 documents table). Keep a lambda in
    # the explode child (dedup.exploded_shingle_hashes) to suppress it.
    for m in re.finditer(r"\(\d+\) Filter[^\n]*\n(?:Input[^\n]*\n)?Condition : (.*)", plan):
        cond = m.group(1)
        if "lambdafunction" in cond and "regexp_replace" in cond:
            violations.append(
                "Filter re-evaluates a normalize pipeline per array "
                "element (InferFiltersFromGenerate pushdown tax)"
            )
            break
        if "regexp_replace" in cond:
            notes.append("filter duplicates a normalize chain")

    for arrow in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas",
                  "FlatMapCoGroupsInPandas"):
        if arrow in plan:
            notes.append(f"arrow boundary: {arrow}")
    if "BroadcastNestedLoopJoin" in plan:
        notes.append("broadcast nested-loop join (tiny literal side)")
    return violations, notes


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from var_elasticnet_bigdata_spark import queries as Q
    from var_elasticnet_bigdata_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    failed = 0
    for name, fn in sorted(Q.QUERIES.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # pragma: no cover - audit tool
            print(f"ERR  {name}: {e}")
            failed += 1
            continue
        violations, notes = audit(name, df)
        if violations:
            failed += 1
            print(f"FAIL {name}: " + "; ".join(violations))
        else:
            extra = f"  [{'; '.join(notes)}]" if notes else ""
            print(f"OK   {name}{extra}")
    print(f"\n{failed} plan violations")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
