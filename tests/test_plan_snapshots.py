"""Plan lock-file check: every lockable query's physical-plan
structure (multiset of structural operator names) must match
tests/plan_snapshots.json. A silently lost broadcast, a new Exchange
in a narrow pipeline, or a Python boundary appearing where none was
fails here with the node-level diff. Intentional plan changes:

    python tools/plan_snapshot.py --update
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.plan_snapshot import SNAPSHOT_PATH, lockable, plan_signature


def test_plans_match_lockfile(spark, monkeypatch):
    from var_elasticnet_bigdata_spark import queries as Q

    # canonical uncached shapes, same mode the lock is built in: the
    # staged-frame persists are disabled so CacheManager substitution
    # (which hides a staged subtree's Exchange/Sort/Window inside an
    # InMemoryTableScan, depending on what ran before this test)
    # cannot perturb the signatures
    monkeypatch.setenv("SPARK_GRAFT_NO_STAGED_CACHE", "1")
    locked = json.load(open(SNAPSHOT_PATH))
    drifts = {}
    missing = []
    for name, fn in sorted(Q.QUERIES.items()):
        if not lockable(name):
            continue
        if name not in locked:
            missing.append(name)
            continue
        # clear per query: earlier tests' or queries' persisted frames
        # would otherwise still substitute into matching sub-plans
        spark.catalog.clearCache()
        sig = plan_signature(fn(spark, "/root/testdata/sf0.01"))
        want = locked[name]
        if sig != want:
            drifts[name] = {
                k: (want.get(k, 0), sig.get(k, 0))
                for k in sorted(set(want) | set(sig))
                if want.get(k, 0) != sig.get(k, 0)
            }
    assert not missing, (
        f"queries not in the plan lock (run tools/plan_snapshot.py "
        f"--update): {missing}"
    )
    assert not drifts, f"plan drift (locked, current): {drifts}"
    # the lock must cover the registry EXACTLY (VERDICT r6 item 9:
    # evidence docs lagged the registry) — no stale leftovers either
    stale = sorted(set(locked) - set(Q.QUERIES))
    assert not stale, f"plan lock holds entries for removed queries: {stale}"
    assert len(locked) == len(Q.QUERIES)
