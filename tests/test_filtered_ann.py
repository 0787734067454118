"""Filtered ANN (`similarity.filtered_ivf_topk`) — VERDICT r9
missing item 1: predicate × cell-probe composition, the pre/post
strategy split, and the selectivity crossover."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from var_elasticnet_bigdata_spark.sources import load_table

    return load_table(spark, SF, "embeddings").cache()


@pytest.fixture(scope="module")
def cents(emb):
    from var_elasticnet_bigdata_spark.operators.similarity import (
        seed_centroids,
    )

    return seed_centroids(emb, nlist=8)


def test_choose_filter_mode_crossover():
    from var_elasticnet_bigdata_spark.operators.similarity import (
        choose_filter_mode,
    )

    assert choose_filter_mode(0.01) == "pre"
    assert choose_filter_mode(0.49) == "pre"
    assert choose_filter_mode(0.5) == "post"
    assert choose_filter_mode(0.95) == "post"
    assert choose_filter_mode(0.3, threshold=0.2) == "post"


def test_pre_filter_results_qualify_and_exclude_self(spark, emb, cents):
    from var_elasticnet_bigdata_spark.operators.similarity import (
        filtered_ivf_topk,
    )

    out = filtered_ivf_topk(
        emb, F.col("label") == 1, k=1, nlist=8, nprobe=3,
        mode="pre", centroids=cents, round_dp=6,
    ).collect()
    assert out, "no filtered matches at all"
    labels = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    for r in out:
        assert labels[r["neighbor_id"]] == 1
        assert r["neighbor_id"] != r["vec_id"]


def test_pre_equals_post_at_full_oversample(spark, emb, cents):
    """With oversample covering every candidate, post-filter keeps
    all probed-cell residents before filtering — both strategies then
    return the argmax over (probed cells ∩ qualifying residents), so
    their top-1 must agree row for row."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        filtered_ivf_topk,
    )

    n = emb.count()
    pre = {
        r["vec_id"]: r["neighbor_id"]
        for r in filtered_ivf_topk(
            emb, F.col("label") == 1, k=1, nlist=8, nprobe=3,
            mode="pre", centroids=cents, round_dp=6,
        ).collect()
    }
    post = {
        r["vec_id"]: r["neighbor_id"]
        for r in filtered_ivf_topk(
            emb, F.col("label") == 1, k=1, nlist=8, nprobe=3,
            mode="post", oversample=n, centroids=cents, round_dp=6,
        ).collect()
    }
    assert pre == post


def test_post_filter_recall_trade_is_real(spark, emb, cents):
    """With oversample=1, post-filter may return FEWER qualifying
    answers than pre-filter (a probe whose single unfiltered top-1
    doesn't qualify returns nothing) — the documented trade that
    motivates the selectivity crossover."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        filtered_ivf_topk,
    )

    pre_n = filtered_ivf_topk(
        emb, F.col("label") == 1, k=1, nlist=8, nprobe=3,
        mode="pre", centroids=cents, round_dp=6,
    ).count()
    post_n = filtered_ivf_topk(
        emb, F.col("label") == 1, k=1, nlist=8, nprobe=3,
        mode="post", oversample=1, centroids=cents, round_dp=6,
    ).count()
    assert post_n < pre_n


def test_auto_measures_selectivity_and_runs(spark, emb, cents):
    from var_elasticnet_bigdata_spark.operators.similarity import (
        filtered_ivf_topk,
    )

    # label = 1 is ~1/3 of rows -> auto goes 'pre'; equality with the
    # explicit pre result proves the measured branch choice
    auto = {
        (r["vec_id"], r["neighbor_id"])
        for r in filtered_ivf_topk(
            emb, F.col("label") == 1, k=1, nlist=8, nprobe=3,
            mode="auto", centroids=cents, round_dp=6,
        ).collect()
    }
    pre = {
        (r["vec_id"], r["neighbor_id"])
        for r in filtered_ivf_topk(
            emb, F.col("label") == 1, k=1, nlist=8, nprobe=3,
            mode="pre", centroids=cents, round_dp=6,
        ).collect()
    }
    assert auto == pre


def test_pre_filter_pushes_predicate_to_scan(spark, emb):
    """The whole point of 'pre': the predicate must reach the corpus
    parquet scan as a pushed filter, not sit above the decode."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        filtered_ivf_topk,
        seed_centroids,
    )
    from var_elasticnet_bigdata_spark.sources import load_table

    # the module fixture caches this table, and the CacheManager
    # substitutes InMemoryTableScan for any matching subtree — drop
    # the cache so the executed plan shows the REAL parquet scan
    emb.unpersist()
    e = load_table(spark, SF, "embeddings")
    C = seed_centroids(e, nlist=8)
    plan = filtered_ivf_topk(
        e, F.col("label") == 1, k=1, nlist=8, nprobe=3,
        mode="pre", centroids=C, round_dp=6,
    )._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(label,1)" in plan, plan[:4000]


def test_pre_filter_brute_force_parity(spark, emb, cents):
    """End-to-end numeric ground truth: replicate routing + filtered
    rerank in numpy and compare every (probe, winner) pair."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        filtered_ivf_topk,
        snap_half_away,
    )

    rows = emb.select("vec_id", "embedding", "label").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    lab = np.array([r["label"] for r in rows])
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = V @ cents.T
    # ivf_assign order: cosine desc (argsort of -sims, ties by index)
    cells = np.argsort(-sims, axis=1)
    resident = cells[:, 0]
    expect: dict[int, int] = {}
    for i in range(len(ids)):
        probed = set(cells[i, :3])
        mask = (
            np.isin(resident, list(probed)) & (lab == 1) & (ids != ids[i])
        )
        if not mask.any():
            continue
        s = snap_half_away(V[mask] @ V[i], 6)
        cand = ids[mask]
        order = np.lexsort((cand, -s))
        expect[int(ids[i])] = int(cand[order[0]])
    got = {
        r["vec_id"]: r["neighbor_id"]
        for r in filtered_ivf_topk(
            emb, F.col("label") == 1, k=1, nlist=8, nprobe=3,
            mode="pre", centroids=cents, round_dp=6,
        ).collect()
    }
    assert got == expect


def test_post_mode_respects_oversample_budget(spark, emb, cents):
    """With oversample=o, a probe returns a row iff one of its o
    unfiltered top candidates qualifies — verified against the
    unfiltered ranking computed independently."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        filtered_ivf_topk,
        ivf_topk,
    )

    o = 3
    unfiltered = ivf_topk(
        emb, k=o, nlist=8, nprobe=3, centroids=cents, round_dp=6
    ).collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    expect = {}
    by_probe: dict = {}
    for r in unfiltered:
        by_probe.setdefault(r["vec_id"], []).append(r)
    for pid, rows in by_probe.items():
        rows.sort(key=lambda r: r["rank"])
        for r in rows[:o]:
            if labels[r["neighbor_id"]] == 1:
                expect[pid] = r["neighbor_id"]
                break
    got = {
        r["vec_id"]: r["neighbor_id"]
        for r in filtered_ivf_topk(
            emb, F.col("label") == 1, k=1, nlist=8, nprobe=3,
            mode="post", oversample=o, centroids=cents, round_dp=6,
        ).collect()
    }
    assert got == expect
