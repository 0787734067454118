"""ADC→exact refine stage for IVF-PQ serving (r11, VERDICT r10
item 2): vector sidecar beside the postings, bucket-pruned exact
re-rank, measured recall lift over pure ADC on the planted corpus."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def artifacts():
    path = os.path.join(
        os.path.dirname(__file__),
        "..",
        "var_elasticnet_bigdata_spark",
        "pinned",
        "ivfpq_artifacts.json",
    )
    art = json.load(open(path))
    return (
        np.array(art["centroids"], dtype=np.float64),
        np.array(art["codebook"], dtype=np.float64),
    )


@pytest.fixture
def clean_store(spark):
    names = ["rfs1", "rfs2", "rfs3"]
    for n in names:
        for suf in ("__pq", "__pq_ledger", "__vec"):
            spark.sql(f"DROP TABLE IF EXISTS {n}{suf}")
    yield
    for n in names:
        for suf in ("__pq", "__pq_ledger", "__vec"):
            spark.sql(f"DROP TABLE IF EXISTS {n}{suf}")


def test_refine_recall_lift_on_planted_corpus(spark):
    """The headline number: on the planted-companion corpus at the
    driver's oracle SF, exact re-rank of the ADC top-9 lifts
    recall@1 strictly above the pure-ADC arm, and row-wise a probe
    the ADC arm already hits is never LOST by refining (the exact
    nearest among survivors is the exact nearest)."""
    from var_elasticnet_bigdata_spark.queries import QUERIES

    rows = QUERIES["ann_ivfpq_refine_recall"](spark, SF_ORACLE).collect()
    assert rows
    n = len(rows)
    hits_adc = sum(r["hit_adc"] for r in rows)
    hits_ref = sum(r["hit_refined"] for r in rows)
    assert hits_ref > hits_adc, (hits_adc, hits_ref, n)
    assert hits_ref / n > 0.6, (hits_ref, n)
    for r in rows:
        assert r["hit_refined"] >= r["hit_adc"], dict(r.asDict())


def test_refine_d_exact_matches_independent_numpy(
    spark, tmp_path, clean_store, artifacts
):
    """d_exact in the refine output equals the true squared L2
    between the normalized probe and the normalized corpus vector,
    recomputed independently with numpy from the raw parquet — and
    ranks are dense and ordered by (d_exact, id)."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        ivfpq_postings_append,
        ivfpq_postings_refine_search,
    )
    from var_elasticnet_bigdata_spark.sources import load_table

    C, cb = artifacts
    e = load_table(spark, SF, "embeddings")
    ivfpq_postings_append(
        e, "rfs1", C, cb, buckets=4, path=str(tmp_path), fresh=True,
        store_vectors=True,
    )
    probes = e.filter("vec_id % 20 = 0")
    out = ivfpq_postings_refine_search(
        spark, "rfs1", probes, C, cb, nprobe=2, topk=3, refine_factor=3
    ).collect()
    assert out
    raw = {
        int(r["vec_id"]): np.array([float(x) for x in r["embedding"]])
        for r in e.collect()
    }

    def norm(v):
        s = float((v * v).sum())
        return v / (np.sqrt(s) if s else 1.0)

    by_q = {}
    for r in out:
        q, v = norm(raw[r["qid"]]), norm(raw[r["vec_id"]])
        d = float(((q - v) ** 2).sum())
        assert abs(r["d_exact"] - d) < 2e-6, (r, d)
        by_q.setdefault(r["qid"], []).append(
            (r["rank"], r["d_exact"], r["vec_id"])
        )
    for q, rows in by_q.items():
        rows.sort()
        assert [rk for rk, _, _ in rows] == list(range(1, len(rows) + 1))
        assert rows == sorted(rows, key=lambda t: (t[1], t[2])), (q, rows)


def test_refine_without_vector_sidecar_fails_loudly(
    spark, tmp_path, clean_store, artifacts
):
    """A store appended without store_vectors=True cannot silently
    serve refined results."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        ivfpq_postings_append,
        ivfpq_postings_refine_search,
    )
    from var_elasticnet_bigdata_spark.sources import load_table

    C, cb = artifacts
    e = load_table(spark, SF, "embeddings")
    ivfpq_postings_append(
        e, "rfs2", C, cb, buckets=4, path=str(tmp_path), fresh=True
    )
    with pytest.raises(Exception):
        ivfpq_postings_refine_search(
            spark, "rfs2", e.filter("vec_id % 20 = 0"), C, cb,
            nprobe=2, topk=3,
        ).collect()


def test_refine_survives_crash_window_vector_double_append(
    spark, tmp_path, clean_store, artifacts
):
    """A crash-window replay double-appends BOTH sinks; the refine
    path's (cell, id) distinct on the sidecar and the postings
    distinct keep the refined top-k identical to the single-append
    store."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        ivfpq_postings_append,
        ivfpq_postings_refine_search,
    )
    from var_elasticnet_bigdata_spark.sources import load_table

    C, cb = artifacts
    e = load_table(spark, SF, "embeddings")
    probes = e.filter("vec_id % 20 = 0")
    ivfpq_postings_append(
        e, "rfs3", C, cb, buckets=4, path=str(tmp_path), fresh=True,
        store_vectors=True,
    )
    single = sorted(
        tuple(r)
        for r in ivfpq_postings_refine_search(
            spark, "rfs3", probes, C, cb, nprobe=2, topk=3
        ).collect()
    )
    ivfpq_postings_append(
        e, "rfs3", C, cb, buckets=4, path=str(tmp_path),
        store_vectors=True,
    )
    doubled = sorted(
        tuple(r)
        for r in ivfpq_postings_refine_search(
            spark, "rfs3", probes, C, cb, nprobe=2, topk=3
        ).collect()
    )
    assert doubled == single and single
