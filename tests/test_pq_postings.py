"""IVF-PQ postings store (r10): incremental index maintenance —
append-encode with pinned artifacts, serve from probed cells'
postings only, batch-split invariance, exchange-free store reads."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


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
    names = ["pqs1", "pqs2", "pqs3"]
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}__pq")
    yield
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}__pq")


def test_append_split_invariance(spark, tmp_path, clean_store, artifacts):
    """Postings appended in two batches serve bit-identically to the
    one-shot inline chain over the union — growing the index by
    appends changes nothing."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        ivfpq_postings_append,
        ivfpq_postings_search,
        ivfpq_search,
    )
    from var_elasticnet_bigdata_spark.sources import load_table

    C, cb = artifacts
    e = load_table(spark, SF, "embeddings")
    ivfpq_postings_append(
        e.filter("vec_id < 250"), "pqs1", C, cb, buckets=4,
        path=str(tmp_path), fresh=True,
    )
    ivfpq_postings_append(
        e.filter("vec_id >= 250"), "pqs1", C, cb, buckets=4,
        path=str(tmp_path),
    )
    probes = e.filter("vec_id % 200 = 0")
    got = sorted(
        tuple(r)
        for r in ivfpq_postings_search(
            spark, "pqs1", probes, C, cb, nprobe=2, topk=3
        ).collect()
    )
    ref = sorted(
        tuple(r)
        for r in ivfpq_search(
            e, nlist=16, m=4, k=16, nprobe=2, topk=3, probe_mod=200,
            centroids=C, codebook=cb,
        ).collect()
    )
    assert got == ref and got


def test_serving_reads_only_probed_cells(spark, tmp_path, clean_store, artifacts):
    """Candidates can only come from each probe's probed cells: with
    nprobe=1 every returned id must live in its probe's single top
    cell (checked against an independent assignment pass)."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        ivf_assign,
        ivfpq_postings_append,
        ivfpq_postings_search,
    )
    from var_elasticnet_bigdata_spark.sources import load_table

    C, cb = artifacts
    e = load_table(spark, SF, "embeddings")
    ivfpq_postings_append(
        e, "pqs2", C, cb, buckets=4, path=str(tmp_path), fresh=True
    )
    probes = e.filter("vec_id % 100 = 0")
    out = ivfpq_postings_search(
        spark, "pqs2", probes, C, cb, nprobe=1, topk=5
    ).collect()
    assert out
    cell_of = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign(e, C, 1).filter("probe_rank = 0").collect()
    }
    for r in out:
        assert cell_of[r["vec_id"]] == cell_of[r["qid"]], r


def test_store_side_exchange_free(spark, tmp_path, clean_store, artifacts):
    from var_elasticnet_bigdata_spark.operators.similarity import (
        ivfpq_postings_append,
    )
    from var_elasticnet_bigdata_spark.plans.inspect import scan_ancestry
    from var_elasticnet_bigdata_spark.sources import load_table
    from var_elasticnet_bigdata_spark.sources.bucketing import read_bucketed

    C, cb = artifacts
    e = load_table(spark, SF, "embeddings")
    ivfpq_postings_append(
        e, "pqs3", C, cb, buckets=4, path=str(tmp_path), fresh=True
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = spark.createDataFrame([(3,)], "cell int")
        j = read_bucketed(spark, "pqs3__pq").join(
            probe.repartition(4, "cell"), "cell"
        )
        anc = scan_ancestry(j, r"pqs3__pq")
        assert not any(a.startswith("Exchange") for a in anc), anc
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_new_batch_candidates_appear_after_append(
    spark, tmp_path, clean_store, artifacts
):
    """The index genuinely grows: a neighbor that only exists in
    batch 2 cannot be returned before its append and appears after."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        ivfpq_postings_append,
        ivfpq_postings_search,
    )
    from var_elasticnet_bigdata_spark.sources import load_table

    C, cb = artifacts
    e = load_table(spark, SF, "embeddings")
    probes = e.filter("vec_id % 200 = 0")
    ivfpq_postings_append(
        e.filter("vec_id < 250"), "pqs1", C, cb, buckets=4,
        path=str(tmp_path), fresh=True,
    )
    before = {
        r["vec_id"]
        for r in ivfpq_postings_search(
            spark, "pqs1", probes, C, cb, nprobe=2, topk=3
        ).collect()
    }
    assert all(v < 250 for v in before)
    ivfpq_postings_append(
        e.filter("vec_id >= 250"), "pqs1", C, cb, buckets=4,
        path=str(tmp_path),
    )
    after = {
        r["vec_id"]
        for r in ivfpq_postings_search(
            spark, "pqs1", probes, C, cb, nprobe=2, topk=3
        ).collect()
    }
    assert any(v >= 250 for v in after)
