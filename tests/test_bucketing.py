"""Bucketed tables (`sources/bucketing.py`): the write-once shuffle.

The plan assertions are the point: a join of two tables bucketed on
the same key/count must contain NO exchange on either side, and a
group-by on the bucket key must aggregate without a shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from var_elasticnet_bigdata_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    rng = np.random.default_rng(0)
    n = 20_000
    facts = pd.DataFrame(
        {
            "k": rng.integers(0, 500, n).astype("int64"),
            "v": rng.normal(size=n).round(6),
        }
    )
    dims = pd.DataFrame(
        {
            "k": np.arange(500, dtype="int64"),
            "w": rng.normal(size=500).round(6),
        }
    )
    write_bucketed(
        spark.createDataFrame(facts), "t_facts", "k", buckets=8,
        sort_cols="k", path=str(base / "facts"),
    )
    write_bucketed(
        spark.createDataFrame(dims), "t_dims", "k", buckets=8,
        sort_cols="k", path=str(base / "dims"),
    )
    yield facts, dims
    spark.sql("DROP TABLE IF EXISTS t_facts")
    spark.sql("DROP TABLE IF EXISTS t_dims")


def _no_broadcast(spark):
    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", None
        ),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v:
            spark.conf.set(k, v)
        else:
            spark.conf.unset(k)


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    facts, dims = bucketed_pair
    old = _no_broadcast(spark)
    try:
        f = read_bucketed(spark, "t_facts")
        d = read_bucketed(spark, "t_dims")
        res = f.join(d, "k").groupBy("k").agg(F.sum(F.col("v") * F.col("w")).alias("x"))
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result is right
        exp = (
            facts.merge(dims, on="k")
            .assign(x=lambda t: t.v * t.w)
            .groupby("k", as_index=False)["x"]
            .sum()
            .sort_values("k")
            .reset_index(drop=True)
        )
        act = res.toPandas().sort_values("k").reset_index(drop=True)
        np.testing.assert_array_equal(act["k"], exp["k"])
        np.testing.assert_allclose(act["x"], exp["x"], rtol=1e-9)
    finally:
        _restore(spark, old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    f = read_bucketed(spark, "t_facts")
    res = f.groupBy("k").agg(F.sum("v").alias("s"))
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_plain_parquet_read_loses_buckets(spark, bucketed_pair, tmp_path):
    # the cautionary half of read_bucketed's docstring, asserted
    old = _no_broadcast(spark)
    try:
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED t_facts")
            .filter(F.col("col_name") == "Location")
            .collect()[0]["data_type"]
        )
        f_raw = spark.read.parquet(loc)
        res = f_raw.groupBy("k").agg(F.sum("v").alias("s"))
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        _restore(spark, old)


def test_incremental_near_dup_bucketed_store(spark, tmp_path):
    """VERDICT r4 #3: the persisted signature store must (a) give the
    same survivors as the DataFrame-store path batch for batch, and
    (b) be read already-partitioned — NO Exchange between the store
    scans and their joins; only the new batch shuffles."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        incremental_near_dup,
        incremental_near_dup_bucketed,
    )
    from var_elasticnet_bigdata_spark.plans.inspect import scan_ancestry

    base = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet cyan magenta black",
        "spark duck table query shuffle join window filter scan sort",
    ]
    rows = []
    rid = 0
    for b in base:
        rows.append((rid, b)); rid += 1
        rows.append((rid, b + " extra")); rid += 1
        rows.append((rid, " ".join(reversed(b.split())))); rid += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    batches = [
        docs.filter(F.col("doc_id") < 4),
        docs.filter((F.col("doc_id") >= 4) & (F.col("doc_id") < 8)),
        docs.filter(F.col("doc_id") >= 8),
    ]
    spark.sql("DROP TABLE IF EXISTS ibs__bands")
    spark.sql("DROP TABLE IF EXISTS ibs__sigs")
    try:
        store = None
        for i, b in enumerate(batches):
            ref, store = incremental_near_dup(b, store, threshold=0.5)
            got = incremental_near_dup_bucketed(
                b, "ibs", threshold=0.5, buckets=4, path=str(tmp_path)
            )
            assert sorted(r.doc_id for r in got.collect()) == sorted(
                r.doc_id for r in ref.collect()
            ), f"batch {i} diverged"
        # store now holds every survivor's rows exactly once
        n_surv = spark.table("ibs__sigs").count()
        assert n_surv == store.count()

        # plan shape: store side of the band join and of the shingle
        # lookup must reach its join with no Exchange above the scan
        old = _no_broadcast(spark)
        try:
            probe = spark.createDataFrame(
                [(100, "0:abc")], "doc_id long, bk string"
            )
            j = (
                read_bucketed(spark, "ibs__bands")
                .select(F.col("doc_id").alias("id_a"), "bk")
                .join(
                    probe.select(F.col("doc_id").alias("id_b"), "bk"), "bk"
                )
            )
            anc = scan_ancestry(j, r"ibs__bands")
            assert not any(a.startswith("Exchange") for a in anc), anc

            cand = spark.createDataFrame([(0,)], "id_a long")
            j2 = (
                read_bucketed(spark, "ibs__sigs")
                .select(F.col("doc_id").alias("id_a"), "sh")
                .join(cand, "id_a")
            )
            anc2 = scan_ancestry(j2, r"ibs__sigs")
            assert not any(a.startswith("Exchange") for a in anc2), anc2
        finally:
            _restore(spark, old)
    finally:
        spark.sql("DROP TABLE IF EXISTS ibs__bands")
        spark.sql("DROP TABLE IF EXISTS ibs__sigs")


def test_contamination_store_exchange_free_and_equivalent(spark, tmp_path):
    """The persisted benchmark shingle store: (a) contamination_vs_store
    must agree with the in-flight split_contamination on the same
    corpus/split, including after an append of extra benchmark docs
    recomputed as a fresh union run; (b) the store side of the shingle
    join reaches its join with no Exchange above the bucketed scan."""
    from var_elasticnet_bigdata_spark.operators.split import (
        contamination_store_write,
        contamination_vs_store,
        hash_split,
        split_contamination,
    )
    from var_elasticnet_bigdata_spark.plans.inspect import scan_ancestry

    rows = [
        (i, f"tok{i % 7} alpha beta gamma delta epsilon zeta eta theta w{i}")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lab = hash_split(docs, "doc_id")
    spark.sql("DROP TABLE IF EXISTS cstore__shingles")
    try:
        contamination_store_write(
            lab.filter(F.col("split") == "train"), "cstore", n=3,
            buckets=4, path=str(tmp_path),
        )
        got = contamination_vs_store(
            lab.filter(F.col("split") == "test"), "cstore", n=3
        )
        ref = split_contamination(docs, n=3)
        g = {r.doc_id: (r.n_shingles, r.n_hit) for r in got.collect()}
        r_ = {r.doc_id: (r.n_shingles, r.n_hit) for r in ref.collect()}
        assert g == r_

        # append a second benchmark (duplicate shingles allowed) ==
        # a fresh run over the union
        extra = spark.createDataFrame(
            [(1000, "omega psi chi phi upsilon tau sigma rho")],
            "doc_id long, text string",
        )
        contamination_store_write(extra, "cstore", n=3, buckets=4, mode="append")
        got2 = {
            r.doc_id: (r.n_shingles, r.n_hit)
            for r in contamination_vs_store(
                lab.filter(F.col("split") == "test"), "cstore", n=3
            ).collect()
        }
        union_lab = hash_split(docs.unionByName(extra), "doc_id").withColumn(
            "split",
            F.when(F.col("doc_id") == 1000, "train").otherwise(F.col("split")),
        )
        union_ref = split_contamination(union_lab, n=3, split_col="split")
        u = {r.doc_id: (r.n_shingles, r.n_hit) for r in union_ref.collect()}
        assert got2 == u

        old = _no_broadcast(spark)
        try:
            probe = spark.createDataFrame([(5, "abc")], "doc_id long, s string")
            j = (
                read_bucketed(spark, "cstore__shingles")
                .groupBy("s")
                .agg(F.lit(1).alias("hit"))
                .join(probe, "s")
            )
            anc = scan_ancestry(j, r"cstore__shingles")
            assert not any(a.startswith("Exchange") for a in anc), anc
        finally:
            _restore(spark, old)
    finally:
        spark.sql("DROP TABLE IF EXISTS cstore__shingles")


def test_compact_bucketed_store_merges_append_fragments(spark, tmp_path):
    """N appends leave N files per bucket; compact_bucketed must
    rewrite to ~one file per bucket, preserve rows exactly, and KEEP
    the bucketing contract (exchange-free join still asserted after
    the swap)."""
    from var_elasticnet_bigdata_spark.plans.inspect import scan_ancestry
    from var_elasticnet_bigdata_spark.sources.compaction import (
        compact_bucketed,
    )

    spark.sql("DROP TABLE IF EXISTS cstore2")
    spark.sql("DROP TABLE IF EXISTS cstore2__compacting")
    try:
        for batch in range(4):
            df = spark.createDataFrame(
                [(batch * 100 + i, float(i)) for i in range(50)],
                "k long, v double",
            )
            write_bucketed(
                df, "cstore2", "k", buckets=4, sort_cols="k",
                path=str(tmp_path / "cstore2") if batch == 0 else None,
                mode="overwrite" if batch == 0 else "append",
            )
        rows_before = {
            (r.k, r.v) for r in spark.table("cstore2").collect()
        }
        before, after = compact_bucketed(spark, "cstore2")
        assert before >= 16  # 4 appends x 4 buckets
        assert after <= 8, (before, after)
        assert {
            (r.k, r.v) for r in spark.table("cstore2").collect()
        } == rows_before
        old = _no_broadcast(spark)
        try:
            probe = spark.createDataFrame([(5,)], "k long")
            j = read_bucketed(spark, "cstore2").join(probe, "k")
            anc = scan_ancestry(j, r"cstore2")
            assert not any(a.startswith("Exchange") for a in anc), anc
        finally:
            _restore(spark, old)
        # compacting twice alternates the sibling location cleanly
        b2, a2 = compact_bucketed(spark, "cstore2")
        assert {
            (r.k, r.v) for r in spark.table("cstore2").collect()
        } == rows_before
        assert a2 <= 8
    finally:
        spark.sql("DROP TABLE IF EXISTS cstore2")
        spark.sql("DROP TABLE IF EXISTS cstore2__compacting")
