"""Regression tests for the three ADVICE r9 items.

1. `cosine_topk(round_dp=6)` snaps similarities to the 6-dp grid
   BEFORE the (score desc, pid asc) ranking, so `ann_truncation_agree`
   matches its ROUND(...,6)-ordered DuckDB twin even on near-ties.
2. `mg_partition_summaries` accepts non-string item columns (the
   column is cast to string Spark-side; no silent Arrow coercion).
3. `synth_wav_payloads` pairs ids and payloads positionally (not by
   pandas index), so an upstream filter can never misalign them.
"""

from __future__ import annotations

import inspect
import math

import numpy as np


def test_cosine_topk_round_dp_snaps_before_ranking(spark):
    """Two probes whose raw cosines to the corpus vector differ by
    ~5e-8 (below the 6-dp grid): raw ranking picks the closer probe
    (pid 2); the snapped ranking sees a tie and must pick pid 1."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        cosine_topk,
    )

    def unit(cos):
        return [float(cos), float(math.sqrt(1.0 - cos * cos))]

    corpus = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    # pid 1 is FARTHER raw (0.99999955) but ties at 6 dp (1.0) with
    # pid 2 (0.99999960) — snap must flip the winner to the lower pid.
    probes = spark.createDataFrame(
        [(1, unit(0.99999955)), (2, unit(0.99999960))],
        "vec_id long, embedding array<double>",
    )
    raw = cosine_topk(
        corpus, queries=probes, k=1, exclude_self=False
    ).collect()[0]
    assert raw["neighbor_id"] == 2
    snapped = cosine_topk(
        corpus, queries=probes, k=1, exclude_self=False, round_dp=6
    ).collect()[0]
    assert snapped["neighbor_id"] == 1
    assert snapped["cosine"] == 1.0  # the snapped score is emitted too


def test_truncation_agree_sources_use_snap():
    """Can't-rot-again: both arms of ann_truncation_agree pass
    round_dp=6 and the twin orders by ROUND(..., 6)."""
    from var_elasticnet_bigdata_spark import queries as Q

    src = inspect.getsource(Q.ann_truncation_agree)
    assert src.count("round_dp=6") == 2
    sql = Q.ORACLE["ann_truncation_agree"]
    assert sql.count("ROUND(list_dot_product(a.e, p.e), 6)") == 2


def test_mg_summaries_accept_int_items(spark):
    """An int64 item column must flow through the string-typed MG
    summary schema without Arrow coercion errors, and the merged
    heavy-hitter keys must be the stringified ids."""
    from var_elasticnet_bigdata_spark.operators.sketch import (
        heavy_hitters_mg,
        mg_partition_summaries,
    )

    # 60 rows of id 7, 30 of id 8, 10 singletons
    rows = [(7,)] * 60 + [(8,)] * 30 + [(i,) for i in range(100, 110)]
    df = spark.createDataFrame(rows, "item_id long").repartition(4)
    summ = mg_partition_summaries(df, "item_id", k=8)
    assert dict(summ.dtypes)["item"] == "string"
    hh = heavy_hitters_mg(df, "item_id", k=8)
    assert all(isinstance(k, str) for k in hh)
    n = 100
    # MG guarantee: anything with true count > n/(k+1) survives the
    # merge, and reported counts under-estimate by at most n/(k+1).
    assert "7" in hh and hh["7"] >= 60 - n // 9
    assert "8" in hh and hh["8"] >= 30 - n // 9


def test_synth_wav_ids_positional(spark):
    """Payloads must match their ids even after an upstream filter:
    decode every payload and check it IS the id-deterministic signal
    (a pandas index-aligned id column would shuffle the pairing if a
    batch ever carried a non-RangeIndex)."""
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        _afp_pcm,
        decode_wav,
        synth_wav_payloads,
    )

    ids = spark.range(0, 40).selectExpr("id AS doc_id")
    picked = ids.filter("doc_id % 3 = 1").repartition(3)
    rows = synth_wav_payloads(picked).collect()
    assert {r["doc_id"] for r in rows} == set(range(1, 40, 3))
    for r in rows:
        _, x = decode_wav(bytes(r["payload"]))
        pcm = np.round(x[:, 0] * 32768.0).astype(np.int64)
        expect = _afp_pcm(int(r["doc_id"]))
        assert np.array_equal(pcm, expect), r["doc_id"]
    # mechanical guard: the id column is built positionally
    src = inspect.getsource(synth_wav_payloads)
    assert ".to_numpy()" in src
