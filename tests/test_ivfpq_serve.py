"""VERDICT r7 items 2+3: the serve-only IVF-PQ path and the
non-degenerate planted recall audit."""
from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_ORACLE, SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    from var_elasticnet_bigdata_spark.sources import load_table

    return load_table(spark, SF_SMALL, "embeddings")


def test_ivfpq_train_then_serve_equals_self_training(spark, emb):
    """`ivfpq_train` + `ivfpq_search(centroids=…, codebook=…)` must be
    bit-identical to the self-training `ivfpq_search` call on the same
    corpus — the train-once/serve-many split cannot change a single
    served row."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        ivfpq_search,
        ivfpq_train,
    )

    C, cb = ivfpq_train(emb, nlist=16, m=4, k=16)
    assert C.shape == (16, 64) and cb.shape == (16, 64)
    served = ivfpq_search(
        emb, nlist=16, m=4, k=16, nprobe=2, topk=3, probe_mod=200,
        centroids=C, codebook=cb,
    ).collect()
    chained = ivfpq_search(
        emb, nlist=16, m=4, k=16, nprobe=2, topk=3, probe_mod=200,
    ).collect()
    key = lambda r: (r["qid"], r["rank"])
    a = {key(r): (r["vec_id"], r["adc"]) for r in served}
    b = {key(r): (r["vec_id"], r["adc"]) for r in chained}
    assert a == b and len(a) > 0


def test_ivfpq_serve_query_matches_pinned_artifacts(spark):
    """The gated serve query must serve from the PINNED artifacts —
    regenerating them from the pinned training corpus (sf0.01)
    reproduces the JSON byte-for-byte (deterministic train), so the
    pin cannot drift from the pipeline that claims to produce it."""
    import json
    import os

    from var_elasticnet_bigdata_spark.operators.similarity import (
        ivfpq_train,
    )
    from var_elasticnet_bigdata_spark.sources import load_table

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "var_elasticnet_bigdata_spark", "pinned", "ivfpq_artifacts.json",
    )
    art = json.load(open(path))
    assert art["provenance"]["sf_dir"].endswith("sf0.01")
    emb = load_table(spark, SF_ORACLE, "embeddings")
    C, cb = ivfpq_train(emb, nlist=16, m=4, k=16)
    assert np.array_equal(np.array(art["centroids"]), C)
    assert np.array_equal(np.array(art["codebook"]), cb)


def test_ivfpq_recall_planted_is_non_degenerate(spark):
    """VERDICT r7 item 2: the planted-corpus recall audit must pin a
    recall STRICTLY between 0 and 1 at the driver's gate SF — both hit
    values present, so a routing regression (wrong nprobe cells,
    broken cell ranking) flips pinned rows instead of landing on a
    structurally-constant column."""
    from var_elasticnet_bigdata_spark.queries import QUERIES

    rows = QUERIES["ann_ivfpq_recall"](spark, SF_ORACLE).collect()
    hits = [r["hit"] for r in rows]
    assert 0 < sum(hits) < len(hits), hits
    # the small-delta planted companions are found by the index: every
    # hit row's winner is a planted id (offset 7,777,777)
    for r in rows:
        if r["hit"]:
            assert r["ivfpq_id"] >= 7_777_777
        assert r["exact_id"] >= 7_777_777  # planted are the exact NN


def test_recall_audit_probe_sampling_matches_full(spark):
    """VERDICT r8 item 4: the deterministic md5-bucket probe sample
    must estimate the SAME recall the full audit measures — per
    sampled probe the verdict is identical (the sample is a strict
    subset of the full audit's rows), and the sampled recall estimate
    sits within the stated 0.25 tolerance of the full recall at
    sf0.1. sample_mod=1 (the gated query's contract) is untouched."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        ivfpq_recall_top1,
    )
    from var_elasticnet_bigdata_spark.queries import _planted_embeddings

    emb = _planted_embeddings(spark, "/root/testdata/sf0.1")
    kw = dict(nlist=16, m=4, k=16, nprobe=2, probe_mod=100)
    full = {
        r["qid"]: r["hit"] for r in ivfpq_recall_top1(emb, **kw).collect()
    }
    samp = {
        r["qid"]: r["hit"]
        for r in ivfpq_recall_top1(emb, sample_mod=2, **kw).collect()
    }
    assert 0 < len(samp) < len(full)
    assert set(samp) < set(full)
    for q, h in samp.items():  # same per-probe verdict
        assert h == full[q]
    r_full = sum(full.values()) / len(full)
    r_samp = sum(samp.values()) / len(samp)
    assert abs(r_full - r_samp) <= 0.25
