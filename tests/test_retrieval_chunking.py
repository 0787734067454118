"""Unit tests for chunking, contamination, and BM25 retrieval
(operators/text.chunk_tokens, operators/split.split_contamination,
operators/retrieval.bm25_topk)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# chunk_tokens
# ---------------------------------------------------------------------------


def test_chunk_boundaries_non_overlapping(spark):
    from var_elasticnet_bigdata_spark.operators.text import chunk_tokens

    text = " ".join(f"w{i}" for i in range(70))
    out = chunk_tokens(_docs(spark, [(1, text)]), chunk_size=32).orderBy(
        "chunk_id"
    )
    rows = out.collect()
    assert [r.chunk_id for r in rows] == [1, 2, 3]
    assert [r.n_tokens for r in rows] == [32, 32, 6]


def test_chunk_overlap_stride(spark):
    from var_elasticnet_bigdata_spark.operators.text import chunk_tokens

    # 70 tokens, chunk 32, stride 24: starts 1, 25, 49 → sizes 32, 32, 22
    text = " ".join(f"w{i}" for i in range(70))
    rows = (
        chunk_tokens(_docs(spark, [(1, text)]), chunk_size=32, stride=24)
        .orderBy("chunk_id")
        .collect()
    )
    assert [r.n_tokens for r in rows] == [32, 32, 22]


def test_chunk_short_and_empty_doc(spark):
    from var_elasticnet_bigdata_spark.operators.text import chunk_tokens

    rows = (
        chunk_tokens(
            _docs(spark, [(1, "just three words"), (2, "")]), chunk_size=32
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.doc_id, r.chunk_id, r.n_tokens) for r in rows] == [
        (1, 1, 3),
        (2, 1, 0),
    ]


def test_chunk_exact_multiple_no_empty_tail(spark):
    from var_elasticnet_bigdata_spark.operators.text import chunk_tokens

    text = " ".join(f"w{i}" for i in range(64))
    rows = chunk_tokens(_docs(spark, [(1, text)]), chunk_size=32).collect()
    assert sorted(r.n_tokens for r in rows) == [32, 32]


def test_chunk_reconstructs_tokens(spark):
    """Non-overlapping chunk keys partition the token stream: chunk
    md5s recomputed from the source tokens match exactly."""
    import hashlib

    from var_elasticnet_bigdata_spark.operators.text import chunk_tokens

    toks = [f"tok{i}" for i in range(50)]
    rows = (
        chunk_tokens(_docs(spark, [(7, " ".join(toks))]), chunk_size=16)
        .orderBy("chunk_id")
        .collect()
    )
    for i, r in enumerate(rows):
        expect = " ".join(toks[i * 16 : (i + 1) * 16])
        assert r.chunk_key == hashlib.md5(expect.encode()).hexdigest()


def test_chunk_plan_is_narrow(spark):
    """No shuffle anywhere in the chunking plan."""
    from var_elasticnet_bigdata_spark.operators.text import chunk_tokens

    df = chunk_tokens(_docs(spark, [(1, "a b c")]), chunk_size=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_rejects_bad_sizes(spark):
    from var_elasticnet_bigdata_spark.operators.text import chunk_tokens

    with pytest.raises(ValueError):
        chunk_tokens(_docs(spark, [(1, "a")]), chunk_size=0)
    with pytest.raises(ValueError):
        chunk_tokens(_docs(spark, [(1, "a")]), chunk_size=4, stride=-1)


# ---------------------------------------------------------------------------
# split_contamination
# ---------------------------------------------------------------------------


def test_contamination_with_injected_labels(spark):
    """Planted overlap: eval doc 10 shares its text with train doc 1
    (ratio 1.0); eval doc 11 is disjoint (ratio 0.0)."""
    from var_elasticnet_bigdata_spark.operators.split import (
        split_contamination,
    )

    shared = " ".join(f"s{i}" for i in range(12))
    clean = " ".join(f"c{i}" for i in range(12))
    df = spark.createDataFrame(
        [
            (1, shared, "train"),
            (2, "other train text entirely different", "train"),
            (10, shared, "test"),
            (11, clean, "test"),
        ],
        "doc_id long, text string, split string",
    )
    rows = {
        r.doc_id: r
        for r in split_contamination(df, n=8, split_col="split").collect()
    }
    assert rows[10].hit_ratio == pytest.approx(1.0)
    assert rows[11].hit_ratio == pytest.approx(0.0)
    # 12 tokens, 8-grams → 5 distinct shingles per doc
    assert rows[10].n_shingles == 5
    assert rows[10].n_hit == 5
    assert rows[11].n_hit == 0


def test_contamination_partial_overlap(spark):
    """Eval doc sharing a prefix run of train tokens gets a
    fractional ratio strictly between 0 and 1."""
    from var_elasticnet_bigdata_spark.operators.split import (
        split_contamination,
    )

    train = " ".join(f"t{i}" for i in range(20))
    # first 10 tokens shared, last 10 novel
    ev = " ".join([f"t{i}" for i in range(10)] + [f"n{i}" for i in range(10)])
    df = spark.createDataFrame(
        [(1, train, "train"), (2, ev, "test")],
        "doc_id long, text string, split string",
    )
    r = split_contamination(df, n=8, split_col="split").collect()[0]
    # eval has 13 8-grams; shingles fully inside t0..t9 are those
    # starting at positions 1..3 → 3 hits
    assert r.n_shingles == 13
    assert r.n_hit == 3
    assert 0.0 < r.hit_ratio < 1.0


def test_contamination_hash_split_matches_duck(spark, duck):
    """Full-rule equivalence on real testdata at sf0.01."""
    from var_elasticnet_bigdata_spark.operators.split import (
        duck_contamination_sql,
        split_contamination,
    )
    from var_elasticnet_bigdata_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    got = {
        r.doc_id: (r.n_shingles, r.n_hit, round(r.hit_ratio, 9))
        for r in split_contamination(docs, n=8).collect()
    }
    want = {
        int(d): (int(ns), int(nh), round(float(hr), 9))
        for d, ns, nh, hr in duck.execute(
            duck_contamination_sql(n=8)
        ).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# bm25_topk
# ---------------------------------------------------------------------------


def test_bm25_matches_reference_formula(spark):
    from var_elasticnet_bigdata_spark.operators.retrieval import (
        bm25_reference,
        bm25_topk,
    )

    rows = [
        (1, "spark shuffle join spark spark table"),
        (2, "window sort merge window table row"),
        (3, "completely unrelated words only here"),
        (4, "spark window spark window sort sort merge agg"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["spark", "window", "sort"]
    got = {r.doc_id: r.bm25 for r in bm25_topk(docs, terms, k=10).collect()}
    toks = [(i, t.split()) for i, t in rows]
    want = bm25_reference(toks, terms)
    assert set(got) == set(want)  # doc 3 matches nothing → absent
    for d in want:
        assert got[d] == pytest.approx(round(want[d], 6), abs=2e-6)


def test_bm25_topk_limit_and_order(spark):
    from var_elasticnet_bigdata_spark.operators.retrieval import bm25_topk

    rows = [(i, "spark " * (i + 1)) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(docs, ["spark"], k=5).collect()
    assert len(out) == 5
    scores = [r.bm25 for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_plan_has_no_global_sort(spark):
    """Top-k compiles to TakeOrderedAndProject, not a full Sort."""
    from var_elasticnet_bigdata_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(1, "spark row"), (2, "spark spark")], "doc_id long, text string"
    )
    plan = (
        bm25_topk(docs, ["spark"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_bm25_rejects_empty_terms(spark):
    from var_elasticnet_bigdata_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------


def test_tfidf_hand_computed(spark):
    import math

    from var_elasticnet_bigdata_spark.operators.retrieval import (
        tfidf_top_terms,
    )

    # 3 docs; "rare" only in doc 1, "common" in all
    docs = _docs(
        spark,
        [
            (1, "rare common common"),
            (2, "common mid"),
            (3, "common mid"),
        ],
    )
    rows = tfidf_top_terms(docs, k=2).collect()
    byid = {}
    for r in rows:
        byid.setdefault(r.doc_id, {})[r.tok] = (r.rank, r.tfidf)
    # doc 1: rare tf=1 idf=ln(3/1); common tf=2 idf=ln(3/3)=0
    assert byid[1]["rare"] == (1, pytest.approx(round(math.log(3), 6)))
    assert byid[1]["common"][1] == pytest.approx(0.0)
    # docs 2/3: mid tf=1 idf=ln(3/2) ranks first
    assert byid[2]["mid"][0] == 1
    assert byid[2]["mid"][1] == pytest.approx(round(math.log(1.5), 6))


def test_tfidf_rank_is_per_doc_window(spark):
    """k bounds EVERY doc's rows and the window is partitioned (no
    global sort in the plan)."""
    from var_elasticnet_bigdata_spark.operators.retrieval import (
        tfidf_top_terms,
    )

    docs = _docs(spark, [(i, f"w{i} a b c d e f") for i in range(6)])
    out = tfidf_top_terms(docs, k=2)
    counts = out.groupBy("doc_id").count().collect()
    assert all(r["count"] <= 2 for r in counts)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Window \[.*?partitionBy=\[\]", plan):
        raise AssertionError(f"global window: {m.group(0)[:120]}")


# ---------------------------------------------------------------------------
# chunk boundary grid (one Spark job per (size, stride) combo)
# ---------------------------------------------------------------------------


def _py_chunks(n_tokens, cs, st):
    import math

    n_chunks = 1 + max(math.ceil((n_tokens - cs) / st), 0)
    return [
        min(cs, max(n_tokens - k * st, 0)) for k in range(n_chunks)
    ]


@pytest.mark.parametrize("cs,st", [(8, 8), (8, 5), (5, 8), (1, 1), (16, 3)])
def test_chunk_grid_matches_formula(spark, cs, st):
    """For every doc length 0..40 in ONE DataFrame: per-chunk token
    counts match the closed-form reference, chunks cover all tokens
    (stride ≤ size), and chunk ids are dense from 1."""
    from var_elasticnet_bigdata_spark.operators.text import chunk_tokens

    docs = _docs(
        spark,
        [(n, " ".join(f"t{i}" for i in range(n))) for n in range(0, 41)],
    )
    rows = chunk_tokens(docs, chunk_size=cs, stride=st).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, {})[r.chunk_id] = r.n_tokens
    for n in range(0, 41):
        want = _py_chunks(n, cs, st)
        assert sorted(got[n]) == list(range(1, len(want) + 1)), (n, cs, st)
        assert [got[n][i + 1] for i in range(len(want))] == want, (n, cs, st)
        if st <= cs:  # full coverage when strides overlap or abut
            covered = set()
            for k in range(len(want)):
                covered.update(range(k * st, k * st + want[k]))
            assert covered == set(range(n)), (n, cs, st)


def test_cluster_top_terms_labels_distinct_vocabulary(spark):
    """c-TF-IDF cluster labeling (r8): cells with distinct member
    vocabulary surface their OWN terms; vocabulary shared by every
    cell scores ln(nlist/nlist) = 0 and loses to cell-specific terms."""
    from var_elasticnet_bigdata_spark.operators.retrieval import (
        cluster_top_terms,
    )

    # 8 vectors on 4 axes -> seed cells 0..3 (vec_id % 4), refined
    # centroids stay on the axes; docs per axis share a vocabulary
    vocab = {0: "apple orchard", 1: "neutron star", 2: "violin sonata",
             3: "glacier moraine"}
    emb_rows, doc_rows = [], []
    for i in range(8):
        axis = i % 4
        v = [0.0] * 4
        v[axis] = 1.0
        v[(axis + 1) % 4] = 0.01 * (i % 3)
        emb_rows.append((i, v))
        doc_rows.append(
            (i, f"common filler words {vocab[axis]} {vocab[axis]}")
        )
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<double>")
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    out = cluster_top_terms(emb, docs, nlist=4, k=2).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append((r["rank"], r["tok"], r["score"]))
    assert len(by_cell) == 4
    for cell, terms in by_cell.items():
        toks = {t for _, t, _ in terms}
        # the cell's own two-word vocabulary wins both slots
        assert toks == set(vocab[cell].split()), (cell, terms)
        assert all(s > 0 for _, _, s in terms)
