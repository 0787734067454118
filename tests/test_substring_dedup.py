"""VERDICT r7 item 5: exact substring dedup — planted-overlap pins."""
from __future__ import annotations

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu",
]


def _run(tag: str, k: int) -> str:
    """k distinct tokens unique to this run."""
    return " ".join(f"{tag}{WORDS[i % 26]}{i}" for i in range(k))


def test_substring_dedup_planted_exact_run_length(spark):
    """A planted 25-token shared run inside otherwise-disjoint docs is
    flagged with overlap_tokens == 25 exactly; an 8-token overlap
    (the shingle width, below min_run=20) is not flagged."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        substring_dedup,
    )

    shared = _run("s", 25)
    short = _run("t", 8)
    rows = [
        (1, _run("a", 15) + " " + shared + " " + _run("b", 12)),
        (2, _run("c", 5) + " " + shared + " " + _run("d", 30)),
        (3, _run("e", 20) + " " + short + " " + _run("f", 20)),
        (4, _run("g", 25) + " " + short + " " + _run("h", 9)),
        (5, _run("i", 40)),
    ]
    out = {
        (r["doc_a"], r["doc_b"]): r["overlap_tokens"]
        for r in substring_dedup(
            _docs(spark, rows), width=8, min_run_tokens=20
        ).collect()
    }
    assert out == {(1, 2): 25}


def test_substring_dedup_matches_duckdb_twin(spark, duck):
    """Spark and the DuckDB twin agree pair-for-pair on a fixture with
    a long overlap, a full duplicate, and a sub-threshold overlap."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        duck_substring_dedup_sql,
        substring_dedup,
    )

    shared = _run("s", 33)
    full = _run("q", 28)
    rows = [
        (10, _run("a", 10) + " " + shared),
        (11, shared + " " + _run("b", 22)),
        (12, full),
        (13, full),
        (14, _run("z", 60)),
    ]
    got = sorted(
        (r["doc_a"], r["doc_b"], r["overlap_tokens"])
        for r in substring_dedup(
            _docs(spark, rows), width=8, min_run_tokens=20
        ).collect()
    )
    duck.execute("DROP TABLE IF EXISTS ssd_docs")
    duck.execute(
        "CREATE TABLE ssd_docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, text)"
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            duck_substring_dedup_sql(
                source_sql="SELECT doc_id, text FROM ssd_docs",
                width=8,
                min_run_tokens=20,
            )
        ).fetchall()
    )
    duck.execute("DROP TABLE IF EXISTS ssd_docs")
    assert got == want
    assert (10, 11, 33) in got and (12, 13, 28) in got


def test_substring_dedup_hot_shingle_gate(spark):
    """A run made of shingles shared by MORE than max_docs_per_shingle
    docs (corpus boilerplate) must NOT produce pairs — the frequency
    gate is the linearity guarantee, and boilerplate is the
    MinHash/template pass's job."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        substring_dedup,
    )

    boiler = _run("bp", 30)
    rows = [(i, _run(f"u{i}x", 10) + " " + boiler) for i in range(12)]
    out = substring_dedup(
        _docs(spark, rows), width=8, min_run_tokens=20,
        max_docs_per_shingle=4,
    ).collect()
    assert out == []


def test_substring_gate_cliff_vs_replication(spark):
    """VERDICT r8 item 6: the frequency gate is a CLIFF in the
    duplication multiplicity K — at K·f <= gate every clone pair is
    emitted (C(K,2) pair output, the measured quadratic term); at
    K·f > gate the shingles drop and the replication becomes
    invisible to the substring pass (exact dedup's job). Pins the
    docstring's sizing rule gate >= K_max·f_typ."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        substring_dedup,
    )

    body = _run("rep", 25)
    k = 5
    rows = [(i, body) for i in range(k)]  # K=5 exact copies
    below = substring_dedup(
        _docs(spark, rows), width=8, min_run_tokens=20,
        max_docs_per_shingle=4,  # gate < K: cliff — nothing emitted
    ).collect()
    assert below == []
    above = substring_dedup(
        _docs(spark, rows), width=8, min_run_tokens=20,
        max_docs_per_shingle=5,  # gate >= K: full C(K,2) pair output
    ).collect()
    assert len(above) == k * (k - 1) // 2
    assert all(r["overlap_tokens"] == 25 for r in above)


def test_positional_shingle_key_width_and_parity(spark, duck):
    """ADVICE r8 #2: the positional shingle key is 60-bit (15 hex
    chars of md5) — wide enough that gate fan-in stays exact at
    1e12-shingle corpora, unlike the 32-bit distinct-set key — and
    Spark's conv() cast agrees bit-for-bit with DuckDB's
    ('0x'||…)::BIGINT on every (pos, s) row."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        NORM_SQL_DUCK,
        POS_SHINGLE_HEX,
        positional_shingle_hashes,
    )

    assert POS_SHINGLE_HEX == 15  # widest md5 prefix inside int64
    text = _run("k", 20)
    got = {
        (r["pos"], r["s"])
        for r in positional_shingle_hashes(
            _docs(spark, [(1, text)]), n=8
        ).collect()
    }
    want = {
        (int(p), int(s))
        for p, s in duck.execute(f"""
            WITH src AS (SELECT 1 AS doc_id, '{text}' AS text),
            w AS (SELECT doc_id, string_split({NORM_SQL_DUCK}, ' ') AS words
                  FROM src)
            SELECT t.i AS pos,
                   ('0x'||substr(md5(array_to_string(
                       list_slice(words, t.i, t.i+7), ' ')),1,{POS_SHINGLE_HEX}))::BIGINT AS s
            FROM w, UNNEST(range(1, greatest(len(words)-8+1, 1)+1)) AS t(i)
        """).fetchall()
    }
    assert got == want and len(got) == 13
    # the key actually uses the widened space (32-bit keys never can)
    assert any(s >= 2**32 for _, s in got)


def test_incremental_substring_store_cross_batch_drop(spark, tmp_path):
    """The positional-shingle store catches a batch-2 doc overlapping
    a batch-1 doc by >= min_run tokens (no shared doc in memory —
    only the store), keeps sub-threshold overlaps, and appends every
    row (seen-set semantics: a doc overlapping a batch-1 DROPPED doc
    still drops)."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        incremental_substring_dedup_bucketed,
    )

    shared = _run("s", 25)
    spark.sql("DROP TABLE IF EXISTS subst__psh")
    try:
        b1 = _docs(spark, [
            (1, _run("a", 15) + " " + shared),
            (2, shared + " " + _run("b", 10)),  # dropped in-batch vs 1
            (3, _run("c", 45)),
        ])
        s1 = incremental_substring_dedup_bucketed(
            b1, "subst", buckets=2, path=str(tmp_path / "s"),
            width=8, min_run_tokens=20,
        )
        assert sorted(r["doc_id"] for r in s1.collect()) == [1, 3]
        b2 = _docs(spark, [
            (10, _run("d", 12) + " " + shared),  # overlaps doc 1 AND
            # the dropped doc 2 — store holds both (seen-set)
            (11, _run("e", 50)),                 # clean
            (12, _run("t", 8) + " " + _run("f", 30)),  # 8 < 20: kept
        ])
        s2 = incremental_substring_dedup_bucketed(
            b2, "subst", buckets=2, path=str(tmp_path / "s"),
            width=8, min_run_tokens=20,
        )
        assert sorted(r["doc_id"] for r in s2.collect()) == [11, 12]
    finally:
        spark.sql("DROP TABLE IF EXISTS subst__psh")


def test_incremental_substring_replay_redrops_original_drops(spark, tmp_path):
    """ADVICE r8 #1 (medium) regression: a crash between store append
    and checkpoint commit replays a batch whose shingles are already
    in the store. The frequency gate must count each doc ONCE across
    store ∪ batch (one COUNT(DISTINCT id) over the union), not sum
    per-side distinct counts — the summed form doubled every replayed
    doc, so a shingle with true distinct-doc count in (max/2, max]
    got gated out only on replay and the replayed batch KEPT docs it
    originally dropped."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        incremental_substring_dedup_bucketed,
    )

    shared = _run("s", 25)
    spark.sql("DROP TABLE IF EXISTS subrp__psh")
    try:
        # 3 docs share the run; gate max 4: 3 <= 4 keeps the shingles,
        # but a replay double-count (3 + 3 = 6 > 4) would gate them out
        batch = _docs(spark, [
            (1, _run("a", 15) + " " + shared),
            (2, shared + " " + _run("b", 10)),
            (3, _run("c", 6) + " " + shared + " " + _run("d", 8)),
        ])
        kw = dict(buckets=2, path=str(tmp_path / "s"),
                  width=8, min_run_tokens=20, max_docs_per_shingle=4)
        s1 = incremental_substring_dedup_bucketed(batch, "subrp", **kw)
        first = sorted(r["doc_id"] for r in s1.collect())
        assert first == [1]
        # crash-replay: same batch again, store already holds its rows
        s2 = incremental_substring_dedup_bucketed(batch, "subrp", **kw)
        replay = sorted(r["doc_id"] for r in s2.collect())
        assert replay == first  # re-drops exactly its original drops
    finally:
        spark.sql("DROP TABLE IF EXISTS subrp__psh")


def test_substring_scrub_removes_exact_span_only(spark, duck):
    """Surgical scrub: the later doc loses EXACTLY the shared run's
    tokens; the earlier doc is untouched; uninvolved docs pass
    through with n_removed = 0; DuckDB twin agrees on every column
    including the rebuilt text."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        duck_substring_scrub_sql,
        substring_scrub,
    )

    shared = _run("s", 25)
    rows = [
        (1, _run("a", 10) + " " + shared + " " + _run("b", 7)),
        (2, _run("c", 6) + " " + shared + " " + _run("d", 9)),
        (3, _run("e", 30)),
    ]
    got = {
        r["doc_id"]: (r["n_kept"], r["n_removed"], r["text_clean"])
        for r in substring_scrub(
            _docs(spark, rows), width=8, min_run_tokens=20
        ).collect()
    }
    # doc 1 is the FIRST occurrence: untouched
    assert got[1] == (42, 0, rows[0][1].lower())
    # doc 2 loses exactly the 25 shared tokens
    assert got[2] == (15, 25, (_run("c", 6) + " " + _run("d", 9)).lower())
    assert got[3] == (30, 0, rows[2][1].lower())

    duck.execute("DROP TABLE IF EXISTS scr_docs")
    duck.execute(
        "CREATE TABLE scr_docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, text)"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(
            duck_substring_scrub_sql(
                source_sql="SELECT doc_id, text FROM scr_docs",
                width=8,
                min_run_tokens=20,
            )
        ).fetchall()
    }
    duck.execute("DROP TABLE IF EXISTS scr_docs")
    assert got == want


def test_decontaminate_spans_cross_corpus_only(spark):
    """Cross-corpus decontamination: a train doc quoting a protected
    doc loses exactly the quoted run; train-train duplication is NOT
    touched (that's substring_dedup's job); protected docs are never
    rewritten (they're not in the output)."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        decontaminate_spans,
    )

    bench_line = _run("bm", 22)
    train_shared = _run("tt", 25)
    train = _docs(spark, [
        (1, _run("a", 10) + " " + bench_line + " " + _run("b", 8)),
        (2, _run("c", 12) + " " + train_shared),
        (3, train_shared + " " + _run("d", 14)),
        (4, _run("e", 35)),
    ])
    prot = _docs(spark, [(100, _run("p", 5) + " " + bench_line)])
    out = {
        r["doc_id"]: (r["n_kept"], r["n_removed"])
        for r in decontaminate_spans(
            train, prot, width=8, min_run_tokens=20
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1] == (18, 22)   # exactly the benchmark quote removed
    assert out[2] == (37, 0)    # train-train overlap untouched
    assert out[3] == (39, 0)
    assert out[4] == (35, 0)
