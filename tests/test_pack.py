"""Sequence-packing tests: distributed prefix sum correctness,
boundary invariance, and pack-manifest invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, lens):
    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(n))) for i, n in enumerate(lens)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _manifest(spark, lens, cap, num_ranges=32):
    from var_elasticnet_bigdata_spark.operators.pack import pack_sequences

    return sorted(
        map(
            tuple,
            pack_sequences(
                _docs(spark, lens), capacity=cap, num_ranges=num_ranges
            ).collect(),
        )
    )


def _py_manifest(lens, cap):
    out = []
    off = 0
    for i, n in enumerate(lens):
        if n == 0:
            continue
        for s in range(off // cap, (off + n - 1) // cap + 1):
            a, b = max(s * cap, off), min((s + 1) * cap, off + n)
            out.append((s, i, a - s * cap, a - off, b - a))
        off += n
    return sorted(out)


def test_pack_matches_reference(spark):
    lens = [5, 0, 12, 3, 40, 1, 7, 0, 22, 64, 130, 2]
    assert _manifest(spark, lens, cap=16) == _py_manifest(lens, 16)


def test_pack_boundary_invariance(spark):
    """Same manifest for 1, 4, and 32 range partitions — the
    distributed prefix sum is placement-invariant."""
    lens = [3, 9, 27, 0, 14, 6, 50, 8] * 5
    m1 = _manifest(spark, lens, cap=32, num_ranges=1)
    m4 = _manifest(spark, lens, cap=32, num_ranges=4)
    m32 = _manifest(spark, lens, cap=32, num_ranges=32)
    assert m1 == m4 == m32 == _py_manifest(lens, 32)


def test_pack_sequences_are_full(spark):
    """Every sequence except the last carries exactly `capacity`
    tokens; doc segments are contiguous and cover each doc."""
    lens = [13, 29, 7, 45, 3, 90, 17]
    cap = 25
    rows = _manifest(spark, lens, cap)
    per_seq = {}
    per_doc = {}
    for seq, doc, pos, dstart, n in rows:
        per_seq[seq] = per_seq.get(seq, 0) + n
        per_doc.setdefault(doc, []).append((dstart, n))
    top = max(per_seq)
    for s in range(top):
        assert per_seq[s] == cap, f"seq {s} not full: {per_seq[s]}"
    assert 0 < per_seq[top] <= cap
    for doc, segs in per_doc.items():
        segs.sort()
        assert segs[0][0] == 0
        for (a0, n0), (a1, _n1) in zip(segs, segs[1:]):
            assert a1 == a0 + n0  # contiguous
        assert sum(n for _a, n in segs) == lens[doc]


def test_pack_no_global_window(spark):
    """The plan's only Window is partitioned (by spark_partition_id);
    no single-partition global sort."""
    from var_elasticnet_bigdata_spark.operators.pack import pack_sequences

    df = pack_sequences(_docs(spark, [4, 5, 6]), capacity=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line:
            assert "SPARK_PARTITION_ID" in line.upper() or "__pid" in line, line


def test_pack_rejects_bad_capacity(spark):
    from var_elasticnet_bigdata_spark.operators.pack import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [3]), capacity=0)


def test_pack_null_text_doc_is_skipped(spark):
    """NULL text behaves exactly like an empty doc: no rows, no
    offset shift for later documents."""
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, None), (2, "d e")], "doc_id long, text string"
    )
    from var_elasticnet_bigdata_spark.operators.pack import pack_sequences

    rows = sorted(map(tuple, pack_sequences(docs, capacity=4).collect()))
    # doc2 starts at global token 3: seq0 gets [a b c d], seq1 gets [e]
    assert rows == [(0, 0, 0, 0, 3), (0, 2, 3, 0, 1), (1, 2, 0, 1, 1)]
