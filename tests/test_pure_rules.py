"""Property tests (hypothesis) for the pure driver-side rules the
engine-portable hash gates depend on: split thresholds, sampling-rate
quantization, the chunk-count formula, and the hot-bucket pair
expression. These run without Spark — any violated invariant here
would silently skew a deterministic sampler or chunker on EVERY
engine."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from var_elasticnet_bigdata_spark.operators.split import (
    _hex4,
    split_thresholds,
)


@st.composite
def fraction_dicts(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    # raw positive weights, normalized to sum exactly 1.0
    raw = draw(
        st.lists(
            st.floats(min_value=0.05, max_value=1.0, allow_nan=False),
            min_size=n,
            max_size=n,
        )
    )
    tot = sum(raw)
    fr = {f"s{i}": w / tot for i, w in enumerate(raw)}
    # renormalize the last one so the sum is exactly 1 (float dust)
    fr[f"s{n-1}"] += 1.0 - sum(fr.values())
    return fr


@settings(max_examples=300, deadline=None)
@given(fraction_dicts())
def test_split_thresholds_invariants(fracs):
    try:
        thr = split_thresholds(fracs)
    except ValueError:
        # legal outcome: a split quantized to 0 (or 256) buckets at
        # 1/256 granularity must raise rather than silently vanish
        return
    # order is preserved, bounds strictly increase, last bound covers
    # the whole 256-bucket space
    assert [n for n, _ in thr] == list(fracs)
    bounds = [int(h, 16) if h != "100" else 256 for _, h in thr]
    assert bounds == sorted(bounds)
    assert len(set(bounds)) == len(bounds)
    assert bounds[-1] == 256
    # every bound is a 2-char hex except the terminal sentinel, so
    # lexical comparison against md5 hex prefixes stays correct
    for _, h in thr[:-1]:
        assert len(h) == 2 and int(h, 16) < 256
    # bucket shares approximate the requested fractions to 1/256 + 1
    prev = 0
    for (name, _), b in zip(thr, bounds):
        share = (b - prev) / 256
        assert abs(share - fracs[name]) <= 1 / 256 + 1e-9, (name, share)
        prev = b


@settings(max_examples=500, deadline=None)
@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_hex4_monotone_and_nesting(rate):
    """Sampling thresholds must nest: a higher rate never excludes a
    row a lower rate admits (the documented superset property)."""
    h = _hex4(rate)
    assert h == "g000" or (len(h) == 4 and int(h, 16) <= 65535)
    for other in (rate / 2, rate * 0.9, max(rate - 0.01, 0.0)):
        assert _hex4(other) <= h  # lexical order == numeric order here
    # quantization error bounded by 1/65536
    n = 65536 if h == "g000" else int(h, 16)
    assert abs(n / 65536 - rate) <= 1 / 65536 + 1e-12


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
)
def test_chunk_count_formula_covers_every_token(n_tokens, chunk_size, stride):
    """The SQL chunk-count formula (operators/text.chunk_words_column)
    must yield the minimal k such that k chunks at the given stride
    cover all tokens — and exactly one chunk for short/empty docs."""
    k = 1 + max(math.ceil((n_tokens - chunk_size) / stride), 0)
    # coverage: the last chunk's span reaches the end
    assert (k - 1) * stride + chunk_size >= n_tokens
    # minimality: one fewer chunk would leave a tail uncovered
    if k > 1:
        assert (k - 2) * stride + chunk_size < n_tokens
    if n_tokens <= chunk_size:
        assert k == 1


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=2,
                max_size=40, unique=True), st.integers(min_value=1, max_value=50))
def test_bucket_pair_semantics(ids, cap):
    """The star-capped bucket expansion (dedup.bucket_pair_expr) has a
    pure-python meaning: all sorted pairs at-or-under the cap, min-id
    star pairs above it. Either way every id stays reachable from the
    bucket minimum (connectivity for components/survivorship)."""
    ids = sorted(ids)
    if len(ids) <= cap:
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        assert len(pairs) == len(ids) * (len(ids) - 1) // 2
    else:
        pairs = [(ids[0], b) for b in ids[1:]]
        assert len(pairs) == len(ids) - 1
    # connectivity: union-find over the pairs joins everything to min
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(b)] = find(a)
    assert len({find(i) for i in ids}) == 1


def test_bucket_pair_expr_matches_python_model(spark):
    """Pin the SQL expression itself against the python model above
    for a bucket straddling the cap."""
    from var_elasticnet_bigdata_spark.operators.dedup import bucket_pair_expr
    from pyspark.sql import functions as F

    for ids, cap in [([3, 1, 7, 5], 10), ([3, 1, 7, 5, 9], 4), ([2, 8], 1)]:
        df = spark.createDataFrame([(sorted(ids),)], "ids array<bigint>")
        got = sorted(
            (r.p.id_a, r.p.id_b)
            for r in df.select(
                F.explode(F.expr(bucket_pair_expr(cap))).alias("p")
            ).collect()
        )
        s = sorted(ids)
        if len(s) <= cap:
            want = sorted((a, b) for i, a in enumerate(s) for b in s[i + 1:])
        else:
            want = sorted((s[0], b) for b in s[1:])
        assert got == want, (ids, cap)
