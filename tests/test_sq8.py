"""SQ8 scalar quantization (r9): integer-exact codes, reconstruction
arithmetic, serving argmin, and quantization-error bounds."""
from __future__ import annotations

import numpy as np


def _frame(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_sq8_codes_match_integer_replication(spark):
    """Codes equal the clamp(floor((v-mn)*256/rng)) replication; the
    corpus max encodes as 255 (the floor(256) clamp), the min as 0;
    constant dimensions encode as 0."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        sq8_encode,
        sq8_minmax,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(20, 6)).astype(np.float32)
    vecs[:, 5] = 2.5  # constant dim
    df = _frame(spark, vecs)
    mn, mx = sq8_minmax(df, d=6)
    v64 = vecs.astype(np.float64)
    assert mn == [float(x) for x in v64.min(axis=0)]
    assert mx == [float(x) for x in v64.max(axis=0)]
    got = {
        r["vec_id"]: r["codes"] for r in sq8_encode(df, mn, mx).collect()
    }
    mn_a, mx_a = np.array(mn), np.array(mx)
    for i, v in enumerate(v64):
        for j in range(6):
            if mx_a[j] == mn_a[j]:
                want = 0
            else:
                want = int(
                    min(
                        255.0,
                        max(
                            0.0,
                            np.floor(
                                ((v[j] - mn_a[j]) * 256.0)
                                / (mx_a[j] - mn_a[j])
                            ),
                        ),
                    )
                )
            assert got[i][j] == want, (i, j)
        # extrema hit the rails
    cols = np.array([got[i] for i in range(20)])
    for j in range(5):
        assert cols[:, j].min() == 0 and cols[:, j].max() == 255


def test_sq8_adc_top1_matches_replication_and_finds_true_probe(spark):
    """The served nearest probe equals an independent numpy
    replication (recon + left-assoc fold + 6dp snap + lowest-pid
    ties), and on well-separated clusters SQ8's top-1 agrees with the
    EXACT float nearest probe — quantization must not flip clearly
    separated answers."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        sq8_adc_top1,
    )

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(3, 64)) * 10.0
    vecs = np.vstack(
        [centers[i % 3] + rng.normal(size=64) * 0.05 for i in range(30)]
    ).astype(np.float32)
    # probes = ids 0, 10, 20 -> one per cluster position pattern
    df = _frame(spark, vecs)
    got = {
        r["vec_id"]: (r["nearest_probe"], r["adc"])
        for r in sq8_adc_top1(df, d=64, probe_mod=10).collect()
    }
    v64 = vecs.astype(np.float64)
    mn, mx = v64.min(axis=0), v64.max(axis=0)
    rng_a = mx - mn
    codes = np.clip(
        np.floor(((v64 - mn) * 256.0) / np.where(rng_a == 0, 1, rng_a)),
        0,
        255,
    )
    recon = np.where(rng_a != 0, mn + (((codes + 0.5) * rng_a) / 256.0), mn)
    pids = [0, 10, 20]
    for i in range(30):
        adcs = []
        for p in pids:
            acc = None
            for j in range(64):
                diff = v64[p, j] - recon[i, j]
                t = diff * diff
                acc = t if acc is None else acc + t
            adcs.append(np.floor(acc * 1e6 + 0.5) / 1e6)
        want_p = pids[int(np.argmin(adcs))]
        assert got[i] == (want_p, min(adcs)), i
        # exact-float agreement on separated clusters
        exact = pids[
            int(np.argmin([((v64[p] - v64[i]) ** 2).sum() for p in pids]))
        ]
        assert want_p == exact, i


def test_sq8_quantization_error_bound(spark):
    """Per-dimension reconstruction error is bounded by rng/512 (half
    a quantization step) — the property that makes 4x compression
    safe for coarse search."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        sq8_encode,
        sq8_minmax,
    )

    rng = np.random.default_rng(3)
    vecs = rng.uniform(-5, 5, size=(50, 8)).astype(np.float32)
    df = _frame(spark, vecs)
    mn, mx = sq8_minmax(df, d=8)
    got = {r["vec_id"]: r["codes"] for r in sq8_encode(df, mn, mx).collect()}
    mn_a, mx_a = np.array(mn), np.array(mx)
    step = (mx_a - mn_a) / 256.0
    for i, v in enumerate(vecs.astype(np.float64)):
        recon = mn_a + (np.array(got[i]) + 0.5) * step
        assert np.all(np.abs(v - recon) <= step / 2 + 1e-12), i


def test_sq8_stream_serving_matches_batch(spark, tmp_path):
    """Streaming serving: trained bounds + explicit probe_rows compose
    onto a readStream frame unchanged and reproduce the batch answer
    bit-for-bit (the pq_adc_top1 streaming contract)."""
    import time as _time

    import numpy as np

    from var_elasticnet_bigdata_spark.operators.similarity import (
        sq8_adc_top1,
        sq8_minmax,
    )

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    emb = _frame(spark, vecs)
    mn, mx = sq8_minmax(emb, d=8)
    probe_rows = emb.filter("vec_id % 10 = 0").select(
        "vec_id", "embedding"
    ).collect()
    batch = {
        r["vec_id"]: (r["nearest_probe"], r["adc"])
        for r in sq8_adc_top1(
            emb, d=8, bounds=(mn, mx), probe_rows=probe_rows
        ).collect()
    }

    src = str(tmp_path / "src")
    emb.filter("vec_id < 20").coalesce(1).write.mode("overwrite").parquet(
        f"{src}/f1"
    )
    _time.sleep(1.1)
    emb.filter("vec_id >= 20").coalesce(1).write.mode("overwrite").parquet(
        f"{src}/f2"
    )
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    scored = sq8_adc_top1(
        stream, d=8, bounds=(mn, mx), probe_rows=probe_rows
    )
    q = (
        scored.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.vec_id: (r.nearest_probe, r.adc)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == batch and len(got) == 40


def test_sq8_probe_rows_without_bounds_friendly_error(spark, tmp_path):
    """A streaming caller that passes probe_rows but no bounds gets
    the contract ValueError BEFORE any train/collect is attempted."""
    import numpy as np
    import pytest as _pytest

    from var_elasticnet_bigdata_spark.operators.similarity import (
        sq8_adc_top1,
    )

    emb = _frame(spark, np.zeros((4, 8), dtype=np.float32))
    src = str(tmp_path / "s")
    emb.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(emb.schema).parquet(src)
    with _pytest.raises(ValueError, match="requires explicit bounds"):
        sq8_adc_top1(stream, d=8, probe_rows=[{"vec_id": 0}])


def test_l2_exact_top1_matches_replication_and_sq8_audit_agrees(spark):
    """The exact arm equals a numpy replication (same fold, snap,
    ties); on well-separated clusters the SQ8 arm and the exact arm
    agree on every vector (the audit's happy path), and the gated
    agree flag reflects it."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        l2_exact_top1,
        sq8_adc_top1,
    )

    rng = np.random.default_rng(13)
    centers = rng.normal(size=(3, 64)) * 10.0
    vecs = np.vstack(
        [centers[i % 3] + rng.normal(size=64) * 0.05 for i in range(30)]
    ).astype(np.float32)
    df = _frame(spark, vecs)
    exact = {
        r.vec_id: (r.nearest_probe, r.dist)
        for r in l2_exact_top1(df, d=64, probe_mod=10).collect()
    }
    v64 = vecs.astype(np.float64)
    pids = [0, 10, 20]
    for i in range(30):
        ds = []
        for p in pids:
            acc = None
            for j in range(64):
                diff = v64[p, j] - v64[i, j]
                t = diff * diff
                acc = t if acc is None else acc + t
            ds.append(np.floor(acc * 1e6 + 0.5) / 1e6)
        assert exact[i] == (pids[int(np.argmin(ds))], min(ds)), i
    sq8 = {
        r.vec_id: r.nearest_probe
        for r in sq8_adc_top1(df, d=64, probe_mod=10).collect()
    }
    assert all(sq8[i] == exact[i][0] for i in range(30))
