"""Regression tests for the round-7 ADVICE items (one named test per
item; VERDICT_RESPONSE.md maps them). All five were low-severity but
each gets a pin so the fix can't regress silently."""
from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    from var_elasticnet_bigdata_spark.sources import load_table

    return load_table(spark, SF_SMALL, "embeddings")


def test_pca_loadings_match_snapped_numpy_replication(spark, emb):
    """ADVICE r7 #1 + #5: pca_power_component must (a) snap final
    loadings half-away-from-zero (engine ROUND), not Python banker's
    round, and (b) snap each distributed Gram cell to the 9-dp grid
    BEFORE the driver-side power iteration, so shuffle-order float
    drift is absorbed at the Gram, not compounded through the
    matvecs. Pinned by an independent numpy replication that applies
    exactly those two snaps — identical mu round, ROUND(SUM, 9) Gram,
    3 matvecs, one half-away 6-dp loading snap."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        pca_power_component,
        snap_half_away,
    )

    got = {
        r["pos"]: r["loading"]
        for r in pca_power_component(emb, iters=3).collect()
    }

    pdf = emb.toPandas().sort_values("vec_id")
    V = np.array(pdf.embedding.tolist(), dtype=np.float64)
    mu = snap_half_away(V.mean(axis=0), 12)
    M = V - mu
    G = snap_half_away(M.T @ M, 9)
    y = np.ones(M.shape[1])
    for _ in range(3):
        y = G @ y
    n = np.sqrt((y * y).sum())
    want = snap_half_away(y / n, 6)
    assert len(got) == M.shape[1]
    for p in range(M.shape[1]):
        assert got[p] == want[p], (p, got[p], want[p])


def test_pq_adc_probe_rows_without_codebook_friendly_error(spark, emb):
    """ADVICE r7 #2: pq_adc_top1 must validate the probe_rows/
    codebook contract BEFORE seeding a codebook (which collects) —
    on a streaming frame the old order surfaced a raw
    streaming-collect AnalysisException instead of the intended
    ValueError."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        pq_adc_top1,
    )

    stream = (
        spark.readStream.schema(emb.schema)
        .parquet(f"{SF_SMALL}/embeddings.parquet")
    )
    probe = emb.limit(1).collect()
    with pytest.raises(ValueError, match="probe_rows requires"):
        pq_adc_top1(stream, m=4, k=16, probe_rows=probe)


def test_semantic_store_budget_scoped_to_batch_cells(spark, tmp_path):
    """ADVICE r7 #3: the incremental semantic store's hot-cell budget
    check is scoped to the cells the CURRENT batch probes — a breach
    in an untouched cell must not fail the batch (the old full-store
    groupBy-count bricked every later batch once any cell breached,
    and its cost grew linearly with the store)."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        incremental_semantic_dedup_bucketed,
    )

    C = np.eye(4, dtype=np.float64)  # cell i <=> basis vector e_i

    def batch(ids, axis):
        rows = []
        for i in ids:
            v = [0.0] * 4
            v[axis] = 1.0
            v[(axis + 1) % 4] = 1e-3 * (i % 7)  # distinct, same cell
            rows.append((i, v))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    spark.sql("DROP TABLE IF EXISTS bscope__vecs")
    try:
        # seed: 20 rows in cell 0 (store appends every batch row)
        incremental_semantic_dedup_bucketed(
            batch(range(20), 0), "bscope", C, buckets=2,
            path=str(tmp_path / "s"),
        )
        # cell 0 now holds 20 > budget 10 — but a batch touching only
        # cell 1 must PASS (old code raised here)
        out = incremental_semantic_dedup_bucketed(
            batch(range(100, 110), 1), "bscope", C, buckets=2,
            path=str(tmp_path / "s"), max_cell_rows=10,
        )
        assert out.count() > 0
        # a batch probing the hot cell itself still fails loudly
        with pytest.raises(ValueError, match="max_cell_rows"):
            incremental_semantic_dedup_bucketed(
                batch(range(200, 205), 0), "bscope", C, buckets=2,
                path=str(tmp_path / "s"), max_cell_rows=10,
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS bscope__vecs")


def test_theils_u_twin_parity_on_zero_prefix(spark, duck):
    """ADVICE r7 #4: on a degenerate all-zero prefix the AR(1)
    denominator is 0 at the first origins; Spark maps that to
    phi = 0.0 while the old twin's NULLIF(den, 0) left phi NULL
    (NULL forecasts silently excluded from SUM but counted by
    COUNT(*)). The twin now mirrors Spark with
    COALESCE(num/NULLIF(den,0), 0.0) and COUNT(err). Parity is
    pinned HERE, on a fixture that actually hits den = 0."""
    import datetime as dt

    from var_elasticnet_bigdata_spark.harness.modeltrain import (
        theils_u_ar1_relational,
    )

    n, start_idx, h = 20, 12, 4
    vals = [0.0] * 9 + [3.0, -1.0, 4.0, 1.0, -5.0, 9.0, 2.0, 6.0,
                        -3.0, 5.0, 8.0]
    assert len(vals) == n
    dates = [dt.date(2020, 1, 1) + dt.timedelta(days=i) for i in range(n)]
    wide = spark.createDataFrame(
        list(zip(dates, vals)), "obs_date date, y double"
    )
    got = [
        (r["horizon"], r["u_ar1"], r["msfe_model"], r["msfe_ar1"])
        for r in theils_u_ar1_relational(
            spark, wide, "y", start_pred=dates[start_idx], h=h
        ).collect()
    ]

    duck.execute("DROP TABLE IF EXISTS zp_series")
    duck.execute(
        "CREATE TABLE zp_series AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, CAST({v!r} AS DOUBLE))" for i, v in enumerate(vals))
        + ") t(i, v)"
    )
    want = duck.execute(
        f"""
        WITH s AS (SELECT i, v FROM zp_series),
        origins AS (SELECT i AS o FROM s
                    WHERE i BETWEEN {start_idx - h} AND {n - 2}),
        phi AS (
          SELECT o.o,
                 COALESCE(
                   (SELECT SUM(a.v * b.v) FROM s a JOIN s b ON b.i = a.i - 1
                    WHERE a.i BETWEEN 1 AND o.o)
                   / NULLIF((SELECT SUM(b.v * b.v) FROM s b
                             WHERE b.i <= o.o - 1), 0),
                   0.0) AS phi
          FROM origins o),
        fc AS (
          SELECT p.o, h.h, POWER(p.phi, h.h) * yo.v AS yhat, yo.v AS yrw,
                 yt.v AS ytrue
          FROM phi p
          CROSS JOIN (VALUES (1), (2), (4)) h(h)
          JOIN s yo ON yo.i = p.o
          JOIN s yt ON yt.i = p.o + h.h),
        aligned AS (SELECT * FROM fc
                    WHERE o + h BETWEEN {start_idx} AND {n - 1})
        SELECT h AS horizon,
               ROUND(SQRT(SUM(POWER(yrw - ytrue, 2)) / COUNT(yhat - ytrue))
                     / SQRT(SUM(POWER(yhat - ytrue, 2))
                            / COUNT(yhat - ytrue)), 6) AS u_ar1,
               ROUND(SUM(POWER(yrw - ytrue, 2)) / COUNT(yhat - ytrue), 6)
                 AS msfe_model,
               ROUND(SUM(POWER(yhat - ytrue, 2)) / COUNT(yhat - ytrue), 6)
                 AS msfe_ar1
        FROM aligned GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    duck.execute("DROP TABLE IF EXISTS zp_series")
    assert got == [tuple(r) for r in want]
    # the degenerate origin really is in play: phi(o=8) has den = 0
    assert got[0][1] is not None


def test_pca_top2_deflation_matches_replication(spark, emb):
    """r8 `pca_top_components`: component 0 must equal the
    single-component query exactly (shared Gram + matvec path), and
    component 1 must match an independent numpy replication of the
    twin's deflation arithmetic — 6-dp u1, 9-dp Rayleigh, bit-exact
    (λ·u_i)·u_j deflation re-snapped to 9 dp, same matvec chain."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        pca_power_component,
        pca_top_components,
        snap_half_away,
    )

    got = {
        (r["component"], r["pos"]): r["loading"]
        for r in pca_top_components(emb, k=2, iters=3).collect()
    }
    one = {
        r["pos"]: r["loading"]
        for r in pca_power_component(emb, iters=3).collect()
    }
    d = len(one)
    assert len(got) == 2 * d
    for p in range(d):
        assert got[(0, p)] == one[p]

    pdf = emb.toPandas().sort_values("vec_id")
    V = np.array(pdf.embedding.tolist(), dtype=np.float64)
    mu = snap_half_away(V.mean(axis=0), 12)
    M = V - mu
    G = snap_half_away(M.T @ M, 9)
    u1 = np.array([one[p] for p in range(d)])
    lam = float(snap_half_away(np.array((u1[:, None] * G * u1[None, :]).sum()), 9))
    G2 = snap_half_away(G - (lam * u1)[:, None] * u1[None, :], 9)
    y = np.ones(d)
    for _ in range(3):
        y = G2 @ y
    u2 = snap_half_away(y / np.sqrt((y * y).sum()), 6)
    for p in range(d):
        assert got[(1, p)] == u2[p], (p, got[(1, p)], u2[p])
    # deflation actually changed the direction
    assert any(got[(0, p)] != got[(1, p)] for p in range(d))


def test_remove_top_directions_matches_manual(spark, emb):
    """r8 ABTT-k apply: projections and residual norm match a numpy
    mirror using the same left-associated per-element arithmetic on
    the same 6-dp components."""
    from var_elasticnet_bigdata_spark.operators.similarity import (
        pca_top_components,
        remove_top_directions,
        snap_half_away,
    )

    rows = pca_top_components(emb, k=2, iters=3).collect()
    d = max(r["pos"] for r in rows) + 1
    U = np.zeros((2, d))
    for r in rows:
        U[r["component"], r["pos"]] = r["loading"]
    got = {
        r["vec_id"]: (r["proj_0"], r["proj_1"], r["resid_norm"])
        for r in remove_top_directions(emb, U).collect()
    }
    pdf = emb.toPandas().sort_values("vec_id")
    V = np.array(pdf.embedding.tolist(), dtype=np.float64)
    ids = pdf.vec_id.to_numpy()
    for q in range(0, len(ids), 97):
        v = V[q]
        p = [float((v * U[c]).sum()) for c in range(2)]
        r = (v - p[0] * U[0]) - p[1] * U[1]
        want = (
            float(snap_half_away(np.array(p[0]), 6)),
            float(snap_half_away(np.array(p[1]), 6)),
            float(snap_half_away(np.array(np.sqrt((r * r).sum())), 6)),
        )
        assert got[int(ids[q])] == pytest.approx(want, abs=2e-6)
