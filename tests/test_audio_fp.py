"""Audio perceptual-fingerprint near-dup (r9) — planted-pair pins
over REAL WAV bytes, the exact int16 round-trip, fingerprint
invariances (gain), undecodable handling, and the synthesized-fixture
DuckDB twin arithmetic."""
from __future__ import annotations

import numpy as np


def _fp_local(pcm: np.ndarray, frames: int = 65) -> int:
    """Independent python replication of the fingerprint bit math."""
    spf = len(pcm) // frames
    e = (pcm[: frames * spf].astype(np.int64) ** 2).reshape(
        frames, spf
    ).sum(axis=1)
    h = 0
    for b, bit in enumerate(e[1:] > e[:-1]):
        if bit:
            h |= 1 << b
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_afp_pcm_exact_wav_round_trip():
    """The synthesized int16 signal survives encode_wav -> decode_wav
    byte-exactly — the precondition for the integer-exact twin."""
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        _afp_pcm,
        decode_wav,
        encode_wav,
    )

    for rid in (0, 1, 2, 3, 97, 1001):
        v = _afp_pcm(rid)
        _, x = decode_wav(encode_wav(v.astype(np.float64) / 32767.0))
        assert np.array_equal(
            np.round(x[:, 0] * 32768.0).astype(np.int64), v
        ), rid


def test_audio_fingerprint_planted_pair_and_gain_invariance(spark):
    """Member 1 of each group sits within hamming <= 2 of member 0
    (one re-drawn frame flips at most the two adjacent comparisons);
    a uniform gain cut flips NO comparison (the perceptual property
    exact byte hashes lack); unrelated ids sit ~32 bits away."""
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        _afp_pcm,
        audio_fingerprint,
        encode_wav,
    )

    rows = [
        (0, encode_wav(_afp_pcm(0).astype(np.float64) / 32767.0)),
        (1, encode_wav(_afp_pcm(1).astype(np.float64) / 32767.0)),
        # same signal at half gain — different BYTES, same fingerprint
        (100, encode_wav(_afp_pcm(0).astype(np.float64) / 32767.0 * 0.5)),
        (2, encode_wav(_afp_pcm(2).astype(np.float64) / 32767.0)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    h = {r["doc_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert _ham(h[0], h[1]) <= 2
    assert h[100] == h[0]
    assert _ham(h[0], h[2]) > 3


def test_audio_fingerprint_drops_undecodable_and_matches_replication(spark):
    """Garbage / truncated payloads are dropped, never task failures;
    surviving hashes equal the independent integer replication (the
    decode path adds no drift)."""
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        _afp_pcm,
        audio_fingerprint,
        encode_wav,
    )

    good = {i: _afp_pcm(i) for i in (0, 5, 11)}
    rows = [
        (i, encode_wav(v.astype(np.float64) / 32767.0))
        for i, v in good.items()
    ]
    rows.append((90, b"not a wav at all"))
    rows.append((91, rows[0][1][:20]))  # truncated header
    rows.append((92, None))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert set(got) == set(good)
    for i, v in good.items():
        assert got[i] == _fp_local(v)


def test_synth_corpus_planted_structure(spark):
    """The synthesized gated-query corpus pairs EXACTLY the 0/1
    members of each id-group through the full real-byte path
    (synth -> WAV encode -> decode -> fingerprint -> banded join)."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        audio_fingerprint,
        synth_wav_payloads,
    )

    ids = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    hashed = audio_fingerprint(synth_wav_payloads(ids))
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_near_dup_pairs(
            hashed, hash_col="afp", max_hamming=3
        ).collect()
    }
    assert pairs == {(4 * g, 4 * g + 1) for g in range(10)}


def test_duck_twin_parity_small_range(spark):
    """The DuckDB twin (integer sample + energy + bit-pack + band/gate
    arithmetic) emits exactly the Spark pipeline's pairs, including
    sign-bit (bit 63) packing, on a 48-id corpus."""
    import duckdb

    from var_elasticnet_bigdata_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        audio_fingerprint,
        duck_audio_fp_sql,
        synth_wav_payloads,
    )

    ids = spark.createDataFrame([(i,) for i in range(48)], "doc_id long")
    spark_pairs = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_dup_pairs(
            audio_fingerprint(synth_wav_payloads(ids)), hash_col="afp"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT unnest(range(0, 48)) AS doc_id"
    )
    duck_pairs = set(map(tuple, con.execute(duck_audio_fp_sql()).fetchall()))
    assert spark_pairs == duck_pairs
