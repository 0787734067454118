"""VERDICT r8 item 2: perceptual-hash image near-dup — planted-pair
pins over REAL encoded bytes (BMP and PNG), the resize path, the
banded candidate join's gates, and the synthesized-fixture twin
arithmetic."""
from __future__ import annotations

import numpy as np
import pytest


def _gray(rng: np.random.Generator, w: int = 9, h: int = 8) -> np.ndarray:
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def _rgb(gray: np.ndarray) -> np.ndarray:
    return np.repeat(gray[:, :, None], 3, axis=2).astype(np.uint8)


def _hashes(spark, payload_rows):
    from var_elasticnet_bigdata_spark.operators.multimodal import image_dhash

    df = spark.createDataFrame(payload_rows, "doc_id long, payload binary")
    return {r["doc_id"]: r["dhash"] for r in image_dhash(df).collect()}


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_image_dhash_planted_near_dup_found_across_codecs(spark):
    """A brightness-bumped copy of an image hashes within <=3 bits of
    the original REGARDLESS of container (BMP vs PNG — same pixels,
    different bytes: exact dedup can never pair them); an unrelated
    image sits far away; the banded join surfaces exactly the planted
    pairs."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        image_dhash,
    )

    rng = np.random.default_rng(7)
    base = _gray(rng)
    # plant one saturating gradient so the bump provably flips a bit:
    # 255 > 254 -> bit set; after +2 clamp both are 255 -> bit cleared
    base[0, 0], base[0, 1] = 254, 255
    bright = np.minimum(base.astype(np.int64) + 2, 255).astype(np.uint8)
    other = _gray(rng)
    rows = [
        (1, encode_bmp(_rgb(base))),
        (2, encode_bmp(_rgb(bright))),   # planted near-dup of 1
        (3, encode_png(_rgb(base))),     # SAME pixels, PNG container
        (4, encode_bmp(_rgb(other))),    # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    h = {r["doc_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert h[1] == h[3]                  # container-invariant
    assert 0 < _ham(h[1], h[2]) <= 3     # bump flips a few bits only
    assert _ham(h[1], h[4]) > 10         # unrelated images are far
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_near_dup_pairs(
            image_dhash(df), max_hamming=3
        ).collect()
    }
    assert pairs == {(1, 2), (1, 3), (2, 3)}


def test_image_dhash_resize_path(spark):
    """A 2x-upscaled image (np.kron pixel doubling) resizes back to
    the 9x8 grid and hashes IDENTICALLY to its original — the
    thumbnail path a real crawl needs (payloads arrive at arbitrary
    dims)."""
    from var_elasticnet_bigdata_spark.operators.multimodal import encode_bmp

    rng = np.random.default_rng(11)
    base = _gray(rng)
    big = np.kron(base, np.ones((2, 2), dtype=np.uint8))
    h = _hashes(
        spark, [(1, encode_bmp(_rgb(base))), (2, encode_bmp(_rgb(big)))]
    )
    assert h[1] == h[2]


def test_image_dhash_drops_undecodable_and_non_image(spark):
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        encode_bmp,
        encode_wav,
    )

    rng = np.random.default_rng(3)
    wav = encode_wav(np.zeros((64, 1), dtype=np.float64), 8000)
    h = _hashes(
        spark,
        [
            (1, encode_bmp(_rgb(_gray(rng)))),
            (2, b"\x00\x01garbage"),
            (3, wav),  # audio: not an image hash's job
            (4, None),
        ],
    )
    assert sorted(h) == [1]


def test_hamming_near_dup_pairs_gates_and_pigeonhole(spark):
    """The bucket frequency gate drops mega-clusters (exact dedup's
    job) and constructor validation rejects band layouts that break
    the pigeonhole guarantee."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )

    rows = [(i, 0x0123456789ABCDEF) for i in range(1, 7)]  # 6 clones
    rows += [(10, 0x0123456789ABCDEE)]  # 1 bit off the clone hash
    df = spark.createDataFrame(rows, "doc_id long, dhash long")
    # gate below the clone-cluster size: every bucket holding the 6
    # clones (+ the near hash on 3 of 4 bands) overflows and is
    # dropped -> no pairs at all
    out = hamming_near_dup_pairs(df, max_ids_per_bucket=4).collect()
    assert out == []
    # gate admitting them: all clone pairs + near pairs, exact hamming
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_dup_pairs(df, max_ids_per_bucket=16).collect()
    }
    assert out[(1, 2)] == 0 and out[(1, 10)] == 1
    assert len(out) == 15 + 6
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_near_dup_pairs(df, bands=4, max_hamming=4).collect()
    with pytest.raises(ValueError, match="divisible"):
        hamming_near_dup_pairs(df, bands=5).collect()


def test_sign_bit_band_extraction_matches_duckdb(spark, duck):
    """Bit 63 packs as the int64 sign bit; band extraction (arithmetic
    shift + mask) and bit_count(xor) must agree between engines on
    negative hashes."""
    vals = [-(1 << 63), -1, 0x7FFF000000000001,
            0x8001800180018001 - (1 << 64)]
    got = spark.createDataFrame(
        [(v,) for v in vals], "h long"
    ).selectExpr(
        "h",
        "shiftright(h, 48) & 65535 AS b3",
        "shiftright(h, 0) & 65535 AS b0",
        "bit_count(h ^ -1L) AS bc",
    ).collect()
    for r in got:
        # parameter binding: a -2^63 literal parses as INT128 in DuckDB
        w = duck.execute(
            "SELECT (CAST(? AS BIGINT) >> 48) & 65535,"
            " (CAST(? AS BIGINT) >> 0) & 65535,"
            " bit_count(xor(CAST(? AS BIGINT), -1::BIGINT))",
            [r["h"], r["h"], r["h"]],
        ).fetchone()
        assert (r["b3"], r["b0"], r["bc"]) == (w[0], w[1], w[2])


def test_synth_corpus_planted_structure(spark):
    """The synthesized gated-query corpus has the documented planted
    structure: members 0/1 of each id-group are near-dups (hamming
    <= 3 after the saturating bump), everything else is far."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        image_dhash,
        synth_gray_bmp_payloads,
    )

    ids = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    hashed = image_dhash(synth_gray_bmp_payloads(ids))
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_near_dup_pairs(hashed, max_hamming=3).collect()
    }
    assert pairs == {(4 * g, 4 * g + 1) for g in range(10)}
