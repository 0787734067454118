"""Video near-dup (r10, VERDICT r9 item 4): real RIFF-AVI container
round-trip, byte-stride frame sampling, per-frame dHash, the
min-matching-frames pair rule, and the planted cross-container pair."""

from __future__ import annotations

import numpy as np
import pytest

from var_elasticnet_bigdata_spark.operators.multimodal import (
    VID_ALT_FRAME,
    VID_FRAMES,
    VID_GROUP_OF,
    VID_MIN_MATCH,
    VID_SAMPLE_EVERY,
    _vid_luma,
    avi_dims,
    dhash_from_rgb,
    encode_avi,
    sample_avi_frames,
)

XX, YY = np.meshgrid(np.arange(9), np.arange(8))


def _frames(doc_id: int) -> list[np.ndarray]:
    return [
        np.repeat(_vid_luma(doc_id, f, XX, YY)[:, :, None], 3, axis=2)
        for f in range(VID_FRAMES)
    ]


def test_avi_round_trip_exact():
    frames = _frames(0)
    payload = encode_avi(frames, fps=10)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    assert avi_dims(payload) == (9, 8)
    out = sample_avi_frames(payload, every=1)
    assert [i for i, _ in out] == list(range(VID_FRAMES))
    for (_, got), want in zip(out, frames):
        assert np.array_equal(got, want)


def test_stride_sampling_skips_decodes():
    payload = encode_avi(_frames(4), fps=10)
    out = sample_avi_frames(payload, every=VID_SAMPLE_EVERY)
    assert [i for i, _ in out] == list(
        range(0, VID_FRAMES, VID_SAMPLE_EVERY)
    )
    capped = sample_avi_frames(payload, every=1, max_frames=2)
    assert [i for i, _ in capped] == [0, 1]


def test_cross_container_bytes_differ_frames_equal():
    """Member j=2: different container bytes (fps + JUNK chunk), every
    decoded frame identical to the base — the pair an exact byte hash
    can never find and the perceptual path must."""
    base = encode_avi(_frames(8), fps=10)
    recont = encode_avi(_frames(8), fps=25, extra_junk=b"recontainered")
    assert base != recont and len(base) != len(recont)
    a = sample_avi_frames(base, every=1)
    b = sample_avi_frames(recont, every=1)
    for (_, fa), (_, fb) in zip(a, b):
        assert np.array_equal(fa, fb)


def test_group_structure_hashes():
    """Planted semantics at the hash level: the redrawn member differs
    from base ONLY at VID_ALT_FRAME; the re-containered member matches
    base everywhere; the j=3 member matches nowhere (w.h.p. — fixed
    ids, deterministic)."""
    g = 16  # group base (multiple of VID_GROUP_OF)

    def hashes(doc):
        return {
            f: dhash_from_rgb(fr)
            for f, fr in sample_avi_frames(
                encode_avi(_frames(doc), fps=10), every=VID_SAMPLE_EVERY
            )
        }

    h0, h1, h2, h3 = (hashes(g + j) for j in range(VID_GROUP_OF))
    assert h2 == h0
    assert {f for f in h0 if h1[f] != h0[f]} == {VID_ALT_FRAME}
    assert all(h3[f] != h0[f] for f in h0)


def test_corrupt_payload_dropped(spark):
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        video_frame_dhash,
    )

    good = encode_avi(_frames(0), fps=10)
    rows = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(b"not an avi")), (2, None)],
        "doc_id long, payload binary",
    )
    out = video_frame_dhash(rows).collect()
    assert {r["doc_id"] for r in out} == {0}
    assert len(out) == len(range(0, VID_FRAMES, VID_SAMPLE_EVERY))


def test_min_matching_frames_rule(spark):
    """End to end on a 3-group corpus: (base, redrawn)=2 matches,
    (base, recontainered)=3, (redrawn, recontainered)=2; a pair
    sharing only ONE frame is excluded by the >=2 rule."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        video_near_dup_pairs,
    )
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        synth_avi_payloads,
        video_frame_dhash,
    )

    docs = spark.range(0, 3 * VID_GROUP_OF).selectExpr("id AS doc_id")
    frames = video_frame_dhash(synth_avi_payloads(docs))
    got = {
        (r["id_a"], r["id_b"]): r["n_matching_frames"]
        for r in video_near_dup_pairs(
            frames, min_matching_frames=VID_MIN_MATCH
        ).collect()
    }
    expect = {}
    for g in range(0, 3 * VID_GROUP_OF, VID_GROUP_OF):
        expect[(g, g + 1)] = 2
        expect[(g, g + 2)] = 3
        expect[(g + 1, g + 2)] = 2
    assert got == expect

    # the >=2 floor is live: with min_matching_frames=4 nothing passes
    # (only 3 frames are sampled), with 3 only the recontainered pairs
    n3 = video_near_dup_pairs(frames, min_matching_frames=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in n3} == {
        (g, g + 2) for g in range(0, 3 * VID_GROUP_OF, VID_GROUP_OF)
    }
    assert not video_near_dup_pairs(frames, min_matching_frames=4).count()


def test_mjpg_chunks_flow_through_decode_media():
    """'00dc' (compressed) frames dispatch through decode_media like
    any image payload — the container machinery is codec-agnostic
    even though the gated corpus uses exact DIB frames."""
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        _avi_chunk,
        _avi_list,
        encode_bmp,
    )

    rgb = np.repeat(_vid_luma(0, 0, XX, YY)[:, :, None], 3, axis=2)
    base = encode_avi([rgb], fps=10)
    # splice: replace the movi body's 00db chunk with a 00dc chunk
    # holding a real BMP payload (decode_media dispatches on magic)
    movi = _avi_list(b"movi", _avi_chunk(b"00dc", encode_bmp(rgb)))
    i = base.find(b"LIST")
    # rebuild: header LISTs up to movi, then our movi
    j = base.find(b"movi") - 8  # start of the movi LIST chunk
    body = base[12:j] + movi
    payload = b"RIFF" + len(b"AVI " + body).to_bytes(4, "little") + b"AVI " + body
    out = sample_avi_frames(payload, every=1)
    assert len(out) == 1 and np.array_equal(out[0][1], rgb)
    assert i >= 0  # silence unused warning


def test_frame_base_alias_guard(spark):
    """frame_idx >= frame_base must fail loudly (assert_true), not
    silently alias composite ids across docs."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        video_near_dup_pairs,
    )

    bad = spark.createDataFrame(
        [(0, 17, 5)], "doc_id long, frame_idx int, dhash long"
    )
    with pytest.raises(Exception, match="frame_base"):
        video_near_dup_pairs(bad).collect()
    # negative frame_idx (ADVICE r10): Spark's % and DIV follow the
    # dividend's sign, so -1 would silently alias into doc-1's range
    neg_frame = spark.createDataFrame(
        [(1, -1, 5)], "doc_id long, frame_idx int, dhash long"
    )
    with pytest.raises(Exception, match="frame_base"):
        video_near_dup_pairs(neg_frame).collect()
    # negative doc id: same decomposition hazard
    neg_doc = spark.createDataFrame(
        [(-1, 2, 5)], "doc_id long, frame_idx int, dhash long"
    )
    with pytest.raises(Exception, match="frame_base"):
        video_near_dup_pairs(neg_doc).collect()


def test_extract_media_features_video_kind(spark):
    """RIFF-AVI payloads flow through the media feature extractor as
    kind='video' with (n_frames, duration_ms, w, h, luma, motion)
    features; corrupt rows still degrade to status rows."""
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        extract_media_features,
    )

    good = encode_avi(_frames(0), fps=10)
    rows = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(b"RIFF    AVI junk"))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in extract_media_features(rows).collect()}
    ok = out[0]
    assert ok["kind"] == "video" and ok["status"] == "ok"
    n_frames, duration_ms, w, h, luma, motion = ok["features"]
    assert n_frames == VID_FRAMES
    assert duration_ms == VID_FRAMES / 10 * 1000.0
    assert (w, h) == (9.0, 8.0)
    assert 0.0 < luma < 255.0 and motion > 0.0
    assert out[1]["status"].startswith("undecodable")


def test_still_from_video_planted_structure(spark):
    """Cross-modal plant (r11): every planted still (doc_id % 8 == 0,
    a pixel-exact extraction of video doc_id's sampled frame 2) pairs
    with the BASE video at hamming 0 AND the re-containered group
    member (doc_id + 2, same decoded frames), but NOT the redrawn
    member (doc_id + 1 redraws exactly frame 2); no un-planted still
    ever pairs."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        still_from_video_pairs,
    )
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        STILL_FROM_VID_EVERY,
        STILL_VID_FRAME,
        image_dhash,
        synth_avi_payloads,
        synth_still_payloads,
        video_frame_dhash,
    )

    docs = spark.range(0, 64).selectExpr("id AS doc_id")
    frames = video_frame_dhash(synth_avi_payloads(docs))
    stills = image_dhash(synth_still_payloads(docs))
    rows = still_from_video_pairs(frames, stills).collect()
    assert rows
    by_still = {}
    for r in rows:
        by_still.setdefault(r["still_id"], []).append(r)
    for sid, matches in by_still.items():
        assert sid % STILL_FROM_VID_EVERY == 0, sid
        vids = {r["video_id"] for r in matches}
        assert sid in vids, (sid, matches)  # the base video, exact
        assert sid + 2 in vids, (sid, matches)  # re-containered member
        assert sid + 1 not in vids, (sid, matches)  # redrawn frame 2
        for r in matches:
            assert r["frame_idx"] == STILL_VID_FRAME, r
            if r["video_id"] == sid:
                assert r["hamming"] == 0, r
    # every planted still in range was found
    planted = {i for i in range(64) if i % STILL_FROM_VID_EVERY == 0}
    assert set(by_still) == planted


def test_still_from_video_negative_id_guard(spark):
    """Negative still or video ids must fail loudly — the parity +
    composite decomposition would silently alias them otherwise."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        still_from_video_pairs,
    )

    frames = spark.createDataFrame(
        [(0, 2, 5)], "doc_id long, frame_idx int, dhash long"
    )
    bad_stills = spark.createDataFrame(
        [(-3, 5)], "doc_id long, dhash long"
    )
    with pytest.raises(Exception, match="doc_id"):
        still_from_video_pairs(frames, bad_stills).collect()


def test_stills_match_only_accepted_store_content(spark, tmp_path):
    """Store-lookup semantics: after the video corpus dedups into
    the store, a planted still matches ONLY its group's base video
    (the store's accepted member) — the re-containered member it
    would also match one-pass is deduped away; lookups never flag
    dropped content."""
    from var_elasticnet_bigdata_spark.operators.dedup import (
        incremental_video_dedup_bucketed,
        stills_against_video_store,
    )
    from var_elasticnet_bigdata_spark.operators.multimodal import (
        STILL_FROM_VID_EVERY,
        STILL_VID_FRAME,
        VID_MIN_MATCH,
        image_dhash,
        synth_avi_payloads,
        synth_still_payloads,
        video_frame_dhash,
    )

    spark.sql("DROP TABLE IF EXISTS tsvs__vfpb")
    try:
        docs = spark.range(0, 32).selectExpr("id AS doc_id")
        frames = video_frame_dhash(synth_avi_payloads(docs))
        for i, pred in enumerate(("doc_id < 16", "doc_id >= 16")):
            incremental_video_dedup_bucketed(
                frames.filter(pred), "tsvs",
                min_matching_frames=VID_MIN_MATCH,
                buckets=4, path=str(tmp_path / "store"), fresh=(i == 0),
            )
        stills = image_dhash(synth_still_payloads(docs))
        rows = stills_against_video_store(stills, "tsvs").collect()
        assert rows
        by_still = {}
        for r in rows:
            by_still.setdefault(r["still_id"], []).append(r)
        planted = {
            i for i in range(32) if i % STILL_FROM_VID_EVERY == 0
        }
        assert set(by_still) == planted
        for sid, matches in by_still.items():
            # exactly ONE stored match: the base video, exact frame
            assert len(matches) == 1, (sid, matches)
            (m,) = matches
            assert m["video_id"] == sid
            assert m["frame_idx"] == STILL_VID_FRAME
            assert m["hamming"] == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS tsvs__vfpb")
