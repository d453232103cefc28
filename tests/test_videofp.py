"""Video fingerprint: majority-bit signature semantics, AVI≡Y4M
container invariance of per-frame hashes, near-dup delegation, and the
corrupt-payload path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bid_evaluation_spark.operators.videofp import (
    video_dhash_frames,
    video_neardup_pairs,
    video_signature,
)


def _frames(nf, d=0):
    return [((7 * np.arange(9)[None, :] ** 2 + 13 * np.arange(8)[:, None]
              + 5 * k + 3 * d) % 256).astype(np.uint8) for k in range(nf)]


def test_signature_majority_semantics(spark):
    # 3 frames: bit set in 2 → majority 1; bit set in 1 → 0; tie (2 of 4
    # below) impossible with odd count — test tie with 2 frames: 1 of 2
    # sets the bit → 2*1 > 2 is False → 0 (ties lose)
    rows = [(1, 0, 0b1011), (1, 1, 0b0011), (1, 2, 0b0110),
            (2, 0, 0b1), (2, 1, 0b0),
            (3, 0, -1), (3, 1, -1), (3, 2, 0)]  # bit 63 via -1 (all ones)
    df = spark.createDataFrame(rows, "media_id long, frame_index long, dhash long")
    got = {r["media_id"]: r for r in video_signature(df).collect()}
    assert got[1]["sig64"] == 0b0011 and got[1]["n_frames"] == 3
    assert got[2]["sig64"] == 0  # tie → 0
    assert got[3]["sig64"] == -1  # majority all-ones incl. the sign bit


def test_container_invariance_and_corrupt(spark):
    from bid_evaluation_spark.operators.avi import encode_avi_mjpeg
    from bid_evaluation_spark.operators.y4m import encode_y4m

    # MJPEG needs MCU-aligned dims for bit-exactness → use 16x24
    frames = []
    for k in range(3):
        blocks = ((11 * np.arange(2)[None, :] + 5 * np.arange(3)[:, None]
                   + 7 * k) % 256)
        frames.append(np.repeat(np.repeat(blocks, 8, 0), 8, 1)
                      .astype(np.uint8))
    rows = [(1, bytearray(encode_avi_mjpeg(frames, qtable=1))),
            (2, bytearray(encode_y4m(frames, mono=True))),
            (3, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = video_dhash_frames(df).collect()
    by = {}
    for r in out:
        by.setdefault(r["media_id"], {})[r["frame_index"]] = r["dhash"]
    assert 3 not in by and by[1] == by[2] and len(by[1]) == 3
    with pytest.raises(Exception):
        video_dhash_frames(df, strict=True).collect()
    # identical videos → identical signatures → hamming-0 near-dup pair
    sigs = video_signature(video_dhash_frames(df))
    pairs = video_neardup_pairs(sigs, max_hamming=2).collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [(1, 2, 0)]


def test_registry_query_shape(spark):
    from __spark_entry__ import queries

    fn = queries()["mm_video_signature_documents"]
    out = fn(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 500
    assert all(r["n_frames"] in (2, 3, 4, 5) for r in out)
