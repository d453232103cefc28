# example_privacy_media.py — round-10 media privacy + video dedup chain
"""The pre-packaging passes a multimodal training corpus runs, composed
from the round-10 operators end to end on synthetic media:

1. EXIF extraction (``operators/exif.py``) — camera metadata + GPS
   presence over JPEG payloads;
2. GPS scrubbing — zero every coordinate byte in place (the privacy
   gate), verified by re-extraction;
3. orientation normalization — portrait/landscape collapse BEFORE
   perceptual hashing;
4. video shot near-dup (``operators/videodedup.py``) — AVI decode →
   scene cuts → per-shot pHash in ONE kernel, then the banded-Hamming
   shot join (never a video cross-join);
5. speech segmentation + log-mel features (``vad`` / ``melspec``) —
   the ASR-corpus manifest.

Every decode is a pure-stdlib codec; every cross-item step is a banded
equi-join or plain groupBy — nothing materializes all pairs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from bid_evaluation_spark.operators.avi import encode_avi_mjpeg
from bid_evaluation_spark.operators.exif import (
    apply_orientation, build_exif_app1, exif_metadata, exif_scrub_gps,
    insert_app1)
from bid_evaluation_spark.operators.jpeg import encode_jpeg
from bid_evaluation_spark.operators.melspec import mel_features
from bid_evaluation_spark.operators.vad import speech_ratio, speech_segments
from bid_evaluation_spark.operators.videodedup import (
    shot_phashes, video_neardup)
from bid_evaluation_spark.operators.wav import encode_wav
from bid_evaluation_spark.session import get_spark

spark = get_spark("example-privacy-media", master="local[4]",
                  shuffle_partitions=4)

# -- 1+2: photos with EXIF, half carrying GPS --------------------------
y, x = np.mgrid[0:32, 0:40]
photos = []
for i in range(6):
    img = np.clip(60 + 4 * ((x * (1 + i)) % 23) + y, 0, 255).astype(np.uint8)
    gps = (40.0 + i, -70.0 - i) if i % 2 == 0 else None
    photos.append((i, insert_app1(
        encode_jpeg(img),
        build_exif_app1(make=f"cam-{i % 2}", orientation=1 + i % 8,
                        gps=gps))))
jpegs = spark.createDataFrame(photos, "media_id long, payload binary")

meta = exif_metadata(jpegs)
print("-- EXIF (before scrub): GPS rows =",
      meta.filter("has_gps").count())
scrubbed = exif_scrub_gps(jpegs)
after = exif_metadata(scrubbed.select("media_id", "payload"))
print("-- after scrub: GPS rows =", after.filter("has_gps").count(),
      "| orientation preserved =",
      after.filter(F.col("orientation").isNotNull()).count())

# -- 4: video shot-level near-dup --------------------------------------
def clip(c, shots=2):
    frames = []
    for s in range(shots):
        b = 1 + (c + 5 * s) % 14
        p = np.round(7 * np.cos(2 * np.pi * x[:24, :32] * (1 + c) / 32)
                     * np.cos(2 * np.pi * y[:24, :32] * (1 + s) / 24))
        frames += [(16 * b + 8 + p).astype(np.uint8)] * 2
    return encode_avi_mjpeg(frames, quality=90)

videos = spark.createDataFrame(
    [(0, clip(0)), (1, clip(0)), (2, clip(3)), (3, clip(0))],
    "media_id long, payload binary")
shots = shot_phashes(videos, strict=True)
pairs = video_neardup(shots)
print("-- video near-dup pairs (same-content clips):")
pairs.show()

# -- 5: speech manifest -------------------------------------------------
def speech(seed):
    t = np.arange(1024 * (2 + seed % 2))
    tone = 0.5 * np.sin(2 * np.pi * 440 * t / 8000.0)
    pcm = 32000 * np.concatenate([np.zeros(512), tone, np.zeros(768)])
    return encode_wav(pcm.astype(np.int16), rate=8000)

audio = spark.createDataFrame(
    [(i, speech(i)) for i in range(4)], "media_id long, payload binary")
segs = speech_segments(audio)
print("-- speech ratio per clip:")
speech_ratio(segs).orderBy("media_id").show()
print("-- mel bands (clip 0):")
mel_features(audio).filter("media_id = 0").orderBy("band").show()

spark.stop()
print("example_privacy_media: OK")
