# example_media_curation.py — end-to-end multimodal curation (beyond reference)
"""The media curation loop a 100-TB multimodal pipeline runs before any
model sees a payload, composed from the round-9 operators:

1. decode + quality gates (``mediaquality``) — drop blank/clipped media;
2. per-modality fingerprints (``audiofp`` / ``videofp`` / ``image_dhash``);
3. near-dup removal through the ONE shared banded-Hamming kernel;
4. a streaming twin (``StreamingHashNearDup``) showing the same filter
   as a stateful dedup-on-ingest.

Every decode is a real pure-stdlib codec (PNG/JPEG/GIF, PCM/G.711/
ADPCM/FLAC, Y4M/MJPEG-AVI); every step is map-shaped or a banded
equi-join — nothing here materializes all pairs.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from bid_evaluation_spark.operators.audiofp import (
    audio_fingerprint, audio_neardup_pairs)
from bid_evaluation_spark.operators.g711 import encode_wav_g711
from bid_evaluation_spark.operators.mediaquality import audio_quality
from bid_evaluation_spark.operators.wav import encode_wav
from bid_evaluation_spark.session import get_spark
from bid_evaluation_spark.streaming.hashdup import StreamingHashNearDup

spark = get_spark("example-media-curation", master="local[4]",
                  shuffle_partitions=4)

# -- a tiny synthetic ingest batch: originals, a lossy re-encode, junk.
# The fingerprint hashes the ENERGY ENVELOPE (frame-to-frame loudness
# gradients, the Haitsma-Kalker bit), so distinct clips get distinct
# amplitude envelopes; a re-encode preserves the envelope.
def clip_(seed, n=4096, amp=0.5):
    env = np.random.default_rng(seed).uniform(0.2, 1.0, n // 256 + 1)
    return (amp * env[np.arange(n) // 256]
            * np.sin(2 * np.pi * 440 * np.arange(n) / 8000.0))

rows = [
    (0, bytearray(encode_wav(clip_(1), rate=8000))),             # keep
    (1, bytearray(encode_wav(clip_(2), rate=8000))),             # keep
    (2, bytearray(encode_wav_g711(clip_(1), rate=8000,
                                  law="ulaw"))),                 # re-encode of 0
    (3, bytearray(encode_wav(np.zeros(4096), rate=8000))),       # silent → gate out
    (4, bytearray(encode_wav(clip_(1, amp=2.0), rate=8000))),    # clipped → gate out
    (5, bytearray(b"corrupt payload")),                          # undecodable
]
media = spark.createDataFrame(rows, "media_id long, payload binary")

print("1) quality gates (silence/clipping over decoded samples):")
q = audio_quality(media)
q.orderBy("media_id").show()
keep = q.filter((F.col("silence_ratio") < 0.9)
                & (F.col("clip_ratio") < 0.05)
                & F.col("peak").isNotNull())
gated = media.join(keep.select("media_id"), "media_id")
print(f"   {media.count()} in -> {gated.count()} past the gates")

print("2) fingerprints + banded near-dup (no all-pairs):")
fps = audio_fingerprint(gated)
pairs = audio_neardup_pairs(fps, max_hamming=6)
pairs.show()
dups = pairs.select(F.col("id_b").alias("media_id")).distinct()
curated = gated.join(dups, "media_id", "left_anti")
print(f"   {gated.count()} -> {curated.count()} after near-dup removal")
assert sorted(r["media_id"] for r in curated.select("media_id").collect()) \
    == [0, 1], "expected originals 0 and 1 to survive"

print("3) the same filter as dedup-on-ingest (streaming twin):")
with tempfile.TemporaryDirectory() as tmp:
    nd = StreamingHashNearDup(spark, os.path.join(tmp, "state"))
    nd.process_batch(fps.filter("media_id <= 1"), batch_id=0)
    nd.process_batch(fps.filter("media_id = 2"), batch_id=1)
    nd.flags().orderBy("media_id").show()
    assert nd.n_retained == 2  # the μ-law re-encode was filtered on arrival

spark.stop()
print("media curation example OK")
