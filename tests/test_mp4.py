"""MP4 inventory: box walk, mvhd v0/v1, track census, salvage, kernel."""

from __future__ import annotations

from bid_evaluation_spark.operators.mp4 import (
    build_mp4,
    mp4_inventory,
    parse_mp4_inventory,
)


def test_av_file_full_inventory():
    b = build_mp4(brand="mp42", timescale=1000, duration=90500,
                  tracks=[("vide", "avc1", 640, 360),
                          ("soun", "mp4a", 0, 0)])
    inv = parse_mp4_inventory(b)
    assert inv["is_mp4"] and inv["major_brand"] == "mp42"
    assert inv["duration_ms"] == 90500 and inv["n_tracks"] == 2
    assert inv["video_codec"] == "avc1" and inv["audio_codec"] == "mp4a"
    assert (inv["width"], inv["height"]) == (640.0, 360.0)
    assert inv["track_types"] == "vide,soun" and inv["clean"]


def test_mvhd_version1_sixtyfour_bit_duration():
    b = build_mp4(timescale=90000, duration=90000 * 7200,
                  mvhd_version=1)
    assert parse_mp4_inventory(b)["duration_ms"] == 7200 * 1000


def test_junk_and_mid_moov_truncation():
    assert parse_mp4_inventory(b"random bytes")["is_mp4"] is False
    full = build_mp4(brand="mp42", duration=5000,
                     tracks=[("vide", "avc1", 320, 240)])
    t = parse_mp4_inventory(full[:28])   # ftyp + 4 bytes of moov header
    assert t["is_mp4"] and t["major_brand"] == "mp42"
    assert t["clean"] is False and t["n_tracks"] == 0
    assert t["duration_ms"] is None


def test_three_track_census():
    b = build_mp4(duration=60000,
                  tracks=[("vide", "avc1", 1280, 720),
                          ("soun", "mp4a", 0, 0),
                          ("text", "tx3g", 0, 0)])
    inv = parse_mp4_inventory(b)
    assert inv["n_tracks"] == 3
    assert inv["track_types"] == "vide,soun,text"
    assert inv["video_codec"] == "avc1"


def test_kernel(spark):
    rows = [(0, build_mp4(duration=1000,
                          tracks=[("vide", "avc1", 64, 48)])),
            (1, b"junk"), (2, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in mp4_inventory(df).collect()}
    assert got[0]["is_mp4"] and got[0]["video_codec"] == "avc1"
    assert got[1]["is_mp4"] is False
    assert got[2]["is_mp4"] is False
