"""Gated loudness: block math, analytic tone values, both gates,
silence handling, normalization, Spark kernel."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bid_evaluation_spark.operators.loudness import (
    block_loudness,
    clip_loudness,
    integrated_loudness,
    normalize_gain,
)
from bid_evaluation_spark.operators.wav import encode_wav

RATE = 8000


def _tone(n, amp, freq=400):
    # 400 Hz at 8 kHz: exactly 20 cycles per 400 ms block, so every
    # block's mean square is the analytic amp^2/2
    return amp * np.sin(2 * np.pi * freq * np.arange(n) / RATE)


def _lufs_of(amp):
    return -0.691 + 10 * math.log10(amp * amp / 2.0)


def test_constant_tone_matches_analytic_value():
    x = _tone(4 * RATE, 0.5)
    got = integrated_loudness(x, RATE)
    assert abs(got - _lufs_of(0.5)) < 0.01
    L = block_loudness(x, RATE)
    assert len(L) == 1 + (4 * RATE - 3200) // 800
    assert np.abs(L - _lufs_of(0.5)).max() < 0.01


def test_absolute_gate_ignores_silence_padding():
    # loudness must NOT change when silence is appended (the property
    # the gate exists for)
    x = _tone(2 * RATE, 0.4)
    padded = np.concatenate([x, np.zeros(4 * RATE)])
    a = integrated_loudness(x, RATE)
    b = integrated_loudness(padded, RATE)
    # boundary blocks straddling the tone->silence edge legitimately
    # survive the relative gate (correct BS.1770 behavior), shifting
    # the value by a fraction of an LU — NOT by the -300 LUFS the
    # ungated mean would move
    assert abs(a - b) < 0.5
    assert integrated_loudness(np.zeros(2 * RATE), RATE) is None


def test_relative_gate_drops_quiet_tail():
    # loud tone + very quiet tone (-40 dB below): relative gate (-10
    # LU) drops the quiet blocks, so integrated ~ loud-only value
    loud = _tone(2 * RATE, 0.5)
    quiet = _tone(2 * RATE, 0.005)
    both = np.concatenate([loud, quiet])
    got = integrated_loudness(both, RATE)
    assert abs(got - _lufs_of(0.5)) < 0.6
    # without the quiet part being droppable (amp within 10 LU) the
    # value shifts toward the mixture
    mid = np.concatenate([loud, _tone(2 * RATE, 0.3)])
    assert integrated_loudness(mid, RATE) < _lufs_of(0.5) - 0.5


def test_normalize_gain_hits_target():
    x = _tone(2 * RATE, 0.2)
    y = normalize_gain(x, RATE, target_lufs=-23.0)
    assert abs(integrated_loudness(y, RATE) + 23.0) < 0.05
    assert np.array_equal(normalize_gain(np.zeros(RATE), RATE),
                          np.zeros(RATE))


def test_spark_kernel(spark):
    rows = [(0, encode_wav(_tone(2 * RATE, 0.5), rate=RATE)),
            (1, encode_wav(np.zeros(2 * RATE), rate=RATE)),
            (2, b"junk")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in clip_loudness(df).collect()}
    assert abs(got[0]["integrated_lufs"] - _lufs_of(0.5)) < 0.05
    assert got[0]["n_gated_blocks"] == got[0]["n_blocks"]
    assert got[1]["integrated_lufs"] is None and got[1]["n_blocks"] > 0
    assert got[2]["integrated_lufs"] is None


def test_registry_goldens_track_analytic_within_straddle_margin():
    """The frozen mm_loudness goldens sit a deterministic ~0.34 LU
    below the ungated analytic tone value (the tone->silence straddle
    blocks) — pin that relationship so a silent regression in either
    the fixture or the gate can't hide inside the golden table."""
    goldens = {0: -24.0424, 1: -18.0207, 2: -14.4986,
               3: -11.9994, 4: -10.0612, 5: -8.4775}
    for c, lufs in goldens.items():
        a = (1 + c) / 10.0
        analytic = -0.691 + 10 * math.log10(a * a / 2)
        assert 0.25 < analytic - lufs < 0.45, (c, analytic, lufs)
