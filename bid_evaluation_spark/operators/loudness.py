"""Gated integrated loudness (ITU-R BS.1770 structure) — the loudness
normalization pass an ASR/audio training corpus runs so the model never
learns gain as a feature: clips are measured, then scaled to a target
(e.g. -23 LUFS), and out-of-range clips are flagged.

Implemented here: the BS.1770 MEASUREMENT pipeline with its two-stage
gate, over mono in [-1, 1]:

1. 400 ms momentary blocks with 75 % overlap (100 ms hop);
2. block loudness ``L_j = -0.691 + 10·log10(z_j)`` with ``z_j`` the
   block mean square;
3. ABSOLUTE gate: drop blocks below -70 LUFS;
4. RELATIVE gate: compute the mean of surviving blocks' ``z``, then
   drop blocks below that mean's loudness - 10 LU;
5. integrated loudness = ``-0.691 + 10·log10(mean z of final set)``.

Documented divergence: the standard prefixes a K-weighting filter
(shelf + high-pass) specified as 48 kHz biquad tables; the 8 kHz
fixture rate has no published tables, so measurement here is
UNWEIGHTED (K-weighting ≈ identity below ~1.5 kHz, where the fixtures
live). The gating logic — the algorithmically interesting part, and
what makes loudness robust to silence padding — is exact.

Spark shape: one Arrow kernel per clip (decode → blocks → gates),
constant work per row; normalization is a map of the payload.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .multimodal import decode_audio

_OFFSET = -0.691
_ABS_GATE = -70.0
_REL_GATE = -10.0


def block_loudness(samples: np.ndarray, rate: int) -> np.ndarray:
    """Per-block loudness (LUFS) for 400 ms blocks at 100 ms hop."""
    x = np.asarray(samples, dtype=np.float64)
    blk = max(1, int(round(0.4 * rate)))
    hop = max(1, int(round(0.1 * rate)))
    if len(x) < blk:
        return np.empty(0)
    n = 1 + (len(x) - blk) // hop
    idx = np.arange(blk)[None, :] + hop * np.arange(n)[:, None]
    z = np.mean(x[idx] ** 2, axis=1)
    return _OFFSET + 10 * np.log10(np.maximum(z, 1e-30))


def integrated_loudness(samples: np.ndarray,
                        rate: int) -> Optional[float]:
    """Two-stage-gated integrated loudness in LUFS (None when no block
    survives the absolute gate — i.e. digital silence)."""
    L = block_loudness(samples, rate)
    if not len(L):
        return None
    z = 10 ** ((L - _OFFSET) / 10.0)
    keep = L > _ABS_GATE
    if not keep.any():
        return None
    rel_thresh = (_OFFSET + 10 * math.log10(float(z[keep].mean()))
                  + _REL_GATE)
    final = keep & (L > rel_thresh)
    if not final.any():
        return None
    return _OFFSET + 10 * math.log10(float(z[final].mean()))


def clip_loudness(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "media_id", *,
                  strict: bool = False) -> DataFrame:
    """Per-clip loudness manifest: ``(media_id, n_blocks,
    n_gated_blocks, integrated_lufs)`` (nulls for silence or, unless
    ``strict``, undecodable payloads)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rate, samples = decode_audio(bytes(p or b""))
                    L = block_loudness(samples, rate)
                    lufs = integrated_loudness(samples, rate)
                    n_gated = int((L > _ABS_GATE).sum()) if len(L) else 0
                except Exception:
                    if strict:
                        raise
                    L, lufs, n_gated = np.empty(0), None, 0
                rows.append({"media_id": int(mid),
                             "n_blocks": len(L),
                             "n_gated_blocks": n_gated,
                             "integrated_lufs": lufs})
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_blocks", "n_gated_blocks",
                "integrated_lufs"])

    return df.select(id_col, payload_col).mapInPandas(
        kernel, "media_id long, n_blocks long, n_gated_blocks long, "
                "integrated_lufs double")


def normalize_gain(samples: np.ndarray, rate: int,
                   target_lufs: float = -23.0) -> np.ndarray:
    """Scale a clip to the target integrated loudness (unchanged when
    unmeasurable); output clipped to [-1, 1] like any real normalizer."""
    lufs = integrated_loudness(samples, rate)
    if lufs is None:
        return np.asarray(samples, dtype=np.float64)
    gain = 10 ** ((target_lufs - lufs) / 20.0)
    return np.clip(np.asarray(samples, dtype=np.float64) * gain,
                   -1.0, 1.0)
