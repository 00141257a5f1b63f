"""Vectorized Bloom filter for semi-join pushdown.

The reference carries a Bloom-filter type it never enables
(SURVEY §2 T6 — dead code); this is the working Ray-Data form: build the
bitmap over the SMALL side's keys in one pass (per-batch partial bitmaps
OR-fold — a bitmap is a few hundred KB regardless of key count), broadcast
it once via ``ray.put``, and PROBE inside the big side's scan so rows that
cannot join never enter the exchange. False positives are possible by
construction, so the probe only PRUNES — an exact join/semi-join downstream
keeps correctness; false negatives are impossible.

Double hashing (Kirsch & Mitzenmacher 2006: g_i = h1 + i·h2) gives k
independent-enough probes from two base hashes, all vectorized numpy.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bloom_build", "bloom_partial", "bloom_probe", "BLOOM_K"]

BLOOM_K = 4  # probes per key; with m/n >= 8 bits/key -> fp ~ 2-3%

_MUL1 = np.uint64(0x9E3779B97F4A7C15)  # splitmix64-style avalanche
_MUL2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _h2x(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = keys.astype(np.uint64)
    h1 = x * _MUL1
    h1 ^= h1 >> np.uint64(29)
    h1 *= _MUL2
    h1 ^= h1 >> np.uint64(32)
    h2 = (x ^ (x >> np.uint64(33))) * _MUL2
    h2 ^= h2 >> np.uint64(29)
    return h1, h2 | np.uint64(1)  # odd step so all slots reachable


def bloom_partial(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """Bitmap (uint64 words) with ``keys`` inserted — a per-batch partial;
    partials combine by bitwise OR."""
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(keys) == 0:
        return words
    h1, h2 = _h2x(np.asarray(keys))
    m = np.uint64(m_bits)
    for i in range(BLOOM_K):
        pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return words


def bloom_build(partials: list[np.ndarray]) -> np.ndarray:
    """OR-fold per-batch partial bitmaps (each a few hundred KB)."""
    out = partials[0].copy()
    for p in partials[1:]:
        out |= p
    return out


def bloom_probe(words: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Membership mask (True = maybe present; False = DEFINITELY absent)."""
    if len(keys) == 0:
        return np.zeros(0, bool)
    h1, h2 = _h2x(np.asarray(keys))
    m = np.uint64(len(words) * 64)
    ok = np.ones(len(keys), bool)
    for i in range(BLOOM_K):
        pos = (h1 + np.uint64(i) * h2) % m
        bit = (words[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        ok &= bit.astype(bool)
    return ok
