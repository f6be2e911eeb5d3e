"""Text-analysis functions for training-data pipelines: SimHash, rolling-hash
document fingerprinting, language-ID scoring, quality features.

SimHash and the winnowed fingerprint are Arrow-vectorized pandas UDFs
(ragged token streams don't map to fixed-width JVM expressions); language-ID
and quality features are pure built-in column expressions (see
verify_queries.q_lang_id / q_text_quality for the JVM-side forms).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

_MASK64 = (1 << 64) - 1


def _h64_bytes(tok: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")


def simhash64(text: str | None) -> int | None:
    """64-bit SimHash over whitespace tokens (signed to fit Spark long)."""
    if text is None:
        return None
    toks = text.split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = _h64_bytes(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return v - (1 << 64) if v >= 1 << 63 else v


@pandas_udf(LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    return texts.map(simhash64)


def rolling_fingerprint(text: str | None, window: int = 4, keep: int = 8) -> str | None:
    """Winnowing-style fingerprint: Karp-Rabin rolling hash over tokens,
    keep the ``keep`` smallest window hashes, hex-joined — a compact,
    shift-tolerant document signature."""
    if text is None:
        return None
    toks = text.split()
    if len(toks) < window:
        return format(_h64_bytes(" ".join(toks)) & _MASK64, "016x")
    B = 1_000_003
    hs = [_h64_bytes(t) for t in toks]
    # polynomial rolling hash over token-hash stream
    power = pow(B, window - 1, 1 << 64)
    h = 0
    out = []
    for i, v in enumerate(hs):
        h = (h * B + v) & _MASK64
        if i >= window - 1:
            out.append(h)
            h = (h - hs[i - window + 1] * power) & _MASK64
    sel = sorted(out)[:keep]
    return ",".join(format(x, "016x") for x in sel)


@pandas_udf(StringType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    return texts.map(rolling_fingerprint)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK64).count("1")
