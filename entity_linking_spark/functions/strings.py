"""String similarity for pairwise scoring: Jaro-Winkler + Levenshtein.

The reference ranks mention/candidate pairs with a BERT pair classifier
(entity_sort/el_models.py:52-95); the north rule specifies classic string
similarities fused with embedding cosine as the batch scoring function.
Both are standard public algorithms, implemented here pure-Python but
always invoked inside Arrow-batched pandas UDFs over short strings
(mentions/aliases), so per-call cost is bounded by string length, not
row-at-a-time serialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType


def levenshtein(a: str, b: str) -> int:
    """Classic two-row DP edit distance."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and a[i] == b[j]:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    t = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    m = matches
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    j = jaro(a, b)
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix >= max_prefix:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [jaro_winkler(x or "", y or "") for x, y in zip(a, b)], dtype=np.float64
    )


@pandas_udf(IntegerType())
def levenshtein_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([levenshtein(x or "", y or "") for x, y in zip(a, b)], dtype=np.int32)


def levenshtein_sim(a: str, b: str) -> float:
    """Normalized to [0,1]: 1 - dist/max_len."""
    if not a and not b:
        return 1.0
    return 1.0 - levenshtein(a, b) / max(len(a), len(b))
