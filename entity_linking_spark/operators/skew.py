"""Explicit skew handling: salted repartition + salted join.

The north rule requires hot-key skew broken by salted repartitioning
(the reference has NO skew handling — its hot aliases simply fan out and
its ThreadPool chunks are uneven, SURVEY §4). Three tiers in this repo:

  1. stop-key removal   non-discriminative keys dropped (blocking.py)
  2. THIS MODULE        salting for keys that are hot but must be kept
  3. AQE skew-join      runtime splitting for the residue (session.py)

``salted_join`` implements the classic replicate-small/salt-large
pattern: the skewed side gets a deterministic salt in [0, S), the small
side is replicated S times, and the equi join runs on (key, salt) — a
hot key's rows now land in S different reduce partitions instead of one
straggler. Deterministic (crc-style hash, never rand()) per the
FIXTURES.md seeding rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SALT = 8


def with_salt(
    df: DataFrame, cols: list[str], n_salts: int = DEFAULT_SALT, out: str = "_salt"
) -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from the row's OTHER
    columns (so equal keys spread, but reruns are byte-identical)."""
    return df.withColumn(out, F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int"))


def replicate(
    df: DataFrame, n_salts: int = DEFAULT_SALT, out: str = "_salt"
) -> DataFrame:
    """Cross the (small) build side with every salt value."""
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    return df.withColumn(out, F.explode(salts))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str | list[str],
    salt_cols: list[str],
    n_salts: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi join on (key..., salt): ``large`` is salted by hashing
    ``salt_cols`` (columns NOT in the key — e.g. the other id of a pair),
    ``small`` is replicated n_salts times. A key owning p% of the rows is
    split across n_salts reducers instead of one.

    Use when the build side is too big to broadcast but small enough to
    replicate n_salts x (supports/feature tables per url), and the probe
    side has hot keys (a viral page appearing in millions of candidate
    pairs).
    """
    keys = [key] if isinstance(key, str) else list(key)
    lg = with_salt(large, salt_cols, n_salts)
    sm = replicate(small, n_salts)
    out = lg.join(sm.hint("shuffle_hash"), [*keys, "_salt"], how)
    return out.drop("_salt")


def salted_repartition(
    df: DataFrame, key: str, n_partitions: int, n_salts: int = DEFAULT_SALT
) -> DataFrame:
    """Repartition by (key, salt) so one hot key spreads over n_salts
    partitions — the pre-shuffle for any downstream per-key processing
    that tolerates split groups (e.g. partial aggregation)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    return salted.repartition(n_partitions, F.col(key), F.col("_salt")).drop("_salt")
