"""Engine-portable deterministic hashing.

Every randomized operator in this repo (minhash, simhash, LSH, synthetic
data derivation) needs hashes that are *identical* in Spark and in the
DuckDB oracle SQL the driver runs side-by-side.  Neither engine's native
hash matches the other's, so we standardize on:

    h(s) = int(md5(s)[:15 hex chars], 16)        # 60 bits, positive

``md5`` is bit-identical everywhere.  Helpers emit both the Spark Column
and the equivalent DuckDB SQL string from one formula, so the two sides
cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Number of hex chars kept (60 bits — fits bigint, stays positive).
HEX_CHARS = 15


def h60(col: Column) -> Column:
    """Spark: 60-bit positive bigint hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, HEX_CHARS), 16, 10).cast("bigint")


def h60_sql(expr: str) -> str:
    """DuckDB SQL for the same 60-bit hash."""
    return f"(('0x' || substr(md5({expr}), 1, {HEX_CHARS}))::BIGINT)"


def seeded(col: Column, seed: int) -> Column:
    return h60(F.concat_ws(":", F.lit(str(seed)), col))


def seeded_sql(expr: str, seed: int) -> str:
    return h60_sql(f"'{seed}' || ':' || {expr}")
