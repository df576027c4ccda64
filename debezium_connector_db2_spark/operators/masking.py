"""Column mask / hash / truncate transforms — F7 (SURVEY.md §2.2).

The reference inherits Debezium's column transforms, exercised in
``Db2ConnectorIT.java:736-787``:

* ``column.mask.with.N.chars``          -> fixed mask string
* ``column.mask.hash.SHA-256.with.salt``-> salted SHA-256 of the value
* ``column.truncate.to.N.chars``        -> prefix truncation

All vectorized JVM expressions — no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mask_with_chars(df: DataFrame, column: str, n: int, char: str = "*") -> DataFrame:
    """Replace every non-null value with ``char * n``."""
    return df.withColumn(
        column,
        F.when(F.col(column).isNotNull(), F.lit(char * n)).otherwise(F.lit(None)),
    )


def mask_hash(df: DataFrame, column: str, salt: str, algo: int = 256) -> DataFrame:
    """Salted SHA-2 hash, hex string — Debezium's
    ``column.mask.hash.SHA-256.with.salt.<salt>`` semantics."""
    return df.withColumn(
        column,
        F.when(
            F.col(column).isNotNull(),
            F.sha2(F.concat(F.lit(salt), F.col(column).cast("string")), algo),
        ).otherwise(F.lit(None)),
    )


def truncate_to_chars(df: DataFrame, column: str, n: int) -> DataFrame:
    return df.withColumn(column, F.substring(F.col(column), 1, n))
