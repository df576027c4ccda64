"""Decimal handling modes + DECFLOAT variable-scale representation.

The reference exposes three ``decimal.handling.mode`` renderings of
DECIMAL/NUMERIC columns (``Db2ValueConverters.java:48-61``, exercised by
``DatatypesFromSnapshotIT.java:70-146``):

* ``precise`` — exact ``BigDecimal`` (Kafka ``Decimal`` logical type);
* ``double``  — lossy float64;
* ``string``  — decimal rendered as text.

DECFLOAT(16/34) values carry *per-value* scale, so precise mode wraps
them as ``VariableScaleDecimal`` — a struct ``{scale: int32, value:
unscaled bytes}`` (``Db2ValueConverters.java:84-116, 146-151``).

All renderings are pure column expressions (codegen'd, no UDFs).  The
unscaled value rides as BIGINT rather than raw bytes — same information,
join/compare-friendly, and exact for the ≤18-digit DECFLOAT(16) family;
the byte rendering is one ``F.conv``/``unhex`` away when Kafka-wire
compatibility matters.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DECIMAL_HANDLING_MODES = ("precise", "double", "string")


def decimal_column(col: Column, precision: int, scale: int,
                   mode: str = "precise") -> Column:
    """Render a numeric column under a decimal handling mode.

    Rounding to ``scale`` uses HALF_UP via ``F.round`` before the exact
    cast, matching the reference's rescale-on-conversion behavior.
    """
    if mode not in DECIMAL_HANDLING_MODES:
        raise ValueError(f"unknown decimal.handling.mode {mode!r}")
    exact = F.round(col, scale).cast(f"decimal({precision},{scale})")
    if mode == "precise":
        return exact
    if mode == "double":
        return exact.cast("double")
    return exact.cast("string")


def variable_scale_decimal(col: Column, precision: int, scale: int,
                           as_struct: bool = True):
    """DECFLOAT precise-mode rendering: ``(scale, unscaled)`` pair.

    ``unscaled = value * 10^scale`` as an exact integer — the payload of
    the reference's ``VariableScaleDecimal`` struct.  ``as_struct=False``
    returns the two columns separately (flat outputs hash-compare cleanly
    across engines).
    """
    exact = F.round(col, scale).cast(f"decimal({precision},{scale})")
    unscaled = (exact * F.lit(10 ** scale)).cast("long")
    if as_struct:
        return F.struct(F.lit(scale).cast("int").alias("scale"),
                        unscaled.alias("value"))
    return F.lit(scale).cast("int"), unscaled
