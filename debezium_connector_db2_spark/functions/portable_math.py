"""Engine-portable deterministic natural log.

``ln`` is the one transcendental the quantized-score operators need,
and neither engine guarantees correctly-rounded ``ln``: the JVM's
``Math.log`` and DuckDB's libm ``ln`` can disagree by 1 ulp, which
flips ``round(ln(x) * 10^4)`` whenever the true value sits within an
ulp of a .5 quantization boundary (observed in practice: one hashed
n-gram bucket in ~10^5 crossed, breaking hash parity of the NB
classifier at sf0.01).

IEEE 754 *does* guarantee correct rounding for ``+ - * / sqrt`` — and
both engines honor it (JLS for ``Math.sqrt``; DuckDB uses the C
``sqrt``).  So a log built from those ops alone is **bit-identical
across engines by construction**:

    y    = x^(2^-K)            (K iterated square roots)
    ln x = 2^K * ln(y) ≈ 2^K * ((y-1) - (y-1)^2 / 2)

With ``K = 30`` and ``|ln x| <= 20``, ``y - 1`` is ~2e-8, the dropped
cubic Taylor term is ~1e-23, and the accumulated sqrt rounding is ~1
ulp of 1.0 → absolute error ≈ 2.4e-7 nats.  Accuracy only needs to
beat the 1e-4 quantum; *parity* needs bit-equality, which the
construction gives unconditionally.  Cost: 30 sqrts per value —
weights tables are bounded (≤ n_buckets rows), so this is training-
side noise.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Iterated-sqrt depth. 2^30 scaling keeps (y-1) large enough that the
#: 1-ulp-of-1.0 noise floor (~2.4e-7 nats after scaling) stays 400x
#: below the deci-milli-nat quantum.
PLN_K = 30


def portable_ln(col: Column) -> Column:
    """Spark column: deterministic ``ln(col)`` for ``col`` in
    ``(~2e-9, ~5e8)`` (i.e. ``|ln| <= 20``), bit-identical to
    :func:`portable_ln_sql` on the same double input."""
    y = col.cast("double")
    for _ in range(PLN_K):
        y = F.sqrt(y)
    e = y - F.lit(1.0)
    return F.lit(float(2 ** PLN_K)) * (e - e * e * F.lit(0.5))


def portable_ln_sql(expr: str) -> str:
    """DuckDB SQL for the same deterministic ``ln``.  ``expr`` should
    be a (CTE) column reference, not a heavy subexpression — it is
    referenced three times."""
    y = f"CAST(({expr}) AS DOUBLE)"
    for _ in range(PLN_K):
        y = f"sqrt({y})"
    scale = repr(float(2 ** PLN_K))
    return (f"({scale} * ((({y}) - 1.0) - "
            f"(({y}) - 1.0) * (({y}) - 1.0) * 0.5))")
