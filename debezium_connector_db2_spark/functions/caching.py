"""Result-scoped caching for library operators.

A library operator that ``persist()``s an intermediate and returns a lazy
DataFrame has a lifecycle problem: the cache must be alive when the
*caller* materializes the result, but a bare ``persist()`` without a
matching ``unpersist()`` pins executor storage for the life of the
session — repeated calls (e.g. one per micro-batch) accumulate blocks
until eviction thrash sets in.  Dropping the persist instead is not an
answer either: Spark recomputes each consumer branch of the shared
subplan (exchange reuse does not cover these multi-consumer aggregate
trees), a measured 3-4x slowdown on the dedup operators.

``pin_for_result`` ties the cache lifetime to the *result object*: the
intermediates stay persisted for exactly as long as the caller holds a
reference to the returned DataFrame, and are unpersisted automatically
when it is garbage-collected (CPython refcounting makes this prompt —
the moment the caller drops the result, typically right after its
action completes).  No API change for callers; no session-long leak.
"""

from __future__ import annotations

import contextlib
import weakref

from pyspark.sql import DataFrame

#: name of the attribute holding the finalizer on a pinned result
_PIN_ATTR = "_cdc_pin_finalizer"


def pin_for_result(result: DataFrame, *deps: DataFrame) -> DataFrame:
    """Persist ``deps`` for as long as ``result`` is referenced.

    Returns ``result`` unchanged.  Each dep is persisted now (lazily, as
    usual — blocks materialize on the result's first action) and
    unpersisted when the returned DataFrame object is garbage-collected.
    Safe against an already-stopped session at teardown.

    **Scope caveat** — the pin rides on the *exact returned object*, not
    on DataFrames derived from it.  ``op(df).where(...)`` drops the
    pinned result immediately and the deps unpersist before the derived
    frame ever runs, silently reverting to full recompute.  Either hold
    the returned object until after your action::

        pairs = ngram_jaccard_pairs(df, "id", "text")
        big = pairs.where("jaccard > 0.8")
        big.count()          # pairs still referenced -> cache alive
        del pairs

    or move the pin onto the derived frame with :func:`carry_pin`::

        big = carry_pin(pairs.where("jaccard > 0.8"), pairs)

    or manage the scope explicitly with :func:`pinned`.
    """
    pinned = []
    for d in deps:
        d.persist()
        pinned.append(d)

    def _release(dfs=pinned):
        for d in dfs:
            try:
                d.unpersist()
            except Exception:
                pass  # session already stopped / JVM gone at teardown

    fin = weakref.finalize(result, _release)
    try:
        setattr(result, _PIN_ATTR, fin)
    except Exception:
        pass  # pin still works; carry_pin just can't transfer it
    return result


def carry_pin(derived: DataFrame, source: DataFrame) -> DataFrame:
    """Transfer ``source``'s result-scoped pin onto ``derived``.

    ``source`` must be a DataFrame returned by :func:`pin_for_result`
    (or one that already carried a pin).  The original finalizer is
    detached — dropping ``source`` no longer unpersists the deps — and
    an equivalent finalizer is attached to ``derived``, so the cache
    lives exactly as long as the *derived* result.  Returns ``derived``.
    No-op if ``source`` carries no pin.
    """
    fin = getattr(source, _PIN_ATTR, None)
    if fin is None or not fin.alive:
        return derived
    _obj, func, args, kwargs = fin.detach()
    new_fin = weakref.finalize(derived, func, *args, **kwargs)
    try:
        delattr(source, _PIN_ATTR)
        setattr(derived, _PIN_ATTR, new_fin)
    except Exception:
        pass
    return derived


@contextlib.contextmanager
def pinned(*deps: DataFrame):
    """Explicit-scope alternative to :func:`pin_for_result`: persist
    ``deps`` for the duration of the ``with`` block, unpersist on exit
    (even on error).  Use when the consuming action happens inside a
    known scope rather than at an unknown caller::

        with pinned(index_df):
            a = index_df.groupBy(...).count()
            b = index_df.join(...).count()
    """
    for d in deps:
        d.persist()
    try:
        yield deps
    finally:
        for d in deps:
            try:
                d.unpersist()
            except Exception:
                pass


#: name of the attribute holding strong lifetime references on a result
_TIE_ATTR = "_cdc_lifetime_refs"


def tie_lifetime(derived: DataFrame, *sources) -> DataFrame:
    """Keep ``sources`` alive for as long as ``derived`` is referenced.

    For operators whose result is backed by *external state scoped to a
    returned object* — e.g. :func:`~debezium_connector_db2_spark.operators.dedup_text.dedup_clusters`
    ties its label-spill scratch directory (rmtree finalizer) to its
    returned DataFrame.  A consumer that derives from such a result and
    drops the original would fire the finalizer before the derived plan
    ever runs; ``tie_lifetime`` holds strong references (including any
    refs the sources themselves carry, so ties chain through multiple
    derivation levels) on the derived object instead.
    """
    refs = []
    for s in sources:
        refs.append(s)
        refs.extend(getattr(s, _TIE_ATTR, ()))
    try:
        setattr(derived, _TIE_ATTR, tuple(refs))
    except Exception:
        pass
    return derived
