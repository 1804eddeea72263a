"""Per-process memo for CONSTANT Column expression trees.

Building a PySpark ``Column`` costs one py4j round trip per operator
node, and several operators assemble hundreds of nodes from
compile-time constants (32 minhash lanes, a 34-column corpus reduce,
a |q|-term scoring sum) — measured 0.3-1.0 s of pure driver-side
Python per query CONSTRUCTION at sf0.1, re-paid on every call (guide
§5: the driver should do almost no work; this was the single largest
per-query cost after the r10 scan memo).  An unresolved Column is an
immutable expression fragment bound to the process-wide py4j gateway,
not to any session or data — the analyzer copies it into each plan it
resolves — so fragments built purely from constants are safe to build
once per process and reuse everywhere, exactly like a compiled regex
(guide §4.5's "heavyweight init once" applied to the driver).

Usage::

    @const_cols
    def _min_hash_cols() -> tuple[Column, ...]:
        return tuple(...)   # built from module constants only

The wrapped function MUST depend only on compile-time constants
(module-level config, literals) — never on the SparkSession, the data
path, or per-call arguments other than hashable constants.  No rows,
no plans, no session state are cached here.
"""

from __future__ import annotations

import functools

__all__ = ["const_cols"]


def const_cols(fn):
    """``functools.cache`` for builders of constant Column fragments
    (kept as a named decorator so the contract above has one home)."""
    return functools.cache(fn)
