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

__all__ = ["const_cols", "sql_double", "sql_double_array"]


def const_cols(fn):
    """``functools.cache`` for builders of constant Column fragments
    (kept as a named decorator so the contract above has one home)."""
    return functools.cache(fn)


# ---------------------------------------------------------------------------
# SQL-literal formatting for F.expr() construction.
#
# The round-trip arithmetic that motivates building big constant trees
# as ONE ``F.expr(sql_text)`` instead of nested Column calls: every
# Column operator node costs one py4j round trip (~0.3 ms), and a
# K x DIM literal distance tree is ~1,300 nodes — ~0.45 s of pure
# driver-side socket latency PER CONSTRUCTION, re-paid on every call
# (measured: kmeans_embeddings 2,304 trips, bm25_ndcg_report 3,559).
# One expr() string is one round trip plus a JVM-side parse (~1 ms),
# and the Python-side string formatting is microseconds.  The parsed
# expression tree is identical to what the Column API would have
# built, so plans and results are unchanged.
# ---------------------------------------------------------------------------
def sql_double(x) -> str:
    """Exact SQL double literal: repr() round-trips binary64, and the
    D suffix forces DoubleType (a bare ``1.25`` parses as DECIMAL
    under Spark's ANSI literal rules — a silent type change)."""
    if x is None:
        return "CAST(NULL AS DOUBLE)"
    return f"{x!r}D"


def sql_double_array(vals) -> str:
    """``array(...)`` literal of doubles — the F.lit(list-of-floats)
    replacement (lit() on a list costs one round trip PER ELEMENT)."""
    return f"array({', '.join(sql_double(v) for v in vals)})"
