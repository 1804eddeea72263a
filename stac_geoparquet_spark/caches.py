"""Session-cache registry (r08 verdict task #8).

Several operator families memoize a small shared intermediate for the
lifetime of the Spark session — a ``.cache()``'d shingle table, a
``localCheckpoint()``'d pair graph, a K-row centroid list — so their
second/third consumers skip the build (the ``_PAIRS_CACHE`` pattern,
``operators/dedup.py``).  A long-lived session that runs the whole
registry (bench.py, the full test suite) therefore accumulates blocks
from every family at once, which is a plausible heap/GC driver for the
one-JVM bench.  Each memo dict registers itself here at definition
time so ONE helper can drop all of them; a contract test
(tests/test_registry_contract.py) asserts every ``*_CACHE`` module
global in the package goes through ``register_cache``, so future
caches cannot silently escape the registry.
"""

from __future__ import annotations

_REGISTRY: dict[str, dict] = {}


def register_cache(name: str, store: dict) -> dict:
    """Register a module-level session-memo dict under a stable name
    and return it (so definition sites stay one-liners)."""
    if name in _REGISTRY and _REGISTRY[name] is not store:
        raise ValueError(f"duplicate session-cache name: {name}")
    _REGISTRY[name] = store
    return store


def registered_caches() -> dict[str, dict]:
    """Snapshot of the registry ({name: live store}) for tests/bench."""
    return dict(_REGISTRY)


def clear_session_caches(spark=None) -> dict[str, int]:
    """Unpersist and drop every registered session memo; returns
    {cache_name: entries_dropped}.

    ``.cache()``'d DataFrames are unpersisted immediately;
    ``localCheckpoint()``'d ones hold executor blocks that the
    ContextCleaner releases once the dropped references are GC'd.
    Passing ``spark`` additionally runs ``catalog.clearCache()``
    (drops EVERY cached plan in the session — fine for bench/test
    sessions, where the registry owns all caching).
    """
    from pyspark.sql import DataFrame

    dropped: dict[str, int] = {}
    for name, store in _REGISTRY.items():
        dropped[name] = len(store)
        for value in store.values():
            parts = value if isinstance(value, tuple) else (value,)
            for v in parts:
                if isinstance(v, DataFrame):
                    try:
                        v.unpersist()
                    except Exception:  # session already stopped
                        pass
        store.clear()
    if spark is not None:
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
    return dropped
