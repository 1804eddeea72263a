"""Registry-wide output-schema contract.

The driver's correctness harness canonicalizes every query result with
pandas (sort_values over all columns, then a value hash).  Python lists
and dicts are unhashable, so a top-level array/map/struct column crashes
the canonicalizer and red-rows the query even when Spark and the oracle
agree (round-2 `embedding_quantize_int8`).  Every registered query must
therefore return a scalar-only schema — join arrays to CSV strings or
explode them before returning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tests.conftest import SF_DIR


def _names():
    import __spark_entry__ as entry

    return sorted(entry.queries())


@pytest.mark.parametrize("name", _names())
def test_query_output_schema_is_scalar_only(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name}: top-level non-scalar columns {bad} — the driver "
        "canonicalizer cannot hash them; array_join/explode first"
    )
    # registry-wide plan anti-pattern sweep (piggybacked on the same
    # DataFrame build): no query may plan a cartesian product or a
    # row-at-a-time Python UDF.  Broadcast 1-row-aggregate crossjoins
    # (BroadcastNestedLoopJoin) and tiny global aggregates
    # (SinglePartition) are the blessed exceptions and not flagged.
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF — use built-ins or an "
        "Arrow-batched pandas path"
    )
    _assert_no_bounded_cardinality_window(name, plan)
    _assert_percentile_inputs_bounded(name, plan)


# Column names whose value domain does NOT grow with the data: a window
# partitioned ONLY by such keys has a fixed partition count, so each
# partition's sorted run grows O(N) — a single-reducer hotspot at 100 TB
# (the round-3 verdict class: select_token_budget's 64-band key,
# kmv_source_overlap's bare-source bottom-K; this sweep also caught
# sketch_kmv_distinct's bare event_type window).  A tuple passes if ANY
# of its keys scales with the data (doc_id, hashes, user_id, pid, ...).
_BOUNDED_KEYS = {
    "band",
    "source",
    "src_a",
    "src_b",
    "lang",
    "language",
    "event_type",
    "query_id",
    "o_orderpriority",
    "o_orderstatus",
    "c_mktsegment",
    "l_returnflag",
    "l_linestatus",
    "l_shipmode",
    "r_name",
    "n_name",
    "priority",
    "status",
    "segment",
    "flag",
}

# Windows whose partition key IS statically bounded but whose INPUT is
# already bounded by construction — each entry documents why the sorted
# run per partition cannot grow O(N).
_BOUNDED_WINDOW_ALLOWLIST = {
    # merged KMV sketches: <= 2K rows per (src_a, src_b) pair by
    # construction (union of two K-minimum sketches)
    ("kmv_source_overlap", ("src_a", "src_b")),
    # per-query scored candidates are pruned before the ranking window:
    # LSH bucket candidates / probed IVF cells, not the full corpus
    ("ann_lsh_bucketed", ("query_id",)),
    ("ann_ivf_probe", ("query_id",)),
    ("ann_pq_adc", ("query_id",)),
    # the documented brute-force BASELINE (the scale path is ann_*);
    # its global scoring pass is the point of the operator
    ("knn_brute_force", ("query_id",)),
    # recall eval composes knn_brute_force + ann_lsh_bucketed, so the
    # two inputs' (already-allowlisted) query_id ranking windows appear
    # in its plan; each window input is the bounded candidate set
    ("ann_recall_report", ("query_id",)),
    # same composition, IVF side
    ("ivf_recall_report", ("query_id",)),
    # the k-distance screen rolls up knn_brute_force's (allowlisted)
    # ranked output — the window input is the bounded query sample
    ("knn_kdist_outliers", ("query_id",)),
    # trailing-baseline z-score: the window's input is the HOURLY
    # ROLLUP, whose per-type row count is bounded by calendar hours,
    # not corpus size (100x the events in the same time range = the
    # same rollup rows); the corpus-sized work is the map-side-
    # combining rollup aggregate beneath the window
    ("events_hourly_anomaly", ("event_type",)),
}


# Spark's EXACT `percentile` aggregate buffers an OpenHashMap of the
# input's DISTINCT values, and the final merge holds the union in one
# task — safe only when the input DOMAIN is bounded independently of
# the row count (the round-5 verdict class: funnel latency at µs
# resolution ≈ one distinct value per converted user).  Every exact-
# percentile input must appear here with the argument that bounds its
# distinct-value count; anything else must quantize first (a stated
# quantum: cents, milliseconds, 0.01 h, round(,6)-in-[0,1]) or use the
# two-phase selection pattern.  Keys are (query name, input column as
# it appears in the physical plan) — keyed per QUERY so a future query
# reusing a column NAME (`score`, `freq`, `c`) does not inherit an
# unearned pass (r06 ADVICE).
_PERCENTILE_DOMAIN_ALLOWLIST = {
    # TPC-H money: prices are DECIMAL-derived cent values — distinct
    # count <= price span x 100, independent of order count; the IQR
    # op quantizes to integer cents so the fence interpolation and
    # comparison are exact-int (bit-exact cross-engine)
    ("outliers_iqr_price", "cents"):
        "int cents: distinct <= price span x 100",
    ("percentile_prices_by_priority", "o_totalprice"):
        "cents: distinct <= price span x 100",
    # approx_percentile_prices carries an exact-percentile reference
    # column next to the approx estimate — integer cents, exact-int
    # interpolation
    ("approx_percentile_prices", "cents"):
        "int cents: distinct <= price span x 100",
    # funnel_latency_quantiles: quantized to INTEGER milliseconds
    # before the percentile — distinct <= corpus time span in ms, and
    # the interpolation runs over exact ints (bit-exact cross-engine)
    ("funnel_latency_quantiles", "latency_ms"):
        "int ms quantum: distinct <= event time span in ms",
    # events_rfm_segments: recency quantized to integer CENTIHOURS
    # (distinct <= span_hours x 100); freq is a small-int per-user
    # event count (distinct <= max events/user); monetary is integer
    # cents — all three medians interpolate exact ints
    ("events_rfm_segments", "recency_ch"):
        "int 0.01 h quantum: distinct <= time span in h x 100",
    ("events_rfm_segments", "freq"):
        "small-int count: distinct <= max events per user",
    ("events_rfm_segments", "monetary_cents"):
        "int cents: distinct <= value span x 100",
    # quality_winsorize: scores are integer micro-units of round(,6)
    # values in [0, 1] — distinct <= ~1e6 per lang at any corpus size,
    # and the cut interpolation runs over exact ints
    ("quality_winsorize", "score_micro"):
        "int micros of round(,6) in [0,1]: distinct <= ~1e6",
    # orders_pareto_share: per-customer revenue as an exact cent sum
    # (the RFM-monetary precedent): distinct <= revenue span x 100 —
    # bounded by the value domain, not the customer count
    ("orders_pareto_share", "rev_cents"):
        "cents: distinct <= revenue span x 100",
    # events_anomaly_mad: both inputs aggregate the HOURLY ROLLUP —
    # rows AND distinct values bounded by calendar hours x event
    # types, never by event count (100x the traffic lands in the same
    # rollup rows)
    ("events_anomaly_mad", "c"):
        "hourly rollup count: rows <= calendar hours x types",
    ("events_anomaly_mad", "absdev"):
        "deviation of the hourly rollup: same calendar bound",
}

_EXACT_PERCENTILE_TOKEN_RE = None
_EXACT_PERCENTILE_ATTR_RE = None


def _assert_percentile_inputs_bounded(name: str, plan: str) -> None:
    import re

    global _EXACT_PERCENTILE_TOKEN_RE, _EXACT_PERCENTILE_ATTR_RE
    if _EXACT_PERCENTILE_TOKEN_RE is None:
        # matches the exact Percentile aggregate only — not
        # approx_percentile / percentile_approx (different function
        # tokens in the plan string)
        _EXACT_PERCENTILE_TOKEN_RE = re.compile(
            r"(?<![_a-zA-Z])percentile\("
        )
        # a PLAIN attribute input: `col#123` or `col#123L` followed by
        # the argument separator — anything else (cast(...), a
        # computed expression) is opaque to the domain argument and
        # must be aliased to a named quantized column first
        _EXACT_PERCENTILE_ATTR_RE = re.compile(r"^(\w+)#\d+L?\s*[,)]")
    for tok in _EXACT_PERCENTILE_TOKEN_RE.finditer(plan):
        rest = plan[tok.end():tok.end() + 120]
        attr = _EXACT_PERCENTILE_ATTR_RE.match(rest)
        assert attr is not None, (
            f"{name}: exact percentile over a non-attribute input "
            f"(`percentile({rest[:40]}...`) — the sweep cannot bound an "
            "expression's distinct-value domain; alias the quantized "
            "expression to a named column BEFORE the aggregate so the "
            "input is a plain attribute, then allowlist (query, column)"
        )
        col = attr.group(1)
        assert (name, col) in _PERCENTILE_DOMAIN_ALLOWLIST, (
            f"{name}: exact percentile over `{col}` — its distinct-value "
            "buffer merges into ONE task; quantize the input to a stated "
            "quantum (cents / ms / 0.01h / round(,6)) and add "
            f"(`{name}`, `{col}`) to _PERCENTILE_DOMAIN_ALLOWLIST with "
            "the bound, or use the two-phase selection pattern"
        )


def _assert_no_bounded_cardinality_window(name: str, plan: str) -> None:
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        keys = []
        for tok in m.group(1).split(", "):
            if (
                " ASC" in tok
                or " DESC" in tok
                or tok.startswith("specifiedwindowframe")
            ):
                break
            keys.append(re.sub(r"#\d+L?$", "", tok.strip()))
        if not keys:
            # unpartitioned window: only legal over tiny aggregates
            # (offset tables, gap-fill hour spines) — covered by the
            # per-operator SinglePartition plan pins, skip here
            continue
        if all(k in _BOUNDED_KEYS for k in keys):
            assert (name, tuple(keys)) in _BOUNDED_WINDOW_ALLOWLIST, (
                f"{name}: window partitioned only by statically-bounded "
                f"key(s) {keys} — each partition's sorted run grows O(N) "
                "at scale; use a two-phase form over a scaling key "
                "(spark_partition_id / doc_id-div buckets) or allowlist "
                "with a bounded-input justification"
            )
