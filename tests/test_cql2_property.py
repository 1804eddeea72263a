"""Property-based CQL2 testing (hypothesis): random predicate ASTs are
rendered to CQL2-text, parsed back, and evaluated — the parsed filter
must select exactly the rows a pure-Python evaluation of the same AST
selects. This covers operator precedence, parenthesization, quoting,
and null comparison semantics across a space hand-written cases can't
enumerate (the reference's own tests are fixture-golden only,
SURVEY.md §5 — property testing is an engine-side strengthening)."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from stac_geoparquet_spark.stac.cql2_text import cql2_text_filter  # noqa: E402

# Evaluation domain: small numeric + string columns with nulls.
ROWS = [
    {"id": i, "num": n, "cat": c}
    for i, (n, c) in enumerate(
        [
            (0.0, "alpha"),
            (1.5, "beta"),
            (-2.0, "alpha"),
            (7.25, None),
            (None, "gamma"),
            (3.0, "beta"),
            (None, None),
            (100.0, "delta"),
        ]
    )
]

_num_lit = st.sampled_from([-2.0, 0.0, 1.5, 3.0, 7.25, 50.0])
_cat_lit = st.sampled_from(["alpha", "beta", "gamma", "it's"])
_cmp_op = st.sampled_from(["=", "<>", "<", "<=", ">", ">="])


@st.composite
def _leaf(draw):
    if draw(st.booleans()):
        op = draw(_cmp_op)
        lit = draw(_num_lit)
        return ("cmp", "num", op, lit)
    op = draw(st.sampled_from(["=", "<>"]))
    lit = draw(_cat_lit)
    return ("cmp", "cat", op, lit)


_pred = st.recursive(
    _leaf(),
    lambda children: st.one_of(
        st.tuples(st.just("not"), children),
        st.tuples(st.sampled_from(["and", "or"]), children, children),
    ),
    max_leaves=6,
)


def _render(node) -> str:
    kind = node[0]
    if kind == "cmp":
        _, col, op, lit = node
        lit_s = (
            repr(float(lit))
            if isinstance(lit, float)
            else "'" + lit.replace("'", "''") + "'"
        )
        return f"({col} {op} {lit_s})"
    if kind == "not":
        return f"(NOT {_render(node[1])})"
    return f"({_render(node[1])} {node[0].upper()} {_render(node[2])})"


def _eval(node, row) -> bool | None:
    """SQL three-valued logic evaluation of the AST against a dict."""
    kind = node[0]
    if kind == "cmp":
        _, col, op, lit = node
        v = row[col]
        if v is None:
            return None
        if isinstance(lit, float):
            cmp = (v > lit) - (v < lit)
        else:
            cmp = (v > lit) - (v < lit)
        return {
            "=": cmp == 0,
            "<>": cmp != 0,
            "<": cmp < 0,
            "<=": cmp <= 0,
            ">": cmp > 0,
            ">=": cmp >= 0,
        }[op]
    if kind == "not":
        inner = _eval(node[1], row)
        return None if inner is None else not inner
    a = _eval(node[1], row)
    b = _eval(node[2], row)
    if kind == "and":
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


@pytest.fixture(scope="module")
def pred_df(spark):
    return spark.createDataFrame(
        [(r["id"], r["num"], r["cat"]) for r in ROWS],
        "id int, num double, cat string",
    ).cache()


@settings(max_examples=60, deadline=None)
@given(node=_pred)
def test_cql2_text_matches_three_valued_logic(pred_df, node):
    text = _render(node)
    expect = sorted(r["id"] for r in ROWS if _eval(node, r) is True)
    got = sorted(
        r["id"] for r in cql2_text_filter(pred_df, text).select("id").collect()
    )
    assert got == expect, f"{text}: {got} != {expect}"


def test_render_sanity():
    node = ("and", ("cmp", "num", ">", 0.0), ("not", ("cmp", "cat", "=", "it's")))
    assert _render(node) == "((num > 0.0) AND (NOT (cat = 'it''s')))"
    assert _eval(node, ROWS[1]) is True
