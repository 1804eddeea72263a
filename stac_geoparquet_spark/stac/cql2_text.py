"""CQL2-text -> CQL2-JSON parser (frontend to stac.cql2).

The reference accepts any pgstac ``search`` dict and forwards it opaquely
(stac_geoparquet/pgstac_reader.py:178-181); pgstac itself accepts both
CQL2 encodings, so a user switching from the reference brings filters in
either form. This module parses the OGC CQL2-text subset matching what
``stac.cql2`` evaluates — logical ops, comparisons, BETWEEN / IN / LIKE /
IS NULL, arithmetic, CASEI / ACCENTI, the T_* temporal functions over
TIMESTAMP / DATE / INTERVAL literals, and S_INTERSECTS over WKT or
BBOX literals — into the *same* JSON AST, so one translator owns the
Column mapping and text filters get the identical sargable plans.

Pure driver-side parsing: the parse cost is per-query, never per-row.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame

from stac_geoparquet_spark.stac.cql2 import Cql2Error, cql2_filter

_TOKEN_RE = re.compile(
    r"""
    \s*(
        '(?:[^']|'')*'            # string literal with '' escape
      | \d+\.\d+ | \.\d+ | \d+    # number
      | <> | <= | >= | [=<>]      # comparison
      | [+\-*/%(),]               # arithmetic / punctuation
      | "[^"]*"                   # quoted identifier
      | [A-Za-z_][A-Za-z0-9_:.]*  # identifier / keyword
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "AND", "OR", "NOT", "BETWEEN", "IN", "LIKE", "IS", "NULL",
    "TRUE", "FALSE", "TIMESTAMP", "DATE", "INTERVAL", "CASEI", "ACCENTI",
}

_TEMPORAL_FNS = {
    "T_AFTER": "t_after",
    "T_BEFORE": "t_before",
    "T_EQUALS": "t_equals",
    "T_DURING": "t_during",
    "ANYINTERACTS": "anyinteracts",
}

_SPATIAL_FNS = {"S_INTERSECTS": "s_intersects"}

_WKT_TYPES = {
    "POINT": "Point",
    "LINESTRING": "LineString",
    "POLYGON": "Polygon",
    "MULTIPOINT": "MultiPoint",
    "MULTILINESTRING": "MultiLineString",
    "MULTIPOLYGON": "MultiPolygon",
}


def _tokenize(text: str) -> list[str]:
    out: list[str] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise Cql2Error(f"cannot tokenize at: {text[pos:pos + 30]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    # ---- token helpers ----
    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def peek_upper(self) -> str | None:
        t = self.peek()
        return t.upper() if t is not None else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise Cql2Error("unexpected end of CQL2 text")
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.next()
        if t.upper() != tok.upper():
            raise Cql2Error(f"expected {tok!r}, got {t!r}")

    def accept(self, tok: str) -> bool:
        if self.peek_upper() == tok.upper():
            self.i += 1
            return True
        return False

    # ---- grammar ----
    def parse(self) -> dict:
        expr = self.or_expr()
        if self.peek() is not None:
            raise Cql2Error(f"trailing tokens: {self.toks[self.i:]!r}")
        return expr

    def or_expr(self) -> dict:
        args = [self.and_expr()]
        while self.accept("OR"):
            args.append(self.and_expr())
        return args[0] if len(args) == 1 else {"op": "or", "args": args}

    def and_expr(self) -> dict:
        args = [self.not_expr()]
        while self.accept("AND"):
            args.append(self.not_expr())
        return args[0] if len(args) == 1 else {"op": "and", "args": args}

    def not_expr(self) -> dict:
        if self.accept("NOT"):
            return {"op": "not", "args": [self.not_expr()]}
        return self.predicate()

    def predicate(self) -> dict:
        up = self.peek_upper()
        if up in _TEMPORAL_FNS:
            self.next()
            self.expect("(")
            prop = self.operand()
            self.expect(",")
            lit = self.temporal_literal()
            self.expect(")")
            return {"op": _TEMPORAL_FNS[up], "args": [prop, lit]}
        if up in _SPATIAL_FNS:
            self.next()
            self.expect("(")
            prop = self.operand()
            self.expect(",")
            geom = self.spatial_literal()
            self.expect(")")
            return {"op": _SPATIAL_FNS[up], "args": [prop, geom]}

        # Grouped boolean expression vs parenthesized arithmetic operand:
        # try boolean first, fall back to operand-led predicate.
        if self.peek() == "(":
            save = self.i
            try:
                self.next()
                inner = self.or_expr()
                self.expect(")")
                return inner
            except Cql2Error:
                self.i = save

        left = self.operand()
        up = self.peek_upper()
        negate = False
        if up == "NOT":
            nxt = (
                self.toks[self.i + 1].upper()
                if self.i + 1 < len(self.toks)
                else None
            )
            if nxt in ("BETWEEN", "IN", "LIKE"):
                self.next()
                negate = True
                up = self.peek_upper()
        if up in ("=", "<>", "<", "<=", ">", ">="):
            op = self.next()
            right = self.operand()
            return {"op": op, "args": [left, right]}
        if up == "BETWEEN":
            self.next()
            lo = self.operand()
            self.expect("AND")
            hi = self.operand()
            node: dict = {"op": "between", "args": [left, lo, hi]}
            return {"op": "not", "args": [node]} if negate else node
        if up == "IN":
            self.next()
            self.expect("(")
            vals = [self.literal_value()]
            while self.accept(","):
                vals.append(self.literal_value())
            self.expect(")")
            node = {"op": "in", "args": [left, vals]}
            return {"op": "not", "args": [node]} if negate else node
        if up == "LIKE":
            self.next()
            pat = self.literal_value()
            if not isinstance(pat, str):
                raise Cql2Error("LIKE pattern must be a string")
            node = {"op": "like", "args": [left, pat]}
            return {"op": "not", "args": [node]} if negate else node
        if up == "IS":
            self.next()
            neg = self.accept("NOT")
            self.expect("NULL")
            node = {"op": "isNull", "args": [left]}
            return {"op": "not", "args": [node]} if neg else node
        raise Cql2Error(f"expected a predicate after {left!r}")

    # operand := term ((+|-) term)*   — arithmetic sub-grammar
    def operand(self) -> Any:
        node = self.term()
        while self.peek() in ("+", "-"):
            op = self.next()
            node = {"op": op, "args": [node, self.term()]}
        return node

    def term(self) -> Any:
        node = self.factor()
        while self.peek() in ("*", "/", "%"):
            op = self.next()
            node = {"op": op, "args": [node, self.factor()]}
        return node

    def factor(self) -> Any:
        t = self.peek()
        if t is None:
            raise Cql2Error("unexpected end of CQL2 text")
        up = t.upper()
        if t == "(":
            self.next()
            node = self.operand()
            self.expect(")")
            return node
        if t == "-":
            self.next()
            f = self.factor()
            if isinstance(f, (int, float)) and not isinstance(f, bool):
                return -f
            return {"op": "-", "args": [0, f]}
        if up in ("CASEI", "ACCENTI"):
            self.next()
            self.expect("(")
            inner = self.operand()
            self.expect(")")
            return {"op": up.lower(), "args": [inner]}
        if up in ("TIMESTAMP", "DATE"):
            return self.temporal_literal()
        if t.startswith('"') and t.endswith('"'):
            self.next()
            return {"property": t[1:-1]}
        if t.startswith("'"):
            return self.literal_value()
        if re.fullmatch(r"\d+\.\d+|\.\d+|\d+", t):
            return self.literal_value()
        if up in ("TRUE", "FALSE"):
            self.next()
            return up == "TRUE"
        if up in _KEYWORDS:
            raise Cql2Error(f"unexpected keyword {t!r} in operand")
        self.next()
        return {"property": t}

    def literal_value(self) -> Any:
        t = self.next()
        if t == "-":
            v = self.literal_value()
            if not isinstance(v, (int, float)) or isinstance(v, bool):
                raise Cql2Error("unary minus needs a numeric literal")
            return -v
        if t.startswith("'"):
            return t[1:-1].replace("''", "'")
        if re.fullmatch(r"\d+\.\d+|\.\d+", t):
            return float(t)
        if re.fullmatch(r"\d+", t):
            return int(t)
        if t.upper() == "TRUE":
            return True
        if t.upper() == "FALSE":
            return False
        raise Cql2Error(f"expected a literal, got {t!r}")

    def temporal_literal(self) -> dict:
        t = self.next()
        up = t.upper()
        if up == "TIMESTAMP":
            self.expect("(")
            v = self.literal_value()
            self.expect(")")
            return {"timestamp": v}
        if up == "DATE":
            self.expect("(")
            v = self.literal_value()
            self.expect(")")
            return {"date": v}
        if up == "INTERVAL":
            self.expect("(")
            lo = self.literal_value()
            self.expect(",")
            hi = self.literal_value()
            self.expect(")")
            return {"interval": [lo, hi]}
        raise Cql2Error(f"expected a temporal literal, got {t!r}")

    def spatial_literal(self) -> dict:
        t = self.next()
        up = t.upper()
        if up == "BBOX":
            self.expect("(")
            vals = [self.literal_value()]
            while self.accept(","):
                vals.append(self.literal_value())
            self.expect(")")
            return {"bbox": vals}
        if up in _WKT_TYPES:
            return {
                "type": _WKT_TYPES[up],
                "coordinates": self.wkt_coords(),
            }
        raise Cql2Error(f"expected a spatial literal, got {t!r}")

    def wkt_coords(self) -> Any:
        """Parse a WKT coordinate block into nested GeoJSON-style lists.

        A parenthesized group is either a comma-list of nested groups or
        a comma-list of `x y [z]` positions; only the coordinate tree is
        needed (the evaluator reduces it to an envelope)."""
        self.expect("(")
        if self.peek() == "(":
            items = [self.wkt_coords()]
            while self.accept(","):
                items.append(self.wkt_coords())
            self.expect(")")
            return items
        positions = []
        while True:
            nums = []
            while self.peek() not in (",", ")", None):
                t = self.next()
                try:
                    if t == "-":
                        nums.append(-float(self.next()))
                    else:
                        nums.append(float(t))
                except (TypeError, ValueError):
                    raise Cql2Error(
                        f"bad WKT coordinate token: {t!r}"
                    ) from None
            positions.append(nums)
            if not self.accept(","):
                break
        self.expect(")")
        if len(positions) == 1:
            return positions[0]  # POINT: a bare position
        return positions


def parse_cql2_text(text: str) -> dict:
    """Parse a CQL2-text expression into the CQL2-JSON dict form."""
    return _Parser(_tokenize(text)).parse()


def cql2_text_filter(df: DataFrame, text: str) -> DataFrame:
    """Apply a CQL2-text filter to a DataFrame."""
    return cql2_filter(df, parse_cql2_text(text))
