"""Predicate IR for ``jsonPredicateHints`` (Delta Sharing "json predicates").

Parity target: ``/root/reference/src/datasource/expr.rs`` — ops A6-A18 in
SURVEY.md §2. Wire format is a camelCase-tagged tree, e.g.::

    {"op":"equal","children":[
        {"op":"column","name":"hireDate","valueType":"date"},
        {"op":"literal","value":"2021-04-29","valueType":"date"}]}

Golden strings: expr.rs:276, :318, :333 — replicated byte-for-byte in
``tests/test_predicates.py``.

Semantics are *inexact* (hint-only): the server may prune files using the
predicate, but the engine must re-apply the full filter on the rows
(table.rs:198-213). ``DeltaSharingReader`` therefore always keeps the
residual ``df.filter``.
"""

from __future__ import annotations

import datetime as _dt
import json
import re
from enum import Enum
from typing import Any, Sequence

from datafusion_delta_sharing_spark.errors import PredicateError

try:  # Spark is optional at import time so the client works sparkless
    from pyspark.sql import types as T
except ImportError:  # pragma: no cover
    T = None


class ValueType(str, Enum):
    """Types representable in json predicates (expr.rs:163-191). Columns of
    any other type make the whole predicate non-pushable (the filter is then
    applied engine-side only)."""

    BOOL = "bool"
    INT = "int"
    LONG = "long"
    STRING = "string"
    DATE = "date"
    FLOAT = "float"
    DOUBLE = "double"
    TIMESTAMP = "timestamp"

    @classmethod
    def from_spark_type(cls, dtype: Any) -> "ValueType":
        if T is None:  # pragma: no cover
            raise PredicateError("pyspark not available")
        mapping = {
            T.BooleanType: cls.BOOL,
            T.ByteType: cls.INT,
            T.ShortType: cls.INT,
            T.IntegerType: cls.INT,
            T.LongType: cls.LONG,
            T.StringType: cls.STRING,
            T.DateType: cls.DATE,
            T.FloatType: cls.FLOAT,
            T.DoubleType: cls.DOUBLE,
            T.TimestampType: cls.TIMESTAMP,
            T.TimestampNTZType: cls.TIMESTAMP,
        }
        for spark_cls, vt in mapping.items():
            if isinstance(dtype, spark_cls):
                return vt
        raise PredicateError(
            f"column type {dtype.simpleString()} not supported in json predicates"
        )


class Op:
    """One node of the predicate tree. Construct via the classmethods
    (``Op.column``, ``Op.literal``, ``Op.equal``, …) mirroring the
    reference's constructors (expr.rs:26-88)."""

    __slots__ = ("op", "name", "value", "value_type", "children")

    def __init__(self, op: str, name: str | None = None, value: str | None = None,
                 value_type: ValueType | None = None,
                 children: Sequence["Op"] | None = None):
        self.op = op
        self.name = name
        self.value = value
        self.value_type = value_type
        self.children = list(children or [])

    def rename_columns(self, mapping: dict[str, str]) -> "Op":
        """A copy of the tree with column names mapped (names absent from
        ``mapping`` pass through) — used to re-express a logical-name
        predicate in physical names for stats pruning on column-mapped
        tables. The wire-format predicate sent to the SERVER stays
        logical per the sharing protocol; only local stats matching needs
        the physical spelling."""
        name = self.name
        if self.op == "column" and name is not None:
            name = mapping.get(name, name)
        return Op(self.op, name=name, value=self.value,
                  value_type=self.value_type,
                  children=[c.rename_columns(mapping) for c in self.children])

    # -- leaves -----------------------------------------------------------

    @classmethod
    def column(cls, name: str, value_type: ValueType) -> "Op":
        return cls("column", name=name, value_type=value_type)

    @classmethod
    def literal(cls, value: Any, value_type: ValueType) -> "Op":
        return cls("literal", value=_render_literal(value, value_type),
                   value_type=value_type)

    # -- unary / variadic -------------------------------------------------

    @classmethod
    def is_null(cls, child: "Op") -> "Op":
        return cls("isNull", children=[child])

    @classmethod
    def not_(cls, child: "Op") -> "Op":
        return cls("not", children=[child])

    @classmethod
    def is_not_null(cls, child: "Op") -> "Op":
        """Sugar: ``not(isNull(c))`` (expr.rs:138-145)."""
        return cls.not_(cls.is_null(child))

    @classmethod
    def and_(cls, children: Sequence["Op"]) -> "Op":
        return cls("and", children=list(children))

    @classmethod
    def or_(cls, children: Sequence["Op"]) -> "Op":
        return cls("or", children=list(children))

    # -- binary comparisons -----------------------------------------------

    @classmethod
    def equal(cls, left: "Op", right: "Op") -> "Op":
        return cls("equal", children=[left, right])

    @classmethod
    def less_than(cls, left: "Op", right: "Op") -> "Op":
        return cls("lessThan", children=[left, right])

    @classmethod
    def less_than_or_equal(cls, left: "Op", right: "Op") -> "Op":
        return cls("lessThanOrEqual", children=[left, right])

    @classmethod
    def greater_than(cls, left: "Op", right: "Op") -> "Op":
        return cls("greaterThan", children=[left, right])

    @classmethod
    def greater_than_or_equal(cls, left: "Op", right: "Op") -> "Op":
        return cls("greaterThanOrEqual", children=[left, right])

    # -- serialization (expr.rs:8-10, 156-158) ----------------------------

    def to_dict(self) -> dict:
        doc: dict[str, Any] = {"op": self.op}
        if self.name is not None:
            doc["name"] = self.name
        if self.value is not None:
            doc["value"] = self.value
        if self.value_type is not None:
            doc["valueType"] = self.value_type.value
        if self.children:
            doc["children"] = [c.to_dict() for c in self.children]
        return doc

    def to_json(self) -> str:
        """Compact JSON matching the reference's serde output byte-for-byte."""
        return json.dumps(self.to_dict(), separators=(",", ":"))

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Op) and self.to_dict() == other.to_dict()

    def __hash__(self) -> int:
        # a custom __eq__ sets __hash__ to None; Op nodes must stay
        # usable in sets/dict keys (hint dedup, verdict caches)
        return hash(self.to_json())

    def __repr__(self) -> str:
        return f"Op({self.to_json()})"


def _render_literal(value: Any, value_type: ValueType) -> str:
    """Literal values are rendered as strings; dates as ``YYYY-MM-DD``
    (reference renders Date32 epoch-days as ISO dates, expr.rs:103-121)."""
    if value_type == ValueType.DATE:
        if isinstance(value, _dt.date) and not isinstance(value, _dt.datetime):
            return value.isoformat()
        if isinstance(value, int):  # epoch days
            return (_dt.date(1970, 1, 1) + _dt.timedelta(days=value)).isoformat()
        return str(value)
    if value_type == ValueType.TIMESTAMP and isinstance(value, _dt.datetime):
        # normalize to UTC before rendering: pushFilters hands NAIVE
        # session-local datetimes, and a wall-clock hint read as UTC by
        # the server (or compared against UTC stats client-side) prunes
        # files that contain matching rows. Naive values take the system
        # tz (Spark's session default); aware values convert directly
        if value.tzinfo is None:
            value = value.astimezone()
        value = value.astimezone(_dt.timezone.utc)
        return value.isoformat().replace("+00:00", "Z")
    if value_type == ValueType.BOOL and isinstance(value, bool):
        return "true" if value else "false"
    return str(value)


def conjunction(ops: Sequence[Op]) -> Op | None:
    """Fold a filter list into one predicate: none -> None, one -> itself,
    many -> ``and`` (mirrors the conjunction at table.rs:182-186)."""
    ops = [op for op in ops if op is not None]
    if not ops:
        return None
    if len(ops) == 1:
        return ops[0]
    return Op.and_(ops)


# -- tiny SQL-comparison parser ------------------------------------------
#
# The reference converts DataFusion ``Expr`` trees; our user-facing entry
# point accepts simple SQL-ish predicate strings (the same surface users
# write in ``df.filter``), e.g. "hireDate = '2021-04-29' AND id < 25".
# Supported grammar (case-insensitive keywords):
#   pred   := term (AND|OR term)*          -- left-assoc, AND binds tighter
#   term   := NOT term | '(' pred ')' | cmp
#   cmp    := col (=|==|<|<=|>|>=) lit | col IS [NOT] NULL
#          |  col [NOT] IN '(' lit (',' lit)* ')'
#   lit    := 'string' | number | true | false
# IN expands to or(equal, ...) — the wire format has no IN op
# (expr.rs's Op set); NOT IN to not(or(...)), which is hint-sound (the
# server prunes to a superset; the exact three-valued semantics are
# re-applied by the residual filter). Anything unparseable raises
# PredicateError -> caller falls back to no-hint (Unsupported), matching
# supports_filters_pushdown semantics.

_TOKEN = re.compile(
    r"\s*(?:(?P<lpar>\()|(?P<rpar>\))|(?P<comma>,)|(?P<op><=|>=|==|=|<|>)"
    r"|(?P<str>'(?:[^']|'')*')|(?P<num>-?\d+(?:\.\d+)?)"
    r"|(?P<word>[A-Za-z_][A-Za-z0-9_.]*))"
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        match = _TOKEN.match(text, pos)
        if not match:
            if text[pos:].strip():
                raise PredicateError(f"cannot tokenize predicate at: {text[pos:pos+30]!r}")
            break
        pos = match.end()
        for kind in ("lpar", "rpar", "comma", "op", "str", "num", "word"):
            val = match.group(kind)
            if val is not None:
                tokens.append((kind, val))
                break
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], schema_types: dict[str, ValueType]):
        self.tokens = tokens
        self.pos = 0
        self.types = schema_types

    def peek_word(self) -> str | None:
        if self.pos < len(self.tokens) and self.tokens[self.pos][0] == "word":
            return self.tokens[self.pos][1].upper()
        return None

    def take(self) -> tuple[str, str]:
        if self.pos >= len(self.tokens):
            raise PredicateError("unexpected end of predicate")
        tok = self.tokens[self.pos]
        self.pos += 1
        return tok

    def parse(self) -> Op:
        node = self.parse_or()
        if self.pos != len(self.tokens):
            raise PredicateError(f"trailing tokens in predicate: {self.tokens[self.pos:]}")
        return node

    def parse_or(self) -> Op:
        parts = [self.parse_and()]
        while self.peek_word() == "OR":
            self.take()
            parts.append(self.parse_and())
        return parts[0] if len(parts) == 1 else Op.or_(parts)

    def parse_and(self) -> Op:
        parts = [self.parse_term()]
        while self.peek_word() == "AND":
            self.take()
            parts.append(self.parse_term())
        return parts[0] if len(parts) == 1 else Op.and_(parts)

    def parse_term(self) -> Op:
        if self.peek_word() == "NOT":
            self.take()
            return Op.not_(self.parse_term())
        if self.pos < len(self.tokens) and self.tokens[self.pos][0] == "lpar":
            self.take()
            node = self.parse_or()
            kind, _ = self.take()
            if kind != "rpar":
                raise PredicateError("missing ')' in predicate")
            return node
        return self.parse_cmp()

    def parse_cmp(self) -> Op:
        kind, col_name = self.take()
        if kind != "word":
            raise PredicateError(f"expected column name, got {col_name!r}")
        if col_name not in self.types:
            raise PredicateError(f"unknown or non-pushable column {col_name!r}")
        vt = self.types[col_name]
        col = Op.column(col_name, vt)

        if self.peek_word() == "IS":
            self.take()
            negated = False
            if self.peek_word() == "NOT":
                self.take()
                negated = True
            kind, word = self.take()
            if kind != "word" or word.upper() != "NULL":
                raise PredicateError("expected NULL after IS [NOT]")
            node = Op.is_null(col)
            return Op.not_(node) if negated else node

        negated_in = False
        if self.peek_word() == "NOT":
            self.take()
            negated_in = True
            if self.peek_word() != "IN":
                raise PredicateError("expected IN after NOT in comparison")
        if self.peek_word() == "IN":
            self.take()
            kind, tok = self.take()
            if kind != "lpar":
                raise PredicateError("expected '(' after IN")
            eqs = []
            while True:
                eqs.append(Op.equal(col, self._literal(vt)))
                kind, tok = self.take()
                if kind == "rpar":
                    break
                if kind != "comma":
                    raise PredicateError(
                        f"expected ',' or ')' in IN list, got {tok!r}")
            node = eqs[0] if len(eqs) == 1 else Op.or_(eqs)
            return Op.not_(node) if negated_in else node

        kind, sym = self.take()
        if kind != "op":
            raise PredicateError(f"expected comparison operator, got {sym!r}")
        lit = self._literal(vt)

        builders = {
            "=": Op.equal, "==": Op.equal,
            "<": Op.less_than, "<=": Op.less_than_or_equal,
            ">": Op.greater_than, ">=": Op.greater_than_or_equal,
        }
        return builders[sym](col, lit)

    def _literal(self, vt: ValueType) -> Op:
        lit_kind, lit_raw = self.take()
        if lit_kind == "str":
            lit_value: Any = lit_raw[1:-1].replace("''", "'")
        elif lit_kind == "num":
            lit_value = lit_raw
        elif lit_kind == "word" and lit_raw.upper() in ("TRUE", "FALSE"):
            lit_value = lit_raw.lower()
        else:
            raise PredicateError(f"expected literal, got {lit_raw!r}")
        return Op.literal(lit_value, vt)


def predicate_from_sql(text: str, schema) -> Op:
    """Parse a simple SQL comparison predicate against a Spark ``StructType``
    into the json-predicate tree. Raises ``PredicateError`` when any part is
    not pushable — callers treat that as "no hint" (the reference's
    ``Unsupported`` pushdown verdict, table.rs:198-213)."""
    types: dict[str, ValueType] = {}
    for sf in schema.fields:
        try:
            types[sf.name] = ValueType.from_spark_type(sf.dataType)
        except PredicateError:
            continue  # non-pushable column type: comparisons on it will fail
    return _Parser(_tokenize(text), types).parse()
