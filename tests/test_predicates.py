"""Predicate IR tests. Golden JSON strings are byte-for-byte the reference's
expected serializations (src/datasource/expr.rs:276, :318, :333)."""

import datetime

import pytest
from pyspark.sql import types as T

from datafusion_delta_sharing_spark.errors import PredicateError
from datafusion_delta_sharing_spark.plans.predicates import (
    Op,
    ValueType,
    conjunction,
    predicate_from_sql,
)

SCHEMA = T.StructType([
    T.StructField("hireDate", T.DateType()),
    T.StructField("id", T.IntegerType()),
    T.StructField("name", T.StringType()),
    T.StructField("salary", T.DoubleType()),
    T.StructField("active", T.BooleanType()),
    T.StructField("big", T.LongType()),
    T.StructField("ratio", T.FloatType()),
    T.StructField("joined", T.TimestampType()),
    T.StructField("tags", T.ArrayType(T.StringType())),  # not pushable
])

GOLDEN_EQUAL = (
    '{"op":"equal","children":[{"op":"column","name":"hireDate","valueType":"date"},'
    '{"op":"literal","value":"2021-04-29","valueType":"date"}]}'
)
GOLDEN_AND = (
    '{"op":"and","children":[{"op":"equal","children":[{"op":"column","name":"hireDate",'
    '"valueType":"date"},{"op":"literal","value":"2021-04-29","valueType":"date"}]},'
    '{"op":"lessThan","children":[{"op":"column","name":"id","valueType":"int"},'
    '{"op":"literal","value":"25","valueType":"int"}]}]}'
)
GOLDEN_NOT = (
    '{"op":"not","children":[{"op":"isNull","children":[{"op":"column","name":"id",'
    '"valueType":"int"}]}]}'
)


def test_golden_equal_from_constructors():
    op = Op.equal(
        Op.column("hireDate", ValueType.DATE),
        Op.literal(datetime.date(2021, 4, 29), ValueType.DATE),
    )
    assert op.to_json() == GOLDEN_EQUAL


def test_golden_equal_epoch_days_literal():
    # 18746 epoch-days == 2021-04-29, the reference's Date32 test value
    op = Op.literal(18746, ValueType.DATE)
    assert op.value == "2021-04-29"


def test_golden_and_from_sql():
    op = predicate_from_sql("hireDate = '2021-04-29' AND id < 25", SCHEMA)
    assert op.to_json() == GOLDEN_AND


def test_golden_not_from_sql():
    op = predicate_from_sql("NOT hireDate IS NULL", SCHEMA)
    expected = GOLDEN_NOT.replace('"name":"id"', '"name":"hireDate"').replace(
        '"valueType":"int"', '"valueType":"date"')
    assert op.to_json() == expected
    op2 = predicate_from_sql("id IS NOT NULL", SCHEMA)
    assert op2.to_json() == GOLDEN_NOT


@pytest.mark.parametrize("sql,opname", [
    ("id = 5", "equal"),
    ("id < 5", "lessThan"),
    ("id <= 5", "lessThanOrEqual"),
    ("id > 5", "greaterThan"),
    ("id >= 5", "greaterThanOrEqual"),
    ("id IS NULL", "isNull"),
])
def test_all_comparison_ops(sql, opname):
    assert predicate_from_sql(sql, SCHEMA).op == opname


def test_value_types_from_spark():
    cases = {
        "active": "bool", "id": "int", "big": "long", "name": "string",
        "hireDate": "date", "ratio": "float", "salary": "double",
        "joined": "timestamp",
    }
    for col, expected in cases.items():
        op = predicate_from_sql(f"{col} IS NULL", SCHEMA)
        assert op.children[0].value_type.value == expected


def test_or_and_precedence():
    op = predicate_from_sql("id < 5 OR id > 10 AND active = true", SCHEMA)
    assert op.op == "or"
    assert op.children[1].op == "and"


def test_parenthesized():
    op = predicate_from_sql("(id < 5 OR id > 10) AND name = 'x'", SCHEMA)
    assert op.op == "and"
    assert op.children[0].op == "or"


def test_unpushable_column_raises():
    with pytest.raises(PredicateError):
        predicate_from_sql("tags = 'a'", SCHEMA)


def test_unknown_column_raises():
    with pytest.raises(PredicateError):
        predicate_from_sql("nope = 1", SCHEMA)


def test_garbage_raises():
    with pytest.raises(PredicateError):
        predicate_from_sql("id + 1 = 2", SCHEMA)


def test_conjunction_folding():
    a = predicate_from_sql("id < 5", SCHEMA)
    b = predicate_from_sql("name = 'x'", SCHEMA)
    assert conjunction([]) is None
    assert conjunction([a]) is a
    both = conjunction([a, b])
    assert both.op == "and" and len(both.children) == 2


def test_string_literal_escaping():
    op = predicate_from_sql("name = 'it''s'", SCHEMA)
    assert op.children[1].value == "it's"


def test_in_expands_to_or_of_equals():
    op = predicate_from_sql("id IN (1, 2, 3)", SCHEMA)
    assert op.op == "or" and len(op.children) == 3
    assert all(c.op == "equal" for c in op.children)
    assert [c.children[1].value for c in op.children] == ["1", "2", "3"]
    # single-element IN folds to a bare equal
    assert predicate_from_sql("id IN (7)", SCHEMA).op == "equal"


def test_not_in_wraps_not():
    op = predicate_from_sql("name NOT IN ('a', 'b')", SCHEMA)
    assert op.op == "not" and op.children[0].op == "or"


def test_in_malformed_raises():
    for bad in ("id IN ()", "id IN (1,)", "id IN (1 2)", "id NOT 5",
                "id IN (1", "id IN 1"):
        with pytest.raises(PredicateError):
            predicate_from_sql(bad, SCHEMA)


def test_column_rename_for_physical_stats():
    op = predicate_from_sql("id IN (1, 2) AND name = 'x'", SCHEMA)
    renamed = op.rename_columns({"id": "col-1"})
    names = set()

    def walk(n):
        if n.op == "column":
            names.add(n.name)
        for c in n.children:
            walk(c)
    walk(renamed)
    assert names == {"col-1", "name"}
    # original tree untouched
    walk_orig = set()

    def walk2(n):
        if n.op == "column":
            walk_orig.add(n.name)
        for c in n.children:
            walk2(c)
    walk2(op)
    assert walk_orig == {"id", "name"}
