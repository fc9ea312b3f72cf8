"""Schema translation (A21), partition decode (A20), stats pruning tests."""

import datetime
import json

import pytest
from pyspark.sql import types as T

from datafusion_delta_sharing_spark.errors import SchemaError
from datafusion_delta_sharing_spark.plans.predicates import predicate_from_sql
from datafusion_delta_sharing_spark.plans.pruning import may_match
from datafusion_delta_sharing_spark.sources.schema import (
    decode_partition_value,
    decode_partition_values,
    schema_from_string,
)


def _schema_string(fields) -> str:
    return json.dumps({"type": "struct", "fields": fields})


def field(name, ftype, nullable=True, metadata=None):
    return {"name": name, "type": ftype, "nullable": nullable,
            "metadata": metadata or {}}


FULL_MATRIX = _schema_string([
    field("s", "string"), field("l", "long"), field("i", "integer"),
    field("sh", "short"), field("b", "byte"), field("f", "float"),
    field("d", "double"), field("bo", "boolean"), field("bin", "binary"),
    field("dec", "decimal(38,2)"), field("dt", "date"), field("ts", "timestamp"),
    field("tsn", "timestamp_ntz"),
    field("arr", {"type": "array", "elementType": "integer", "containsNull": True}),
    field("m", {"type": "map", "keyType": "string", "valueType": "double",
                "valueContainsNull": True}),
    field("st", {"type": "struct", "fields": [field("a", "integer"),
                                              field("b", "string")]}),
    field("deep", {"type": "array", "containsNull": True, "elementType": {
        "type": "struct", "fields": [
            field("k", "string"),
            field("v", {"type": "array", "elementType": "long",
                        "containsNull": True}),
        ]}}),
])


def test_full_type_matrix_roundtrip():
    st = schema_from_string(FULL_MATRIX)
    by = {f.name: f.dataType for f in st.fields}
    assert isinstance(by["s"], T.StringType)
    assert isinstance(by["l"], T.LongType)
    assert isinstance(by["i"], T.IntegerType)
    assert isinstance(by["sh"], T.ShortType)
    assert isinstance(by["b"], T.ByteType)
    assert isinstance(by["f"], T.FloatType)
    assert isinstance(by["d"], T.DoubleType)
    assert isinstance(by["bo"], T.BooleanType)
    assert isinstance(by["bin"], T.BinaryType)
    assert by["dec"] == T.DecimalType(38, 2)
    assert isinstance(by["dt"], T.DateType)
    assert isinstance(by["ts"], T.TimestampType)
    assert isinstance(by["tsn"], T.TimestampNTZType)
    assert by["arr"] == T.ArrayType(T.IntegerType(), True)
    assert by["m"] == T.MapType(T.StringType(), T.DoubleType(), True)
    assert isinstance(by["st"], T.StructType)
    assert isinstance(by["deep"].elementType, T.StructType)
    assert by["deep"].elementType["v"].dataType == T.ArrayType(T.LongType(), True)


def test_field_metadata_roundtrip():
    st = schema_from_string(_schema_string([
        field("c", "integer", metadata={"comment": "hello", "k": 1}),
    ]))
    assert st["c"].metadata == {"comment": "hello", "k": 1}


def test_decimal_over_38_is_clear_error():
    with pytest.raises(SchemaError, match="38"):
        schema_from_string(_schema_string([field("d", "decimal(39,2)")]))


def test_decimal_over_76_is_rejected_everywhere():
    with pytest.raises(SchemaError, match="76"):
        schema_from_string(_schema_string([field("d", "decimal(77,2)")]))


def test_nested_decimal_validated():
    with pytest.raises(SchemaError, match="38"):
        schema_from_string(_schema_string([
            field("a", {"type": "array", "elementType": "decimal(40,0)",
                        "containsNull": True}),
        ]))


def test_malformed_schema_string():
    with pytest.raises(SchemaError):
        schema_from_string("{oops")
    with pytest.raises(SchemaError):
        schema_from_string(json.dumps({"type": "array"}))


# -- partition decode (scan.rs:239-300 analogues) ------------------------


def test_partition_decode_typed_values():
    assert decode_partition_value("foo", T.StringType()) == "foo"
    assert decode_partition_value("42", T.IntegerType()) == 42
    assert decode_partition_value("42", T.LongType()) == 42
    assert decode_partition_value("1970-01-13", T.DateType()) == datetime.date(1970, 1, 13)
    assert decode_partition_value("1970-01-14 01:02:03", T.TimestampType()) == \
        datetime.datetime(1970, 1, 14, 1, 2, 3)
    assert decode_partition_value("true", T.BooleanType()) is True
    assert decode_partition_value("3.5", T.DoubleType()) == 3.5
    assert str(decode_partition_value("1.20", T.DecimalType(10, 2))) == "1.20"


def test_partition_decode_empty_is_null():
    for dtype in (T.StringType(), T.IntegerType(), T.DateType(),
                  T.TimestampType(), T.BooleanType()):
        assert decode_partition_value("", dtype) is None
        assert decode_partition_value(None, dtype) is None


def test_partition_decode_all_null_map():
    schema = T.StructType([
        T.StructField("x", T.IntegerType()),
        T.StructField("p", T.DateType()),
        T.StructField("q", T.StringType()),
    ])
    out = decode_partition_values({}, schema, ["p", "q"])
    assert out == {"p": None, "q": None}


def test_partition_decode_bad_value():
    with pytest.raises(SchemaError):
        decode_partition_value("not-a-number", T.IntegerType())


def test_partition_decode_unsupported_type():
    with pytest.raises(SchemaError, match="not partition-decodable"):
        decode_partition_value("x", T.ArrayType(T.StringType()))


# -- stats-based file pruning --------------------------------------------

PRUNE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("price", T.DoubleType()),
    T.StructField("day", T.DateType()),
    T.StructField("name", T.StringType()),
])


def stats(lo, hi, nulls=0, n=100, col="id"):
    return {"numRecords": n, "minValues": {col: lo}, "maxValues": {col: hi},
            "nullCount": {col: nulls}}


def pred(sql):
    return predicate_from_sql(sql, PRUNE_SCHEMA)


def test_prune_equal_outside_range():
    assert may_match(pred("id = 50"), stats(1, 100))
    assert not may_match(pred("id = 500"), stats(1, 100))
    assert not may_match(pred("id = 0"), stats(1, 100))


def test_prune_inequalities():
    assert not may_match(pred("id < 1"), stats(1, 100))
    assert may_match(pred("id <= 1"), stats(1, 100))
    assert not may_match(pred("id > 100"), stats(1, 100))
    assert may_match(pred("id >= 100"), stats(1, 100))
    assert not may_match(pred("id >= 101"), stats(1, 100))


def test_prune_and_or():
    assert not may_match(pred("id > 0 AND id > 200"), stats(1, 100))
    assert may_match(pred("id > 200 OR id < 50"), stats(1, 100))
    assert not may_match(pred("id > 200 OR id < 0"), stats(1, 100))


def test_prune_strings_and_dates():
    s = {"minValues": {"name": "apple", "day": "2021-01-01"},
         "maxValues": {"name": "mango", "day": "2021-06-30"}}
    assert not may_match(pred("name = 'zebra'"), s)
    assert may_match(pred("name = 'banana'"), s)
    assert not may_match(pred("day > '2021-12-01'"), s)
    assert may_match(pred("day >= '2021-06-30'"), s)


def test_prune_is_null_with_zero_nullcount():
    assert not may_match(pred("id IS NULL"), stats(1, 100, nulls=0))
    assert may_match(pred("id IS NULL"), stats(1, 100, nulls=5))


def test_prune_is_not_null_all_null_file():
    assert not may_match(pred("id IS NOT NULL"), stats(None, None, nulls=100, n=100))


def test_prune_conservative_on_missing_stats():
    assert may_match(pred("id = 500"), None)
    assert may_match(pred("id = 500"), {})
    assert may_match(pred("id = 500"), {"minValues": {}})
    assert may_match(pred("price = 1.5"), stats(1, 100))  # stats for other col only


def test_bool_stats_garbage_never_prunes():
    """Unparseable boolean stats must keep the file (raise inside, caught
    by may_match) — the old coercion read Postgres-style 't' as False and
    pruned files whose every row matched (r5 review)."""
    from datafusion_delta_sharing_spark.plans.predicates import (
        Op,
        ValueType,
    )

    schema = T.StructType([T.StructField("flag", T.BooleanType())])
    p = predicate_from_sql("flag = true", schema)
    good = {"numRecords": 3, "minValues": {"flag": "t"},
            "maxValues": {"flag": "t"}, "nullCount": {"flag": 0}}
    assert may_match(p, good)  # cannot analyze -> keep
    # well-formed bools still prune
    assert not may_match(p, {"numRecords": 3, "minValues": {"flag": "false"},
                             "maxValues": {"flag": "false"},
                             "nullCount": {"flag": 0}})
    del Op, ValueType  # imported to assert availability only


def test_partition_int_decode_is_strict():
    """Out-of-width and underscore-syntax integers must raise the clear
    SchemaError here, not wrap or silently mis-decode downstream."""
    assert decode_partition_value("127", T.ByteType()) == 127
    with pytest.raises(SchemaError, match="out of range"):
        decode_partition_value("300", T.ByteType())
    with pytest.raises(SchemaError, match="out of range"):
        decode_partition_value("70000", T.ShortType())
    with pytest.raises(SchemaError, match="integer literal"):
        decode_partition_value("1_0", T.IntegerType())
    assert decode_partition_value("2147483647", T.IntegerType()) == 2**31 - 1


def test_partition_float_decode_is_strict():
    """r9 review: float('1_0') silently reads a corrupt value as 10.0 —
    the same underscore guard as the integer path applies."""
    assert decode_partition_value("1.5", T.DoubleType()) == 1.5
    assert decode_partition_value("-0.25", T.FloatType()) == -0.25
    for raw in ("1_0", "1_0.5", "1.0_5"):
        with pytest.raises(SchemaError, match="float literal"):
            decode_partition_value(raw, T.DoubleType())


def test_ambiguous_mapping_names():
    """r9 review: rename-swap detection — a name that is one column's
    logical name AND another's physical name; identity mappings and
    disjoint renames are clean."""
    from datafusion_delta_sharing_spark.sources.schema import (
        ambiguous_mapping_names,
    )

    # RENAME a TO c; RENAME b TO a: logical a has physical b, logical c
    # has physical a -> 'a' is ambiguous
    assert ambiguous_mapping_names({"a": "b", "c": "a"}) == {"a"}
    # disjoint physical names (the normal columnMapping=id shape)
    assert ambiguous_mapping_names(
        {"a": "col-001", "b": "col-002"}) == set()
    # identity mapping (columnMapping=name on never-renamed columns)
    assert ambiguous_mapping_names({"a": "a", "b": "b"}) == set()
    # full swap: both names ambiguous
    assert ambiguous_mapping_names({"a": "b", "b": "a"}) == {"a", "b"}


def test_stream_reader_refuses_snapshot_pins():
    """r9 review: versionAsOf on the snapshot-diff stream was silently
    ignored for data but honored by the expired-URL refresh — now
    refused up front with the batch-reader pointer."""
    from datafusion_delta_sharing_spark.errors import DeltaSharingError
    from datafusion_delta_sharing_spark.sources.datasource import (
        DeltaSharingStreamReader,
    )

    schema = T.StructType([T.StructField("id", T.LongType())])
    for opts in ({"versionAsOf": "5"}, {"timestampAsOf": "2024-01-01"}):
        with pytest.raises(DeltaSharingError, match="not supported"):
            DeltaSharingStreamReader(opts, schema)


def test_timestamp_literal_rendered_utc():
    """pushFilters hands naive session-local datetimes; the wire literal
    must be the UTC instant (a wall-clock hint read as UTC prunes files
    holding matching rows — r5 review)."""
    from datafusion_delta_sharing_spark.plans.predicates import (
        Op,
        ValueType,
        _render_literal,
    )

    aware = datetime.datetime(2021, 4, 28, 9, 0,
                              tzinfo=datetime.timezone(
                                  datetime.timedelta(hours=9)))
    assert _render_literal(aware, ValueType.TIMESTAMP) == \
        "2021-04-28T00:00:00Z"
    # naive input takes the system tz; whatever it is, the result is an
    # aware-UTC rendering of a real instant (ends in Z, round-trips)
    naive = datetime.datetime(2021, 4, 28, 9, 0)
    out = _render_literal(naive, ValueType.TIMESTAMP)
    assert out.endswith("Z")
    del Op
