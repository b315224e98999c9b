from decimal import Decimal

import pytest
from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from amazon_s3_find_and_forget_spark.schema import (
    ColumnNotFoundError,
    MatchIdCastingError,
    NotAnIdentifierError,
    cast_match_id,
    resolve_column,
    validate_identifier,
)

SCHEMA = StructType(
    [
        StructField("customer_id", StringType()),
        StructField("customerId", IntegerType()),
        StructField("customer_id_decimal", DecimalType(6, 3)),
        StructField(
            "user_info",
            StructType(
                [
                    StructField(
                        "personal_information",
                        StructType([StructField("email", StringType())]),
                    )
                ]
            ),
        ),
        StructField("days_off", ArrayType(StringType())),
    ]
)


def test_resolve_case_insensitive():
    path, dtype = resolve_column(SCHEMA, "CUSTOMER_ID")
    assert path == "customer_id"
    assert isinstance(dtype, StringType)


def test_resolve_nested_dot_path():
    path, dtype = resolve_column(SCHEMA, "user_info.Personal_Information.EMAIL")
    assert path == "user_info.personal_information.email"
    assert isinstance(dtype, StringType)


def test_resolve_missing_raises():
    with pytest.raises(ColumnNotFoundError):
        resolve_column(SCHEMA, "nope")


def test_array_children_not_identifiers():
    # reference: generate_queries.py:376-400 — array children unreachable
    with pytest.raises(ColumnNotFoundError):
        resolve_column(SCHEMA, "days_off.element")


def test_array_itself_not_identifier():
    with pytest.raises(NotAnIdentifierError):
        validate_identifier(SCHEMA, "days_off")


def test_struct_not_identifier():
    with pytest.raises(NotAnIdentifierError):
        validate_identifier(SCHEMA, "user_info")


def test_cast_int():
    assert cast_match_id("123", "c", IntegerType()) == 123
    assert cast_match_id(123, "c", LongType()) == 123


def test_cast_float():
    assert cast_match_id("1.5", "c", DoubleType()) == 1.5


def test_cast_decimal_scale_exact():
    v = cast_match_id("123.450", "c", DecimalType(6, 3))
    assert v == Decimal("123.450")


def test_cast_str():
    assert cast_match_id(12345, "c", StringType()) == "12345"


def test_cast_failure_is_fatal():
    # parity: generate_queries.py:516-519 MatchIdCastingError
    with pytest.raises(MatchIdCastingError):
        cast_match_id("abc", "c", IntegerType())
