"""Decimal handling modes + VariableScaleDecimal
(``Db2ValueConverters.java:48-61, 84-116``)."""

import decimal

import pytest
from pyspark.sql import functions as F

from debezium_connector_db2_spark.functions.decimals import (
    decimal_column,
    variable_scale_decimal,
)


def test_three_modes(spark):
    df = spark.createDataFrame([(1, 123.456), (2, -0.005)], "id: int, x: double")
    out = df.select(
        decimal_column(F.col("x"), 10, 2, "precise").alias("p"),
        decimal_column(F.col("x"), 10, 2, "double").alias("d"),
        decimal_column(F.col("x"), 10, 2, "string").alias("s"),
    ).orderBy("p").collect()
    assert out[1].p == decimal.Decimal("123.46")
    assert isinstance(out[1].d, float) and out[1].d == 123.46
    assert out[1].s == "123.46"
    with pytest.raises(ValueError):
        decimal_column(F.col("x"), 10, 2, "bogus")


def test_variable_scale_decimal(spark):
    df = spark.createDataFrame([(987.654,)], "x: double")
    row = df.select(
        variable_scale_decimal(F.col("x"), 15, 2).alias("v")).collect()[0]
    assert row.v.scale == 2 and row.v.value == 98765
    s, u = variable_scale_decimal(F.col("x"), 15, 3, as_struct=False)
    row = df.select(s.alias("s"), u.alias("u")).collect()[0]
    assert (row.s, row.u) == (3, 987654)
