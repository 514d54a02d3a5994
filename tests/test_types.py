from pyspark.sql import types as T

from cdc_connector_spark.functions.types import describe_to_struct, mysql_to_spark_type


def test_boolean_decodes():
    assert mysql_to_spark_type("tinyint(1)") == T.BooleanType()
    assert mysql_to_spark_type("bit(1)") == T.BooleanType()
    assert mysql_to_spark_type("BIT(1)") == T.BooleanType()


def test_integer_family():
    assert mysql_to_spark_type("tinyint") == T.ShortType()
    assert mysql_to_spark_type("tinyint(4)") == T.ShortType()
    assert mysql_to_spark_type("smallint(6)") == T.ShortType()
    assert mysql_to_spark_type("mediumint(9)") == T.IntegerType()
    assert mysql_to_spark_type("int(11)") == T.IntegerType()
    assert mysql_to_spark_type("int(10) unsigned") == T.LongType()
    assert mysql_to_spark_type("bigint(20)") == T.LongType()
    assert mysql_to_spark_type("bigint(20) unsigned") == T.LongType()


def test_decimal_precision_preserved():
    assert mysql_to_spark_type("decimal(12,2)") == T.DecimalType(12, 2)
    assert mysql_to_spark_type("decimal(38,10)") == T.DecimalType(38, 10)
    assert mysql_to_spark_type("decimal(10,0) unsigned") == T.DecimalType(10, 0)


def test_float_double():
    assert mysql_to_spark_type("float") == T.FloatType()
    assert mysql_to_spark_type("double") == T.DoubleType()
    assert mysql_to_spark_type("double precision") == T.DoubleType()


def test_temporal():
    assert mysql_to_spark_type("date") == T.DateType()
    assert mysql_to_spark_type("datetime") == T.TimestampNTZType()
    assert mysql_to_spark_type("datetime(6)") == T.TimestampNTZType()
    assert mysql_to_spark_type("timestamp") == T.TimestampType()
    assert mysql_to_spark_type("time") == T.LongType()
    assert mysql_to_spark_type("year(4)") == T.IntegerType()


def test_strings_and_binary():
    assert mysql_to_spark_type("varchar(255)") == T.StringType()
    assert mysql_to_spark_type("enum('a','b')") == T.StringType()  # falls back to string
    assert mysql_to_spark_type("text") == T.StringType()
    assert mysql_to_spark_type("longtext") == T.StringType()
    assert mysql_to_spark_type("varbinary(16)") == T.BinaryType()
    assert mysql_to_spark_type("blob") == T.BinaryType()
    assert mysql_to_spark_type("json") == T.StringType()


def test_unknown_falls_back_to_string():
    assert mysql_to_spark_type("geometry") == T.StringType()
    assert mysql_to_spark_type("weird_custom") == T.StringType()


def test_describe_to_struct_lowercases():
    st = describe_to_struct([("ID", "bigint(20)"), ("Price", "decimal(12,2)")])
    assert st.fieldNames() == ["id", "price"]
    assert st["price"].dataType == T.DecimalType(12, 2)


def test_describe_rows_full_shape_to_table():
    from cdc_connector_spark.functions.types import describe_rows_to_table

    # the exact 6-tuple shape a mysql client cursor yields for DESCRIBE
    rows = [
        ("ID", "bigint(20)", "NO", "PRI", None, "auto_increment"),
        ("Tenant", "int(11)", "NO", "PRI", None, ""),
        ("Name", "varchar(255)", "YES", "MUL", None, ""),
        ("Amount", "decimal(18,4)", "YES", "", None, ""),
        ("Flag", "tinyint(1)", "NO", "", "0", ""),
        ("Created", "datetime", "YES", "", "CURRENT_TIMESTAMP", ""),
    ]
    schema, pk = describe_rows_to_table(rows)
    assert pk == ["id", "tenant"]  # composite key, ordinal order, lowercased
    by_name = {f.name: f for f in schema.fields}
    assert not by_name["id"].nullable and by_name["name"].nullable
    assert by_name["amount"].dataType.simpleString() == "decimal(18,4)"
    assert by_name["flag"].dataType.simpleString() == "boolean"  # tinyint(1) rule
    # datetime (no tz in MySQL) -> TIMESTAMP_NTZ per the §1.2 map
    assert by_name["created"].dataType.simpleString() == "timestamp_ntz"
