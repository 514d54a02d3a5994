from cdc_connector_spark.functions.normalize import (  # noqa: F401
    bit_to_boolean,
    lag_minutes,
    lowercase_columns,
    normalize_row,
    null_zero_date,
    route_table_name,
    strip_nul_binary,
    strip_nul_string,
    tinyint_to_boolean,
)
from cdc_connector_spark.functions.types import mysql_to_spark_type  # noqa: F401
