"""MySQL/MariaDB type-string → Spark DataType translation.

Reproduces the reference's source→sink type map semantics
(migrate_v3.py:167-193 ``TYPE_MAP`` plus the special cases in
migrate_v3.py:225-248 ``convert_mysql_type``) with Spark SQL target types,
per the mapping table in SURVEY.md §1.2:

- tinyint(1) / bit(1)        → BooleanType
- tinyint / smallint         → ShortType
- mediumint / int            → IntegerType  (unsigned → LongType promotion)
- bigint [unsigned]          → LongType (unsigned: documented overflow risk,
  matching ``bigint.unsigned.handling.mode: long`` in
  connectors/sources/mariadb/trading.json:40)
- decimal(p,s)               → DecimalType(p,s) precision preserved
  (migrate_v3.py:239-243; ``decimal.handling.mode: precise``)
- float / double             → FloatType / DoubleType
- date                       → DateType
- datetime                   → TimestampNTZType (no tz, migrate_v3.py:179)
- timestamp                  → TimestampType (session tz UTC)
- time                       → LongType microseconds-since-midnight
  (Spark has no TIME type; convention documented here, matching
  ``time.precision.mode: adaptive_time_microseconds``)
- char/varchar/enum/set/text → StringType
- binary/varbinary/blob      → BinaryType
- json                       → StringType (raw JSON text)
- anything unknown           → StringType fallback (migrate_v3.py:248)
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_PAREN = re.compile(r"^([a-z0-9_ ]+?)\s*(?:\(\s*([0-9]+)\s*(?:,\s*([0-9]+)\s*)?\))?\s*(unsigned)?\s*(zerofill)?$")


def mysql_to_spark_type(type_str: str) -> T.DataType:
    """Translate a MySQL column type string (as shown by ``DESCRIBE``) to a
    Spark DataType. Case-insensitive; tolerant of display widths."""
    s = type_str.strip().lower()
    m = _PAREN.match(s)
    if not m:
        return T.StringType()
    base, p, scale, unsigned = m.group(1).strip(), m.group(2), m.group(3), bool(m.group(4))
    p_i = int(p) if p is not None else None

    if base == "bit":
        # bit(1) → boolean; wider bitfields → binary
        return T.BooleanType() if (p_i or 1) == 1 else T.BinaryType()
    if base == "tinyint":
        if p_i == 1:
            return T.BooleanType()
        return T.IntegerType() if unsigned else T.ShortType()
    if base == "smallint":
        return T.IntegerType() if unsigned else T.ShortType()
    if base in ("mediumint", "int", "integer"):
        return T.LongType() if unsigned else T.IntegerType()
    if base == "bigint":
        return T.LongType()  # unsigned handled as long (documented overflow risk)
    if base in ("decimal", "numeric", "dec", "fixed"):
        return T.DecimalType(p_i or 10, int(scale) if scale is not None else 0)
    if base == "float":
        return T.FloatType()
    if base in ("double", "double precision", "real"):
        return T.DoubleType()
    if base == "date":
        return T.DateType()
    if base == "datetime":
        return T.TimestampNTZType()
    if base == "timestamp":
        return T.TimestampType()
    if base == "time":
        return T.LongType()  # microseconds since midnight, by convention
    if base == "year":
        return T.IntegerType()
    if base in ("char", "varchar", "enum", "set", "tinytext", "text", "mediumtext", "longtext"):
        return T.StringType()
    if base in ("binary", "varbinary", "tinyblob", "blob", "mediumblob", "longblob"):
        return T.BinaryType()
    if base == "json":
        return T.StringType()
    return T.StringType()


def describe_to_struct(columns: list[tuple[str, str]]) -> T.StructType:
    """Build a StructType from ``DESCRIBE``-style (name, type_string) pairs,
    lowercasing identifiers the way the reference sink does
    (migrate_v3.py:395,590)."""
    return T.StructType(
        [T.StructField(name.lower(), mysql_to_spark_type(ts), nullable=True) for name, ts in columns]
    )


def describe_rows_to_table(
    rows: list[tuple],
) -> tuple[T.StructType, list[str]]:
    """Full MySQL ``DESCRIBE`` result rows — the 6-tuple shape the
    connector returns: (Field, Type, Null, Key, Default, Extra) — to a
    (schema, primary_key) pair ready for TableMeta / the range planner
    (the reference's get_table_structure flow, migrate_v3.py:292-305):

    - nullability from the ``Null`` column ('NO' → non-nullable);
    - primary key = the columns marked ``PRI``, in DESCRIBE (ordinal)
      order — for composite keys MySQL's DESCRIBE does not expose the
      index's own column order (that needs SHOW KEYS / seq_in_index);
      ordinal order matches in every schema the reference migrates, and
      key-ORDER only affects range-planning locality, never correctness;
    - identifiers lowercased like the sink (migrate_v3.py:395,590).

    No live server in this environment: this parses the canned row shape
    the mysql client produces, so the whole discovery→plan path is
    testable; a live cursor would feed the identical tuples in."""
    fields = []
    pk: list[str] = []
    for row in rows:
        name, type_str, null_s, key_s = row[0], row[1], row[2], row[3]
        fields.append(
            T.StructField(
                name.lower(),
                mysql_to_spark_type(type_str),
                nullable=(str(null_s).upper() != "NO"),
            )
        )
        if str(key_s).upper() == "PRI":
            pk.append(name.lower())
    return T.StructType(fields), pk
