"""Change-event envelope: schema, flatten, per-table SMT analogues.

The envelope models the Debezium record shape the reference's streaming plane
produces (SURVEY.md §1.1): ``{before, after, op, ts_ms, source{db,table},
seq}`` where ``op`` ∈ {c,u,d,r} ('r' = snapshot read) and ``seq`` stands in
for the Kafka offset (per-key tie-break — the reference gets per-key total
order from 1-partition topics, connectors/sources/mariadb/trading.json:61;
at scale we order by (ts_ms, seq) within key instead).

``flatten_envelope`` is the ExtractNewRecordState analogue
(connectors/sources/mariadb/trading.json:73-76): project ``after.*`` plus
metadata columns ``__op, __ts_ms, __source_db, __source_table, __seq``.
For deletes (after is NULL) the key columns are taken from ``before`` so a
delete row still carries its key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_COLS = ["__op", "__ts_ms", "__source_db", "__source_table", "__seq"]

OP_CREATE, OP_UPDATE, OP_DELETE, OP_READ = "c", "u", "d", "r"
UPSERT_OPS = (OP_CREATE, OP_UPDATE, OP_READ)


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Envelope StructType for a given row schema."""
    return T.StructType(
        [
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
            T.StructField("op", T.StringType(), False),
            T.StructField("ts_ms", T.LongType(), False),
            T.StructField("source_db", T.StringType(), True),
            T.StructField("source_table", T.StringType(), True),
            T.StructField("seq", T.LongType(), False),
        ]
    )


def flatten_envelope(env: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Envelope → flat row + metadata columns.

    Non-key columns come from ``after``; for delete events key columns are
    coalesced from ``before`` so the applier can target the row to delete.
    """
    row_fields = [f.name for f in env.schema["after"].dataType.fields]
    keys = set(key_cols or [])
    cols: list[Column] = []
    for name in row_fields:
        if name in keys:
            cols.append(F.coalesce(F.col(f"after.{name}"), F.col(f"before.{name}")).alias(name))
        else:
            cols.append(F.col(f"after.{name}").alias(name))
    cols += [
        F.col("op").alias("__op"),
        F.col("ts_ms").alias("__ts_ms"),
        F.col("source_db").alias("__source_db"),
        F.col("source_table").alias("__source_table"),
        F.col("seq").alias("__seq"),
    ]
    return env.select(*cols)


def parse_json_envelope(raw: DataFrame, row_schema: T.StructType, value_col: str = "value") -> DataFrame:
    """Kafka-style raw JSON bytes/string → typed envelope frame.

    ``from_json`` with the envelope schema — the JsonConverter analogue
    (connectors/sources/mariadb/trading.json:68-71).
    """
    schema = envelope_schema(row_schema)
    parsed = raw.select(F.from_json(F.col(value_col).cast("string"), schema).alias("e"))
    return parsed.select("e.*")


def apply_renames(df: DataFrame, renames: dict[str, str], table: str | None = None,
                  table_pattern: str | None = None) -> DataFrame:
    """P2: predicate-gated column rename (connectors/sources/mariadb/live.json:71-79).

    Renames apply only when ``table`` matches ``table_pattern`` (regex) —
    e.g. ``user → owner_user_id`` only for ``.*T_CARRIER``.
    """
    if table_pattern is not None and table is not None:
        import re

        if not re.fullmatch(table_pattern, table):
            return df
    out = df
    for old, new in renames.items():
        if old in out.columns:
            out = out.withColumnRenamed(old, new)
    return out


def apply_casts(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """P3: Cast$Value analogue (connectors/sinks/postgres/trading.json:37-38)."""
    out = df
    for c, t in casts.items():
        if c in out.columns:
            out = out.withColumn(c, F.col(c).cast(t))
    return out
