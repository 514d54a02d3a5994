"""Table metadata registry.

The reference discovers schema dynamically (DESCRIBE / INFORMATION_SCHEMA,
migrate_v3.py:292-369; PK discovery tests/validation.py:222-236; timestamp
column chosen by name pattern tests/validation.py:249-258). Here the same
metadata is an explicit, serializable ``TableMeta`` carried by the engine —
the discovery front-ends (JDBC metadata queries) populate it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Preference-ordered name patterns for the freshness timestamp column,
# modeling the reference's heuristic (a column whose name signals
# last-modification time is preferred over creation time).
_TS_PATTERNS: tuple[str, ...] = (
    "last_modified_date",
    "last_modified",
    "modified_date",
    "modified_at",
    "updated_at",
    "update_date",
    "last_updated",
    "updated",
    "created_date",
    "created_at",
    "create_date",
    "creation_date",
    "ts",
    "timestamp",
)


def find_ts_column(columns: list[str]) -> str | None:
    """Pick the freshness column by name pattern; None if no candidate."""
    lowered = {c.lower(): c for c in columns}
    for pat in _TS_PATTERNS:
        if pat in lowered:
            return lowered[pat]
    # substring fallback: any column containing 'modified' then 'updated' then 'created'
    for needle in ("modified", "updated", "created"):
        for lc, orig in lowered.items():
            if needle in lc:
                return orig
    return None


@dataclass
class TableMeta:
    """Identity + keys + freshness column for one replicated table."""

    db: str
    table: str
    pk_cols: list[str]
    ts_col: str | None = None
    schema: T.StructType | None = None
    # per-table transform rules (SMT analogues)
    renames: dict[str, str] = field(default_factory=dict)       # P2 conditional rename
    casts: dict[str, str] = field(default_factory=dict)         # P3 per-column casts
    bit_bool_cols: list[str] = field(default_factory=list)      # F1
    tinyint_bool_cols: list[str] = field(default_factory=list)  # F1
    zero_date_cols: list[str] = field(default_factory=list)     # F2
    strip_nul_cols: list[str] = field(default_factory=list)     # F3

    @property
    def sink_name(self) -> str:
        """``<db>_<table>`` lowercased (migrate_v3.py:373)."""
        return f"{self.db}_{self.table}".lower()

    def has_pk(self) -> bool:
        return bool(self.pk_cols)


def meta_from_df(db: str, table: str, df: DataFrame, pk_cols: list[str]) -> TableMeta:
    """Build TableMeta for a DataFrame-backed table, inferring the ts column."""
    return TableMeta(
        db=db,
        table=table,
        pk_cols=pk_cols,
        ts_col=find_ts_column(df.columns),
        schema=df.schema,
    )


# The driver-provided analytics tables (TESTDATA.md) with their natural keys.
TESTDATA_TABLES: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def load_table(spark, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing nanosecond parquet timestamps
    (which Spark cannot read natively) to TimestampType.

    ``spark.sql.legacy.parquet.nanosAsLong`` makes the scan yield BIGINT
    nanos; values in the testdata are µs-precision so ``div 1000`` is
    lossless. Set lazily so sessions we don't own (the driver's) work too.
    """
    from pyspark.sql import functions as F

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark, sf_dir: str, names: list[str] | None = None) -> list[str]:
    """SQL front-end: register every testdata table as a temp view so the
    whole engine surface is reachable via ``spark.sql`` (the reference's
    users speak SQL; S5 catalog analogue)."""
    names = names or TESTDATA_TABLES
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(names)
