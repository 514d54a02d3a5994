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
class IndexMeta:
    """One secondary index at the SOURCE (migrate_v3.py:307-336 extracts
    these from SHOW INDEX; :459-482 re-creates them post-load). In a
    parquet/lakehouse sink there is no btree to build — the physical
    analogue is clustering (Z-order on the index columns, ops/zorder.py),
    but the metadata itself must survive so a migration report can say
    'these indexes existed at the source'."""

    name: str
    columns: list[str]
    unique: bool = False
    type: str = "BTREE"


@dataclass
class ForeignKeyMeta:
    """One FK constraint at the source (migrate_v3.py:338-369,
    INFORMATION_SCHEMA.KEY_COLUMN_USAGE). The sink-side analogue of
    enforcement is the J1 orphan anti-join (validation.checks.check_orphans)
    run child→parent over these columns."""

    name: str
    columns: list[str]
    ref_table: str
    ref_columns: list[str]


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
    # source physical metadata (captured, reported, mapped to clustering)
    indexes: list[IndexMeta] = field(default_factory=list)
    foreign_keys: list[ForeignKeyMeta] = field(default_factory=list)

    @property
    def sink_name(self) -> str:
        """``<db>_<table>`` lowercased (migrate_v3.py:373)."""
        return f"{self.db}_{self.table}".lower()

    def has_pk(self) -> bool:
        return bool(self.pk_cols)

    def cluster_columns(self) -> list[str]:
        """The sink-side clustering suggestion derived from source indexes:
        columns of the first (most-selective-by-convention) secondary
        index — feed to ``zorder_write`` for the physical effect a btree
        gave readers at the source."""
        return list(self.indexes[0].columns) if self.indexes else []

    def to_dict(self) -> dict:
        """JSON-serializable migration record (schema as DDL JSON)."""
        from dataclasses import asdict

        d = asdict(self)
        d["schema"] = self.schema.json() if self.schema is not None else None
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "TableMeta":
        d = dict(d)
        if d.get("schema"):
            import json as _json

            d["schema"] = T.StructType.fromJson(_json.loads(d["schema"]))
        d["indexes"] = [IndexMeta(**i) for i in d.get("indexes", [])]
        d["foreign_keys"] = [ForeignKeyMeta(**f) for f in d.get("foreign_keys", [])]
        return cls(**d)


def meta_from_df(
    db: str,
    table: str,
    df: DataFrame,
    pk_cols: list[str],
    indexes: list[IndexMeta] | None = None,
    foreign_keys: list[ForeignKeyMeta] | None = None,
) -> TableMeta:
    """Build TableMeta for a DataFrame-backed table, inferring the ts column."""
    return TableMeta(
        db=db,
        table=table,
        pk_cols=pk_cols,
        ts_col=find_ts_column(df.columns),
        schema=df.schema,
        indexes=list(indexes or []),
        foreign_keys=list(foreign_keys or []),
    )


def fk_orphans(child: DataFrame, parent: DataFrame, fk: ForeignKeyMeta) -> DataFrame:
    """Rows of ``child`` violating ``fk`` (no matching parent key) — the
    distributed analogue of FK enforcement for an append-only sink: run
    post-load, alert on count > 0. NULL FK values are excluded (SQL FK
    semantics: NULLs never violate)."""
    from pyspark.sql import functions as F

    cond = None
    for c in fk.columns:
        notnull = F.col(c).isNotNull()
        cond = notnull if cond is None else (cond & notnull)
    pairs = list(zip(fk.columns, fk.ref_columns))
    parent_keys = parent.select(*[F.col(r).alias(c) for c, r in pairs]).dropDuplicates()
    return child.filter(cond).join(parent_keys, on=[c for c, _ in pairs], how="left_anti")


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
