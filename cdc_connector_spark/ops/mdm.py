"""Master-data survivorship (golden records): collapse matched-entity
clusters into one canonical row per real-world entity — the step AFTER
entity resolution (``ops/fuzzy.py`` finds the match pairs,
``ops/components.py`` closes them into clusters, this module elects the
surviving value per field). The MDM pipeline every warehouse runs on
customer/supplier/product dimensions.

Survivorship rule (deterministic, SQL-replayable): per (cluster, field),
the most frequent non-NULL value wins; frequency ties break to the
smallest value (a total order — no "first seen" dependence on scan
order, which would be nondeterministic under parallel scans). Richer
policies (trust-ordered sources, latest-updated) compose by pre-ranking
upstream and feeding the rank as the field value.

Shape: one connected-components run over the pair graph (label
propagation on match pairs only — corpus-sized rows never enter the
graph), then per field one cluster-keyed count + one window pick; all
shuffles key on cluster/field over member-sized tables. Records with no
match pair form singleton clusters via the left-join + coalesce
convention (components only returns matched nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def golden_records(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    fields: list[str] | None = None,
) -> DataFrame:
    """Elect one golden row per matched-entity cluster.

    ``pairs`` is the (id_a, id_b) match-pair table (e.g. from
    ``fuzzy_pairs``). Returns one row per cluster:
    (cluster_id, n_members, <field> for each field) where cluster_id is
    the minimum member id (the components convention) and each field
    carries its surviving value (most frequent non-NULL, ties to the
    smallest; NULL only when every member is NULL)."""
    from cdc_connector_spark.ops.components import connected_components

    if fields is None:
        fields = [c for c in df.columns if c != id_col]
    if not fields:
        raise ValueError("fields must be non-empty")
    from pyspark.sql import Window

    comp = connected_components(pairs)
    members = (
        df.join(comp, df[id_col] == comp["id"], "left")
        .select(
            F.coalesce(comp["comp"], df[id_col]).alias("cluster_id"),
            *[df[c] for c in [id_col] + fields],
        )
        # every field's count pass plus the size aggregate consumes this
        # frame — lazily it re-scans the dimension table |fields|+1 times
        # (r12 review); materialize the member projection once
        .localCheckpoint(eager=True)
    )
    out = members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    for f in fields:
        counts = (
            members.filter(F.col(f).isNotNull())
            .groupBy("cluster_id", f)
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("__n").desc(), F.col(f).asc()
        )
        best = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("cluster_id", f)
        )
        out = out.join(best, "cluster_id", "left")
    return out
