"""Snapshot CLI: discovery, idempotent skip, overwrite, PK overrides."""

from cdc_connector_spark.snapshot.cli import discover_tables, main, parse_pk_overrides

SF = "/root/testdata/sf0.001"


def test_discover_tables():
    names = discover_tables(SF)
    assert "lineitem" in names and "documents" in names and len(names) == 10


def test_parse_pk_overrides():
    assert parse_pk_overrides(["t1=a,b", "t2=x"]) == {"t1": ["a", "b"], "t2": ["x"]}


def test_cli_migrate_and_idempotent_skip(spark, tmp_path):
    sink = str(tmp_path / "sink")
    assert main(["--source-root", SF, "--database", "tpch", "--tables", "region,nation", "--sink-root", sink]) == 0
    n0 = spark.read.parquet(f"{sink}/tpch_region").count()
    assert n0 == 5
    # second run: mode=ignore → no error, data unchanged
    assert main(["--source-root", SF, "--database", "tpch", "--tables", "region,nation", "--sink-root", sink]) == 0
    assert spark.read.parquet(f"{sink}/tpch_region").count() == 5


def test_register_views_sql_frontend(spark):
    from cdc_connector_spark.tables import register_views

    names = register_views(spark, SF)
    assert len(names) == 10
    n = spark.sql("select count(*) as n from lineitem join orders on l_orderkey = o_orderkey").first()["n"]
    assert n > 0
    top = spark.sql("select o_orderkey from orders order by o_totalprice desc limit 1").count()
    assert top == 1


def test_cli_reports_failed_table_and_exits_1(tmp_path):
    code = main(
        ["--source-root", SF, "--database", "t", "--tables", "region,no_such_table",
         "--sink-root", str(tmp_path / "s")]
    )
    assert code == 1
