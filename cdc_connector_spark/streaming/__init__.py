from cdc_connector_spark.streaming.pipeline import ChangelogStream  # noqa: F401
