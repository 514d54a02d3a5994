from cdc_connector_spark.streaming.pipeline import ChangelogStream  # noqa: F401
from cdc_connector_spark.streaming.export import StreamingTrainingExport  # noqa: F401
