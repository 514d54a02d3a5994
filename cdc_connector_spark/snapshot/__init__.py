from cdc_connector_spark.snapshot.engine import snapshot_table  # noqa: F401
from cdc_connector_spark.snapshot.planner import jdbc_read_options, plan_num_partitions  # noqa: F401
