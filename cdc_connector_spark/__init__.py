"""cdc_connector_spark — a PySpark-native CDC replication + analytics engine.

Re-implements (Spark-first, from public knowledge only) the capability
surface of the Container-xChange/cdc-connector reference:

- batch snapshot/migration engine      (cdc_connector_spark.snapshot)
- changelog apply engine (CDC upsert)  (cdc_connector_spark.changelog)
- structured-streaming pipeline        (cdc_connector_spark.streaming)
- reconciliation/validation suite      (cdc_connector_spark.validation)
- scalar/normalization function lib    (cdc_connector_spark.functions)
- large-scale training-data operators  (cdc_connector_spark.ops)

All heavy lifting is declared through the DataFrame API so Catalyst picks
physical plans (predicate pushdown, broadcast joins, AQE skew handling);
there are no row-at-a-time Python UDFs in any hot path.
"""

__version__ = "0.1.0"
