from cdc_connector_spark.sources.pg_copy import (  # noqa: F401
    PgConn,
    PostgresCopyDataSource,
    copy_to_postgres,
    create_indexes,
    pg_foreign_keys,
    pg_range_stats,
    pg_table_indexes,
    pg_table_schema,
)
from cdc_connector_spark.sources.pg_logical import (  # noqa: F401
    PostgresCdcStreamSource,
    changes_to_envelope,
    create_slot,
    drop_slot,
    fetch_changes,
    run_cdc_poll,
)
