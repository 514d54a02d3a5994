from cdc_connector_spark.validation.checks import (  # noqa: F401
    CheckResult,
    TableReport,
    check_distinct_pk,
    check_duplication,
    check_exists,
    check_freshness,
    check_orphans,
    check_rowcount,
    run_all_checks,
)
from cdc_connector_spark.validation.drift import (  # noqa: F401
    duplicate_groups,
    orphan_sample,
    replay_window,
)
