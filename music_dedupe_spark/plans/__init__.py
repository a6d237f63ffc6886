from music_dedupe_spark.plans.checks import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    partition_filters,
    pushed_filters,
    scan_read_schema,
)
