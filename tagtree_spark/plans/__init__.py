"""Plan inspection utilities (see plans.inspect)."""

from tagtree_spark.plans.inspect import (  # noqa: F401
    formatted_plan,
    has_cartesian,
    physical_plan,
    pushed_filters,
    scan_schemas,
    single_partition_exchanges,
)
