"""Plan inspection: explain capture, operator counting, scale assertions."""

from .inspect import (  # noqa: F401
    count_exchanges,
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    scan_schema_columns,
    uses_take_ordered,
)
