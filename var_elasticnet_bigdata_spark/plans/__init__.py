from .inspect import (
    explain_str,
    pushed_filters,
    read_schema_columns,
    has_broadcast_join,
    wholestage_codegen_spans,
    assert_scan_pruned,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "wholestage_codegen_spans",
    "assert_scan_pruned",
]
