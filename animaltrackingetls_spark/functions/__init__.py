from .datetime_expr import (
    date_rescue,
    parse_event_timestamp,
    temporal_columns,
)
from .coercion import try_double, count_with_default, scrub_na_strings

__all__ = [
    "date_rescue",
    "parse_event_timestamp",
    "temporal_columns",
    "try_double",
    "count_with_default",
    "scrub_na_strings",
]
