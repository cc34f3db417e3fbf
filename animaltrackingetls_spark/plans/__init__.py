"""Plan inspection: assert the physical plan is the one you designed.

At 100 TB a wrong plan (cartesian product, missed broadcast, unpushed
filter) is the difference between minutes and days — these helpers make
plan shape a *testable property* instead of something eyeballed once.
"""

from .audit import (  # noqa: F401
    assert_broadcast_join,
    assert_no_cartesian,
    formatted_plan,
    pushed_filters,
    scan_read_schema,
)
from .metrics import execution_metrics  # noqa: F401
