"""Plan inspection: the engine's `.explain` tooling.

SURVEY.md §4: Catalyst supplies pushdown/pruning/join-selection; this
package makes those properties ASSERTABLE so regressions in plan shape
(a lost broadcast, a filter that stopped pushing down, a surprise
cartesian) fail tests instead of silently costing 10× at scale.
"""

from etlalchemy_spark.plans.inspect import (  # noqa: F401
    explain_formatted,
    has_broadcast_join,
    has_cartesian,
    has_pushed_filters,
    has_wholestage_codegen,
    scan_read_schema,
    unpartitioned_windows,
)
