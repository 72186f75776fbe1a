from .explain import explain_formatted
from .stats_cbo import (
    DimSpec,
    StarJoinPlan,
    estimated_size_bytes,
    manifest_ndv,
    plan_star_join,
)

__all__ = [
    "explain_formatted",
    "DimSpec",
    "StarJoinPlan",
    "estimated_size_bytes",
    "manifest_ndv",
    "plan_star_join",
]
