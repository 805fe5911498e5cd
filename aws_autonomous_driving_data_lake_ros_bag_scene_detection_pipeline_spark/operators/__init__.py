from ..sources.tables import union_by_name
from .pivot import pivot_wide
from .sessionize import change_point_intervals, sessionize
from .timeseries import asof_join, forward_fill, lag_lead, resample_asof, time_spine
from .topk import top_k_per_group

__all__ = [
    "asof_join", "change_point_intervals", "forward_fill", "lag_lead",
    "pivot_wide", "resample_asof", "sessionize", "time_spine",
    "top_k_per_group", "union_by_name",
]
