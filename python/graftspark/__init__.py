from . import multimodal, ops
from .session import (
    GraftProfileSession,
    new_profiling_session,
    merge_profiles,
    estimate_segments,
)

__all__ = [
    "GraftProfileSession",
    "new_profiling_session",
    "merge_profiles",
    "estimate_segments",
    "ops",
    "multimodal",
]
