from .events import (
    stream_events,
    tumbling_counts,
    sliding_counts,
    session_counts,
    dedup_within_watermark,
    windowed_topk,
    run_to_memory,
)

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "dedup_within_watermark",
    "windowed_topk",
    "run_to_memory",
]
