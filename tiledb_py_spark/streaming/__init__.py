from .events import (cohort_retention, dedup_event_stream,
                     event_transitions, funnel, neardup_event_stream,
                     read_event_stream, session_window_stats, sessionize,
                     sliding_window_counts, stream_events_to_array,
                     tumbling_window_counts)
from .events import ewma
from .stateful import (ewma_stream, funnel_stream, running_user_totals,
                       sessionize_stream)

__all__ = ["tumbling_window_counts", "sliding_window_counts",
           "session_window_stats", "sessionize", "sessionize_stream",
           "funnel", "funnel_stream", "ewma", "ewma_stream",
           "cohort_retention",
           "event_transitions", "stream_events_to_array",
           "read_event_stream", "running_user_totals",
           "dedup_event_stream", "neardup_event_stream"]
