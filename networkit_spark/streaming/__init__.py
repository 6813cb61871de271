from networkit_spark.streaming.events import (  # noqa: F401
    EVENT_SCHEMA,
    GraphUpdater,
    apply_events,
    read_event_stream,
    streaming_degree_counts,
    streaming_edge_rate,
)
