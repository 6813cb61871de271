"""Graph event streams — the reference's dynamics module, Spark-native.

Reference: ``GraphEvent {Type, u, v, w}`` with types NODE_ADDITION,
NODE_REMOVAL, EDGE_ADDITION, EDGE_REMOVAL, EDGE_WEIGHT_UPDATE,
EDGE_WEIGHT_INCREMENT, TIME_STEP
(``include/networkit/dynamics/GraphEvent.hpp:23-37``), applied in
batches by ``GraphUpdater`` (``cpp/dynamics/GraphUpdater.cpp``) and
parsed from files by ``DGSStreamParser``
(``cpp/dynamics/DGSStreamParser.cpp``). The reference is
batch-incremental — no watermarks or event time (SURVEY §2.10).

Spark mapping:
- :func:`apply_events` / :class:`GraphUpdater` — the batch path:
  snapshot-in, snapshot-out edge-table transformation (our mutability
  model, SURVEY §1.2).
- :func:`read_event_stream` + the ``streaming_*`` aggregations — the
  genuinely-streaming path the reference lacks: Structured Streaming
  source with event-time watermarks, windowed edge-rate, and running
  degree counts; sinks via ``foreachBatch`` can feed
  :class:`GraphUpdater` for periodic snapshot refresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from networkit_spark.graph import Graph

#: event record schema; ``etype`` values mirror GraphEvent.hpp:23-30
EVENT_SCHEMA = (
    "ts timestamp, etype string, u long, v long, w double"
)

EDGE_ADDITION = "EDGE_ADDITION"
EDGE_REMOVAL = "EDGE_REMOVAL"
EDGE_WEIGHT_UPDATE = "EDGE_WEIGHT_UPDATE"
EDGE_WEIGHT_INCREMENT = "EDGE_WEIGHT_INCREMENT"
NODE_ADDITION = "NODE_ADDITION"
NODE_REMOVAL = "NODE_REMOVAL"
TIME_STEP = "TIME_STEP"


def apply_events(graph: Graph, events: DataFrame) -> Graph:
    """Apply an event batch to a graph snapshot (``GraphUpdater::update``
    semantics, ``cpp/dynamics/GraphUpdater.cpp``), returning a new Graph.

    Order within one batch follows the reference's sequential replay
    collapsed to set semantics: removals beat earlier additions of the
    same edge; weight updates override; increments sum onto the final
    weight. Node removal drops incident edges (``Graph::removeNode``
    behavior, ``Graph.hpp:1111``).
    """
    e = graph.edges
    key = ["src", "dst"]

    adds = events.where(F.col("etype") == EDGE_ADDITION).select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        F.coalesce("w", F.lit(1.0)).alias("weight"),
    )
    removals = events.where(F.col("etype") == EDGE_REMOVAL).select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    )
    updates = events.where(F.col("etype") == EDGE_WEIGHT_UPDATE).select(
        F.col("u").alias("src"), F.col("v").alias("dst"), F.col("w").alias("new_w")
    )
    increments = (
        events.where(F.col("etype") == EDGE_WEIGHT_INCREMENT)
        .groupBy(F.col("u").alias("src"), F.col("v").alias("dst"))
        .agg(F.sum("w").alias("inc_w"))
    )
    gone_nodes = events.where(F.col("etype") == NODE_REMOVAL).select(
        F.col("u").alias("id")
    )

    merged = e.unionAll(adds)
    merged = merged.join(removals, key, "left_anti")
    merged = merged.join(updates, key, "left").select(
        "src", "dst", F.coalesce("new_w", F.col("weight")).alias("weight")
    )
    merged = merged.join(increments, key, "left").select(
        "src",
        "dst",
        (F.col("weight") + F.coalesce("inc_w", F.lit(0.0))).alias("weight"),
    )
    merged = merged.join(
        gone_nodes.withColumnRenamed("id", "src"), "src", "left_anti"
    ).join(gone_nodes.withColumnRenamed("id", "dst"), "dst", "left_anti")

    vertices = None
    if graph._vertices is not None:
        added_nodes = events.where(F.col("etype") == NODE_ADDITION).select(
            F.col("u").alias("id")
        )
        vertices = (
            graph._vertices.unionAll(added_nodes)
            .join(gone_nodes, "id", "left_anti")
            .distinct()
        )
    return Graph(
        merged.select("src", "dst", "weight"),
        directed=graph.directed,
        weighted=graph.weighted,
        vertices=vertices,
    )


class GraphUpdater:
    """Stateful batch replayer (``GraphUpdater`` analog): holds the
    current snapshot, applies event batches, tracks a snapshot counter —
    the ``foreachBatch`` callable for streaming refresh."""

    def __init__(self, graph: Graph) -> None:
        self.graph = graph
        self.batches_applied = 0

    def update(self, events: DataFrame) -> Graph:
        self.graph = apply_events(self.graph, events)
        self.batches_applied += 1
        return self.graph

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.update(batch_df)


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "json"
) -> DataFrame:
    """Structured Streaming source of graph events (the DGS-file analog:
    a directory of event files consumed incrementally)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .load(path)
    )


def streaming_edge_rate(
    events: DataFrame, window: str = "10 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    """Windowed edge-event counts with late-data tolerance — event-time
    semantics the reference's batch-incremental design lacks."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "etype")
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "etype",
            "events",
        )
    )


def streaming_degree_counts(events: DataFrame, watermark: str = "30 seconds") -> DataFrame:
    """Running out-degree per source vertex over the addition stream
    (update-mode aggregation; state = one long per vertex)."""
    return (
        events.withWatermark("ts", watermark)
        .where(F.col("etype") == EDGE_ADDITION)
        .groupBy(F.col("u").alias("id"))
        .agg(F.count(F.lit(1)).alias("out_deg"))
    )


def streaming_exact_dedup(
    docs: DataFrame,
    key_col: str = "content_hash",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: drop repeated content keys within
    the watermark horizon (state = one row per key, expired by event
    time). The streaming twin of the batch ``doc_exact_dedup`` pipeline —
    ``dropDuplicates`` over a watermarked stream is Spark's built-in
    keyed-state operator, so no custom state function is needed."""
    return docs.withWatermark(ts_col, watermark).dropDuplicates([key_col])


def streaming_component_refresh(
    graph: Graph, events: DataFrame, every_batches: int = 1
):
    """foreachBatch sink wiring: an event stream drives a
    :class:`~networkit_spark.operators.dyncomponents.DynConnectedComponents`
    instance — additions merge labels in O(batch), removals recompute
    only affected components (the Dyn* batch-incremental path of the
    reference, SURVEY §2.10).

    Returns ``(dyn, sink)`` — pass ``sink`` to
    ``events.writeStream.foreachBatch(sink)``; read
    ``dyn.get_partition()`` between batches.
    """
    from networkit_spark.operators.dyncomponents import DynConnectedComponents

    dyn = DynConnectedComponents(graph).run()
    state = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        state["n"] += 1
        if state["n"] % every_batches == 0:
            dyn.update(batch_df)

    return dyn, sink


def streaming_vertex_sessions(
    events: DataFrame,
    gap_seconds: int = 30,
    watermark: str = "1 minute",
) -> DataFrame:
    """Per-vertex activity sessionization — a CUSTOM stateful operator
    via ``applyInPandasWithState`` (the piece of the streaming surface
    Spark's built-ins don't cover; the reference has no analog — its
    dynamics are batch-incremental, SURVEY §2.10).

    Groups the event stream by source vertex ``u``; state per vertex =
    the open session ``(start, last, n_events)``. An event more than
    ``gap_seconds`` after the previous one closes the session and emits
    ``(id, session_start, session_end, events)``; event-time timeout
    flushes sessions whose vertex goes quiet past the watermark. Use on
    crawl/link streams to find vertices with bursty edge churn (hub
    hotspots) without materializing per-event state downstream.
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType, StructField, StructType, TimestampType,
    )

    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
        ]
    )
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (vid,) = key
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "id": [vid],
                        "session_start": [pd.Timestamp(start_us, unit="us")],
                        "session_end": [pd.Timestamp(last_us, unit="us")],
                        "events": [n],
                    }
                )
            return
        ts_us = []
        for pdf in pdf_iter:
            ts_us.extend(
                int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
            )
        ts_us.sort()
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        out = {"id": [], "session_start": [], "session_end": [], "events": []}
        for t in ts_us:
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                out["id"].append(vid)
                out["session_start"].append(pd.Timestamp(start_us, unit="us"))
                out["session_end"].append(pd.Timestamp(last_us, unit="us"))
                out["events"].append(n)
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if out["id"]:
            yield pd.DataFrame(out)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("u")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def graph_from_stream(
    spark, events: DataFrame, weighted: bool = False, directed: bool = False
) -> "Graph":
    """``dynamic.graphFromStream`` (``networkit/dynamic.py:6-22``):
    build a fresh graph by replaying an event stream onto an empty
    graph — node additions populate the tracked vertex set."""
    empty_e = spark.createDataFrame([], "src long, dst long, weight double")
    empty_v = spark.createDataFrame([], "id long")
    g = Graph(empty_e, directed=directed, weighted=weighted, vertices=empty_v)
    return apply_events(g, events)
