from networkit_spark.sources.pages import synthetic_pages  # noqa: F401
from networkit_spark.sources.linkgraph import (  # noqa: F401
    assign_dense_ids,
    build_link_graph,
    latest_pages,
    links_to_edges,
    pages_to_links,
)
