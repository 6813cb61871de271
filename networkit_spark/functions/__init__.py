from networkit_spark.functions.extraction import (  # noqa: F401
    EXTRACTOR_VERSION,
    extract_links_udf,
    extract_text_udf,
    normalize_url_col,
)
