from mr_crawly_spark.functions.urls import (  # noqa: F401
    canonicalize_pairs,
    canonicalize_udf,
    canonicalize_url,
    url_hash_col,
    url_host_col,
)
