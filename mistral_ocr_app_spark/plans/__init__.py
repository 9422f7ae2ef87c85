from .lineage import (  # noqa: F401
    bucket_expr,
    committed_buckets,
    lineage_rows,
    run_extraction_with_lineage,
)
