from lucene_mapreduce_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schemas,
)

__all__ = ["explain_str", "has_broadcast_join", "pushed_filters", "read_schemas"]
