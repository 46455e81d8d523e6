from auraverse_etl_pipeline_spark.plans.registry import QueryDef, all_queries, query

__all__ = ["QueryDef", "all_queries", "query"]
