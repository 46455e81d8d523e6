from auraverse_etl_pipeline_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    read_text_corpus,
    register_views,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "read_text_corpus",
    "register_views",
]
