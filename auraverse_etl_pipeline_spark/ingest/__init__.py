from auraverse_etl_pipeline_spark.ingest.convert import convert_corpus, convert_document
from auraverse_etl_pipeline_spark.ingest.detect import Fragment, detect_document
from auraverse_etl_pipeline_spark.ingest.normalize import normalize_fragment
from auraverse_etl_pipeline_spark.ingest.pipeline import (
    FRAGMENT_SCHEMA,
    RECORD_SCHEMA,
    SCHEMA_FIELD_SCHEMA,
    consolidated_schema,
    detect_fragments,
    extract_records,
    infer_schema_fields,
    normalize_fragments,
    summarize_fragments,
)
from auraverse_etl_pipeline_spark.ingest.schema_infer import fields_for_data, flatten_record

__all__ = [
    "Fragment",
    "detect_document",
    "normalize_fragment",
    "convert_document",
    "convert_corpus",
    "FRAGMENT_SCHEMA",
    "RECORD_SCHEMA",
    "SCHEMA_FIELD_SCHEMA",
    "consolidated_schema",
    "detect_fragments",
    "extract_records",
    "infer_schema_fields",
    "normalize_fragments",
    "summarize_fragments",
    "fields_for_data",
    "flatten_record",
]
