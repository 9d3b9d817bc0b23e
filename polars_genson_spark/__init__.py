"""polars_genson_spark — a PySpark-native schema-inference and constraint
validation engine with the capabilities of lmmx/polars-genson, generalised
to large-scale pre-tokenized training corpora.

Public API (mirrors the reference's entry points, SURVEY.md §2.9):

- infer_json_schema(df, col, config)      — merged JSON Schema
- infer_spark_schema(df, col, config)     — pyspark StructType
- normalise_json(df, col, ...)            — schema-enforced JSON column
- validate_corpus(df, ...)                — per-partition verdicts + violations
"""

from .config import InferenceConfig, NormaliseConfig, ValidationConfig
from .functions.dtypes import (
    avro_to_spark_schema,
    json_to_schema,
    parse_dtype,
    schema_to_dict,
    schema_to_json,
)
from .operators.incremental import (
    infer_incremental,
    infer_json_schema_by_group,
)
from .operators.infer import (
    InferenceResult,
    SchemaInferenceError,
    infer_json_schema,
    infer_json_schema_per_row,
    infer_spark_schema,
)
from .operators.normalise_op import normalise_json, normalise_json_with_result
from .session import get_spark
from .sources.parquet_io import (
    infer_from_parquet,
    normalise_from_parquet,
    read_parquet_metadata,
)

__all__ = [
    "InferenceConfig",
    "NormaliseConfig",
    "ValidationConfig",
    "InferenceResult",
    "SchemaInferenceError",
    "infer_json_schema",
    "infer_json_schema_per_row",
    "infer_json_schema_by_group",
    "infer_incremental",
    "infer_spark_schema",
    "normalise_json",
    "normalise_json_with_result",
    "infer_from_parquet",
    "normalise_from_parquet",
    "read_parquet_metadata",
    "get_spark",
    "schema_to_json",
    "json_to_schema",
    "schema_to_dict",
    "avro_to_spark_schema",
    "parse_dtype",
]

__version__ = "0.1.0"

# df.genson.* accessor, like the reference's import-time registration
from .namespace import GensonNamespace, register_genson_namespace  # noqa: E402

register_genson_namespace()
__all__ += ["GensonNamespace", "register_genson_namespace"]

_SUBPACKAGES = ("sources", "operators", "functions", "streaming", "plans")


def __getattr__(name):
    # lazy subpackage access (PEP 562): pgs.streaming / pgs.plans resolve
    # on first touch without widening the eager import graph above
    if name in _SUBPACKAGES:
        import importlib

        return importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(list(globals()) + list(_SUBPACKAGES) + __all__))
