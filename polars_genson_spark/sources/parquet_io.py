"""File-level parquet entry points with KV metadata (reference parity).

Mirrors the reference's file-level API surface
(/root/reference/polars-genson-py/src/parquet_io.rs:32-125, 153-288 and
/root/reference/genson-core/src/parquet.rs:27-199):

- ``infer_from_parquet``: read one string column, infer schema.
- ``normalise_from_parquet``: infer once (Avro forced), normalise every
  row, write parquet stamped with ``genson_avro_schema`` +
  ``genson_normalise_config`` metadata.
- ``read_parquet_metadata``: return the stamped KV metadata.

Metadata placement: the reference embeds KV pairs in the parquet file
footer (parquet.rs:126-188). For a single output file we do exactly that
via pyarrow. For a directory written by Spark (the scale path — many part
files) the same pairs go to a ``_genson_metadata.json`` sidecar in the
directory, the distributed-friendly equivalent (an Iceberg deployment
would use table properties instead); ``read_parquet_metadata`` checks the
footer first, then the sidecar.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..config import InferenceConfig, NormaliseConfig
from ..operators.infer import InferenceResult, infer_json_schema

METADATA_SCHEMA_KEY = "genson_avro_schema"
METADATA_CONFIG_KEY = "genson_normalise_config"
SIDECAR_NAME = "_genson_metadata.json"


def infer_from_parquet(
    spark: SparkSession,
    path: str,
    column: str,
    config: InferenceConfig | None = None,
) -> InferenceResult:
    """Infer the merged schema of one string column of a parquet file/dir.

    Only ``column`` is scanned (Catalyst column pruning reaches the
    footer), matching the reference's single-column read
    (parquet.rs:27-115)."""
    df = spark.read.parquet(path).select(column)
    return infer_json_schema(df, column, config or InferenceConfig())


def _norm_config_dict(norm: NormaliseConfig) -> dict[str, Any]:
    return {
        "empty_as_null": norm.empty_as_null,
        "coerce_string": norm.coerce_string,
        "map_encoding": norm.map_encoding,
        "wrap_root": norm.wrap_root,
    }


def normalise_from_parquet(
    spark: SparkSession,
    input_path: str,
    column: str,
    output_path: str,
    config: InferenceConfig | None = None,
    norm: NormaliseConfig | None = None,
    single_file: bool = False,
) -> InferenceResult:
    """Normalise ``column`` of ``input_path`` against its own inferred
    (Avro) schema and write to ``output_path`` with stamped metadata.

    ``single_file=True`` writes ONE parquet file via pyarrow with the
    metadata in the footer (byte-level parity with parquet.rs:126-188) —
    driver-side collect, only for small outputs. Default writes a Spark
    parquet directory + sidecar (the 100 TB path: no collect)."""
    from ..operators.normalise_op import normalise_json

    config = config or InferenceConfig()
    norm = norm or NormaliseConfig(wrap_root=config.wrap_root)

    avro_cfg = dataclasses.replace(config, avro=True)
    df = spark.read.parquet(input_path)
    res = infer_json_schema(df, column, avro_cfg)
    out = normalise_json(
        df, column, config=config, norm=norm, avro_schema=res.schema
    )

    meta = {
        METADATA_SCHEMA_KEY: json.dumps(res.schema, separators=(",", ":")),
        METADATA_CONFIG_KEY: json.dumps(
            _norm_config_dict(norm), separators=(",", ":")
        ),
    }

    if single_file:
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.Table.from_pandas(out.toPandas())
        existing = table.schema.metadata or {}
        table = table.replace_schema_metadata(
            {**existing, **{k.encode(): v.encode() for k, v in meta.items()}}
        )
        pq.write_table(table, output_path)
    else:
        out.write.mode("overwrite").parquet(output_path)
        # remote-safe: a local open() here would crash on s3a://... AFTER
        # the expensive distributed write completed
        write_sidecar_metadata(output_path, meta, spark=spark)
    return res


def write_sidecar_metadata(
    path: str, meta: dict[str, str], spark: SparkSession | None = None
) -> None:
    """Stamp KV metadata on a Spark-written parquet directory via the
    sidecar file that :func:`read_parquet_metadata` understands. Pass
    ``spark`` so remote directories (s3a://, hdfs://) write through the
    Hadoop FileSystem."""
    from .. import fsutil

    fsutil.write_text(
        spark,
        path.rstrip("/") + "/" + SIDECAR_NAME,
        json.dumps(
            {str(k): str(v) for k, v in meta.items()}, indent=2
        ),
    )


def read_parquet_metadata(
    path: str, spark: SparkSession | None = None
) -> dict[str, str]:
    """Return user KV metadata stamped on ``path`` (reference
    parquet.rs:190-199): parquet footer for a single file, sidecar for a
    Spark-written directory. Pass ``spark`` for remote paths."""
    from .. import fsutil

    if fsutil.is_remote(path):
        text = fsutil.read_text(
            spark, path.rstrip("/") + "/" + SIDECAR_NAME
        )
        if text is not None:
            return {str(k): str(v) for k, v in json.loads(text).items()}
        return {}
    if os.path.isdir(path):
        sidecar = os.path.join(path, SIDECAR_NAME)
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                return {str(k): str(v) for k, v in json.load(f).items()}
        return {}
    import pyarrow.parquet as pq

    md = pq.read_schema(path).metadata or {}
    out = {}
    for k, v in md.items():
        key = k.decode() if isinstance(k, bytes) else str(k)
        if key.startswith("genson_"):
            out[key] = v.decode() if isinstance(v, bytes) else str(v)
    return out
