"""``df.genson.*`` accessor — API parity with the reference's polars
DataFrame namespace (reference
polars-genson-py/python/polars_genson/__init__.py:765-1218, the
``GensonNamespace`` registered via ``register_dataframe_namespace``).

PySpark has no extension-namespace registry, so
:func:`register_genson_namespace` attaches a ``genson`` property to
``pyspark.sql.DataFrame`` once (idempotent); it is called on package
import so ``import polars_genson_spark`` is enough — exactly how the
reference behaves on ``import polars_genson``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


class GensonNamespace:
    """JSON schema inference operations, reachable as ``df.genson``."""

    def __init__(self, df: DataFrame):
        self._df = df

    def schema_to_json(self) -> str:
        """This DataFrame's own schema as the reference's JSON dtype
        serialisation (reference ``df.genson.schema_to_json()``)."""
        from .functions.dtypes import schema_to_json

        return schema_to_json(self._df.schema)

    def schema_to_dict(self) -> dict:
        from .functions.dtypes import schema_to_dict

        return schema_to_dict(self._df.schema)

    @staticmethod
    def _cfg(kwargs: dict):
        """Reference namespace methods take config knobs as kwargs
        (map_threshold=..., unify_maps=..., wrap_root=...); fold them
        into an InferenceConfig, passing through an explicit config=.
        Reference-only diagnostics (debug/profile/verbosity) are
        accepted and ignored, like the CLI; merge_schemas is handled by
        the callers (it changes the output shape)."""
        from .config import InferenceConfig

        # strip the ignored diagnostics BEFORE the explicit-config early
        # return: config= plus debug=True used to leave 'debug' behind
        # for _reject_unknown to TypeError on, contradicting the
        # 'accepted and ignored' contract above
        for diag in ("debug", "profile", "verbosity"):
            kwargs.pop(diag, None)
        if "config" in kwargs:
            return kwargs.pop("config")
        cfg_fields = {f for f in InferenceConfig.__dataclass_fields__}
        cfg_kw = {k: kwargs.pop(k) for k in list(kwargs) if k in cfg_fields}
        return InferenceConfig(**cfg_kw)

    @staticmethod
    def _reject_unknown(kwargs: dict, allowed: tuple = ()) -> None:
        """A typo'd knob must not silently fall back to defaults."""
        unknown = [k for k in kwargs if k not in allowed]
        if unknown:
            raise TypeError(f"unknown keyword argument(s): {unknown}")

    def infer_json_schema(self, column: str, **kwargs: Any):
        """Merged JSON Schema of a JSON-string column (reference
        ``df.genson.infer_json_schema``). ``merge_schemas=False`` is the
        reference's per-row mode — Spark-idiomatically that returns the
        per-row schema DataFrame (collecting a row-per-doc python list
        would not survive corpus scale)."""
        from .operators.infer import (
            infer_json_schema,
            infer_json_schema_per_row,
        )

        merge = kwargs.pop("merge_schemas", True)
        cfg = self._cfg(kwargs)
        self._reject_unknown(kwargs)
        if not merge:
            return infer_json_schema_per_row(self._df, column, cfg)
        return infer_json_schema(self._df, column, cfg).schema

    def infer_spark_schema(self, column: str, **kwargs: Any):
        """StructType (the reference's ``infer_polars_schema``)."""
        from .operators.infer import infer_spark_schema

        if kwargs.pop("merge_schemas", True) is False:
            raise ValueError(
                "merge_schemas=False: use infer_json_schema(..., "
                "merge_schemas=False) for the per-row schema DataFrame"
            )
        cfg = self._cfg(kwargs)
        self._reject_unknown(kwargs)
        return infer_spark_schema(self._df, column, cfg)

    # reference-compatible alias
    infer_polars_schema = infer_spark_schema

    def normalise_json(self, column: str, **kwargs: Any) -> DataFrame:
        """Reference kwarg surface: config knobs plus empty_as_null /
        coerce_strings / map_encoding (NormaliseConfig) and decode /
        unnest / output_col passthrough."""
        from .config import NormaliseConfig
        from .operators.normalise_op import normalise_json

        cfg = self._cfg(kwargs)
        norm_kw = {}
        if "empty_as_null" in kwargs:
            norm_kw["empty_as_null"] = kwargs.pop("empty_as_null")
        if "coerce_strings" in kwargs:  # reference spells it plural
            norm_kw["coerce_string"] = kwargs.pop("coerce_strings")
        if "map_encoding" in kwargs:
            norm_kw["map_encoding"] = kwargs.pop("map_encoding")
        norm = NormaliseConfig(wrap_root=cfg.wrap_root, **norm_kw)
        self._reject_unknown(
            kwargs, allowed=("decode", "unnest", "output_col", "avro_schema")
        )
        kwargs.setdefault("decode", True)  # reference namespace default
        return normalise_json(self._df, column, cfg, norm, **kwargs)


def register_genson_namespace() -> None:
    """Attach ``DataFrame.genson`` (idempotent)."""
    if getattr(DataFrame, "_genson_registered", False):
        return
    DataFrame.genson = property(GensonNamespace)  # type: ignore[attr-defined]
    DataFrame._genson_registered = True  # type: ignore[attr-defined]
