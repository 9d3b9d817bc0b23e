"""polars_genson_spark.operators — lazy submodule access (PEP 562) so
``pgs.operators.verdicts`` etc. work without importing every operator."""

_SUBMODULES = (
    "checks", "decontaminate", "dedup", "incremental", "infer",
    "multimodal", "normalise_op", "quality_model", "relational", "sample", "similarity",
    "stats", "text", "verdicts",
)


def __getattr__(name):
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
