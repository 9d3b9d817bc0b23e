"""polars_genson_spark.sources — lazy submodule access (PEP 562) so
``pgs.sources.corpus`` works without paying every reader's import cost."""

_SUBMODULES = ("bucketing", "catalog", "corpus", "parquet_io")


def __getattr__(name):
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
