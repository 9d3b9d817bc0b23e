"""Deterministic stratified sampling for training-data curation.

Per-stratum sampling with rates that differ by group (down-weight a
dominant crawl source, keep all of a rare high-quality source). Two
methods, both partition-layout-independent (no RNG state, no
zipWithIndex):

- ``hash``: keep rows where ``pmod(xxhash64(id), denom) < num`` — the
  scale default; the hash decorrelates the sample from any id structure.
- ``mod``:  keep rows where ``pmod(id, denom) < num`` — systematic
  sampling on the raw id; fully reproducible by any SQL engine (used by
  the driver oracle), biased iff ids correlate with content.

Rates are (numerator, denominator) integer pairs so the decision is exact
integer arithmetic, not float comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    rates: dict[str, tuple[int, int]],
    default_rate: tuple[int, int] = (1, 1),
    group_col: str = "source",
    id_col: str = "doc_id",
    method: str = "hash",
) -> DataFrame:
    """Keep a deterministic per-group fraction of rows.

    ``rates``: {group: (num, denom)} — keep num/denom of that group.
    Groups not listed use ``default_rate``. The keep decision is a pure
    column expression (whole-stage codegen, no shuffle, no RNG)."""
    if method == "hash":
        key: Column = F.xxhash64(F.col(id_col))
    elif method == "mod":
        key = F.col(id_col).cast("long")
    else:
        raise ValueError(f"unknown method {method!r} (use 'hash' or 'mod')")

    keep = None
    num, den = default_rate
    default_keep = F.pmod(key, F.lit(den)) < F.lit(num)
    for group, (n, d) in rates.items():
        cond = (F.col(group_col) == group) & (
            F.pmod(key, F.lit(d)) < F.lit(n)
        )
        keep = cond if keep is None else keep | cond
    # null-safe: isin() is NULL for a NULL group, and NULL would poison
    # the (listed & keep) | (~listed & default_keep) combination below —
    # silently dropping every null-group row even at default_rate=(1,1).
    # Coalesce to False so null groups fall through to the default rate.
    listed = (
        F.coalesce(
            F.col(group_col).isin(list(rates.keys())), F.lit(False)
        )
        if rates
        else F.lit(False)
    )
    final = (
        (listed & keep) | (~listed & default_keep)
        if keep is not None
        else default_keep
    )
    return df.where(final)
