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


def temperature_rates(
    counts: dict[str, int],
    target_rows: int,
    temperature: float = 2.0,
    scale: int = 1_000_000,
) -> dict[str, tuple[int, int]]:
    """Per-source keep rates implementing multinomial temperature
    sampling (the standard training-mix policy, e.g. multilingual LM
    data): target share of source s ∝ count_s^(1/T). T=1 keeps natural
    proportions; T→∞ approaches uniform across sources; T<1 sharpens
    toward the head sources.

    Pure driver arithmetic on the KB-sized count rollup. Rates are
    quantised to ``1/scale`` so the keep decision downstream is exact
    integer arithmetic; the derivation is plain double math over SORTED
    source keys, so any engine reproducing this formula (sum order
    fixed by the sort) computes identical rates."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    items = sorted(counts.items())
    weights = [(s, float(c) ** (1.0 / temperature)) for s, c in items]
    total_w = 0.0
    for _, w in weights:  # fixed (sorted) accumulation order
        total_w += w
    rates: dict[str, tuple[int, int]] = {}
    for (s, c), (_, w) in zip(items, weights):
        if c <= 0 or total_w <= 0:
            rates[s] = (0, scale)
            continue
        frac = (w / total_w) * target_rows / c  # fraction of s to keep
        num = min(scale, int(frac * scale))
        rates[s] = (num, scale)
    return rates


def temperature_mix(
    df: DataFrame,
    target_rows: int,
    temperature: float = 2.0,
    group_col: str = "source",
    id_col: str = "doc_id",
    method: str = "hash",
    scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic temperature-mixed sample: compute the per-source
    count rollup (one map-combined groupBy — the only corpus pass),
    derive ``temperature_rates`` on the driver, and apply them as a
    zero-shuffle filter expression via :func:`stratified_sample`.
    Approximate in expectation (systematic/hash sampling, not exact
    quotas); for exact per-source caps use ``text.source_mix``.

    With ``method="mod"`` choose ``scale`` ≤ the id range: the keep test
    is ``id % scale < num``, so a scale larger than the ids keeps
    everything below the quantised rate boundary."""
    counts = {
        r[group_col]: r["n"]
        for r in df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r[group_col] is not None
    }
    rates = temperature_rates(counts, target_rows, temperature, scale)
    return stratified_sample(
        df, rates, default_rate=(0, 1), group_col=group_col,
        id_col=id_col, method=method,
    )
