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

import math

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
        # fail loud on non-integral id columns: cast('long') of a string
        # id like 'm-000001' is NULL (non-ANSI), pmod(NULL, d) is NULL,
        # and where(NULL) would silently drop EVERY row
        id_type = df.schema[id_col].dataType.simpleString()
        if id_type not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"method='mod' needs an integral id column; {id_col!r} "
                f"is {id_type} — use method='hash'"
            )
        # NULL ids fall to key 0 (kept at any nonzero rate), matching
        # 'hash' where xxhash64(NULL) is a constant — not silently dropped
        key = F.coalesce(F.col(id_col).cast("long"), F.lit(0))
    else:
        raise ValueError(f"unknown method {method!r} (use 'hash' or 'mod')")
    for group, (n, d) in [*rates.items(), ("<default>", default_rate)]:
        # fail loud: pmod(key, 0) is NULL under non-ANSI Spark, and
        # where(NULL) would silently drop the whole group
        if d <= 0 or n < 0:
            raise ValueError(
                f"rate for {group!r} must have denom > 0 and num >= 0, "
                f"got ({n}, {d})"
            )

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
        if num == 0 and frac > 0:
            # a keep fraction below 1/scale would floor to (0, scale)
            # and silently EXCLUDE the source (a huge head source can
            # legitimately owe most of the target at a tiny fraction);
            # keep it at its exact reciprocal rate instead — the same
            # closed-form both engines reproduce (ceil of a double)
            rates[s] = (1, int(math.ceil(1.0 / frac)))
        else:
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


def shuffle_key(id_col: str = "doc_id", seed: int = 0) -> Column:
    """Engine-portable pseudo-random sort key: ``md5("<seed>:<id>")``.

    md5 is md5 in every engine (unlike xxhash64, whose seed/variant is
    Spark-specific), so the induced order is bit-reproducible by the
    DuckDB oracle, by a downstream reader re-deriving epoch order, and
    by a re-run on different partitioning. Changing ``seed`` yields an
    independent permutation (different epochs shuffle differently).

    NULL ids yield a NULL key (``concat`` null-propagates, matching
    SQL's ``||``): they sort together under ``deterministic_shuffle``
    and fall through every threshold in ``split_corpus`` to its LAST
    split — the same behavior a SQL engine's CASE gives, so the
    engine-portability contract holds for NULLs too."""
    return F.md5(
        F.concat(
            F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string")
        )
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Seeded, partition-layout-independent GLOBAL shuffle for training
    order randomization (every LM pipeline's last step before writing
    epoch shards).

    Scale shape: ``repartitionByRange`` on the md5 key + in-partition
    sort — a single range exchange producing a total order across
    output files (file i holds keys below file i+1's), with NO
    single-partition window/zipWithIndex bottleneck. Writing the result
    preserves the order in the shard layout, so readers stream the
    corpus in shuffled order for free."""
    out = df.withColumn("_shuffle_key", shuffle_key(id_col, seed))
    cols = [F.col("_shuffle_key"), F.col(id_col)]
    # `is not None`, not truthiness: an (invalid) explicit 0 must reach
    # repartitionByRange's own error, not silently become the default
    ranged = (
        out.repartitionByRange(num_partitions, *cols)
        if num_partitions is not None
        else out.repartitionByRange(*cols)  # spark.sql.shuffle.partitions
    )
    return ranged.sortWithinPartitions("_shuffle_key", id_col).drop(
        "_shuffle_key"
    )


def split_corpus(
    df: DataFrame,
    weights: dict[str, int] | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic hash-based train/val/test assignment.

    Each row's bucket is the first 8 hex chars of ``md5("<seed>:<id>")``
    — uniform over [0, 16^8) — compared against cumulative thresholds
    derived from ``weights`` by exact integer math. Properties a
    training pipeline needs and RNG splits don't give:

    - stable: a doc's split never changes with partitioning, cluster
      size, or row order (no RNG state, no zipWithIndex);
    - disjoint + exhaustive by construction (chained half-open ranges);
    - engine-portable: the oracle (or a feature store in another stack)
      recomputes the same assignment from the same formula;
    - zero-shuffle: pure codegen column expression.

    ``weights`` e.g. ``{"train": 98, "val": 1, "test": 1}`` (the
    default). Split names are processed in sorted order so the
    name→range mapping is itself deterministic."""
    if weights is None:
        weights = {"train": 98, "val": 1, "test": 1}
    # an explicit {} is an error, not a request for the default — only
    # None opts into 98/1/1. Weights must be INTEGERS: floats would pass
    # a >0 check and then crash format(float, '08x') with an unrelated
    # error (use {'train': 98, 'val': 1}, not {'train': 0.98, ...})
    if not weights or any(
        not isinstance(w, int) or isinstance(w, bool) or w <= 0
        for w in weights.values()
    ):
        raise ValueError(
            f"weights must be positive integers, got {weights!r}"
        )
    total = sum(weights.values())
    key8 = F.substring(shuffle_key(id_col, seed), 1, 8)
    items = sorted(weights.items())
    expr = None
    acc = 0
    for name, w in items[:-1]:
        acc += w
        threshold = format((acc * 16**8) // total, "08x")
        cond = key8 < F.lit(threshold)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = items[-1][0]
    assigned = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, assigned)
