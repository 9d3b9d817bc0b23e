"""Incremental schema-inference maintenance: the mergeable-summary monoid
as persistent state.

The per-partition summary (functions/summary.py) is associative and
count-insensitive for schema purposes, so inference over a growing
dataset never needs to rescan old files: fold ONLY the new files, merge
with the stored per-file summaries, re-derive the schema. State is a
JSON sidecar of {file → summary} — KB-sized per file, independent of row
count — so a 100 TB corpus that grows by one partition per hour pays one
partition of work per hour, not a full rescan.

This is the engine-native generalisation of the reference's incremental
builder (genson-rs folds docs into one SchemaBuilder in memory;
schema.rs:240-280): here the fold state is durable and distributed-
mergeable across job runs.

Per-group inference (``infer_json_schema_by_group``) runs the same fold
keyed by a group column via ``applyInPandas`` — one schema per group in
a single shuffle, the groupwise face of the monoid.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import InferenceConfig
from ..functions import summary as S
from ..functions.rewrite import postprocess_schema
from .infer import (
    SchemaInferenceError,
    _apply_schema_uri,
    partition_summaries,
)

STATE_NAME = "_schema_state.json"


@dataclass
class IncrementalResult:
    schema: dict[str, Any]
    processed_count: int
    new_files: list[str] = field(default_factory=list)
    reused_files: list[str] = field(default_factory=list)


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, STATE_NAME)


def load_state(state_dir: str) -> dict[str, Any]:
    p = _state_path(state_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"files": {}}


def save_state(state_dir: str, state: dict[str, Any]) -> str:
    os.makedirs(state_dir, exist_ok=True)
    p = _state_path(state_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, p)  # atomic: readers never see a torn state file
    return p


def _list_parquet_files(spark: SparkSession, path: str) -> list[str]:
    """Distinct file names backing ``path`` (via the input_file_name of a
    zero-row-cost metadata scan)."""
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("f")
    ).distinct()
    return sorted(r["f"] for r in df.collect())


def infer_incremental(
    spark: SparkSession,
    input_path: str,
    state_dir: str,
    column: str,
    config: InferenceConfig | None = None,
) -> IncrementalResult:
    """Infer the merged schema of ``column`` over ``input_path``,
    folding ONLY files not present in the state (monoid property: the
    global schema is the merge of per-file summaries in file order).

    Files that disappeared from the input since the last run are dropped
    from the state — the schema always reflects exactly the current file
    set without any rescan of surviving files."""
    config = config or InferenceConfig()
    state = load_state(state_dir)
    # stored per-file summaries depend on the InferenceConfig
    # (ignore_outer_array / max_builders change what _observe_cell folds),
    # so state written under different rules — or under no recorded rules
    # at all — must be discarded and every file re-folded, exactly like
    # checkpoint.plan_resume invalidates skips on a config_fp change
    from ..checkpoint import config_fingerprint

    cfg_fp = config_fingerprint(config)
    if state.get("config_fp") != cfg_fp:
        state = {"files": {}, "config_fp": cfg_fp}
    current = _list_parquet_files(spark, input_path)
    known = state["files"]

    new_files = [f for f in current if f not in known]
    reused = [f for f in current if f in known]

    for f in new_files:
        df = spark.read.parquet(f).select(column)
        parts = partition_summaries(df, column, config)
        err = next((p["error"] for p in parts if p["error"]), None)
        if err:
            raise SchemaInferenceError(err)
        node = S.new_summary()
        for p in parts:  # pid order: deterministic
            S.merge(node, p["summary"])
        known[f] = {
            "summary": node,
            "processed": sum(p["processed"] for p in parts),
        }

    # drop state for files no longer present
    for f in list(known):
        if f not in set(current):
            del known[f]

    merged = S.new_summary()
    processed = 0
    seen: set[str] = set()  # A6 dedup applies across files too
    for f in current:  # stable file order ⇒ deterministic merge
        entry = known[f]
        processed += int(entry["processed"])
        key = S.summary_key(entry["summary"])
        if key in seen:
            continue
        seen.add(key)
        S.merge(merged, json.loads(json.dumps(entry["summary"])))

    if processed == 0:
        raise SchemaInferenceError("No JSON documents found to process")

    schema = S.to_schema(merged)
    postprocess_schema(schema, config)
    schema = _apply_schema_uri(schema, config)
    save_state(state_dir, state)
    return IncrementalResult(
        schema=schema,
        processed_count=processed,
        new_files=new_files,
        reused_files=reused,
    )


def infer_json_schema_by_group(
    df: DataFrame,
    column: str,
    group_col: str,
    config: InferenceConfig | None = None,
) -> DataFrame:
    """One merged JSON Schema per group: (group, schema_json, processed).

    Two-level fold, NOT a whole-group ``applyInPandas`` (which would
    materialise each group's rows in one pandas frame — unbounded at
    scale): a partition-local fold emits one (group, summary) row per
    group per partition, then the per-group merge runs over those
    KB-sized summaries only. The shuffle carries summaries, never
    documents — the groupwise face of ``infer_json_schema``."""
    cfg = config or InferenceConfig()

    def partial_fold(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from .infer import _observe_cell

        nodes: dict[Any, dict] = {}
        counts: dict[Any, int] = {}
        errors: dict[Any, str | None] = {}
        for pdf in batches:
            for grp, cell in zip(pdf[group_col], pdf[column]):
                if errors.get(grp) is not None:
                    continue
                node = nodes.setdefault(grp, S.new_summary())
                try:
                    if _observe_cell(node, cell, cfg, counts.get(grp, 0)):
                        counts[grp] = counts.get(grp, 0) + 1
                except SchemaInferenceError as e:
                    errors[grp] = str(e)
        if nodes:
            yield pd.DataFrame(
                {
                    "group": list(nodes),
                    "summary": [json.dumps(nodes[g]) for g in nodes],
                    "processed": [counts.get(g, 0) for g in nodes],
                    "error": [errors.get(g) for g in nodes],
                }
            )

    partials = df.select(F.col(group_col), F.col(column)).mapInPandas(
        partial_fold,
        schema="group string, summary string, processed long, error string",
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        node = S.new_summary()
        processed = 0
        error = None
        seen: set[str] = set()  # A6 dedup across partitions
        for _, row in pdf.sort_values("summary").iterrows():
            if error is None and row["error"]:
                error = row["error"]
            processed += int(row["processed"])
            parsed = json.loads(row["summary"])
            key = S.summary_key(parsed)
            if key not in seen:
                seen.add(key)
                S.merge(node, parsed)
        if error is not None:
            schema_json = None
        else:
            schema = S.to_schema(node)
            postprocess_schema(schema, cfg)
            schema = _apply_schema_uri(schema, cfg)
            schema_json = json.dumps(schema, sort_keys=True)
        return pd.DataFrame(
            {
                "group": [pdf["group"].iloc[0]],
                "schema_json": [schema_json],
                "processed": [processed],
                "error": [error],
            }
        )

    out = partials.groupBy("group").applyInPandas(
        merge_group,
        schema="group string, schema_json string, processed long, "
        "error string",
    )
    return out.withColumnRenamed("group", group_col)


def schema_drift(
    df: DataFrame,
    column: str,
    window_col: str,
    config: InferenceConfig | None = None,
) -> DataFrame:
    """Field-level schema drift between consecutive windows: one merged
    schema per window (the two-level summary fold — the shuffle carries
    KB summaries, never documents), then adjacent windows' property maps
    diff driver-side (schemas are KB rollups; |windows| rows total).

    Returns one row per window AFTER the first:
    (window, added, removed, changed) — field names that appeared,
    vanished, or changed their inferred type vs the previous window.
    The monitoring face of schema inference: a producer silently adding
    a field or widening int→string shows up as a named diff, not a
    downstream parse failure.
    """
    per = infer_json_schema_by_group(df, column, window_col, config)
    rows = sorted(
        (r[window_col], r["schema_json"]) for r in per.collect()
    )
    out = []
    prev_props: dict | None = None
    for w, sj in rows:
        if sj is None:
            # this window's inference errored (by_group isolates per-group
            # failures as schema_json=None) — surface it as an all-null
            # diff row rather than crashing, and keep the last GOOD
            # window as the baseline for the next good one
            out.append((str(w), None, None, None))
            continue
        props = json.loads(sj).get("properties", {}) or {}
        if prev_props is not None:
            added = sorted(set(props) - set(prev_props))
            removed = sorted(set(prev_props) - set(props))
            changed = sorted(
                k
                for k in set(props) & set(prev_props)
                if props[k] != prev_props[k]
            )
            out.append((str(w), added, removed, changed))
        prev_props = props
    schema = (
        "window string, added array<string>, removed array<string>, "
        "changed array<string>"
    )
    return df.sparkSession.createDataFrame(out, schema)
