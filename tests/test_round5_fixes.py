"""Round-5 regression tests: the ADVICE r04 findings.

1. fsutil.write_text/read_text must REFUSE a remote URI with spark=None
   (previously: silent local write to a literal "s3a:" directory).
2. fsutil.delete_partition_dirs — the dynamic-partition-overwrite
   stale-violation fix's primitive (Hive unescape + matched delete).
3. jobs.run_validation: a revalidated source that is now CLEAN must not
   leave its stale violations.parquet partition behind (dynamic overwrite
   only rewrites partitions present in the written data).
4. incremental: per-file attribution keys survive URL-encoding
   divergence between input_file_name() and inputFiles() (paths with
   spaces), instead of silently folding an empty summary.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from polars_genson_spark import fsutil
from polars_genson_spark.config import ValidationConfig
from polars_genson_spark.fsutil import _unescape_hive, delete_partition_dirs
from polars_genson_spark.jobs import run_validation
from polars_genson_spark.operators.incremental import infer_incremental


# ---------------------------------------------------------------------------
# 1. remote URI + spark=None must raise, not silently take the local path
# ---------------------------------------------------------------------------


def test_write_text_remote_requires_spark(tmp_path):
    with pytest.raises(ValueError, match="requires a SparkSession"):
        fsutil.write_text(None, "s3a://bucket/run/manifest.json", "{}")
    # and nothing was written locally (the old bug created ./s3a:/...)
    assert not os.path.exists("s3a:")


def test_read_text_remote_requires_spark():
    with pytest.raises(ValueError, match="requires a SparkSession"):
        fsutil.read_text(None, "hdfs://nn/run/manifest.json")


def test_local_paths_still_work_without_spark(tmp_path):
    p = str(tmp_path / "note.txt")
    fsutil.write_text(None, p, "hello")
    assert fsutil.read_text(None, p) == "hello"


# ---------------------------------------------------------------------------
# 2. Hive partition-dir unescape + targeted delete
# ---------------------------------------------------------------------------


def test_unescape_hive():
    assert _unescape_hive("plain") == "plain"
    assert _unescape_hive("a%20b") == "a b"
    assert _unescape_hive("x%3Ay%2Fz") == "x:y/z"
    # malformed escapes pass through untouched
    assert _unescape_hive("100%zz") == "100%zz"
    assert _unescape_hive("tail%2") == "tail%2"


def test_delete_partition_dirs_local(tmp_path):
    base = tmp_path / "violations.parquet"
    for d in ("source=web-01", "source=a%20b", "source=__HIVE_DEFAULT_PARTITION__", "source=keep"):
        (base / d).mkdir(parents=True)
        (base / d / "part-0.parquet").write_bytes(b"x")
    deleted = delete_partition_dirs(
        None, str(base), "source", ["web-01", "a b", None]
    )
    assert sorted(deleted) == [
        "source=__HIVE_DEFAULT_PARTITION__",
        "source=a%20b",
        "source=web-01",
    ]
    assert sorted(os.listdir(base)) == ["source=keep"]
    # idempotent on a now-absent set / absent base dir
    assert delete_partition_dirs(None, str(base), "source", ["web-01"]) == []
    assert delete_partition_dirs(
        None, str(tmp_path / "missing"), "source", ["x"]
    ) == []


def test_parquet_sizes_remote_recursive(spark, tmp_path):
    """Hadoop globStatus has no recursive '**': a remote directory
    partitioned 2+ levels deep returned (0, 0) and downstream sized the
    write at max(1, 0) partitions. The listFiles(recursive) rewrite must
    see depth-2 files through the file:// (remote-branch) scheme."""
    base = tmp_path / "deep"
    for split in ("train", "val"):
        d = base / f"split={split}" / "source=web"
        d.mkdir(parents=True)
        (d / "part-0.parquet").write_bytes(b"0123456789")
    n, total = fsutil.parquet_sizes(spark, f"file://{base}")
    assert n == 2 and total == 20
    # local branch agrees
    assert fsutil.parquet_sizes(spark, str(base)) == (2, 20)
    # absent dir → (0, 0), not an exception
    assert fsutil.parquet_sizes(spark, f"file://{tmp_path}/nope") == (0, 0)


# ---------------------------------------------------------------------------
# 3. revalidated-clean source clears its stale violations partition
# ---------------------------------------------------------------------------


def _mini_corpus(spark, web_consistent: bool):
    """Two sources; 'books' carries a permanent consistency violation
    (so violations.parquet never goes fully empty), 'web' is dirty or
    clean per the flag. Changing the flag changes web's fingerprint, so
    resume revalidates exactly that source."""
    rows = []
    for i in range(50):
        toks = [1, 2, 3]
        n = 3 if (web_consistent or i % 5) else 2  # every 5th row dirty
        rows.append((f"w{i}", toks, n, "web"))
    for i in range(50):
        n = 3 if i % 5 else 2
        rows.append((f"b{i}", [4, 5, 6], n, "books"))
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def test_revalidated_clean_source_clears_stale_violations(spark, tmp_path):
    run_dir = str(tmp_path / "run")
    allowed = spark.createDataFrame(
        [("web",), ("books",)], "source string"
    )
    cfg = ValidationConfig(check_drift=False)

    r1 = run_validation(
        spark, _mini_corpus(spark, web_consistent=False), allowed, run_dir,
        cfg=cfg,
    )
    viol_path = run_dir + "/violations.parquet"
    v1 = spark.read.parquet(viol_path)
    assert v1.where(F.col("source") == "web").count() > 0
    assert v1.where(F.col("source") == "books").count() > 0
    assert not r1["all_passed"]

    # web is now clean; books unchanged → only web revalidates
    r2 = run_validation(
        spark, _mini_corpus(spark, web_consistent=True), allowed, run_dir,
        cfg=cfg,
    )
    assert r2["validated"] == ["web"]
    assert r2["skipped"] == ["books"]
    v2 = spark.read.parquet(viol_path)
    # the stale source=web partition must be GONE, books' preserved
    assert v2.where(F.col("source") == "web").count() == 0
    assert v2.where(F.col("source") == "books").count() > 0
    assert r2["partitions"]["web"]["passed"]


# ---------------------------------------------------------------------------
# 4. incremental inference with URL-encodable characters in the path
# ---------------------------------------------------------------------------


def test_infer_incremental_path_with_space(spark, tmp_path):
    data = str(tmp_path / "dir with space" / "data")
    state = str(tmp_path / "state")
    df = spark.createDataFrame(
        [(json.dumps({"a": 1, "b": "x"}),), (json.dumps({"a": 2}),)],
        "j string",
    )
    df.coalesce(1).write.mode("append").parquet(data)

    r1 = infer_incremental(spark, data, state, "j")
    # the old code keyed state by %20-encoded input_file_name while
    # listing unencoded inputFiles — every file took the empty-summary
    # fallback, yielding processed_count == 0 and an empty schema
    assert r1.processed_count == 2
    assert sorted(r1.schema["properties"]) == ["a", "b"]
    assert r1.schema["required"] == ["a"]
    # state keys are canonical (no %20)
    for f in r1.new_files:
        assert "%20" not in f and "dir with space" in f

    # incremental append still attributes per-file under the spaced path
    df2 = spark.createDataFrame([(json.dumps({"c": True}),)], "j string")
    df2.coalesce(1).write.mode("append").parquet(data)
    r2 = infer_incremental(spark, data, state, "j")
    assert r2.processed_count == 3
    assert len(r2.new_files) == 1 and len(r2.reused_files) == 1
    assert "c" in r2.schema["properties"]


# ---------------------------------------------------------------------------
# 5. delete_partition_dirs vs SPARK'S OWN partition-path escaping
# ---------------------------------------------------------------------------


def test_delete_partition_dirs_matches_spark_escaping(spark, tmp_path):
    """The unit test above fabricates dir names by hand; this one lets
    Spark write `partitionBy("source")` with special-char values and
    asserts the unescape-and-match delete finds the dirs SPARK created.
    If Spark's escape table ever diverges from what _unescape_hive can
    invert, the stale-violation fix would silently no-op — this pins it."""
    base = str(tmp_path / "part")
    values = ["plain", "a b", "x:y", "pct%40", None]
    df = spark.createDataFrame(
        [(v, 1) for v in values], "source string, v int"
    )
    df.write.partitionBy("source").parquet(base)
    names = sorted(os.listdir(base))
    # delete the two special-char ones plus the null partition
    deleted = delete_partition_dirs(spark, base, "source", ["a b", "x:y", None])
    assert len(deleted) == 3, (deleted, names)
    remaining = [n for n in os.listdir(base) if n.startswith("source=")]
    kept_vals = {
        _unescape_hive(n[len("source="):]) for n in remaining
    }
    assert kept_vals == {"plain", "pct%40"}
    # the kept data still reads back
    back = spark.read.parquet(base)
    assert {r["source"] for r in back.collect()} == {"plain", "pct%40"}


# ---------------------------------------------------------------------------
# 5. fingerprint fold: a fresh run computes the resume fingerprint INSIDE
#    the stats scan (no separate full-corpus pass) — the folded value must
#    byte-match checkpoint.partition_fingerprints, so a later resume over
#    unchanged data skips everything
# ---------------------------------------------------------------------------


def test_fresh_run_folded_fingerprints_match_prescan(spark, tmp_path):
    from polars_genson_spark import checkpoint as ckpt

    run_dir = str(tmp_path / "runf")
    allowed = spark.createDataFrame([("web",), ("books",)], "source string")
    cfg = ValidationConfig(check_drift=False)
    corpus = _mini_corpus(spark, web_consistent=True)

    r1 = run_validation(spark, corpus, allowed, run_dir, cfg=cfg)
    assert sorted(r1["validated"]) == ["books", "web"]

    manifest = ckpt.load_manifest(run_dir, spark=spark)
    pre = ckpt.partition_fingerprints(corpus, cfg)
    assert {k: int(v) for k, v in manifest["fingerprints"].items()} == {
        str(k): v for k, v in pre.items()
    }
    # the resume-internal _fp column must NOT leak into the outputs
    verd = spark.read.parquet(run_dir + "/verdicts.parquet")
    assert "_fp" not in verd.columns
    assert all(
        "_fp" not in p for p in manifest["partitions"].values()
    )

    # unchanged corpus → resume skips every partition (fingerprint parity)
    r2 = run_validation(spark, corpus, allowed, run_dir, cfg=cfg)
    assert r2["validated"] == []
    assert sorted(r2["skipped"]) == ["books", "web"]


def test_fresh_run_fold_with_null_source(spark, tmp_path):
    """NULL is a legal source partition: the folded fingerprint path keys
    it as None in per_partition and must round-trip through the manifest
    so an unchanged-data resume skips it like any other partition."""
    from polars_genson_spark import checkpoint as ckpt

    run_dir = str(tmp_path / "runn")
    allowed = spark.createDataFrame([("web",)], "source string")
    cfg = ValidationConfig(check_drift=False)
    rows = [(f"w{i}", [1, 2], 2, "web") for i in range(20)] + [
        (f"n{i}", [3, 4], 2, None) for i in range(20)
    ]
    corpus = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )

    r1 = run_validation(spark, corpus, allowed, run_dir, cfg=cfg)
    assert sorted(r1["validated"]) == ["None", "web"]
    pre = ckpt.partition_fingerprints(corpus, cfg)
    manifest = ckpt.load_manifest(run_dir, spark=spark)
    assert {k: int(v) for k, v in manifest["fingerprints"].items()} == {
        str(k): v for k, v in pre.items()
    }
    # NULL source fails referential (not in allowed) but passes nothing
    # silently: the partition must be present with passed=False
    assert manifest["partitions"]["None"]["passed"] is False

    r2 = run_validation(spark, corpus, allowed, run_dir, cfg=cfg)
    assert r2["validated"] == [] and sorted(r2["skipped"]) == ["None", "web"]


# ---------------------------------------------------------------------------
# 6. fresh-rerun crash window: stale manifest must not phantom-clean
# ---------------------------------------------------------------------------


def test_delete_manifest_unit(tmp_path):
    from polars_genson_spark import checkpoint as ckpt

    run_dir = str(tmp_path / "rd")
    ckpt.save_manifest(run_dir, {"partitions": {}, "fingerprints": {}})
    assert ckpt.load_manifest(run_dir) is not None
    ckpt.delete_manifest(run_dir)
    assert ckpt.load_manifest(run_dir) is None
    ckpt.delete_manifest(run_dir)  # absent → no-op, not an exception


def test_fresh_run_deletes_manifest_before_output_dirs(
    spark, tmp_path, monkeypatch
):
    """The fix's ORDER pin: on a --no-resume rerun into a reused run_dir,
    the stale manifest must already be gone by the time the output dirs
    are dropped. Otherwise a crash between the two leaves (old manifest,
    deleted outputs) and the next resume skips every unchanged source —
    phantom-cleaning the violations. Fresh runs drop the WHOLE
    violations/verdicts dirs via fsutil.delete_dir (per-partition deletes
    cannot reach sources absent from the new corpus), so that is the
    destructive call the spy pins the ordering against."""
    from polars_genson_spark import checkpoint as ckpt
    from polars_genson_spark import jobs as jobs_mod

    run_dir = str(tmp_path / "run")
    allowed = spark.createDataFrame([("web",), ("books",)], "source string")
    cfg = ValidationConfig(check_drift=False)
    corpus = _mini_corpus(spark, web_consistent=False)
    run_validation(spark, corpus, allowed, run_dir, cfg=cfg)
    assert ckpt.load_manifest(run_dir) is not None

    seen: dict[str, bool] = {}
    real = fsutil.delete_dir

    def spying(spark_, uri):
        # record the state at the FIRST destructive delete only
        seen.setdefault("manifest_gone", ckpt.load_manifest(run_dir) is None)
        return real(spark_, uri)

    monkeypatch.setattr(jobs_mod.fsutil, "delete_dir", spying)
    run_validation(spark, corpus, allowed, run_dir, cfg=cfg, resume=False)
    assert seen["manifest_gone"] is True


def test_fresh_rerun_crash_recovers_by_full_revalidation(spark, tmp_path):
    """Simulate the crash itself: fresh rerun died right after its
    deletes (manifest + todo partition dirs gone, nothing rewritten).
    A later default-resume run must see previous=None and revalidate
    everything, restoring violations.parquet."""
    from polars_genson_spark import checkpoint as ckpt

    run_dir = str(tmp_path / "run")
    allowed = spark.createDataFrame([("web",), ("books",)], "source string")
    cfg = ValidationConfig(check_drift=False)
    corpus = _mini_corpus(spark, web_consistent=False)
    run_validation(spark, corpus, allowed, run_dir, cfg=cfg)

    # the interrupted fresh rerun's destructive prefix, then "crash"
    ckpt.delete_manifest(run_dir)
    delete_partition_dirs(
        None, run_dir + "/violations.parquet", "source", ["web", "books"]
    )

    r = run_validation(spark, corpus, allowed, run_dir, cfg=cfg)  # resume=True
    assert sorted(r["validated"]) == ["books", "web"] and r["skipped"] == []
    v = spark.read.parquet(run_dir + "/violations.parquet")
    assert v.where(F.col("source") == "web").count() > 0
    assert v.where(F.col("source") == "books").count() > 0


# ---------------------------------------------------------------------------
# 8. vanished sources must not leave phantom violations/verdicts behind
# ---------------------------------------------------------------------------


def _two_source_corpus(spark, with_web: bool):
    """'books' carries a permanent consistency violation; 'web' (also
    dirty) exists only when ``with_web``. Dropping web from the corpus
    must drop its violations/verdicts partitions from disk too."""
    rows = []
    if with_web:
        rows += [
            (f"w{i}", [1, 2, 3], 3 if i % 5 else 2, "web") for i in range(50)
        ]
    rows += [
        (f"b{i}", [4, 5, 6], 3 if i % 5 else 2, "books") for i in range(50)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def test_vanished_source_cleared_on_resume(spark, tmp_path):
    """books is untouched (todo is EMPTY on the second run — the cleanup
    must not hide inside the revalidation write path), web vanishes."""
    run_dir = str(tmp_path / "run")
    allowed = spark.createDataFrame([("web",), ("books",)], "source string")
    cfg = ValidationConfig(check_drift=False)

    run_validation(
        spark, _two_source_corpus(spark, True), allowed, run_dir, cfg=cfg
    )
    viol = spark.read.parquet(run_dir + "/violations.parquet")
    assert viol.where(F.col("source") == "web").count() > 0

    r2 = run_validation(
        spark, _two_source_corpus(spark, False), allowed, run_dir, cfg=cfg
    )
    assert r2["validated"] == []
    assert r2["skipped"] == ["books"]
    viol = spark.read.parquet(run_dir + "/violations.parquet")
    verd = spark.read.parquet(run_dir + "/verdicts.parquet")
    assert viol.where(F.col("source") == "web").count() == 0
    assert verd.where(F.col("source") == "web").count() == 0
    # the surviving source's rows are intact
    assert viol.where(F.col("source") == "books").count() > 0
    assert verd.where(F.col("source") == "books").count() == 1
    assert "web" not in r2["partitions"]


def test_vanished_source_cleared_on_fresh_rerun(spark, tmp_path):
    """--no-resume into a reused run_dir: the whole stale output tree is
    rebuilt, including partitions of sources absent from the new corpus
    (which are in nobody's todo list)."""
    run_dir = str(tmp_path / "run")
    allowed = spark.createDataFrame([("web",), ("books",)], "source string")
    cfg = ValidationConfig(check_drift=False)

    run_validation(
        spark, _two_source_corpus(spark, True), allowed, run_dir, cfg=cfg
    )
    run_validation(
        spark,
        _two_source_corpus(spark, False),
        allowed,
        run_dir,
        cfg=cfg,
        resume=False,
    )
    viol = spark.read.parquet(run_dir + "/violations.parquet")
    verd = spark.read.parquet(run_dir + "/verdicts.parquet")
    assert viol.where(F.col("source") == "web").count() == 0
    assert verd.where(F.col("source") == "web").count() == 0
    assert viol.where(F.col("source") == "books").count() > 0
