"""Remote-safe small-file IO through the Hadoop FileSystem API.

Sidecars, manifests, and size probes must work on ANY URI scheme Spark's
Hadoop conf knows (file://, hdfs://, s3a://, ...) — a local ``open()`` or
``glob`` next to a distributed parquet write crashes (or silently returns
nothing) the moment the output directory is remote, typically AFTER the
expensive write completed. Paths without a scheme take the plain local
fast path, so tests and local runs never touch the JVM.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import SparkSession


def is_remote(path: str) -> bool:
    return "://" in path


def hadoop_path(spark: SparkSession, uri: str):
    """(Path, FileSystem) for any URI scheme the Hadoop conf knows."""
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(uri)
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return path, fs


def write_text(spark: SparkSession | None, uri: str, text: str) -> None:
    """Write a small text file at ``uri`` (local or remote)."""
    if is_remote(uri) and spark is None:
        # the local branch would mkdir a literal "s3a:" directory and
        # "succeed" — the manifest silently lands on the driver's disk
        # and the next resume sees nothing. Fail loudly instead.
        raise ValueError(
            f"remote URI {uri!r} requires a SparkSession (spark=None)"
        )
    if spark is None or not is_remote(uri):
        os.makedirs(os.path.dirname(uri) or ".", exist_ok=True)
        tmp = uri + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, uri)  # atomic locally
        return
    path, fs = hadoop_path(spark, uri)
    out = fs.create(path, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession | None, uri: str) -> str | None:
    """Contents of ``uri`` or None if absent (local or remote)."""
    if is_remote(uri) and spark is None:
        # os.path.exists("s3a://...") is always False — the caller would
        # get a silent no-resume instead of its remote manifest
        raise ValueError(
            f"remote URI {uri!r} requires a SparkSession (spark=None)"
        )
    if spark is None or not is_remote(uri):
        if not os.path.exists(uri):
            return None
        with open(uri) as f:
            return f.read()
    path, fs = hadoop_path(spark, uri)
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        # IOUtils, not readFully into a Python bytearray: py4j passes
        # byte[] BY COPY, so reads into a Python-side buffer are lost
        jvm = spark.sparkContext._jvm
        buf = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, buf, 4096, False)
        return buf.toString("UTF-8")
    finally:
        stream.close()


def parquet_sizes(spark: SparkSession, directory: str) -> tuple[int, int]:
    """(file_count, total_bytes) of the parquet parts under ``directory``
    — Hadoop globStatus, so remote inputs size correctly (a local glob on
    an s3a:// URI silently returns nothing, and a downstream
    bytes-derived partition count of max(1, 0) would funnel the whole
    dataset through ONE writer task)."""
    if not is_remote(directory):
        files = _glob.glob(
            os.path.join(directory, "*.parquet")
        ) or _glob.glob(
            os.path.join(directory, "**", "*.parquet"), recursive=True
        )
        return len(files), sum(os.path.getsize(f) for f in files)
    # Hadoop globStatus has no recursive '**' (it matches a single path
    # segment), so a glob-based remote branch missed files nested deeper
    # than one partition level (split=x/source=y/part-*.parquet → 0 files
    # → a bytes-derived writer count of max(1, 0)). listFiles(path, true)
    # is a truly recursive RemoteIterator — same semantics as the local
    # recursive glob above.
    path, fs = hadoop_path(spark, directory)
    total = 0
    count = 0
    if not fs.exists(path):
        return 0, 0
    it = fs.listFiles(path, True)
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            count += 1
            total += st.getLen()
    return count, total


def delete_dir(spark: SparkSession | None, uri: str) -> None:
    """Recursively delete a directory, local or remote (Hadoop FS).
    Missing paths are a no-op. Used by the curate pipeline's reliable
    checkpoints to retire the previous stage boundary."""
    if not is_remote(uri):
        import shutil

        shutil.rmtree(uri, ignore_errors=True)
        return
    if spark is None:
        raise ValueError(
            f"delete_dir on remote URI {uri!r} needs a SparkSession"
        )
    path, fs = hadoop_path(spark, uri)
    if fs.exists(path):
        fs.delete(path, True)


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _unescape_hive(name: str) -> str:
    """Decode Hive partition-path escaping (%XX per special char).
    Decoding needs no knowledge of WHICH chars Hive escapes — any %XX
    pair is a literal byte — so it is safe against the full escape set
    (space, colon, '#', '%', ...)."""
    out: list[str] = []
    i = 0
    while i < len(name):
        c = name[i]
        if c == "%" and i + 3 <= len(name):
            try:
                out.append(chr(int(name[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(c)
        i += 1
    return "".join(out)


def delete_partition_dirs(
    spark: SparkSession,
    base_uri: str,
    col: str,
    values: list,
) -> list[str]:
    """Delete ``col=<value>`` partition directories under ``base_uri``
    for each value in ``values`` (``None`` matches Hive's
    ``__HIVE_DEFAULT_PARTITION__``). Returns the deleted dir names.

    Needed because dynamic partition overwrite only rewrites partitions
    PRESENT in the written data: a revalidated source that is now clean
    emits zero violation rows, so its stale partition from the prior run
    would survive the overwrite and readers would see phantom violations.
    Matching is done by UNESCAPING existing dir names (one-directional,
    char-set-free) rather than re-implementing Hive's escape table.
    """
    want = {(_HIVE_NULL if v is None else str(v)) for v in values}
    deleted: list[str] = []
    prefix = col + "="
    if not is_remote(base_uri):
        if not os.path.isdir(base_uri):
            return deleted
        import shutil

        for name in os.listdir(base_uri):
            if not name.startswith(prefix):
                continue
            raw = name[len(prefix):]
            val = raw if raw == _HIVE_NULL else _unescape_hive(raw)
            if val in want:
                shutil.rmtree(os.path.join(base_uri, name))
                deleted.append(name)
        return deleted
    path, fs = hadoop_path(spark, base_uri)
    if not fs.exists(path):
        return deleted
    for st in fs.listStatus(path):
        if not st.isDirectory():
            continue
        name = st.getPath().getName()
        if not name.startswith(prefix):
            continue
        raw = name[len(prefix):]
        val = raw if raw == _HIVE_NULL else _unescape_hive(raw)
        if val in want:
            fs.delete(st.getPath(), True)
            deleted.append(name)
    return deleted
