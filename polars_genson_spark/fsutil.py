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
    jvm = spark.sparkContext._jvm
    total = 0
    count = 0
    for pattern in ("/*.parquet", "/**/*.parquet"):
        path = jvm.org.apache.hadoop.fs.Path(
            directory.rstrip("/") + pattern
        )
        fs = path.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        statuses = fs.globStatus(path)
        if statuses:
            for st in statuses:
                count += 1
                total += st.getLen()
            break
    return count, total
