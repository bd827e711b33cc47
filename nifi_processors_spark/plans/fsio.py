"""Filesystem shim for engine metadata IO (snapshots, markers, registry,
metrics) — local paths use the stdlib, URI paths (hdfs://, s3a://, ...)
go through Hadoop's FileSystem API via the active SparkSession's JVM.

Why: data files always go through Spark readers/writers (already
cluster-portable), but icelite's METADATA layer needs small-file
read/write/list/rename primitives. Round 1 used os.* directly, which
made `--table s3a://bucket/...` silently impossible; this shim is the
documented fix. Atomicity notes:

  * local + HDFS: rename is atomic — the snapshot-pointer swap keeps its
    all-or-nothing guarantee.
  * S3A: rename is copy+delete (not atomic). Real Iceberg solves this
    with a catalog swap; deployments on raw S3 should point the metadata
    dir at HDFS/a consistent store, or front it with a catalog. The shim
    still works — the non-atomic window is the pointer file only.

Everything takes plain path strings; paths are joined with '/' (URI-safe
and identical to os.path.join on POSIX for the local case).
"""

from __future__ import annotations

import json
import os
import re
import uuid
from typing import Any

from pyspark.sql import SparkSession

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")


def is_remote(path: str) -> bool:
    """Any URI-scheme path (file:, hdfs://, s3a://, ...) routes through
    Hadoop's FileSystem — `file:` included, so the JVM code path is fully
    testable without object storage."""
    return bool(_SCHEME_RE.match(path))


def _hadoop_fs(path: str):
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(f"remote path {path!r} needs an active SparkSession")
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, jpath


def join(*parts: str) -> str:
    return "/".join(p.rstrip("/") for p in parts if p)


def exists(path: str) -> bool:
    if not is_remote(path):
        return os.path.exists(path)
    _, fs, p = _hadoop_fs(path)
    return fs.exists(p)


def makedirs(path: str) -> None:
    if not is_remote(path):
        os.makedirs(path, exist_ok=True)
        return
    _, fs, p = _hadoop_fs(path)
    fs.mkdirs(p)


def listdir(path: str) -> list[str]:
    """Child entry NAMES (not full paths), like os.listdir."""
    if not is_remote(path):
        return os.listdir(path)
    _, fs, p = _hadoop_fs(path)
    return [st.getPath().getName() for st in fs.listStatus(p)]


def getsize(path: str) -> int:
    if not is_remote(path):
        return os.path.getsize(path)
    _, fs, p = _hadoop_fs(path)
    return fs.getFileStatus(p).getLen()


def remove(path: str) -> None:
    if not is_remote(path):
        os.remove(path)
        return
    _, fs, p = _hadoop_fs(path)
    fs.delete(p, False)


def rmtree(path: str) -> None:
    if not is_remote(path):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        return
    _, fs, p = _hadoop_fs(path)
    if fs.exists(p):
        fs.delete(p, True)


def read_text(path: str) -> str:
    if not is_remote(path):
        with open(path) as f:
            return f.read()
    jvm, fs, p = _hadoop_fs(path)
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, jvm.java.nio.charset.StandardCharsets.UTF_8
        )
    finally:
        stream.close()


def _write_text(path: str, text: str) -> None:
    if not is_remote(path):
        with open(path, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        return
    jvm, fs, p = _hadoop_fs(path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
        out.hflush()
    finally:
        out.close()


def rename(src: str, dst: str) -> None:
    if not is_remote(src):
        os.replace(src, dst)
        return
    _, fs, s = _hadoop_fs(src)
    jvm, _, d = _hadoop_fs(dst)
    fs.delete(d, False)  # Hadoop rename refuses to clobber
    if not fs.rename(s, d):
        raise IOError(f"rename {src!r} -> {dst!r} failed")


def write_json_atomic(path: str, obj: Any) -> None:
    """tmp + rename (atomic on local/HDFS; see module note for S3)."""
    parent = path.rsplit("/", 1)[0] if "/" in path else "."
    tmp = join(parent, f".tmp.{uuid.uuid4().hex[:8]}")
    _write_text(tmp, json.dumps(obj))
    rename(tmp, path)


def read_json(path: str) -> Any:
    return json.loads(read_text(path))
