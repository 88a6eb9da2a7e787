"""Filesystem primitives for index/table MAINTENANCE on any
Hadoop-compatible filesystem.

The Spark parquet reads/writes in the index classes are FS-agnostic
already; what used to pin ``index_dir`` to a local/NFS path was the
maintenance bookkeeping around them — manifest publish, staged-directory
swaps, delta-area discovery, post-publish GC — written with POSIX
primitives (``os.rename`` / ``os.replace`` / ``os.scandir`` /
``shutil.rmtree``).  This module is the same small set of primitives
dispatched on the path's scheme:

* **No URI scheme** (``/data/index``): the POSIX primitives, unchanged.
  ``os.replace`` is atomic on POSIX — the property the crash-injection
  tests pin for the manifest publish.
* **Any scheme** (``hdfs://…``, ``file://…``, ``s3a://…``): the Hadoop
  FileSystem API through the session's JVM gateway, using the
  filesystem bound to the path's scheme in the active Hadoop conf.
  The atomic overwrite used by the manifest publish goes through
  ``FileContext.rename(…, Options.Rename.OVERWRITE)`` — **atomic on
  HDFS** (one namenode op).  Schemes without an ``AbstractFileSystem``
  binding (plain s3a) fall back to delete-then-rename with a
  documented non-atomic window; object stores without atomic rename
  at all keep their usual caveat — commit visibility is only as atomic
  as the store's rename, same as any manifest-swap table format.

``file://…`` exercises the ENTIRE Hadoop branch against the local disk
(Hadoop's LocalFileSystem), which is how the test suite proves the
remote path works without a cluster.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Optional

from pyspark.sql import SparkSession

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def has_scheme(path: str) -> bool:
    return bool(_SCHEME_RE.match(path))


def _jfs(spark: SparkSession, path: str):
    """(jvm, FileSystem, Path) for a scheme-qualified path."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, jpath


def is_dir(spark: SparkSession, path: str) -> bool:
    if not has_scheme(path):
        return os.path.isdir(path)
    _, fs, p = _jfs(spark, path)
    return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())


def has_subdirs(spark: SparkSession, path: str) -> bool:
    """True when ``path`` is a directory containing at least one child
    directory (the delta-area discovery probe)."""
    if not has_scheme(path):
        return os.path.isdir(path) and any(
            e.is_dir() for e in os.scandir(path)
        )
    _, fs, p = _jfs(spark, path)
    if not (fs.exists(p) and fs.getFileStatus(p).isDirectory()):
        return False
    return any(s.isDirectory() for s in fs.listStatus(p))


def list_names(spark: SparkSession, path: str) -> list:
    """Child entry basenames (``os.listdir`` shape); ``[]`` when the
    path is absent — callers gate on their own existence signals (a
    manifest read) before trusting an empty listing."""
    if not has_scheme(path):
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []
    _, fs, p = _jfs(spark, path)
    if not fs.exists(p):
        return []
    return [s.getPath().getName() for s in fs.listStatus(p)]


def delete(spark: SparkSession, path: str) -> None:
    """Recursive delete, missing-ok — directories AND plain files (the
    Hadoop ``fs.delete(recursive=True)`` contract; the POSIX branch
    must match it, since callers pass staged FILES such as versioned
    codebooks JSONs through the same primitive)."""
    if not has_scheme(path):
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
        return
    _, fs, p = _jfs(spark, path)
    fs.delete(p, True)  # False on missing — same contract


def remove_file(spark: SparkSession, path: str) -> None:
    """Delete one file, missing-ok."""
    if not has_scheme(path):
        try:
            os.remove(path)
        except FileNotFoundError:
            pass
        return
    _, fs, p = _jfs(spark, path)
    fs.delete(p, False)


def rmdir_if_empty(spark: SparkSession, path: str) -> None:
    """Drop a directory only when it is empty; no-op otherwise."""
    if not has_scheme(path):
        try:
            os.rmdir(path)
        except OSError:
            pass
        return
    _, fs, p = _jfs(spark, path)
    try:
        if fs.exists(p) and len(fs.listStatus(p)) == 0:
            fs.delete(p, False)
    except Exception:  # noqa: BLE001 — contract is best-effort, like os.rmdir
        pass


def makedirs(spark: SparkSession, path: str) -> None:
    if not has_scheme(path):
        os.makedirs(path, exist_ok=True)
        return
    _, fs, p = _jfs(spark, path)
    fs.mkdirs(p)


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Directory/file move; raises ``OSError`` on failure (the caller's
    recovery messaging relies on that, _compact_partitioned)."""
    if not has_scheme(src):
        os.rename(src, dst)
        return
    jvm, fs, p_src = _jfs(spark, src)
    p_dst = jvm.org.apache.hadoop.fs.Path(dst)
    try:
        ok = fs.rename(p_src, p_dst)
    except Exception as ex:  # noqa: BLE001 — Java FileNotFoundException etc.
        raise OSError(f"rename failed: {src} -> {dst}: {ex}") from ex
    if not ok:
        raise OSError(f"rename failed: {src} -> {dst}")


def replace_file(spark: SparkSession, src: str, dst: str) -> None:
    """Atomic-overwrite move of ONE file — the manifest-publish
    primitive.  POSIX: ``os.replace``.  Hadoop: ``FileContext.rename``
    with ``Options.Rename.OVERWRITE`` (atomic on HDFS); schemes with no
    ``AbstractFileSystem`` binding fall back to delete+rename (the
    window where ``dst`` is briefly absent is the price of that store —
    readers treat a missing manifest as the pre-merge default layout)."""
    if not has_scheme(src):
        os.replace(src, dst)
        return
    jvm, fs, p_src = _jfs(spark, src)
    p_dst = jvm.org.apache.hadoop.fs.Path(dst)
    try:
        fctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            p_dst.toUri(), spark._jsc.hadoopConfiguration()
        )
        gw = spark.sparkContext._gateway
        opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
        opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fctx.rename(p_src, p_dst, opts)
    except Exception:  # noqa: BLE001 — no AbstractFileSystem for scheme
        fs.delete(p_dst, False)
        try:
            ok = fs.rename(p_src, p_dst)
        except Exception as ex:  # noqa: BLE001
            raise OSError(f"replace failed: {src} -> {dst}: {ex}") from ex
        if not ok:
            raise OSError(f"replace failed: {src} -> {dst}")


def read_text(spark: SparkSession, path: str) -> str:
    """Whole-file read; raises ``FileNotFoundError`` when absent (the
    manifest readers' missing-manifest signal)."""
    if not has_scheme(path):
        with open(path) as f:
            return f.read()
    jvm, fs, p = _jfs(spark, path)
    if not fs.exists(p):
        raise FileNotFoundError(path)
    stream = fs.open(p)
    try:
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return data.decode("utf-8")


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Plain (non-atomic) whole-file write — stage here, then
    :func:`replace_file` into place."""
    if not has_scheme(path):
        with open(path, "w") as f:
            f.write(text)
        return
    _, fs, p = _jfs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
