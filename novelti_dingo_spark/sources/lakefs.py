"""Hadoop FileSystem helpers for the lake utilities.

`pathlib` silently assumes POSIX semantics (atomic rename, cheap local
listing) — wrong on object stores. Everything here goes through the
Hadoop FileSystem API via the JVM gateway, so the same code runs on
``file://``, ``hdfs://``, ``s3a://``, ``gs://`` with whatever committer
semantics the cluster configures. Used by pipelines.compact_parquet /
publish_versioned / read_version / upsert_by_partition.

Semantics notes for the pointer-flip pattern (publish_versioned):
- HDFS: rename is atomic; readers see old or new pointer, never partial.
- S3A/GCS: rename is copy+delete (not atomic), but object PUT itself is
  atomic — a reader never observes a partially-written object, only the
  old pointer, the new pointer, or (for the rename window) none. The
  manifest inside the immutable ``v=N`` directory is the source of truth;
  the pointer is a convenience.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path, jvm) for `path` under the session's Hadoop conf."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def exists(spark: SparkSession, path: str) -> bool:
    fs, p, _ = _fs(spark, path)
    return bool(fs.exists(p))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p, _ = _fs(spark, path)
    fs.mkdirs(p)


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, p, _ = _fs(spark, path)
    return bool(fs.delete(p, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, s, jvm = _fs(spark, src)
    d = jvm.org.apache.hadoop.fs.Path(dst)
    if fs.exists(d):
        fs.delete(d, False)
    return bool(fs.rename(s, d))


def copy(spark: SparkSession, src: str, dst: str) -> None:
    """Byte copy of one file via Hadoop FileUtil (no driver read):
    the copy-on-write primitive — untouched files move between versions
    without decode/re-encode, so a surgical rewrite costs only the
    affected files' I/O plus cheap filesystem copies of the rest."""
    fs, s, jvm = _fs(spark, src)
    d = jvm.org.apache.hadoop.fs.Path(dst)
    jvm.org.apache.hadoop.fs.FileUtil.copy(
        fs, s, fs, d, False, spark._jsc.hadoopConfiguration()
    )


def listdir(spark: SparkSession, path: str) -> list[str]:
    """Child basenames of a directory ([] if it doesn't exist)."""
    fs, p, _ = _fs(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def walk_files(spark: SparkSession, path: str) -> list[str]:
    """All file paths under `path`, RELATIVE to it, recursively
    (fs.listFiles(recursive=true) — one listing stream, object-store
    safe). [] if the path doesn't exist."""
    fs, p, _ = _fs(spark, path)
    if not fs.exists(p):
        return []
    root = fs.makeQualified(p).toString().rstrip("/")
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        full = it.next().getPath().toString()
        out.append(full[len(root) + 1:])
    return sorted(out)


def du_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under `path` (one getContentSummary RPC, no scan job)."""
    fs, p, _ = _fs(spark, path)
    return int(fs.getContentSummary(p).getLength())


def read_text(spark: SparkSession, path: str) -> str:
    fs, p, jvm = _fs(spark, path)
    stream = fs.open(p)
    try:
        # readFully up to file length via IOUtils → byte string
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, False)
        return bytes(baos.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create/overwrite a small control file (single PUT on object stores)."""
    fs, p, _ = _fs(spark, path)
    stream = fs.create(p, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def replace_text(spark: SparkSession, path: str, text: str) -> None:
    """ATOMIC pointer flip: write `path`.tmp, then rename-with-overwrite
    onto `path` via FileContext (atomic on HDFS and local FS; a single
    last-write-wins PUT on object stores). Readers observe the old or the
    new content, never a missing/partial pointer — unlike delete+rename,
    which has a no-pointer window and loses the pointer outright if the
    writer dies between the two calls."""
    fs, p, jvm = _fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()
    conf = spark._jsc.hadoopConfiguration()
    uri = p.toUri()
    fc = (
        jvm.org.apache.hadoop.fs.FileContext.getFileContext(uri, conf)
        if uri.getScheme()
        else jvm.org.apache.hadoop.fs.FileContext.getFileContext(conf)
    )
    overwrite = spark.sparkContext._gateway.new_array(
        jvm.org.apache.hadoop.fs.Options.Rename, 1
    )
    overwrite[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
    fc.rename(tmp, p, overwrite)
