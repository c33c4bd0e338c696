"""Filesystem operations through the Hadoop FileSystem API.

The archive/stream lifecycle (existence checks, immutability markers,
directory swaps) must work wherever the data lives — local disk in
tests, HDFS/S3/GCS on a cluster. Driver-local ``os.path`` calls are
silently wrong there: ``os.path.exists("s3a://...")`` is always False,
so write-once and write-after-close guarantees would simply vanish at
the scale the engine targets. Every path-shaped check in the library
goes through this module, which resolves the scheme's FileSystem via
the active Hadoop configuration (``file://`` included — local behavior
is unchanged, and tests run against the same code path production
uses).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs_and_path(spark, path)
    fs.mkdirs(p)


def touch(spark: SparkSession, path: str, content: str = "1") -> None:
    """Create/overwrite a small marker file."""
    fs, p = _fs_and_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def touch_exclusive(spark: SparkSession, path: str, content: str) -> None:
    """Create a small file with ``overwrite=False`` — the write-once
    primitive. A pre-existing file raises ``FileExistsError`` instead
    of silently replacing it: release manifests are numbered
    write-once records, and a second writer racing to the same number
    must fail LOUDLY rather than last-wins rewrite history. (HDFS
    enforces this atomically server-side; local/file does a
    create-check; S3A is check-then-put — the documented single-writer
    contract still applies there, this just converts the silent
    corruption into an error everywhere stronger semantics exist.)"""
    fs, p = _fs_and_path(spark, path)
    try:
        out = fs.create(p, False)
    except Exception as e:
        # classify by the JAVA exception class, not message text: a
        # permission/parent-path error whose message happens to contain
        # "exists" must NOT be reported as a racing duplicate writer,
        # and a differently-phrased already-exists must not slip
        # through. Py4J exposes the cause as e.java_exception; Hadoop
        # raises org.apache.hadoop.fs.FileAlreadyExistsException (HDFS,
        # local) or the java.nio variant depending on scheme.
        jexc = getattr(e, "java_exception", None)
        jname = jexc.getClass().getName() if jexc is not None else ""
        if jname.endswith("FileAlreadyExistsException"):
            raise FileExistsError(
                f"touch_exclusive: {path} already exists"
            ) from None
        raise
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    """Read a small file's full content. The bytes MUST materialize on
    the JVM side (``readAllBytes`` — Java 17) and come back as a
    return value: Py4J passes a Python bytearray argument to
    ``InputStream.read(byte[])`` BY VALUE, so the Java side fills a
    copy and the Python buffer stays all-NULs — a silent
    wrong-content bug, not an error."""
    fs, p = _fs_and_path(spark, path)
    stream = fs.open(p)
    try:
        return bytes(stream.readAllBytes()).decode("utf-8")
    finally:
        stream.close()


def delete(spark: SparkSession, path: str, recursive: bool = True) -> None:
    fs, p = _fs_and_path(spark, path)
    fs.delete(p, recursive)


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, p_src = _fs_and_path(spark, src)
    _, p_dst = _fs_and_path(spark, dst)
    return bool(fs.rename(p_src, p_dst))


def replace_dir(spark: SparkSession, src: str, dst: str) -> None:
    """Swap ``src`` into ``dst``'s place (delete + rename). Atomic per
    rename on HDFS; single-writer contract elsewhere — same promise the
    local shutil version made, now scheme-agnostic."""
    delete(spark, dst, recursive=True)
    if not rename(spark, src, dst):
        raise IOError(f"rename {src} -> {dst} failed")


def list_dir(spark: SparkSession, path: str) -> list[tuple[str, bool]]:
    """[(name, is_dir)] of the direct children of ``path`` (empty if
    the path is missing)."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    out = []
    for status in fs.listStatus(p):
        out.append((status.getPath().getName(), bool(status.isDirectory())))
    return out
