"""Small-file I/O that works on whatever filesystem owns the path.

The index families persist their corpus-sized state as parquet (already
cluster-portable through Spark writers) plus one small metadata.json.
Plain local paths use the stdlib; any path with a scheme (hdfs://,
s3a://, file:) goes through the Hadoop FileSystem API on the JVM
gateway — same discipline as graph._fs_rmtree, so an index saved to a
cluster store round-trips without local-disk assumptions.
"""

from __future__ import annotations

import os


def _is_local(path: str) -> bool:
    return "://" not in path and not path.startswith("file:")


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def write_text(spark, path: str, text: str) -> None:
    """Write a small UTF-8 file, creating parent dirs as needed."""
    if _is_local(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(text)
        return
    fs, hpath = _hadoop_fs(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark, path: str) -> str:
    """Read a small UTF-8 file."""
    if _is_local(path):
        with open(path) as f:
            return f.read()
    fs, hpath = _hadoop_fs(spark, path)
    stream = fs.open(hpath)
    try:
        # commons-io ships with Spark's Hadoop client; a java byte[]
        # return converts cleanly to Python bytes (py4j cannot fill a
        # Python-side buffer through read(byte[]))
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()
