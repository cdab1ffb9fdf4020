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
import shutil


def _is_local(path: str) -> bool:
    return "://" not in path and not path.startswith("file:")


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def write_text(spark, path: str, text: str) -> None:
    """Write a small UTF-8 file ATOMICALLY (temp sibling + rename),
    creating parent dirs as needed.  Several callers use the file's
    CONTENT as a commit record — the export's _compact_commit marker,
    the streaming clusters' merged-upto watermark — and a torn write
    (crash mid-write leaving truncated JSON / a partial int) would
    wedge every later reader; publish-by-rename makes the file either
    absent or whole (r11 review).  Object stores get copy+delete for
    the rename — same caveat every swap in this repo documents."""
    tmp = f"{path}.__tmp"
    if _is_local(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
        return
    fs, hpath = _hadoop_fs(spark, path)
    htmp = spark._jvm.org.apache.hadoop.fs.Path(tmp)
    out = fs.create(htmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    fs.delete(hpath, False)
    if not fs.rename(htmp, hpath):
        raise IOError(f"atomic write_text rename {tmp} -> {path} failed")


def exists(spark, path: str) -> bool:
    """Probe a path on whatever filesystem owns it.  os.path.exists is
    local-only: on a scheme'd store (hdfs://, s3a://) it always returns
    False, which silently turned every maintained-pair-table batch into
    a no-state batch (ADVICE r6) — so state probes must come here."""
    if _is_local(path):
        return os.path.exists(path)
    fs, hpath = _hadoop_fs(spark, path)
    return fs.exists(hpath)


def list_subdirs(spark, path: str) -> list[str]:
    """Names of the immediate child DIRECTORIES of `path` (not files,
    not recursive); [] for a missing path.  The exactly-once streaming
    layer derives committed epochs from the `epoch=N` directory listing
    — its 'the commit marker IS the directory' invariant — so this must
    be a pure listing, never a data scan."""
    if _is_local(path):
        try:
            return [
                n for n in os.listdir(path)
                if os.path.isdir(os.path.join(path, n))
            ]
        except FileNotFoundError:
            return []
    fs, hpath = _hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return []
    return [
        st.getPath().getName()
        for st in fs.listStatus(hpath)
        if st.isDirectory()
    ]


def glob_paths(spark, base: str, pattern: str) -> list[str]:
    """Paths under directory `base` matching relative glob `pattern`
    (one filesystem call — the committed-epoch scan uses
    `epoch=*/_SUCCESS` so N epochs cost one listing, not N existence
    probes).  `base` is taken LITERALLY: a state dir containing `[`,
    `]`, `?` or `*` must not turn into glob syntax, or every committed
    epoch goes invisible and readers hide its rows (ADVICE r9) — so
    the wildcard part is a separate argument and `base` is escaped per
    backend.  Local paths use the stdlib glob; scheme'd paths go
    through FileSystem.globStatus (backslash-escape convention)."""
    if _is_local(base):
        import glob as _glob

        return sorted(_glob.glob(f"{_glob.escape(base)}/{pattern}"))
    jvm = spark._jvm
    escaped = "".join(
        f"\\{c}" if c in "*?[]{}\\" else c for c in base
    )
    hpattern = jvm.org.apache.hadoop.fs.Path(f"{escaped}/{pattern}")
    fs = hpattern.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = fs.globStatus(hpattern)
    if statuses is None:
        return []
    return sorted(str(st.getPath()) for st in statuses)


def rmtree(spark, path: str) -> None:
    """Delete a directory tree on whatever filesystem owns `path`.
    Missing paths are a no-op on both branches (FileSystem.delete
    returns false rather than raising)."""
    if _is_local(path):
        shutil.rmtree(path, ignore_errors=True)
        return
    fs, hpath = _hadoop_fs(spark, path)
    fs.delete(hpath, True)


def delete(spark, path: str) -> None:
    """Delete a path that may be a plain FILE or a directory; missing
    paths are a no-op.  rmtree's local branch is shutil.rmtree, which
    silently no-ops on a regular file (ADVICE r9: the reseed 'pure
    scratch' wipe left a stale drift_baseline.json beside the emptied
    state tables) — file deletes must come here.  The Hadoop branch's
    FileSystem.delete already handles both shapes."""
    if _is_local(path):
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)
        return
    fs, hpath = _hadoop_fs(spark, path)
    fs.delete(hpath, True)


def mkdirs(spark, path: str) -> None:
    """Create a directory (and parents) on whatever filesystem owns
    `path`; existing dirs are a no-op.  rename()'s local branch is a
    bare os.rename whose destination PARENT must already exist — the
    epoch-append export publishes `out_dir/epoch=K` by rename, and the
    first epoch has no out_dir yet."""
    if _is_local(path):
        os.makedirs(path, exist_ok=True)
        return
    fs, hpath = _hadoop_fs(spark, path)
    fs.mkdirs(hpath)


def rename(spark, src: str, dst: str) -> None:
    """Directory rename (atomic on POSIX and HDFS; object stores give a
    copy+delete — callers that need atomic swap document the caveat)."""
    if _is_local(src) and _is_local(dst):
        os.rename(src, dst)
        return
    fs, hsrc = _hadoop_fs(spark, src)
    hdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(hsrc, hdst):
        raise IOError(f"rename {src} -> {dst} failed")


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
