"""Task-side write layer — POSIX rename vs object-store PUT semantics.

The build's fast path has executors write their own parquet files
(chunk/docs/postings) instead of returning rows to a Spark write job. On a
local/POSIX-shared filesystem the atomicity recipe is tmp → ``os.replace``.
On S3/GCS there IS no rename (it's a copy) — but there is also no partial
file: a PUT is all-or-nothing. So the correct protocol per filesystem is:

- ``atomic_rename=True`` (POSIX): write ``path.tmp-<pid>`` then rename —
  readers scanning the directory never see a partial file;
- ``atomic_rename=False`` (object stores): write DIRECTLY to the final key
  (the PUT either fully lands or doesn't exist) and rely on the
  manifest-last commit order for visibility: every kernel writes its data
  files first and its manifest LAST, and resume/readers trust only
  manifested partitions (``completed_partitions`` / ``read_manifests``), so
  an orphaned data file from a crashed task is simply overwritten by the
  retry. The snapshot-level commit stays the single ``meta.json`` swap
  (Iceberg's metadata-pointer analog, ``streaming/incremental.py``).

``WriteFS`` is picklable (pyarrow FileSystems serialize) and rides into the
task closures; ``filesystem=None`` everywhere keeps today's local behavior
bit-for-bit.
"""

from __future__ import annotations

import json
import os


class WriteFS:
    """Thin write adapter over ``pyarrow.fs.FileSystem``.

    ``fs=None`` → plain local I/O (tmp → ``os.replace``), the default.
    With a pyarrow filesystem, ``atomic_rename`` picks the protocol above.
    """

    def __init__(self, fs=None, atomic_rename: bool = True) -> None:
        self.fs = fs
        self.atomic_rename = atomic_rename

    # -- directories -------------------------------------------------------
    def makedirs(self, path: str) -> None:
        if self.fs is None:
            os.makedirs(path, exist_ok=True)
        else:
            self.fs.create_dir(path, recursive=True)

    # -- parquet -----------------------------------------------------------
    def write_table(
        self, table, path: str, compression="zstd", row_group_size=None
    ) -> None:
        """``compression`` may be a codec name or a per-column dict (the
        postings files store the varbyte columns uncompressed — see
        ``builder.POSTINGS_COMPRESSION``)."""
        import pyarrow.parquet as pq

        kw = {"compression": compression}
        if row_group_size is not None:
            kw["row_group_size"] = row_group_size
        if self.fs is None:
            tmp = path + f".tmp-{os.getpid()}"
            pq.write_table(table, tmp, **kw)
            os.replace(tmp, path)
        elif self.atomic_rename:
            tmp = path + f".tmp-{os.getpid()}"
            pq.write_table(table, tmp, filesystem=self.fs, **kw)
            self.fs.move(tmp, path)
        else:
            # object store: the PUT is all-or-nothing; visibility is gated
            # by the manifest written after this call
            pq.write_table(table, path, filesystem=self.fs, **kw)

    # -- listing / cleanup / reads (driver-side resume bookkeeping) --------
    # These run on the DRIVER: with ``fs`` set, the manifests/worklists the
    # tasks wrote to the object store are read back through the same
    # filesystem, and stale-file cleanup removes the remote files the local
    # os.listdir would never see (round-3 ADVICE).
    def listdir(self, path: str) -> "list[str]":
        if self.fs is None:
            return os.listdir(path) if os.path.isdir(path) else []
        from pyarrow.fs import FileSelector, FileType

        try:
            infos = self.fs.get_file_info(FileSelector(path))
        except (FileNotFoundError, OSError):
            return []
        return [
            i.path.rsplit("/", 1)[-1]
            for i in infos
            if i.type != FileType.NotFound
        ]

    def remove(self, path: str) -> None:
        if self.fs is None:
            os.remove(path)
        else:
            self.fs.delete_file(path)

    def exists(self, path: str) -> bool:
        if self.fs is None:
            return os.path.exists(path)
        from pyarrow.fs import FileType

        return self.fs.get_file_info(path).type != FileType.NotFound

    def read_json(self, path: str):
        if self.fs is None:
            with open(path) as f:
                return json.load(f)
        with self.fs.open_input_stream(path) as f:
            return json.loads(f.read().decode())

    # -- json sidecars (manifests — ALWAYS written after the data files) ----
    def write_json(self, obj, path: str) -> None:
        payload = json.dumps(obj).encode()
        if self.fs is None:
            tmp = path + f".tmp-{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)
        elif self.atomic_rename:
            tmp = path + f".tmp-{os.getpid()}"
            with self.fs.open_output_stream(tmp) as f:
                f.write(payload)
            self.fs.move(tmp, path)
        else:
            with self.fs.open_output_stream(path) as f:
                f.write(payload)


LOCAL = WriteFS()
