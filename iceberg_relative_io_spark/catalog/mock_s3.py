"""Mock S3 — an object-store delegate FS with S3's (lack of) semantics.

The reference's headline scenario is writing a warehouse on posix and
re-reading it under ``s3a://`` with no metadata rewrite (reference
README.md:112-121), and its commit protocol carries an explicit caveat
for stores without atomic rename — the LockManager hook (reference
HadoopRelativeTableOperations.java:346-376, README.md:123-124). To
exercise BOTH ends of that story without network or cloud credentials,
this module registers a ``mock-s3`` io-impl: a pyarrow
``FileSystemHandler`` over a local backing directory that deliberately
behaves like S3 where it matters —

- **no atomic rename**: ``move`` is copy-then-delete (what S3 "rename"
  really is), so a bare exists+move commit carries the classic race and
  correctness must come from the LockManager, exactly the reference's
  caveat;
- **no append**: ``open_append_stream`` raises, like S3;
- **bucket-in-path URIs**: a ``s3://bucket/key`` location maps to
  ``<root>/bucket/key`` on the backing store, so moving a warehouse is
  copying the bucket prefix — metadata relativity is what makes the
  re-read work, the same property the posix->file:// test pins.

Because the Spark JVM cannot resolve the mock scheme, the impl also
registers a spark-path translator (fileio.register_spark_path_translator)
mapping ``s3://bucket/key`` -> ``file://<root>/bucket/key``: the JVM
plane reads/writes the same bytes through the backing directory while
every metadata/manifest byte flows through the mock FS. Production
schemes need no translator — ``s3a://`` with the Hadoop connector
resolves on both planes natively; the translator exists so the
object-store commit/layout/move semantics are testable hermetically.
"""

from __future__ import annotations

from pyarrow import fs as pafs

from iceberg_relative_io_spark.catalog.fileio import (
    register_io_impl,
    register_spark_path_translator,
)


class _MockS3Handler(pafs.FileSystemHandler):
    """Delegates storage to a SubTreeFileSystem over the backing root,
    overriding exactly the operations whose semantics S3 changes."""

    def __init__(self, root: str):
        self.root = root.rstrip("/")
        self._fs = pafs.SubTreeFileSystem(self.root, pafs.LocalFileSystem())

    # -- identity ---------------------------------------------------------
    def get_type_name(self):
        return "mock-s3"

    def __eq__(self, other):
        return isinstance(other, _MockS3Handler) and other.root == self.root

    def __ne__(self, other):
        return not self.__eq__(other)

    def normalize_path(self, path):
        return path.lstrip("/")

    # -- reads --------------------------------------------------------------
    def get_file_info(self, paths):
        return self._fs.get_file_info(paths)

    def get_file_info_selector(self, selector):
        return self._fs.get_file_info(selector)

    def open_input_stream(self, path):
        return self._fs.open_input_stream(path)

    def open_input_file(self, path):
        return self._fs.open_input_file(path)

    # -- writes -------------------------------------------------------------
    def open_output_stream(self, path, metadata):
        return self._fs.open_output_stream(path)

    def open_append_stream(self, path, metadata):
        raise NotImplementedError("mock-s3: object stores do not append")

    def create_dir(self, path, recursive):
        # S3 has no directories; the backing store needs them. Creating
        # them eagerly mirrors how s3fs-style adapters fake prefixes.
        self._fs.create_dir(path, recursive=True)

    def delete_dir(self, path):
        self._fs.delete_dir(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self._fs.delete_dir_contents(path, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        self._fs.delete_dir_contents("", accept_root_dir=True)

    def delete_file(self, path):
        self._fs.delete_file(path)

    def move(self, src, dest):
        """Copy-then-delete — S3's real 'rename'. NOT atomic: a reader
        (or racing committer) can observe dest existing while src still
        does. Commit correctness on this FS comes from put_if_absent
        (preferred) or the LockManager (fileio.RelativeFileIO.rename)."""
        self._fs.copy_file(src, dest)
        self._fs.delete_file(src)

    def copy_file(self, src, dest):
        self._fs.copy_file(src, dest)

    # -- conditional put ------------------------------------------------------
    def put_if_absent(self, path, data: bytes) -> bool:
        """S3 ``PutObject`` with ``If-None-Match: *`` (generally
        available on real S3 since late 2024): atomically create the
        object iff no object exists at the key; False = precondition
        failed (someone else won). Real S3 makes the object visible only
        with its FULL content, so the mock must too: the payload is
        written to a private temp file first and published with
        ``os.link`` — link(2) fails atomically with FileExistsError when
        the key exists, and at link time the content is already complete,
        so a concurrent reader can never observe an empty or partial
        object (a bare O_CREAT|O_EXCL-then-write would expose exactly
        that window to TableOperations.current()/refresh). This removes
        the LockManager requirement from the commit protocol: the
        reference epoch needed a lock because S3 of its day had no
        conditional write; modern object stores make CAS-on-key native,
        and RelativeFileIO.rename prefers it."""
        import os
        import uuid as _uuid

        full = os.path.join(self.root, path.lstrip("/"))
        os.makedirs(os.path.dirname(full), exist_ok=True)
        tmp = f"{full}.put-{_uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        try:
            os.link(tmp, full)  # atomic create-iff-absent, content complete
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        return True


def enable_mock_s3(root: str) -> str:
    """Register the ``mock-s3`` io-impl (and its JVM-plane translator)
    backed by ``root``. Returns the impl name. Warehouses then look like
    ``s3://bucket/wh`` with bytes living at ``<root>/bucket/wh``.

    The io-impl registry is process-local: a pickled RelativeFileIO
    carries only the impl NAME, and executors re-resolve it from their
    own registry — on a real multi-node cluster the registering module
    must be importable there too (ship the package, call enable_* in a
    session-startup hook). In local[k] (this harness) driver and
    executors share the process, so one call covers both planes."""

    # one impl name per root: re-registering "mock-s3" with a different
    # root would silently repoint every not-yet-resolved FileIO (and all
    # JVM path translation) at the newest root (round-4 ADVICE). Keying
    # the name by root makes concurrent mock stores independent; the
    # same root re-registers idempotently.
    import hashlib

    name = "mock-s3-" + hashlib.sha1(root.encode()).hexdigest()[:8]

    def factory(_warehouse: str):
        return pafs.PyFileSystem(_MockS3Handler(root))

    def to_jvm(absolute: str) -> str:
        if "://" in absolute:
            absolute = absolute.split("://", 1)[1]
        return "file://" + root.rstrip("/") + "/" + absolute.lstrip("/")

    register_io_impl(name, factory)
    register_spark_path_translator(name, to_jvm)
    return name
