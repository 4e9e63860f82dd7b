"""Filesystem catalog with relative table locations.

Python re-expression of the reference's ``HadoopRelativeCatalog``
(reference HadoopRelativeCatalog.java:60-396):

- a namespace is a warehouse subdirectory that is not a table directory
  (reference :341-343),
- a table directory is one containing ``metadata/*.metadata.json``
  (reference isTableDir, :126-141),
- ``default_warehouse_location`` returns the *relative* ``ns/…/table``
  string — the core trick (reference :202-210, README.md:126-129),
- rename is unsupported for path-based tables (reference :238-241),
- namespaces carry no metadata beyond their (relative) location
  (reference :318-339).
"""

from __future__ import annotations

import posixpath

from iceberg_relative_io_spark.catalog.fileio import RelativeFileIO
from iceberg_relative_io_spark.catalog.table_ops import (
    CommitFailedError,
    NoSuchTableError,
    TableOperations,
    new_table_metadata,
)

_METADATA_GLOB_RE = (".metadata.json",)


class NamespaceNotEmptyError(RuntimeError):
    pass


class AlreadyExistsError(RuntimeError):
    pass


class FsCatalog:
    """Path-based catalog over any pyarrow filesystem."""

    def __init__(
        self,
        warehouse: str,
        name: str = "relative",
        io_impl: str = "pyarrow",
        lock_impl: str | None = None,
        suppress_permission_error: bool = False,
    ):
        # io_impl / lock_impl are the catalog-property passthroughs of the
        # reference's `relative.io-impl` (RelativeFileIO.java:42-56) and
        # LockManager conf: object-store deployments pick a delegate FS and
        # a commit lock without touching the relativizing layer.
        # suppress_permission_error mirrors the reference's
        # `suppress-permission-error` option (HadoopRelativeCatalog.java:49,
        # 117-124): listings skip subtrees the caller cannot read instead
        # of failing the whole walk.
        self.name = name
        self.io = RelativeFileIO(warehouse, io_impl=io_impl, lock_impl=lock_impl)
        self.warehouse = self.io.warehouse
        self.suppress_permission_error = suppress_permission_error

    # -- identifiers ---------------------------------------------------------
    @staticmethod
    def _ident_path(namespace: tuple[str, ...] | list[str], name: str | None = None) -> str:
        parts = list(namespace) + ([name] if name else [])
        return posixpath.join(*parts) if parts else ""

    def default_warehouse_location(self, namespace, name: str) -> str:
        """A17: RELATIVE location 'ns1/ns2/table' — no warehouse prefix."""
        return self._ident_path(namespace, name)

    # -- table dir test (A14) --------------------------------------------------
    @staticmethod
    def _is_permission_error(exc: Exception) -> bool:
        """Mirror of shouldSuppressPermissionError
        (HadoopRelativeCatalog.java:117-124): posix EACCES /
        PermissionError, or the Azure AuthorizationPermissionMismatch
        message the reference special-cases."""
        import errno

        if isinstance(exc, PermissionError):
            return True
        if isinstance(exc, OSError) and exc.errno == errno.EACCES:
            return True
        return "AuthorizationPermissionMismatch" in str(exc)

    def _probe_table_dir(self, rel_path: str) -> bool | None:
        """True/False = readable verdict; None = permission-suppressed
        (caller skips the subtree). Unsuppressed permission errors
        propagate — silently mislabeling an unreadable table dir as a
        namespace would corrupt listings."""
        try:
            listing = self.io.list_prefix(f"{rel_path}/metadata")
        except Exception as exc:
            if self._is_permission_error(exc):
                if self.suppress_permission_error:
                    return None
                raise
            if isinstance(exc, (FileNotFoundError, NotADirectoryError)):
                return False  # genuinely no metadata dir -> not a table
            # anything else is a transient store error: mislabeling a
            # table as a namespace (or vice versa) corrupts listings —
            # propagate (the docstring's contract; missing dirs never
            # reach here anyway, list_prefix allows not-found)
            raise
        return any(
            fi.location.rsplit("/", 1)[-1].endswith(_METADATA_GLOB_RE) for fi in listing
        )

    def is_table_dir(self, rel_path: str) -> bool:
        return bool(self._probe_table_dir(rel_path))

    def _child_dirs(self, rel_path: str) -> list[str]:
        from pyarrow import fs as pafs

        # '' resolves to the warehouse root itself; the old '.' form
        # made a literal '<wh>/.' key prefix that real object stores
        # treat as nonexistent, silently emptying root-level listings
        base = self.io._fs_path(rel_path)
        sel = pafs.FileSelector(base, recursive=False, allow_not_found=True)
        out = []
        try:
            infos = self.io.fs.get_file_info(sel)
        except Exception as exc:
            if self.suppress_permission_error and self._is_permission_error(exc):
                return []
            raise
        for info in infos:
            if info.type == pafs.FileType.Directory:
                out.append(info.base_name)
        return sorted(out)

    # -- namespaces (A20-A23) ----------------------------------------------------
    def create_namespace(self, namespace, metadata: dict | None = None) -> None:
        if metadata:
            # reference rejects namespace metadata on the FS catalog (:247-250)
            raise ValueError("FsCatalog namespaces cannot carry metadata")
        rel = self._ident_path(namespace)
        if self._namespace_exists(namespace):
            raise AlreadyExistsError(f"namespace {rel} already exists")
        self.io.fs.create_dir(self.io._fs_path(rel), recursive=True)

    def _namespace_exists(self, namespace) -> bool:
        rel = self._ident_path(namespace)
        if not rel:
            return True
        from pyarrow import fs as pafs

        info = self.io.fs.get_file_info(self.io._fs_path(rel))
        return info.type == pafs.FileType.Directory and not self.is_table_dir(rel)

    def list_namespaces(self, namespace=()) -> list[tuple[str, ...]]:
        rel = self._ident_path(namespace)
        out = []
        for child in self._child_dirs(rel):
            child_rel = posixpath.join(rel, child) if rel else child
            verdict = self._probe_table_dir(child_rel)
            if verdict is None:
                continue  # unreadable subtree, suppressed: skip, don't guess
            if not verdict:
                out.append(tuple(namespace) + (child,))
        return out

    def drop_namespace(self, namespace) -> None:
        rel = self._ident_path(namespace)
        if not self._namespace_exists(namespace):
            raise NoSuchTableError(f"no such namespace {rel}")
        if self._child_dirs(rel):
            # refuse non-empty (reference :308-310)
            raise NamespaceNotEmptyError(f"namespace {rel} is not empty")
        self.io.fs.delete_dir(self.io._fs_path(rel))

    def load_namespace_metadata(self, namespace) -> dict:
        rel = self._ident_path(namespace)
        if not self._namespace_exists(namespace):
            raise NoSuchTableError(f"no such namespace {rel}")
        return {"location": rel}  # relative, as in the reference (:330-339)

    # -- tables (A15-A19, A24) ------------------------------------------------------
    def new_table_ops(self, namespace, name: str) -> TableOperations:
        return TableOperations(self.io, self.default_warehouse_location(namespace, name))

    def create_table(
        self,
        namespace,
        name: str,
        schema_json: dict,
        partition_by: list[str] | None = None,
        properties: dict | None = None,
        location: str | None = None,
        sort_order: list[str] | None = None,
    ) -> TableOperations:
        rel = self.default_warehouse_location(namespace, name)
        if location is not None and location.rstrip("/") != rel:
            # A24: reject custom locations (reference buildTable guard :378-396)
            raise ValueError(
                f"FsCatalog tables must live at their default location {rel!r}"
            )
        ops = self.new_table_ops(namespace, name)
        if ops.find_version() > 0:
            raise AlreadyExistsError(f"table {rel} already exists")
        meta = new_table_metadata(rel, schema_json, partition_by, properties, sort_order)
        try:
            ops.commit(0, meta)
        except CommitFailedError:
            # two racing creators: the loser's failed v1 commit means
            # the table now exists — surface the type the sequential
            # path raises, not a commit-protocol internal
            raise AlreadyExistsError(f"table {rel} already exists") from None
        return ops

    def load_table(self, namespace, name: str) -> TableOperations:
        ops = self.new_table_ops(namespace, name)
        ops.current()  # raises NoSuchTableError if absent
        return ops

    def table_exists(self, namespace, name: str) -> bool:
        return self.is_table_dir(self.default_warehouse_location(namespace, name))

    def list_tables(self, namespace) -> list[str]:
        rel = self._ident_path(namespace)
        return [
            child
            for child in self._child_dirs(rel)
            if self._probe_table_dir(posixpath.join(rel, child) if rel else child)
        ]

    def drop_table(self, namespace, name: str, purge: bool = False) -> bool:
        rel = self.default_warehouse_location(namespace, name)
        if not self.is_table_dir(rel):
            return False
        if purge:
            self.io.delete_prefix(rel)  # data + metadata + dir (reference :229-231)
        else:
            self.io.delete_prefix(f"{rel}/metadata")
        return True

    def rename_table(self, src, dst, *rest) -> None:
        # A19: unsupported for path-based tables (reference :238-241);
        # accepts either (src, dst) idents or the JdbcCatalog 4-arg form
        raise NotImplementedError(
            "cannot rename tables in a path-based catalog; use JdbcCatalog"
        )
