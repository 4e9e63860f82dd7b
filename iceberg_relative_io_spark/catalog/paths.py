"""Path relativization — the reference's single core idea.

Every path stored in table metadata is relative to the warehouse root, so
the warehouse can be moved (or re-read under a different protocol, e.g.
posix -> s3a) without rewriting any metadata. Semantics mirror the
reference exactly:

- absolutize: absolute URIs pass through unchanged; relative paths get the
  warehouse prefix (reference RelativeFileIO.java:31-36).
- relativize: strip the warehouse prefix when present, else return
  unchanged (reference RelativeFileIO.java:38-40).
- the warehouse root is normalized to trailing-slash form (reference
  RelativeFileIO.java:50, HadoopRelativeCatalog.java:85).
"""

from __future__ import annotations

from urllib.parse import urlparse

_SCHEME_MARK = "://"


def normalize_warehouse(warehouse: str) -> str:
    """Strip trailing slashes then re-append exactly one."""
    if not warehouse:
        raise ValueError("warehouse location is required and cannot be empty")
    return warehouse.rstrip("/") + "/"


def is_absolute(location: str) -> bool:
    """True for URIs with a scheme (s3a://..., file:/...) or rooted posix
    paths. Mirrors the reference's `new Path(location).isAbsolute()`."""
    if location.startswith("/"):
        return True
    parsed = urlparse(location)
    return bool(parsed.scheme) and (_SCHEME_MARK in location or location.startswith("file:"))


def absolute_location(warehouse: str, location: str) -> str:
    """Relative -> warehouse-prefixed; absolute passes through."""
    if is_absolute(location):
        return location
    return normalize_warehouse(warehouse) + location


def relative_location(warehouse: str, location: str) -> str:
    """Strip the warehouse prefix if present; else return unchanged."""
    w = normalize_warehouse(warehouse)
    if location.startswith(w):
        return location[len(w):]
    return location
