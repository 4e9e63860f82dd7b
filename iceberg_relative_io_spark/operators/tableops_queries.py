"""Catalog/table-format-backed queries (B2/B3/B28/B29) — filled in in M2."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
