"""Structured Streaming queries (B30/B31) — filled in in M3."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
