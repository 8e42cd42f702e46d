"""Reusable column-level function helpers (non-query building blocks)."""
