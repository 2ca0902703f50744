"""Shared helpers for the DuckDB oracle mirrors."""

from __future__ import annotations


def sq(text: str) -> str:
    """Escape a string (regex or value) for embedding in a single-quoted
    SQL literal.  Backslash is NOT an escape character in
    standard-conforming strings, so only the quote doubles."""
    return text.replace("'", "''")
