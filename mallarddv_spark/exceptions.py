"""Typed exception hierarchy mirroring the reference library's error
contract (``/root/reference/mallarddv/exceptions.py:7-37``), so callers can
discriminate error classes (catch ``DVEntityError`` vs a blanket
``DVException``) instead of parsing ``ValueError`` strings.

Every class also subclasses its closest builtin (``ValueError`` for the
entity/metadata/configuration errors) so pre-existing callers that caught
``ValueError`` keep working.
"""

from __future__ import annotations


class DVException(Exception):
    """Base exception for the mallarddv_spark engine."""


class DVSQLError(DVException):
    """SQL execution failed. Carries the offending statement and the
    original engine error (reference ``exceptions.py:12-18``)."""

    def __init__(self, message: str, sql: str, original_error: Exception | None = None):
        self.sql = sql
        self.original_error = original_error
        super().__init__(
            f"{message}: {original_error if original_error is not None else ''}"
        )


class DVMetadataError(DVException, ValueError):
    """Metadata (tables/transitions definitions) is invalid or missing."""


class DVEntityError(DVException, ValueError):
    """A Data Vault entity definition violates the model (e.g. a satellite
    with zero or multiple hub keys)."""


class DVConfigurationError(DVException, ValueError):
    """Unsupported configuration value (hash algo, file format, join mode)."""


class DVETLError(DVException):
    """A load/flow stage failed during ETL execution."""
