"""Metadata type strings → Spark SQL types.

The reference passes ``column_type`` strings verbatim into DuckDB DDL
(``schema_manager.py:91``); we parse them into Spark types. ``CHAR(n)`` /
``VARCHAR(n)`` map to plain ``string`` (Spark does not enforce length and we
do not want padding semantics on hash keys).
"""

from __future__ import annotations

import re

_VARCHAR_RE = re.compile(r"^(VAR)?CHAR\s*(\(\s*\d+\s*\))?$", re.IGNORECASE)

_SIMPLE = {
    "INTEGER": "int",
    "INT": "int",
    "BIGINT": "bigint",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "HUGEINT": "decimal(38,0)",
    "DOUBLE": "double",
    "FLOAT": "float",
    "REAL": "float",
    "BOOLEAN": "boolean",
    "BOOL": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "DATETIME": "timestamp",
    "VARCHAR": "string",
    "TEXT": "string",
    "STRING": "string",
    "BLOB": "binary",
    "BYTEA": "binary",
    "BINARY": "binary",
}


def spark_type_for(column_type: str | None) -> str:
    """Return the Spark SQL type string for a metadata ``column_type``.

    Unknown types pass through verbatim (Spark will validate at DDL time),
    matching the reference's pass-through stance; empty/None → string.
    """
    if not column_type or not str(column_type).strip():
        return "string"
    t = str(column_type).strip()
    upper = t.upper()
    if upper in _SIMPLE:
        return _SIMPLE[upper]
    if _VARCHAR_RE.match(upper):
        return "string"
    m = re.match(r"^(DECIMAL|NUMERIC)\s*(\(.*\))?$", upper)
    if m:
        return f"decimal{m.group(2) or '(10,0)'}"
    return t
