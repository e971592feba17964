"""Canonical Data Vault hash-key / hash-diff expressions.

The correctness keystone of the whole engine: every hub key, link key and
satellite hash-diff is

    <algo>(upper(concat_ws('||', coalesce(cast(f1 as string),''), ...)))

which is byte-identical to the hash the reference system computes
(``/root/reference/mallarddv/datavault/hash_generator.py:32-46`` —
``sha1(upper(concat_ws('||', coalesce(f::string,'') ...)))``): lowercase hex,
40 chars for SHA1. NULL inputs coalesce to '' (this is why "ghost" hub rows
for NULL business keys hash to sha1('')).

Cross-engine cast fidelity (differential-tested in ``test_hashing``):
int/bool/decimal/date/timestamp (every fractional shape) render identically
in Spark and DuckDB. The ONE divergent type is FLOAT/DOUBLE at magnitudes
≥ 1e7: Spark renders scientific (``1.0E7``), DuckDB plain
(``10000000.0``). Don't use raw floating-point columns as hash inputs —
apply a ``cast(# as decimal(...))`` metadata transformation first (exact
decimals render identically, and a float business key is a modeling smell
anyway).

Everything is a Catalyst expression — JVM-side, whole-stage-codegen'd, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from mallarddv_spark.exceptions import DVConfigurationError

#: hash algorithms supported for key/diff generation. ``sha1`` is the
#: reference-parity default; ``md5`` is used by oracle-checked queries
#: (available in both Spark and DuckDB 1.0).
SUPPORTED_ALGOS = ("sha1", "md5", "sha256")


#: ANSI-reserved words that break generated SQL when used bare as column
#: aliases (subset of Spark's reserved list that plausibly appears as a
#: business column name). Anything here is backtick-quoted unconditionally.
_SQL_KEYWORDS = frozenset(
    """all and any as asc between by case cast create current current_date
    current_time current_timestamp current_user default delete desc distinct
    drop else end escape except exists false filter for foreign from full
    grant group having in inner insert intersect interval into is join
    lateral leading left like limit natural not null offset on only or order
    outer overlaps partition position primary references right select
    session_user set some table then time timestamp to trailing true union
    unique unknown update user using values when where window with""".split()
)


def quote_ident(name: str) -> str:
    """Backtick-quote an identifier when it needs quoting (e.g. spaces,
    leading digits, SQL keywords, empty/exotic names).

    The reference double-quotes identifiers containing spaces
    (``hub_manager.py:66-70``); Spark SQL uses backticks. A column literally
    named ``order`` or ``from`` must be quoted too, and an empty name must
    not crash the generator (it yields a quoted empty identifier, which
    Spark then rejects with a clear parse error instead of an IndexError
    here).
    """
    if (
        name
        and name.replace("_", "a").isalnum()
        and not name[0].isdigit()
        and name.lower() not in _SQL_KEYWORDS
    ):
        return name
    return "`" + name.replace("`", "``") + "`"


def _algo_sql(inner: str, algo: str) -> str:
    if algo == "sha256":
        return f"sha2({inner}, 256)"
    if algo not in SUPPORTED_ALGOS:
        raise DVConfigurationError(f"unsupported hash algo: {algo}")
    return f"{algo}({inner})"


def hash_sql(fields: list[str], alias: str | None = None, algo: str = "sha1") -> str:
    """SQL-string form of the canonical hash over ``fields`` (in order).

    Field order matters — it is the metadata ``position`` order. Each field
    may be any SQL expression (already-transformed columns included).
    """
    coalesced = ",".join(f"coalesce(cast({f} as string),'')" for f in fields)
    inner = f"upper(concat_ws('||',{coalesced}))"
    out = _algo_sql(inner, algo)
    if alias:
        out = f"{out} as {quote_ident(alias)}"
    return out


def hash_col(fields: list[Column | str], algo: str = "sha1") -> Column:
    """Column form of the canonical hash (same bytes as :func:`hash_sql`)."""
    cols = [F.col(f) if isinstance(f, str) else f for f in fields]
    parts = [F.coalesce(c.cast("string"), F.lit("")) for c in cols]
    inner = F.upper(F.concat_ws("||", *parts))
    if algo == "sha1":
        return F.sha1(inner)
    if algo == "md5":
        return F.md5(inner)
    if algo == "sha256":
        return F.sha2(inner, 256)
    raise DVConfigurationError(f"unsupported hash algo: {algo}")


def apply_transformation(field_sql: str, transformation: str | None) -> str:
    """Apply a metadata ``transformation`` expression to a source field.

    ``#`` is the placeholder for the source expression, e.g. ``trim(#)``
    (reference: ``hash_generator.py:95``; ``demo/transitions.csv`` rows with
    ``trim(#)``). The transformation runs *upstream* of both the stored value
    and the hash — a trimmed name is stored trimmed and hashed trimmed.
    """
    return (transformation or "#").replace("#", field_sql)


def raw_literal_sql(value: str, alias: str) -> str:
    """A metadata ``raw=true`` field: the *string literal* ``value`` aliased
    as a column (reference: ``hash_generator.py:104-110``)."""
    escaped = value.replace("'", "''")
    return f"'{escaped}' as {quote_ident(alias)}"
