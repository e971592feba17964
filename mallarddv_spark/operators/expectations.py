"""Declarative data-quality expectations over any DataFrame.

A training-data pipeline (and a Data Vault staging contract) needs cheap,
scale-safe constraint checking: *"these columns are never null, this key is
unique, this value is in range / in set / matches a pattern, this foreign
key resolves."* This module compiles a rule list into the minimum number of
Spark jobs:

* every **row-level** rule (not_null / in_range / in_set / matches /
  custom predicate) becomes one boolean column in a SINGLE aggregate pass
  over the table — one scan regardless of rule count, all JVM-side;
* each **unique** rule is a two-phase ``groupBy(keys).count`` (its own
  shuffle — unavoidable, and deliberately NOT folded into the row pass:
  mixing countDistinct with other aggregates makes Catalyst plan an Expand
  that replicates every row per distinct-rule);
* each **referential** rule is a left-anti join against the referenced
  table (Catalyst broadcasts small reference sides automatically; at lake
  scale a large dim anti-join shuffles on the key — the right plan).

The report is one row per rule: ``(rule, kind, target, violations, total,
passed)``. Aggregate results are scalars, so assembling the report on the
driver is control-plane work, not a data collect.

No reference twin: the reference engine ships no constraint checker; this
is part of the pipeline-operator surface (SURVEY §6 scope).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window, functions as F

from mallarddv_spark.exceptions import DVConfigurationError


@dataclass(frozen=True)
class Expectation:
    """One rule. ``fail`` is a Column predicate that is True for VIOLATING
    rows (row-level kinds only)."""

    name: str
    kind: str
    target: str
    fail: Column | None = None
    keys: tuple[str, ...] = ()
    ref: DataFrame | None = field(default=None, compare=False)
    ref_col: str | None = None


def _reject_duplicate_names(rules: list[Expectation]) -> None:
    """Rule names label report rows and ``violated_rules`` tags; two rules
    sharing a name (easy via explicit ``name=`` or ``expect_that``) would
    make those outputs ambiguous — fail fast instead."""
    seen: set[str] = set()
    dupes = sorted({r.name for r in rules if r.name in seen or seen.add(r.name)})
    if dupes:
        raise DVConfigurationError(
            f"duplicate expectation names: {dupes} — give each rule a "
            "distinct name"
        )


def expect_not_null(col: str, name: str | None = None) -> Expectation:
    return Expectation(
        name or f"not_null({col})", "not_null", col, F.col(col).isNull()
    )


def expect_in_range(
    col: str, lo, hi, name: str | None = None
) -> Expectation:
    """Violation: value outside [lo, hi]. NULLs pass (compose with
    expect_not_null to forbid them)."""
    c = F.col(col)
    return Expectation(
        name or f"in_range({col},{lo},{hi})",
        "in_range",
        col,
        c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi)),
    )


def expect_in_set(col: str, values, name: str | None = None) -> Expectation:
    c = F.col(col)
    return Expectation(
        name or f"in_set({col})",
        "in_set",
        col,
        c.isNotNull() & ~c.isin(list(values)),
    )


def expect_matches(col: str, pattern: str, name: str | None = None) -> Expectation:
    c = F.col(col)
    return Expectation(
        name or f"matches({col})",
        "matches",
        col,
        c.isNotNull() & ~c.rlike(pattern),
    )


def expect_that(predicate: Column, name: str) -> Expectation:
    """Custom row-level rule: ``predicate`` is True for rows that PASS."""
    return Expectation(name, "custom", name, ~predicate)


def expect_unique(*cols: str, name: str | None = None) -> Expectation:
    return Expectation(
        name or f"unique({','.join(cols)})", "unique", ",".join(cols), keys=cols
    )


def expect_ref(
    col: str, ref: DataFrame, ref_col: str, name: str | None = None
) -> Expectation:
    """Violation: a non-null value with no match in ``ref[ref_col]``."""
    return Expectation(
        name or f"ref({col})", "ref", col, ref=ref, ref_col=ref_col
    )


def split_by_expectations(
    df: DataFrame, rules: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split: returns ``(good, bad)`` where ``bad`` carries an
    extra ``violated_rules`` column (semicolon-joined rule names — default
    names contain commas, so ``;`` is the unambiguous delimiter) and
    ``good`` has the original schema. Every rule kind participates:

    * row-level rules tag rows in the same single projection;
    * ``unique`` keeps the FIRST row per key (ordered by the remaining
      columns for determinism) and tags the rest;
    * ``ref`` tags rows via a join against the distinct reference keys
      (broadcast by Catalyst when small).

    This is the quarantine alternative to the all-or-nothing flow gate:
    load ``good``, land ``bad`` in a dead-letter table for triage.
    """
    if not rules:
        raise DVConfigurationError("split_by_expectations: empty rule list")
    _reject_duplicate_names(rules)
    tagged = df
    tag_cols = []
    for i, r in enumerate(rules):
        c = f"__x{i}"
        tag_cols.append((c, r.name))
        if r.fail is not None:
            tagged = tagged.withColumn(c, F.coalesce(r.fail, F.lit(False)))
        elif r.kind == "unique":
            order = [k for k in df.columns if k not in r.keys] or list(r.keys)
            w = F.row_number().over(
                Window.partitionBy(*r.keys).orderBy(*order)
            )
            tagged = tagged.withColumn(c, w > 1)
        elif r.kind == "ref":
            ref = r.ref.select(
                F.col(r.ref_col).alias(r.target)
            ).distinct().withColumn("__hit", F.lit(True))
            tagged = tagged.join(ref, r.target, "left").withColumn(
                c, F.col(r.target).isNotNull() & F.col("__hit").isNull()
            ).drop("__hit")
        else:  # pragma: no cover
            raise DVConfigurationError(f"unknown expectation kind: {r.kind}")
    violated = F.concat_ws(
        ";", *[F.when(F.col(c), F.lit(name)) for c, name in tag_cols]
    )
    any_bad = None
    for c, _ in tag_cols:
        any_bad = F.col(c) if any_bad is None else (any_bad | F.col(c))
    out_cols = df.columns
    good = tagged.filter(~any_bad).select(*out_cols)
    bad = tagged.filter(any_bad).select(
        *out_cols, violated.alias("violated_rules")
    )
    return good, bad


def run_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns the report DataFrame
    ``(rule, kind, target, violations, total, passed)`` ordered as given.
    """
    if not rules:
        raise DVConfigurationError("run_expectations: empty rule list")
    _reject_duplicate_names(rules)
    spark = df.sparkSession

    row_rules = [(i, r) for i, r in enumerate(rules) if r.fail is not None]
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.sum(r.fail.cast("long")).alias(f"__v{i}") for i, r in row_rules
    ]
    agg_row = df.agg(*aggs).first()
    total = int(agg_row["__total"])
    # keyed by rule INDEX, not name — names are caller-supplied and a
    # collision must not silently alias two rules' counts
    row_violations = {i: int(agg_row[f"__v{i}"] or 0) for i, _ in row_rules}

    results: list[tuple] = []
    for i, r in enumerate(rules):
        if r.fail is not None:
            v = row_violations[i]
        elif r.kind == "unique":
            # duplicates = rows beyond the first of each key group
            dup = (
                df.groupBy(*[F.col(k) for k in r.keys])
                .count()
                .filter(F.col("count") > 1)
                .agg(F.sum(F.col("count") - 1).alias("d"))
                .first()
            )
            v = int(dup["d"] or 0)
        elif r.kind == "ref":
            ref = r.ref.select(F.col(r.ref_col).alias(r.target)).distinct()
            v = (
                df.filter(F.col(r.target).isNotNull())
                .join(ref, r.target, "left_anti")
                .count()
            )
        else:  # pragma: no cover - constructors prevent this
            raise DVConfigurationError(f"unknown expectation kind: {r.kind}")
        results.append((r.name, r.kind, r.target, v, total, v == 0))

    from mallarddv_spark.functions.litframe import literal_frame

    return literal_frame(
        spark, results, "rule string, kind string, target string, "
                        "violations long, total long, passed boolean"
    )
