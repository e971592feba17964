"""Hash-view planning: metadata transitions → column expressions.

Produces the plan for ``stg.{t}_hash_vw``: a projection of transformed
source fields plus one hash column per hub group (``{group}_hk``), link
group (``{group}_hk``) and satellite group (``{group}_hashdiff``).

Semantics mirrored from the reference (``hash_generator.py:69-179``):

* CTE fields = every non-raw source field of transfer_type ∉
  {ll, sat_delta, sat_full}, with its ``transformation`` applied
  (``#`` placeholder), aliased to the source field name; plus every
  ``raw=true`` field as a string literal. (We deduplicate by alias
  deterministically — the reference uses ``set()`` which is
  nondeterministic in order.)
* Hub hashes: ``bk`` rows grouped by group_name, hashed in position order.
* Link hashes: ``ll``/``dk`` rows grouped by group_name. **Link-hash
  expansion** (the one non-obvious semantic, ``hash_generator.py:128-148``):
  an ``ll`` leg names a *hub group*; the link hash is computed over that hub
  group's underlying business-key source fields (recursively expanded), not
  over the hub's hash key. ``dk`` legs contribute their own field.
* Sat hash-diffs: ``f`` rows grouped by group_name, hashed in position order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from mallarddv_spark.functions.hashing import (
    apply_transformation,
    hash_sql,
    quote_ident,
    raw_literal_sql,
)
from mallarddv_spark.plans.model import TransitionRecord, group_records
from mallarddv_spark.exceptions import DVEntityError


@dataclass
class HashViewPlan:
    """Everything needed to emit the hash view for one staging table."""

    stg_table: str
    cte_fields: list[str] = field(default_factory=list)  # SQL "expr as alias"
    hash_fields: list[str] = field(default_factory=list)  # SQL "hash(...) as name"

    def view_sql(self, stg_db: str, algo_note: str = "") -> str:
        cte = ",\n        ".join(self.cte_fields) if self.cte_fields else "*"
        hashes = ",\n        ".join([*self.hash_fields, "*"])
        return (
            f"CREATE OR REPLACE VIEW {stg_db}.{quote_ident(self.stg_table + '_hash_vw')} AS\n"
            f"    WITH cte AS (\n"
            f"        SELECT\n        {cte}\n"
            f"        FROM {stg_db}.{quote_ident(self.stg_table)}\n"
            f"    )\n"
            f"    SELECT\n        {hashes}\n    FROM cte"
        )


def plan_hash_view(
    stg_table: str, records: list[TransitionRecord], algo: str = "sha1"
) -> HashViewPlan:
    """Build the hash-view plan from a staging table's transitions."""
    plan = HashViewPlan(stg_table=stg_table)

    # --- CTE projection: transformed source fields + raw literals ---
    seen: set[str] = set()
    for r in records:
        if r.raw or r.transfer_type in ("ll", "sat_delta", "sat_full"):
            continue
        if r.source_field in seen:
            continue
        seen.add(r.source_field)
        expr = apply_transformation(quote_ident(r.source_field), r.transformation)
        plan.cte_fields.append(f"{expr} as {quote_ident(r.source_field)}")
    for r in records:
        if r.raw and r.source_field not in seen:
            seen.add(r.source_field)
            plan.cte_fields.append(raw_literal_sql(r.source_field, r.source_field))

    # --- hub hash keys ---
    hub_groups = group_records(
        [r for r in records if r.transfer_type == "bk"], ["group_name"]
    )
    for group, rows in hub_groups.items():
        fields = [quote_ident(r.source_field) for r in rows]
        plan.hash_fields.append(hash_sql(fields, alias=f"{group}_hk", algo=algo))

    # --- link hash keys (with hub-group expansion) ---
    link_groups = group_records(
        [r for r in records if r.transfer_type in ("ll", "dk")], ["group_name"]
    )
    for group, rows in link_groups.items():
        fields: list[str] = []
        for r in rows:
            if r.transfer_type == "ll":
                hub_rows = hub_groups.get(r.source_field)
                if hub_rows is None:
                    raise DVEntityError(
                        f"link group '{group}' leg '{r.source_field}' does not "
                        f"match any hub group of staging table '{stg_table}'"
                    )
                fields.extend(quote_ident(h.source_field) for h in hub_rows)
            else:
                fields.append(quote_ident(r.source_field))
        plan.hash_fields.append(hash_sql(fields, alias=f"{group}_hk", algo=algo))

    # --- satellite hash diffs ---
    sat_groups = group_records(
        [r for r in records if r.transfer_type == "f"], ["group_name"]
    )
    for group, rows in sat_groups.items():
        fields = [quote_ident(r.source_field) for r in rows]
        plan.hash_fields.append(hash_sql(fields, alias=f"{group}_hashdiff", algo=algo))

    return plan
