"""Schema-evolution reconciler: change-event schema → table DDL.

The north_rule requires add / rename / type-widen columns in the
change stream to map onto table schema updates.  The reference's
analogue is implicit: enrichment stages silently add dict keys and
the uploader invalidates its column cache when the column set changes
(realdeal/real_deal_batch_uploader.py:90-92); here the diff is
explicit, versioned, and applied *before* the epoch's MERGE so the
batch lands under the new schema.

Rename handling: a rename is indistinguishable from drop+add by
schema diff alone (CDC streams carry names, not field ids), so
renames arrive as an explicit hint map — exactly how real CDC
pipelines handle it (Debezium schema-change topics carry the rename).
Everything else is inferred:

- event column absent from table → ``add_column``
- event column type wider than table's (int→bigint→double,
  float→double) → ``widen_column``
- event column *narrower* → no table change (the MERGE casts the
  source up to the table type; lossless by the widen lattice)
- table column absent from events → no change (MERGE fills typed
  nulls in replace mode / keeps target values in coalesce mode)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

from realdeal_spark.lake.table import LakeTable, _can_widen


@dataclass
class EvolutionAction:
    kind: str  # "rename" | "add" | "widen"
    column: str
    detail: str

    def __str__(self) -> str:
        return f"{self.kind} {self.column} ({self.detail})"


# columns of the change-event envelope that are not table data columns
ENVELOPE_COLS = {"op"}


def plan_evolution(
    table: LakeTable,
    event_schema: T.StructType,
    renames: dict[str, str] | None = None,
) -> list[EvolutionAction]:
    """Diff the incoming event schema against the table; return the
    ordered actions that would reconcile them (renames first, so an
    add of the new name is not mistaken for a fresh column)."""
    snap = table.snapshot()
    cur = {f["name"]: f["type"] for f in table._schema_version(
        snap, snap.current_schema).fields}
    actions: list[EvolutionAction] = []
    for old, new in (renames or {}).items():
        if old in cur and new not in cur:
            actions.append(EvolutionAction("rename", old, f"-> {new}"))
            cur[new] = cur.pop(old)
    for f in event_schema.fields:
        name, etype = f.name, f.dataType.simpleString()
        if name in ENVELOPE_COLS:
            continue
        if name not in cur:
            actions.append(EvolutionAction("add", name, etype))
            cur[name] = etype
        elif etype != cur[name] and _can_widen(cur[name], etype):
            actions.append(EvolutionAction("widen", name, f"{cur[name]} -> {etype}"))
            cur[name] = etype
        # narrower / equal / non-widenable: MERGE-side cast handles it
    return actions


def apply_evolution(table: LakeTable, actions: list[EvolutionAction]) -> None:
    """Apply planned actions as table schema commits (one snapshot
    each; all metadata-only — no data files rewritten)."""
    for a in actions:
        if a.kind == "rename":
            table.rename_column(a.column, a.detail.split("-> ")[1])
        elif a.kind == "add":
            table.add_column(a.column, a.detail)
        elif a.kind == "widen":
            table.widen_column(a.column, a.detail.split("-> ")[1])
        else:  # pragma: no cover
            raise ValueError(f"unknown action {a}")


def reconcile(
    table: LakeTable,
    event_schema: T.StructType,
    renames: dict[str, str] | None = None,
) -> list[EvolutionAction]:
    """plan + apply; returns the actions taken (empty = no drift)."""
    actions = plan_evolution(table, event_schema, renames)
    apply_evolution(table, actions)
    return actions
