"""CDC merge-apply: the set-based replacement for the reference's
row-at-a-time EDIT/DELETE write path (src/database.rs:700-813 stages
per-slot rewrites; SURVEY §2.1 S4/S5). At warehouse scale, changes
arrive as batches and apply as one declarative MERGE over the snapshot
— the Delta/Iceberg `MERGE INTO` semantic, expressed with joins.

Composes with `latest_per_key` (q85): a raw change STREAM first
collapses to one row per key (newest wins), producing the unique-key
batch this operator requires; the merged output is the next snapshot
(storage/warehouse.py's snapshot-swap commit makes it live atomically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply a CDC batch to a base snapshot and return the new snapshot.

    ``changes`` carries the base columns plus ``op_col`` ∈ {'I','U','D'}
    with at most one row per key (collapse with latest_per_key first).
    Semantics: D removes the key; U/I insert the change row (an upsert —
    U for an existing key, I for a new one; both reduce to
    anti-join + append, so a mis-labeled op cannot corrupt the result).

    Scale shape: a change batch is tiny next to a 100 TB snapshot, so
    the touched-key set broadcasts (default) and the whole merge is one
    map-side anti-join over the base scan plus a union — the base never
    shuffles and untouched rows stream through unmodified. Pass
    ``broadcast_changes=False`` for backfill-sized batches; the plan
    degrades to a shuffled anti-join that still scales.
    """
    touched = changes.select(key).distinct()
    if broadcast_changes:
        touched = F.broadcast(touched)
    upserts = changes.filter(F.col(op_col) != "D").drop(op_col)
    return base.join(touched, key, "left_anti").unionByName(upserts)
