"""Slowly-changing-dimension Type 2 maintenance.

Two complementary shapes behind the same scale design (every branch an
equi/anti-join on the business key — one shuffle key throughout, no
row-by-row merge; with Delta/Iceberg on the classpath either becomes a
single MERGE INTO, the seam is the function signature):

- :func:`scd2_merge` — delta-feed style: apply an updates batch to a
  [key, tracked..., valid_from, valid_to, is_current] table with a
  9999-12-31 open sentinel; keys absent from the batch are untouched.
- :func:`scd2_apply` — full-snapshot style: fold a complete snapshot
  into a [keys..., tracked..., valid_from, valid_to] history with
  half-open [valid_from, valid_to) validity (NULL = open), map-side
  sha2 change hashes, optional close_missing for deletion semantics,
  plus :func:`scd2_current` / :func:`scd2_as_of` views.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amadou_spark.scale import materialize_shared

OPEN_END = "9999-12-31"

def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked_cols: list[str],
    effective_date: str,
) -> DataFrame:
    """Apply `updates` (one row per key) to an SCD2 `current` table with
    columns [key, *tracked_cols, valid_from, valid_to, is_current].

    The open-rows and updates tables are checkpointed: each feeds 3-4
    branches (the change join, the close semi-join, the brand-new
    anti-join, the new-versions semi-join), and column pruning
    specializes every un-checkpointed copy so exchange reuse cannot
    dedup them — the r7 duplicate-subtree audit measured the caller's
    input re-scanned 18x through this fan-out. SCD2 tables are
    dimension-grain, so the two copies are cheap; the joins then read
    materialized blocks."""
    upd = materialize_shared(updates.select(key, *tracked_cols))

    open_rows = materialize_shared(current.filter(F.col("is_current")))
    closed_rows = current.filter(~F.col("is_current"))

    # explicit marker distinguishes "no update row" from "update with
    # NULLs" — a NULL-vs-value comparison must not count as a change
    # when the key simply received no update
    upd_marked = upd.withColumn("_has_upd", F.lit(True))
    change_cond = F.lit(False)
    for c in tracked_cols:
        change_cond = change_cond | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
    change_cond = F.coalesce(F.col("upd._has_upd"), F.lit(False)) & change_cond

    joined = open_rows.alias("cur").join(upd_marked.alias("upd"), key, "left")
    unchanged = joined.filter(~change_cond).select("cur.*")
    changed_keys = joined.filter(change_cond).select(F.col(key).alias("_k")).distinct()

    closed_out = (
        open_rows.join(changed_keys, open_rows[key] == F.col("_k"), "left_semi")
        .withColumn("valid_to", F.lit(effective_date).cast("date"))
        .withColumn("is_current", F.lit(False))
    )
    brand_new = upd.join(open_rows, key, "left_anti")
    new_versions = (
        upd.join(changed_keys, upd[key] == F.col("_k"), "left_semi")
        .unionByName(brand_new)
        .withColumn("valid_from", F.lit(effective_date).cast("date"))
        .withColumn("valid_to", F.lit(OPEN_END).cast("date"))
        .withColumn("is_current", F.lit(True))
    )
    return closed_rows.unionByName(unchanged).unionByName(closed_out).unionByName(
        new_versions
    )


# 64 chars outside sha2's hex alphabet — cannot collide with any real
# per-column digest, so NULL is distinguished from every string value
# (including the empty string and strings that look like digests)
_NULL_HASH = "x" * 64


def _change_hash(cols: Sequence[str]) -> F.Column:
    """Order-stable sha2 over the tracked columns.

    Each column is hashed INDEPENDENTLY and the fixed-width (64 hex
    char) digests are concatenated before the outer sha2 — separator-
    free and unambiguous: values containing any separator byte can
    never shift content across column boundaries (a ``concat_ws``
    scheme lets ``('a\\x01b', 'c')`` hash equal to ``('a', 'b\\x01c')``
    and silently miss a real change)."""
    parts = [
        F.coalesce(F.sha2(F.col(c).cast("string"), 256), F.lit(_NULL_HASH))
        for c in cols
    ]
    return F.sha2(F.concat(*parts), 256)


def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    snapshot_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    close_missing: bool = False,
    check_unique: bool = True,
) -> DataFrame:
    """Fold one full snapshot into an SCD2 history table.

    ``history`` columns: ``keys + tracked + [valid_from, valid_to]``
    with ``valid_to IS NULL`` marking the open (current) version —
    half-open ``[valid_from, valid_to)`` validity, one open row per key.
    ``snapshot`` columns: ``keys + tracked`` (the full current state).

    Per key:
    - unchanged (same tracked values)      → open row passes through;
    - changed                              → open row closes at
      ``snapshot_ts``, a new open row starts at ``snapshot_ts``;
    - new key                              → new open row;
    - absent from the snapshot             → open row passes through,
      or closes at ``snapshot_ts`` when ``close_missing=True`` (use
      True for full snapshots where absence means deletion, False for
      partial/delta feeds).

    Closed rows are immutable and never join. Deterministic: same
    inputs + same ``snapshot_ts`` → identical output (idempotent —
    re-applying the same snapshot changes nothing).
    """
    keys = list(keys)
    tracked = list(tracked)
    ts = F.lit(snapshot_ts).cast("timestamp")

    closed = history.filter(F.col(valid_to).isNotNull())
    open_rows = history.filter(F.col(valid_to).isNull())

    if check_unique:
        # Integrity gate: the full-outer join below assumes ONE open row
        # per key in history and ONE row per key in the snapshot — a
        # duplicate on either side fans the join out and silently writes
        # several open rows per key, permanently corrupting the
        # one-open-row invariant that scd2_current and every later apply
        # depend on. One key-only shuffle job (fixed-width keys, payload
        # never moves); disable only when the caller guarantees
        # uniqueness upstream.
        dups = (
            open_rows.select(*keys).withColumn("_side", F.lit("history(open)"))
            .unionByName(
                snapshot.select(*keys).withColumn("_side", F.lit("snapshot"))
            )
            .groupBy("_side", *keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(5)
            .collect()
        )
        if dups:
            shown = ", ".join(
                f"{r['_side']}:{[r[k] for k in keys]}×{r['_n']}" for r in dups
            )
            raise ValueError(
                "scd2_apply: duplicate business keys would fan out the "
                f"full-outer join and corrupt the history — {shown}. "
                "Dedup deterministically upstream or pass "
                "check_unique=False if uniqueness is guaranteed."
            )

    cur = open_rows.withColumn("_cur_hash", _change_hash(tracked))
    snap = snapshot.select(
        *keys, *tracked
    ).withColumn("_snap_hash", _change_hash(tracked))

    # one full-outer equi-join on the business key decides every case
    cur_k = cur.select(*keys, "_cur_hash", valid_from, *tracked)
    snap_k = snap.select(
        *[F.col(c).alias(f"_s_{c}") for c in keys],
        *[F.col(c).alias(f"_sv_{c}") for c in tracked],
        "_snap_hash",
    )
    cond = [F.col(k).eqNullSafe(F.col(f"_s_{k}")) for k in keys]
    # checkpoint the decision join: THREE branches (keep_open,
    # close_now, open_now) read it, and column pruning specializes
    # every un-checkpointed copy so the full-outer join would
    # re-execute per branch (r7 duplicate-subtree audit). Safe to cut
    # here — the snap side is pre-renamed, so no qualifier is needed
    # downstream.
    j = materialize_shared(cur_k.join(snap_k, on=cond, how="full_outer"))

    in_cur = F.col("_cur_hash").isNotNull()
    in_snap = F.col("_snap_hash").isNotNull()
    changed = in_cur & in_snap & (F.col("_cur_hash") != F.col("_snap_hash"))

    # surviving open rows: unchanged, or missing-from-snapshot when the
    # feed is partial
    keep_open = j.filter(
        (in_cur & in_snap & ~changed)
        | (in_cur & ~in_snap & F.lit(not close_missing))
    ).select(
        *keys, *tracked, valid_from, F.lit(None).cast("timestamp").alias(valid_to)
    )
    # open rows that close at this snapshot
    close_now = j.filter(
        changed | (in_cur & ~in_snap & F.lit(close_missing))
    ).select(*keys, *tracked, valid_from, ts.alias(valid_to))
    # rows that open at this snapshot: changed values + brand-new keys
    open_now = j.filter(changed | (~in_cur & in_snap)).select(
        *[F.coalesce(F.col(f"_s_{k}"), F.col(k)).alias(k) for k in keys],
        *[F.col(f"_sv_{c}").alias(c) for c in tracked],
        ts.alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
    )

    out_cols = keys + tracked + [valid_from, valid_to]
    return (
        closed.select(*out_cols)
        .unionByName(keep_open)
        .unionByName(close_now)
        .unionByName(open_now)
    )


def scd2_current(history: DataFrame, valid_to: str = "valid_to") -> DataFrame:
    """The dimension's current state: the open version of every key."""
    return history.filter(F.col(valid_to).isNull())


def scd2_as_of(
    history: DataFrame,
    ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time view: rows whose half-open validity contains ts."""
    t = F.lit(ts).cast("timestamp")
    return history.filter(
        (F.col(valid_from) <= t)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > t))
    )
