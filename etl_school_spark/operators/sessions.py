"""Gap-based sessionization, including the hot-key scale path.

``gap_sessions`` is the plain formulation: one window partition per key
(lag flag + running sum). Correct and one-shuffle, but a key with a
billion events serializes onto one reducer — the window-skew limitation
AQE cannot split (documented in PLANS.md).

``gap_sessions_sharded`` is the boundary-stitch design for that case:

1. shard each key's history by fixed time ranges (``shard_us``) and
   sessionize WITHIN (key, shard) — the hot key's rows now spread over
   #shards reducers;
2. collapse to per-session summaries (start, end, n) — one row per
   session, orders of magnitude smaller than the event rows;
3. re-run the SAME gap rule over the summaries per key: two adjacent
   sessions merge exactly when the gap between the earlier session's
   last event and the later session's first event is under the gap —
   which is precisely the event-level rule, so stitching is EXACT, and
   transitive chains (a session spanning many shards) merge through the
   same running-sum mechanism.

The stitch pass shuffles only session summaries, so the hot key costs
O(#its sessions) on one reducer instead of O(#its events) — the skew
escape hatch promised by the PLANS.md note, equivalence-locked against
the plain formulation in tests/test_operators.py.

New-session convention: a gap >= ``gap_us`` starts a new session (the
same boundary rule as Spark's native ``session_window``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sessionize(df: DataFrame, parts: list[str], ts: str, tiebreak: str, gap_us: int) -> DataFrame:
    """Per-partition gap sessions → summary rows (parts..., ses_start,
    ses_end, n_events)."""
    w = Window.partitionBy(*parts).orderBy(ts, tiebreak)
    flagged = df.withColumn("_prev", F.lag(ts).over(w)).withColumn(
        "_ns",
        F.when(
            F.col("_prev").isNull()
            | (F.expr(f"timestampdiff(MICROSECOND, _prev, {ts})") >= gap_us),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "_sid", F.sum("_ns").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy(*parts, "_sid").agg(
        F.min(ts).alias("ses_start"),
        F.max(ts).alias("ses_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def gap_sessions(
    df: DataFrame,
    key: str,
    ts: str,
    gap_us: int,
    tiebreak: str,
) -> DataFrame:
    """Sessions per key: (key, ses_start, ses_end, n_events)."""
    return _sessionize(df, [key], ts, tiebreak, gap_us).drop("_sid")


def gap_sessions_sharded(
    df: DataFrame,
    key: str,
    ts: str,
    gap_us: int,
    tiebreak: str,
    shard_us: int = 30 * 24 * 3600 * 1_000_000,
) -> DataFrame:
    """Same output contract as ``gap_sessions`` via shard + stitch (see
    module doc). ``shard_us`` defaults to ~month shards; any value works
    — correctness does not depend on where boundaries fall."""
    epoch_us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts})"
    )
    sharded = df.withColumn("_shard", F.floor(epoch_us / F.lit(int(shard_us))))
    level1 = _sessionize(sharded, [key, "_shard"], ts, tiebreak, gap_us)

    # stitch: the event-gap rule applied to session summaries per key.
    # summaries from consecutive shards are disjoint in time and ordered
    # by ses_start, so lag(ses_end) IS the previous session's last event.
    w = Window.partitionBy(key).orderBy("ses_start", "ses_end")
    flagged = level1.withColumn("_prev_end", F.lag("ses_end").over(w)).withColumn(
        "_ns",
        F.when(
            F.col("_prev_end").isNull()
            | (F.expr("timestampdiff(MICROSECOND, _prev_end, ses_start)") >= gap_us),
            1,
        ).otherwise(0),
    )
    stitched = flagged.withColumn(
        "_gid", F.sum("_ns").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        stitched.groupBy(key, "_gid")
        .agg(
            F.min("ses_start").alias("ses_start"),
            F.max("ses_end").alias("ses_end"),
            F.sum("n_events").alias("n_events"),
        )
        .drop("_gid")
    )
