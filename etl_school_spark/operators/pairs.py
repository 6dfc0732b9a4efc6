"""Pair generation within co-occurrence groups (the LSH-bucket primitive).

``pairs_within_groups`` replaces the bucket SELF-JOIN shape

    a.join(b, group_cols + [a.id < b.id]).select(id_a, id_b).dropDuplicates()

with groupBy(group) → collect_list(id) → expression-side pair expansion.
Same candidate set, two structural wins measured on this engine:

- the upstream plan runs ONCE. A self-join evaluates its (often
  expensive — MinHash signatures, hyperplane codes) child on BOTH sides;
  Spark's ReuseExchange does not apply when one side becomes a broadcast
  build. Here the child feeds a single groupBy shuffle.
- the shuffle carries one row per (group, id) instead of the join's one
  row per colliding PAIR.

Group sizes are collision-bounded (an LSH bucket's membership), so the
in-group quadratic expansion is the same work the join did — just
JVM-side over a grouped array, with no second evaluation of the child.
At 100 TB a genuinely hot bucket (mass-duplicated content) concentrates
its s·(s−1)/2 pair STRUCTS into one reducer ROW under the array
expansion — the r8-measured failure mode (a 16,390-member bucket's
134 M structs never finished). ``max_group_size`` (r9) routes groups
past that bound through a streaming self-join over the group's
re-exploded (group, id) rows instead: pair rows then flow through
codegen with no per-group array materialization, while the expensive
child STILL runs once (both branches consume the same groupBy exchange,
deduplicated by ReuseExchange — asserted in test). The census
(dedup/census.py) tells each corpus where its buckets sit relative to
the bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairs_within_groups(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    max_group_size: int | None = None,
) -> DataFrame:
    """Distinct unordered pairs (id_a < id_b) of ids sharing any group.

    Output columns: id_a, id_b (the id column's type). With
    ``max_group_size`` set, groups larger than it generate their pairs
    via a row-streaming self-join instead of the in-array expansion —
    identical output for any value (module docstring)."""
    grouped = (
        df.groupBy(*group_cols)
        .agg(F.collect_list(id_col).alias("_ids"))
        .filter(F.size("_ids") > 1)
    )
    small = (
        grouped
        if max_group_size is None
        else grouped.filter(F.size("_ids") <= max_group_size)
    )
    ids_s = F.array_sort(F.col("_ids"))
    pairs = F.flatten(
        F.transform(
            ids_s,
            lambda x, i: F.transform(
                F.slice(ids_s, i + 2, F.size(ids_s)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    out = (
        small.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        # array_sort makes x <= y; strict filter guards hypothetical
        # duplicate ids within one group (the join's a.id < b.id semantics)
        .filter(F.col("id_a") < F.col("id_b"))
    )
    if max_group_size is not None:
        hot_rows = grouped.filter(F.size("_ids") > max_group_size).select(
            *group_cols, F.explode("_ids").alias("_id")
        )
        a, b = hot_rows.alias("a"), hot_rows.alias("b")
        # NULL-SAFE group equality, for two load-bearing reasons: a
        # null-keyed group's pairs must not vanish (the array branch
        # keeps them — plain `=` would drop every one), and eqNullSafe
        # prevents the isnotnull pushdown that would otherwise make the
        # join sides' aggregation children non-identical to the small
        # branch's — with it, ALL THREE consumers share ONE groupBy
        # exchange via ReuseExchange (asserted in test), so the
        # expensive upstream (signatures, codes) still runs once
        cond = F.col("a._id") < F.col("b._id")
        for g in group_cols:
            cond = F.col(f"a.{g}").eqNullSafe(F.col(f"b.{g}")) & cond
        hot_pairs = a.join(b, cond).select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        out = out.unionByName(hot_pairs)
    # cross-group duplicates collapse here (and, in the hybrid, the rare
    # pair sharing both a hot and a small group)
    return out.dropDuplicates(["id_a", "id_b"])
