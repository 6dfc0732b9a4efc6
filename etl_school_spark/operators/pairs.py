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
on one reducer either way; cap group size upstream (e.g. drop stop-bands)
if that becomes real skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairs_within_groups(
    df: DataFrame, group_cols: list[str], id_col: str
) -> DataFrame:
    """Distinct unordered pairs (id_a < id_b) of ids sharing any group.

    Output columns: id_a, id_b (the id column's type).
    """
    grouped = (
        df.groupBy(*group_cols)
        .agg(F.collect_list(id_col).alias("_ids"))
        .filter(F.size("_ids") > 1)
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
    return (
        grouped.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        # array_sort makes x <= y; strict filter guards hypothetical
        # duplicate ids within one group (the join's a.id < b.id semantics)
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
