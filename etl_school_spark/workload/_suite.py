"""Suite assembly: project component query results onto one tagged frame.

The driver's correctness gate checks the FIRST 50 registered queries in
registration order, so the relational/scale families are consolidated
into multi-operator suite queries: every component's full result is
projected onto the suite's shared column frame (missing slots become
typed NULLs), tagged with the component name, and UNION ALL'd. Each
component keeps full value-level checkability — its rows appear
verbatim inside the suite result — while the whole family costs one
driver slot. Component-level exactness is additionally locked by
tests/test_entry.py::test_component_oracle_parity.

Cross-engine alignment rule: the Spark side casts every slot to the
suite type and the oracle side CASTs to the matching DuckDB type, so
UNION type unification can never diverge between engines (this also
retires the DuckDB HUGEINT hazard for windowed integer SUMs — every
integer slot passes through an explicit BIGINT cast on both sides).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# suite schema types → DuckDB cast targets
_DUCK_TYPES = {
    "string": "VARCHAR",
    "long": "BIGINT",
    "double": "DOUBLE",
    "timestamp_ntz": "TIMESTAMP",
}


def tag_branch(
    df: DataFrame, which: str, schema: dict[str, str], **cols: Column | str
) -> DataFrame:
    """Project ``df`` onto the suite frame: lit tag + per-slot cast, with
    typed NULLs for slots the component doesn't fill."""
    sel: list[Column] = [F.lit(which).alias("which")]
    for name, typ in schema.items():
        c = cols.get(name)
        if c is None:
            sel.append(F.lit(None).cast(typ).alias(name))
        else:
            if callable(c) and not isinstance(c, Column):
                c = c()  # lazy Column factory (no session at import time)
            if isinstance(c, str):
                c = F.col(c)
            sel.append(c.cast(typ).alias(name))
    return df.select(*sel)


def union_suite(branches: list[DataFrame]) -> DataFrame:
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def oracle_branch(
    which: str, inner_sql: str, schema: dict[str, str], **exprs: str
) -> str:
    """The oracle twin of ``tag_branch``: wrap the component's oracle SQL
    as a subquery and project the same tagged, explicitly-cast frame."""
    parts = [f"'{which}' AS which"]
    for name, typ in schema.items():
        e = exprs.get(name)
        dt = _DUCK_TYPES[typ]
        parts.append(f"CAST({'NULL' if e is None else e} AS {dt}) AS {name}")
    return "SELECT " + ", ".join(parts) + f" FROM (\n{inner_sql}\n)"


def oracle_union(branches: list[str]) -> str:
    return "\nUNION ALL\n".join(branches)


def sorted_single(df: DataFrame, *cols: str) -> DataFrame:
    """Deterministic total order WITHOUT a range exchange — for BOUNDED
    outputs only (top-k, per-group aggregates, fixed-size profiles).

    ``orderBy`` plans a RangePartitioner whose bound-sampling pass
    RE-EXECUTES the entire upstream plan — for queries whose tail is an
    expensive verify stage (near-dup pair pipelines), that doubles the
    query. The driver's correctness compare is order-insensitive and
    these outputs are small, so a 1-partition in-partition sort gives the
    same deterministic result for half the cost.

    Row-proportional outputs must use ``unordered_output`` instead: a
    total order on a corpus-proportional result funnels everything
    through ONE task — ×4 of the whole sf1 simhash suite (SCALING.md
    r11), and billions of rows through one partition at 100 TB."""
    return df.repartition(1).sortWithinPartitions(*cols)


def unordered_output(df: DataFrame) -> DataFrame:
    """The row-proportional output contract (r11): values are exact and
    hash-compared order-insensitively by the driver; imposing a total
    order on a result that GROWS with the corpus is an anti-pattern the
    plan gate would flag on any other operator (single-partition sort
    tail). Identity by design — the name marks the contract at the
    registration site."""
    return df
