"""Pareto skyline (maximal-vector) computation — dominance filtering
without the O(n²) pairwise test.

The skyline of a relation under two maximize-criteria (x, y) is the set
of rows no other row dominates, where a dominates b iff x_a ≥ x_b and
y_a ≥ y_b with at least one strict. The textbook formulation is a
quadratic NOT EXISTS anti-join; the scale-correct plan exploits the 2-D
structure: after reducing to the DISTINCT-x relation (x → max y, plus
the running max of y over strictly larger x), a row survives iff its y
equals its x-group's max AND beats every larger-x group's best y. The
expensive relation (raw rows) is touched by exactly one map-side
combinable aggregation; all ordering work happens on the distinct-x
relation (domain-sized — the ks/acf windows contract).

The registered oracle is intentionally the BRUTE-FORCE O(n²) NOT EXISTS
formulation (structurally independent of this plan), so a green check
proves the reduction lossless rather than mirroring it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["pareto_skyline_2d"]


def pareto_skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_cols: list[str],
) -> DataFrame:
    """Rows not dominated by any other row under (maximize x_col,
    maximize y_col). Both criteria must be exact (integer / already
    quantized) columns so dominance is well-defined cross-engine.
    Duplicate (x, y) points are all kept (neither dominates the other —
    dominance requires one STRICT inequality).

    Returns (id_cols..., x_col, y_col), skyline rows only.
    """
    x, y = F.col(x_col), F.col(y_col)
    per_x = df.groupBy(x_col).agg(F.max(y).alias("_maxy"))
    # best y among STRICTLY larger x: order distinct-x descending and
    # look at all previous rows — domain-sized window, never rows-sized
    w = W.orderBy(F.col(x_col).desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    frontier = per_x.select(
        x_col,
        "_maxy",
        F.max("_maxy").over(w).alias("_runmax"),
    )
    keep = frontier.filter(
        F.col("_runmax").isNull() | (F.col("_maxy") > F.col("_runmax"))
    ).select(x_col, "_maxy")
    return (
        df.join(F.broadcast(keep), x_col)
        .filter(y == F.col("_maxy"))
        .select(*id_cols, x_col, y_col)
    )
