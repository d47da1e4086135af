"""Grid-bucketed ε-neighbor spatial self-join — exact, no cross join.

The 2-D "find all pairs within distance ε" primitive (geo proximity,
point-cloud dedup, collision detection). All-pairs is O(n²); the grid
decomposition is the standard fix and maps cleanly onto one Spark shuffle:

  1. quantize both coordinates to BIGINT micro-units (×10⁶, rounded) —
     every later comparison is exact integer arithmetic, so the oracle
     reproduces it bit-for-bit (no FP-boundary membership flips);
  2. cell = (x_div_ε, y_div_ε): any pair within ε lives in the same or an
     adjacent cell, so candidates = equi-join of points against the 3×3
     neighborhood — LEFT side exploded ×9 with the neighbor offsets
     (bounded constant fan-out), RIGHT side scanned once;
  3. equi-join on the cell key — ONE hash shuffle, shuffled-hash/SMJ,
     never a nested loop;
  4. exact L2² verify on the integer coords + ``id_a < id_b`` dedup
     (a pair in adjacent cells appears once per shared neighborhood —
     distinct on the id pair collapses it).

Scale: fan-out is a fixed 9×; per-cell candidate cost is density², which
is the geometry of the data, not the corpus size — a pathological
mega-cell (all points in one place) is the skew knob ``max_cell_size``
caps loudly (drop + count, never explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grid_neighbor_pairs"]

_MICROS = 1_000_000


def grid_neighbor_pairs(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    max_cell_size: int | None = None,
) -> DataFrame:
    """(id_a, id_b, dist2_micros) for every pair with L2 distance <= eps.

    ``dist2_micros`` is the exact squared distance in micro-unit² BIGINTs;
    callers wanting float distance divide late.
    """
    eps_u = int(round(eps * _MICROS))
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.round(F.col(x_col).cast("double") * _MICROS).cast("long").alias("_x"),
        F.round(F.col(y_col).cast("double") * _MICROS).cast("long").alias("_y"),
    ).select(
        "*",
        # floor division keeps negative coords in the right cell
        # (cast-to-long truncates toward zero — wrong for negatives)
        F.floor(F.col("_x") / F.lit(eps_u)).alias("_cx"),
        F.floor(F.col("_y") / F.lit(eps_u)).alias("_cy"),
    )
    if max_cell_size is not None:
        sizes = pts.groupBy("_cx", "_cy").agg(F.count(F.lit(1)).alias("_csz"))
        pts = (
            pts.join(sizes, ["_cx", "_cy"])
            .filter(F.col("_csz") <= max_cell_size)
            .drop("_csz")
        )
    off = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ])
    )
    left = pts.select(
        F.col("_id").alias("id_a"),
        F.col("_x").alias("_xa"),
        F.col("_y").alias("_ya"),
        "_cx",
        "_cy",
        off.alias("_o"),
    ).select(
        "id_a",
        "_xa",
        "_ya",
        (F.col("_cx") + F.col("_o.dx")).alias("_jx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_jy"),
    )
    right = pts.select(
        F.col("_id").alias("id_b"),
        F.col("_x").alias("_xb"),
        F.col("_y").alias("_yb"),
        F.col("_cx").alias("_jx"),
        F.col("_cy").alias("_jy"),
    )
    d2 = (F.col("_xa") - F.col("_xb")) * (F.col("_xa") - F.col("_xb")) + (
        F.col("_ya") - F.col("_yb")
    ) * (F.col("_ya") - F.col("_yb"))
    # no post-join distinct needed: B occupies exactly one cell, so the
    # pair (A, B) matches exactly one of A's 9 exploded neighborhood rows,
    # and id_a < id_b collapses the mirrored (B, A) role swap
    return (
        left.join(right, ["_jx", "_jy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", d2.alias("dist2_micros"))
        .filter(F.col("dist2_micros") <= F.lit(eps_u * eps_u))
    )
