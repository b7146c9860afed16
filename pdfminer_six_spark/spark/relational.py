"""Relational mirrors of the layout pipeline (SURVEY.md §2.11).

The extraction kernel runs layout analysis in-UDF for byte-exactness; these
mirrors re-express the same operators as *pure Spark relational plans* over
the flattened ``chars``/``lines`` relations — proving the semantics are
shuffle-expressible and giving a JVM-side scale path for layout analytics:

* L1 char->line grouping  = lag() window + running-sum segmentation
  (reference layout.py:703-778 single-pass predicate, exactly mirrored)
* L2 word-gap insertion   = lag(x1) + gap predicate
* L3 neighbor search      = grid-bucketed self-join with alignment
  predicates (reference find_neighbors layout.py:513-558)

All are tested for equality against the in-UDF kernel's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def lines_from_chars(
    chars: DataFrame,
    line_overlap: float = 0.5,
    char_margin: float = 2.0,
) -> DataFrame:
    """chars -> lines purely with window functions.

    halign (reference layout.py:722-728): consecutive chars (emission
    order) stay in one line iff they v-overlap by more than
    ``line_overlap * min(h)`` and their h-distance is under
    ``char_margin * max(w)``.  A flag per char marks line starts; the
    running sum of flags is the line id.  One shuffle on the page key;
    everything else is within-partition.
    """
    key = ["conv_id", "turn_idx", "page_id"]
    w = Window.partitionBy(*key).orderBy("char_seq")

    px0, px1 = F.lag("x0").over(w), F.lag("x1").over(w)
    py0, py1 = F.lag("y0").over(w), F.lag("y1").over(w)

    height = F.col("y1") - F.col("y0")
    p_height = py1 - py0
    width = F.col("x1") - F.col("x0")
    p_width = px1 - px0

    is_voverlap = (F.col("y0") <= py1) & (py0 <= F.col("y1"))
    voverlap = F.when(
        is_voverlap,
        F.least(
            F.abs(py0 - F.col("y1")), F.abs(py1 - F.col("y0"))
        ),
    ).otherwise(F.lit(0.0))
    is_hoverlap = (F.col("x0") <= px1) & (px0 <= F.col("x1"))
    hdistance = F.when(is_hoverlap, F.lit(0.0)).otherwise(
        F.least(F.abs(px0 - F.col("x1")), F.abs(px1 - F.col("x0")))
    )

    halign = (
        is_voverlap
        & (F.least(p_height, height) * F.lit(line_overlap) < voverlap)
        & (hdistance < F.greatest(p_width, width) * F.lit(char_margin))
    )
    new_line = F.when(px0.isNull() | ~halign, 1).otherwise(0)
    seg = chars.withColumn("new_line", new_line).withColumn(
        "line_id",
        F.sum("new_line").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )
    return seg.groupBy(*key, "line_id").agg(
        F.min("x0").alias("x0"),
        F.min("y0").alias("y0"),
        F.max("x1").alias("x1"),
        F.max("y1").alias("y1"),
        F.count("*").alias("n_chars"),
        F.concat_ws(
            "", F.array_sort(
                F.collect_list(F.struct("char_seq", "text"))
            ).getField("text")
        ).alias("raw_text"),
    )


def words_from_chars(
    chars: DataFrame, word_margin: float = 0.1
) -> DataFrame:
    """L2 mirror: word segmentation inside lines via the word-gap predicate
    (reference layout.py:505-511): a gap opens when
    ``prev_x1 < x0 - word_margin * max(w, h)``."""
    lines = lines_from_chars(chars).select(
        "conv_id", "turn_idx", "page_id", "line_id"
    )
    key = ["conv_id", "turn_idx", "page_id"]
    w = Window.partitionBy(*key).orderBy("char_seq")
    seg = chars.withColumn(
        "line_id",
        F.sum(
            F.when(
                F.lag("x0").over(w).isNull()
                | ~(
                    (F.col("y0") <= F.lag("y1").over(w))
                    & (F.lag("y0").over(w) <= F.col("y1"))
                ),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0))
        - 1,
    )
    wl = Window.partitionBy(*key, "line_id").orderBy("char_seq")
    gap = F.lag("x1").over(wl) < F.col("x0") - F.lit(word_margin) * F.greatest(
        F.col("x1") - F.col("x0"), F.col("y1") - F.col("y0")
    )
    seg = seg.withColumn(
        "word_id",
        F.sum(F.when(F.lag("x1").over(wl).isNull() | gap, 1).otherwise(0)).over(
            wl.rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )
    return seg.groupBy(*key, "line_id", "word_id").agg(
        F.concat_ws(
            "",
            F.array_sort(F.collect_list(F.struct("char_seq", "text"))).getField(
                "text"
            ),
        ).alias("word"),
        F.min("x0").alias("x0"),
        F.max("x1").alias("x1"),
    )


def neighbor_pairs(
    lines: DataFrame, line_margin: float = 0.5, gridsize: int = 50
) -> DataFrame:
    """L3 mirror: the find_neighbors spatial predicate as a grid-bucketed
    self-join (the Plane's 50pt grid becomes the equi-join key, so the
    quadratic candidate space is bounded per bucket — reference
    utils.py:738-813 + layout.py:513-558)."""
    d = F.lit(line_margin) * (F.col("y1") - F.col("y0"))
    expanded = lines.select(
        "conv_id", "turn_idx", "page_id", "line_id",
        "x0", "y0", "x1", "y1",
        (F.col("y0") - d).alias("qy0"),
        (F.col("y1") + d).alias("qy1"),
        d.alias("d"),
    )
    cells = expanded.withColumn(
        "cell",
        F.explode(
            F.sequence(
                F.floor(F.col("qy0") / gridsize),
                F.floor(F.col("qy1") / gridsize),
            )
        ),
    )
    a, b = cells.alias("a"), cells.alias("b")
    joined = a.join(
        b,
        on=[
            F.col("a.conv_id") == F.col("b.conv_id"),
            F.col("a.turn_idx") == F.col("b.turn_idx"),
            F.col("a.page_id") == F.col("b.page_id"),
            F.col("a.cell") == F.col("b.cell"),
            F.col("a.line_id") != F.col("b.line_id"),
        ],
    )
    same_height = (
        F.abs(
            (F.col("b.y1") - F.col("b.y0")) - (F.col("a.y1") - F.col("a.y0"))
        )
        <= F.col("a.d")
    )
    aligned = (
        (F.abs(F.col("b.x0") - F.col("a.x0")) <= F.col("a.d"))
        | (F.abs(F.col("b.x1") - F.col("a.x1")) <= F.col("a.d"))
        | (
            F.abs(
                (F.col("b.x0") + F.col("b.x1")) / 2
                - (F.col("a.x0") + F.col("a.x1")) / 2
            )
            <= F.col("a.d")
        )
    )
    overlap = (
        (F.col("b.x1") > F.col("a.x0"))
        & (F.col("a.x1") > F.col("b.x0"))
        & (F.col("b.y1") > F.col("a.qy0"))
        & (F.col("a.qy1") > F.col("b.y0"))
    )
    return (
        joined.filter(same_height & aligned & overlap)
        .select(
            F.col("a.conv_id").alias("conv_id"),
            F.col("a.turn_idx").alias("turn_idx"),
            F.col("a.page_id").alias("page_id"),
            F.col("a.line_id").alias("line_a"),
            F.col("b.line_id").alias("line_b"),
        )
        .distinct()
    )
