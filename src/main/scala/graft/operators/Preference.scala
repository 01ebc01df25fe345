package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair mining for DPO/RLHF-style training data: within each
  * group (a prompt and its scored candidate responses), pair the best
  * against the worst so each pair carries the widest score signal the
  * group can offer.
  */
object Preference {

  /** Rank-symmetric pairing: the i-th best response is paired with the
    * i-th worst (`rn` against `n+1−rn`), for i ≤ ⌊n/2⌋, keeping pairs
    * whose score gap exceeds `margin` — near-tied pairs teach a
    * preference model nothing and are dropped at the source. The middle
    * element of an odd group never pairs; ties rank by id, so the pairing
    * is deterministic and replayable by any engine with the same window
    * semantics.
    *
    * `scoreExpr` must be integral (pre-scale reward floats the v_scaled
    * way) so the `margin` comparison is exact — a float gap threshold
    * would flip pairs across engines at the boundary.
    *
    * Spark shape: ONE shuffle on `groupCol` serves both rank windows,
    * then a self-join keyed on (group, rank) — |pairs| ≤ |rows|/2, and
    * the join probes rank values, never scores, so skew follows group
    * size, not score distribution. Returns
    * (groupCol, chosen_id, rejected_id, score_gap, pair_rank). */
  def pairs(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      scoreExpr: Column,
      margin: Long = 0L): DataFrame = {
    require(margin >= 0, s"margin must be >= 0, got $margin")
    val byScore = Window.partitionBy(groupCol)
      .orderBy(desc("__score"), col(idCol))
    val ranked = df
      .select(col(groupCol), col(idCol), scoreExpr.as("__score"))
      .filter(col(groupCol).isNotNull && col(idCol).isNotNull &&
        col("__score").isNotNull)
      .withColumn("__rn", row_number().over(byScore))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val chosen = ranked.filter(col("__rn") * 2 <= col("__n"))
      .select(col(groupCol), col(idCol).as("chosen_id"),
        col("__score").as("__cs"), col("__rn"), col("__n"))
    val rejected = ranked.select(col(groupCol).as("__rg"),
      col(idCol).as("rejected_id"), col("__score").as("__rs"),
      col("__rn").as("__rrn"))
    chosen.join(rejected,
        col(groupCol) === col("__rg") &&
          col("__rrn") === col("__n") + 1 - col("__rn"))
      .filter(col("__cs") - col("__rs") > margin)
      .select(col(groupCol), col("chosen_id"), col("rejected_id"),
        (col("__cs") - col("__rs")).as("score_gap"),
        col("__rn").as("pair_rank"))
  }
}
