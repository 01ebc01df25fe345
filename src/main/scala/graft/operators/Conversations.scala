package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation assembly — the chat-training-data shape: an event/message
  * log becomes one row per conversation with an ordered, rendered
  * transcript ("role: text" lines), ready for tokenization, packing
  * ([[Pack]]) and dedup ([[Dedup]]).
  *
  * Spark shape: ONE shuffle on the group key serves both the ordering
  * window and the final aggregation (exchange reuse, the q6 pattern).
  * The `maxTurns` cap is a `row_number <= k` filter, which Spark 4
  * rewrites to a map-side WindowGroupLimit — each mapper forwards at most
  * k rows per group, so a pathological million-event user bounds shuffle
  * bytes instead of OOMing a reducer. The per-group state of the final
  * `collect_list` is therefore ≤ maxTurns rendered lines by construction.
  * Rendering happens BEFORE the collect (codegen'd `concat`), so the
  * aggregation buffers hold exactly the strings the transcript needs.
  *
  * Determinism: (tsCol, tieCol) must be a total order within a group
  * (tieCol unique); `array_sort` on the (seq, line) structs restores it
  * after the unordered collect.
  */
object Conversations {

  /** One row per `groupCol`: `(group, n_turns, transcript, n_chars)`.
    * Turns are ordered by `(tsCol, tieCol)`; only the first `maxTurns`
    * turns per group survive (count them with an exact pre-aggregation if
    * completeness matters — the capped-collect contract). */
  def assemble(
      df: DataFrame,
      groupCol: String,
      tsCol: String,
      tieCol: String,
      roleCol: Column,
      textCol: Column,
      sep: String = "\n",
      maxTurns: Int = 100000): DataFrame = {
    require(maxTurns >= 1, s"maxTurns must be >= 1, got $maxTurns")
    val w = Window.partitionBy(groupCol).orderBy(col(tsCol), col(tieCol))
    df.select(col(groupCol), col(tsCol), col(tieCol),
        concat(roleCol, lit(": "), textCol).as("__line"))
      .withColumn("__seq", row_number().over(w))
      .filter(col("__seq") <= maxTurns)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_turns"),
        array_sort(collect_list(struct(col("__seq"), col("__line"))))
          .as("__turns"))
      .withColumn("transcript",
        array_join(transform(col("__turns"), t => t.getField("__line")), sep))
      .select(col(groupCol), col("n_turns"), col("transcript"),
        length(col("transcript")).cast("long").as("n_chars"))
  }
}
