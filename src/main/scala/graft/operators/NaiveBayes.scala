package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multinomial naive Bayes text classification, trained AND scored fully
  * distributed — the cheap-strong baseline every corpus-labeling pipeline
  * wants (source attribution, quality-tier routing, topic bucketing)
  * before anything neural.
  *
  * Unlike the backoff LM ([[graft.functions.LanguageModel]]), which
  * deliberately bounds a DRIVER-side model, nothing here ever leaves the
  * executors: token-class counts, class totals, vocabulary size and
  * priors are all aggregations, and scoring is a (token, class) equi-join
  * against the dense likelihood grid. Classes are assumed FEW (the
  * `labels` frame broadcasts; a thousand-class problem would want a
  * different factorization) while the vocabulary can be arbitrarily
  * large — it stays sharded across the cluster.
  *
  * Determinism: add-α likelihoods are exact count arithmetic inside
  * `ln`; per-document scores are log sums rounded at 6 decimals (the t11
  * convention — last-ulp summation wobble sits ~9 orders below the
  * rounding grain), and the predicted class is the argmax of the ROUNDED
  * scores with class-name ascending tie-break, so any engine replays the
  * decision exactly.
  */
object NaiveBayes {

  /** Train on (`textCol`, `labelCol`) and score every row against every
    * class: `(idCol, label, score, predicted)` — one row per (doc,
    * class), `score = round(ln prior + Σ tf·ln((c_wc+α)/(tot_c+α·V)), 6)`,
    * `predicted` the winning class repeated on each of the doc's rows.
    * Token-less documents (empty text) produce no rows — there is no
    * evidence to score. */
  def trainScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val tok = df.select(col(idCol), col(labelCol).as("__lab"),
      explode(TextFunctions.words(col(textCol))).as("t"))
    val labels = df.select(col(labelCol).as("label")).distinct()
    val v = tok.agg(countDistinct(col("t")).as("vv"))
    // per-class token totals over the LABEL universe: a class whose
    // training docs are all empty still exists — its likelihoods are pure
    // smoothing (α/(0+αV)), not a silently dropped class
    val ct = labels.join(
        tok.groupBy(col("__lab").as("label")).agg(count(lit(1)).as("tot0")),
        Seq("label"), "left")
      .select(col("label"), coalesce(col("tot0"), lit(0L)).as("tot"))
    val wc = tok.groupBy(col("t"), col("__lab").as("label"))
      .agg(count(lit(1)).as("c"))
    val dtf = tok.groupBy(col(idCol), col("t"))
      .agg(count(lit(1)).as("tf"))
    val pri = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("ndall"))))
      .select(col("label"),
        log(col("nd").cast("double") / col("ndall")).as("lp"))
    val contrib = dtf.crossJoin(broadcast(labels))
      .join(wc, Seq("t", "label"), "left")
      .join(broadcast(ct), "label")
      .crossJoin(broadcast(v))
      .select(col(idCol), col("label"),
        (col("tf") * log(
          (coalesce(col("c"), lit(0L)) + lit(alpha)) /
            (col("tot") + lit(alpha) * col("vv").cast("double")))).as("x"))
    val sc = contrib.join(broadcast(pri), "label")
      .groupBy(col(idCol), col("label"), col("lp"))
      .agg(round(col("lp") + sum(col("x")), 6).as("score"))
      .select(col(idCol), col("label"), col("score"))
    val wpred = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("label"))
    val pred = sc.withColumn("__rn", row_number().over(wpred))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("label").as("predicted"))
    sc.join(pred, idCol)
      .select(col(idCol), col("label"), col("score"), col("predicted"))
  }
}
