package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Stage-by-stage cost of the d18 prefix-filtered set-similarity join:
  * candidate volume out of the prefix-token equi-join, the length-filter
  * survival rate, and where the verification seconds go. */
object ProfileJaccard {
  private def run(label: String, n: Int = 5)(df: => DataFrame): Unit = {
    val counts = df.count()
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      df.count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[jac] $label%-36s rows $counts%10d  median ${times(n / 2)}%6.3f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val queries = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("q_id"), col("text").as("q_text"))
    val (num, den) = (3, 5)

    def prepared(df: DataFrame, idCol: String, textCol: String,
        setName: String): DataFrame =
      df.select(col(idCol), TextFunctions.words(col(textCol)).as("__w"))
        .filter(size(col("__w")) > 0)
        .select(col(idCol),
          array_sort(array_distinct(
            TextFunctions.shingles(col("__w"), 3))).as(setName))
        .withColumn("__pfx", slice(col(setName), lit(1),
          size(col(setName)) - expr(
            s"cast((size($setName) * $num + $den - 1) div $den as int)") + 1))
    val q = prepared(queries, "q_id", "q_text", "__qs")
      .select(col("q_id"), col("__qs"), explode(col("__pfx")).as("__tok"))
    val c = prepared(docs, "doc_id", "text", "__cs")
      .select(col("doc_id"), col("__cs"), explode(col("__pfx")).as("__tok"))
    run("query prefix rows")(q)
    run("corpus prefix rows")(c)
    run("raw token join")(q.join(c, "__tok"))
    run("+ length filter")(q.join(c, "__tok")
      .filter(size(col("__cs")) * den >= size(col("__qs")) * num &&
        size(col("__qs")) * den >= size(col("__cs")) * num))
    run("+ pair dedup")(q.join(c, "__tok")
      .filter(size(col("__cs")) * den >= size(col("__qs")) * num &&
        size(col("__qs")) * den >= size(col("__cs")) * num)
      .dropDuplicates("q_id", "doc_id"))
    run("full jaccardJoin")(graft.operators.Dedup.jaccardJoin(
      queries, "q_id", "q_text", docs, "doc_id", "text", num, den))
    spark.stop()
  }
}
