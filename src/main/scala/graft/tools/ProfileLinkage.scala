package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage cost breakdown of the q49 fuzzy-link shape: where do the
  * seconds go — key explosion, candidate join, levenshtein verification,
  * pair dedup, or the best-match window? */
object ProfileLinkage {
  private def run(label: String, n: Int = 5)(df: => DataFrame): Unit = {
    val counts = df.count()
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      df.count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[link] $label%-34s rows $counts%10d  median ${times(n / 2)}%6.3f s")
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
    def t(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")

    val clean = t("part").select(col("p_partkey"), col("p_name"))
    val dirty = clean.filter(col("p_partkey") % 3 === 0)
      .withColumn("__pos",
        expr("cast(2 + p_partkey % (length(p_name) - 2) as int)"))
      .select((col("p_partkey") + 9000000L).as("dirty_id"),
        concat(expr("substring(p_name, 1, __pos - 1)"),
          expr("substring(p_name, __pos + 1)")).as("dirty_name"))

    run("dirty side alone")(dirty)

    def keyed(df: DataFrame, id: String, name: String) =
      df.select(col(id), col(name),
        explode(graft.operators.Linkage.blockKeys(col(name), 1)).as("__bk"))

    val l = keyed(dirty, "dirty_id", "dirty_name")
    val r = keyed(clean, "p_partkey", "p_name")
    run("keyed left (explode)")(l)
    run("keyed right (explode)")(r)
    run("candidate join (no verify)")(l.join(r, "__bk"))
    run("join + levenshtein filter")(
      l.join(r, "__bk")
        .select(col("dirty_id"), col("p_partkey"),
          levenshtein(col("dirty_name"), col("p_name"), 1).as("distance"))
        .filter(col("distance").between(0, 1)))
    run("+ dropDuplicates")(
      l.join(r, "__bk")
        .select(col("dirty_id"), col("p_partkey"),
          levenshtein(col("dirty_name"), col("p_name"), 1).as("distance"))
        .filter(col("distance").between(0, 1))
        .dropDuplicates("dirty_id", "p_partkey"))
    run("full fuzzyJoin")(
      graft.operators.Linkage.fuzzyJoin(dirty, "dirty_id", "dirty_name",
        clean, "p_partkey", "p_name", maxDistance = 1))
    run("full gate (bestMatch)")(
      graft.operators.Linkage.bestMatch(
        graft.operators.Linkage.fuzzyJoin(dirty, "dirty_id", "dirty_name",
          clean, "p_partkey", "p_name", maxDistance = 1),
        "dirty_id", "p_partkey"))
    spark.stop()
  }
}
