package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Adjudicates the q3 two-phase-distinct rewrite: warm medians for the
  * no-Expand two-phase plan vs the countDistinct(Expand) formulation, plus
  * the Expand operator's actual output-row metric as the scale evidence. */
object ProfileQ3 {
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")

  private def run(label: String, n: Int = 7)(df: => DataFrame): Unit = {
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      df.count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[q3] $label%-30s median ${times(n / 2)}%6.3f s  " +
      f"min ${times.head}%5.3f max ${times.last}%5.3f")
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

    def viaExpand: DataFrame = {
      val c = t("customer"); val o = t("orders"); val l = t("lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_lines"))
        .orderBy("c_mktsegment")
    }

    run("two-phase (current, no Expand)")(SparkEntry.queries("q3_join_agg")(spark, sfDir))
    run("countDistinct (Expand)")(viaExpand)
    run("two-phase again")(SparkEntry.queries("q3_join_agg")(spark, sfDir))
    run("countDistinct again")(viaExpand)

    // shuffle/Expand evidence: collect() the SAME DataFrame (count() runs a
    // separate query under AQE) then read the final adaptive plan's metrics
    // walk through AQE wrappers: QueryStageExec has no children, its stage
    // plan hangs off `.plan`
    def walk(p: org.apache.spark.sql.execution.SparkPlan)(
        f: org.apache.spark.sql.execution.SparkPlan => Unit): Unit = {
      f(p)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)(f)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)(f)
        case other => other.children.foreach(walk(_)(f))
      }
    }
    def evidence(label: String, df: DataFrame): Unit = {
      df.collect()
      println(s"[q3] === $label ===")
      walk(df.queryExecution.executedPlan) { node =>
        val n = node.nodeName
        if (n.contains("Expand") || n.contains("Exchange") || n.contains("Aggregate"))
          println(s"[q3]   $n: " + node.metrics
            .filter { case (k, _) => Set("numOutputRows", "shuffleRecordsWritten",
              "dataSize", "shuffleBytesWritten").contains(k) }
            .map { case (k, m) => s"$k=${m.value}" }.mkString(", "))
      }
    }
    evidence("countDistinct form", viaExpand)
    evidence("two-phase form", SparkEntry.queries("q3_join_agg")(spark, sfDir))
    spark.stop()
  }
}
