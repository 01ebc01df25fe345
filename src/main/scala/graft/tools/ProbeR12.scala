package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan audit for the round-12 operators: join strategies, exchange counts,
  * and the absence of cartesian/nested-loop fallbacks in semDedup, the
  * regression gates, and each PageRank iteration. */
object ProbeR12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (q <- Seq("d13_semdedup", "ml1_linprobe", "ml2_logreg",
        "t20_backoff_lm", "g1_pagerank", "s26_merge")) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"[$q] cartesian=${p.contains("CartesianProduct")}" +
        s" bnlj=${p.contains("BroadcastNestedLoop")}" +
        s" shj=${"ShuffledHashJoin".r.findAllIn(p).length}" +
        s" smj=${"SortMergeJoin".r.findAllIn(p).length}" +
        s" bhj=${"BroadcastHashJoin".r.findAllIn(p).length}" +
        s" exchanges=${"Exchange".r.findAllIn(p).length}" +
        s" reused=${"ReusedExchange".r.findAllIn(p).length}" +
        s" aqeShuffleReads=${"AQEShuffleRead".r.findAllIn(p).length}")
    }
    spark.stop()
  }
}
