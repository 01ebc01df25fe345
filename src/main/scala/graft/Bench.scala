package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: headline queries on SPARK_GRAFT_SF_DIR (default
  * sf0.1), one JSON line on stdout. Fixture materialization (partitioned
  * layouts derived from the testdata) happens before the timed region —
  * it is test scaffolding, not query work.
  */
object Bench {

  /** Headline set: one representative per cost class — scan path, wide agg,
    * filter, shuffle join chain, window, top-k, minhash dedup, ANN,
    * tokenization, as-of join. */
  val headline: Seq[String] = Seq(
    "s1_scan_hive", "q1_agg", "q2_filter", "q3_join_agg", "q6_window",
    "q7_topk", "q20_multijoin", "d2_dedup_minhash", "a1_ann_brute",
    "t3_tokens", "as1_asof")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixture warmup (cached layouts) + JIT/codegen warmup on the small SF
    Fixtures.hiveLineitem(spark, sfDir)
    Fixtures.ymdOrders(spark, sfDir)
    Fixtures.valueOnlyOrders(spark, sfDir)

    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      // run 1 warms JIT/codegen for this query's generated classes; run 2 is
      // the steady-state measurement (what a long-lived cluster job sees).
      // Cache is cleared between runs so the measurement is always a full
      // fresh computation (operator-internal persists must not carry over).
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val secs = (System.nanoTime() - t0) / 1e9
      if (n < 0) System.err.println(s"[bench] $name FAILED")
      name -> secs
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
