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
    * tokenization, as-of join (count-elided pair + payload-consuming sum),
    * decontamination, sequence packing, BM25 scoring, heavy-hitters sketch
    * aggregation. */
  val headline: Seq[String] = Seq(
    "s1_scan_hive", "q1_agg", "q2_filter", "q3_join_agg", "q6_window",
    "q7_topk", "q20_multijoin", "d2_dedup_minhash", "a1_ann_brute",
    "t3_tokens", "as1_asof", "as2_asof_native", "as3_asof_sum",
    "d8_decontam", "t9_pack", "t12b_bm25", "t15_heavyhitters",
    "d10_span_stats")

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

    // pass 0 warms JIT/codegen for every query's generated classes; then
    // THREE full interleaved passes (steady state, and a machine-load blip
    // hits one pass of every query rather than every run of one query).
    // Cache is cleared between runs so each measurement is a full fresh
    // computation (operator-internal persists must not carry over).
    for (name <- headline) {
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => System.err.println(s"[bench] $name warmup FAILED") }
      spark.catalog.clearCache()
    }
    val passes = 3
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to passes; name <- headline) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val secs = (System.nanoTime() - t0) / 1e9
      // a failed run must NOT contribute a (fast) time-to-exception sample —
      // that would make a broken query read as a speedup
      if (n < 0) System.err.println(s"[bench] $name FAILED")
      else samples(name) = samples(name) :+ secs
      spark.catalog.clearCache()
    }
    val results = headline.map { name =>
      val ts = samples(name).sorted
      if (ts.isEmpty) (name, -1.0, 0.0) // all passes failed: visible marker
      else (name, ts(ts.size / 2), ts.last - ts.head) // (median, spread)
    }
    // failed queries emit null (not a -1.0 sentinel) so summing the map
    // always reproduces the headline total; failures stay visible in "failed"
    val qs = results.map { case (k, med, _) =>
      "\"" + k + "\":" + (if (med < 0) "null" else f"$med%.3f")
    }.mkString("{", ",", "}")
    val spread = results.map { case (k, med, sp) =>
      "\"" + k + "\":" + (if (med < 0) "null" else f"$sp%.3f")
    }.mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.collect { case (_, m, _) if m >= 0 => m }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spread,"passes":$passes,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
