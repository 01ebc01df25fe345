package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.operators.AsofJoin

/** Warm-run timing breakdown for the as-of join pair (as1 composition vs
  * as2 native) and their isolated pieces, to locate where the native
  * query's wall-time goes. */
object ProfileAsof {
  private def run(label: String, n: Int = 5, count: Boolean = false)(df: => DataFrame): Unit = {
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      if (count) df.count()
      else df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val sorted = times.sorted
    println(f"[asof] $label%-34s median ${sorted(n / 2)}%6.3f s  runs ${times.map(t => f"$t%5.3f").mkString(" ")}")
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

    def events = graft.Fixtures.events(spark, sfDir).select("event_id", "user_id", "ts")
    def ordersDeduped = {
      val w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(desc("o_orderkey"))
      spark.read.parquet(s"$sfDir/orders.parquet")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey"),
          col("o_orderdate").cast("timestamp").as("o_date_ts"),
          col("o_orderkey"), col("o_totalprice"))
    }

    run("as1 count (bench view)", count = true)(SparkEntry.queries("as1_asof")(spark, sfDir))
    run("as2 count (bench view)", count = true)(SparkEntry.queries("as2_asof_native")(spark, sfDir))
    run("orders dedup count", count = true)(ordersDeduped)
    run("events scan only")(events)
    run("orders dedup only")(ordersDeduped)
    run("as1 full (gate query)")(SparkEntry.queries("as1_asof")(spark, sfDir))
    run("as2 full (gate query)")(SparkEntry.queries("as2_asof_native")(spark, sfDir))
    run("as1 no orderBy") {
      val o = ordersDeduped.withColumnRenamed("o_date_ts", "o_orderdate")
      AsofJoin.asofJoin(events, o, "ts", "o_orderdate", "user_id", "o_custkey",
        Seq("o_orderkey", "o_totalprice"))
    }
    run("as2 no orderBy, no repartition") {
      AsofJoin.asofJoinNative(events, ordersDeduped, "ts", "o_date_ts",
        "user_id", "o_custkey", Seq("o_orderkey", "o_totalprice"))
    }
    run("as2 no orderBy, with repartition") {
      AsofJoin.asofJoinNative(events,
        ordersDeduped.repartition(col("o_custkey")),
        "ts", "o_date_ts", "user_id", "o_custkey", Seq("o_orderkey", "o_totalprice"))
    }
    spark.stop()
  }
}
