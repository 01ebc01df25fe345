package graft.tools
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named gates to files — the
  * optimization-round evidence artifacts (plans/rNN/<query>_<tag>.txt).
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> <q1,q2,...>
  * Session config mirrors Bench (local[cpus], shuffle.partitions=cpus,
  * AQE on) so the dumped plan is the plan the bench actually runs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, tag, qcsv) = args.take(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (q <- qcsv.split(",")) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, dir)
        // initial formatted plan (pre-AQE), plus the executed plan after
        // one real run so AQE's final joins/coalescing are on record too
        val initial = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        df.write.format("noop").mode("overwrite").save()
        val executed = df.queryExecution.executedPlan.toString
        Files.writeString(Paths.get(s"$outDir/${q}_$tag.txt"),
          s"== explain(formatted), initial plan ==\n$initial\n" +
            s"== executedPlan after run (AQE-final) ==\n$executed\n")
        println(s"[plandump] wrote $q")
      } catch { case e: Throwable =>
        println(s"[plandump] $q FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
