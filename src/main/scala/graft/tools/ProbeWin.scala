package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Probe: does `Window.partitionBy(lit(0))` keep a non-empty partition
  * spec through the optimizer (silencing WindowExec's "No Partition
  * Defined" warning) and produce the same single-partition result as the
  * global window? Evidence for the r21 window-spam fix. */
object ProbeWin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 8).map(i => (i, i % 3)).toDF("x", "g")
    val global = df.withColumn("rn",
      row_number().over(Window.orderBy(desc("x"), col("g"))))
    val litPart = df.withColumn("rn",
      row_number().over(Window.partitionBy(lit(0)).orderBy(desc("x"), col("g"))))
    println("== global ==")
    println(global.queryExecution.executedPlan.toString)
    println("== litPart ==")
    println(litPart.queryExecution.executedPlan.toString)
    val a = global.orderBy("x").collect().map(_.toSeq).toSeq
    val b = litPart.orderBy("x").collect().map(_.toSeq).toSeq
    println(s"rows equal: ${a == b}")
    spark.stop()
  }
}
