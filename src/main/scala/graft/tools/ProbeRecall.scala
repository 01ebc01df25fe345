package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev check: the planted ANN corpus must make a2/a3 return exactly the
  * planted ids (9000000..9000009) with ranks 1..10 at any SF. */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val expected = (0 until 10).map(i => (9000000L + i, i + 1))
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val a2 = SparkEntry.queries("a2_ann_lsh")(spark, sf).collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      val a3 = SparkEntry.queries("a3_ann_ivf")(spark, sf).collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      println(s"$sf a2==planted: ${a2 == expected} a3==planted: ${a3 == expected}" +
        (if (a2 != expected) s" a2=$a2" else "") + (if (a3 != expected) s" a3=$a3" else ""))
    }
    spark.stop()
  }
}
