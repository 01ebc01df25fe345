package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the co-located-join story at 100 TB.
  *
  * Writing both sides of a recurring join bucketed by the join key lets every
  * subsequent join plan as a zero-shuffle sort-merge (Catalyst sees the
  * bucketing output partitioning and drops both Exchanges). For a fact table
  * joined daily against the same dimension key this converts the dominant
  * shuffle into a local merge.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. `numBuckets` should be
    * sized so one bucket of the LARGEST future join side fits an executor
    * core's working set (e.g. 100 TB / 8192 buckets ≈ 12 GB per bucket). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a stale warehouse dir from a previous session is invisible to the
    // in-memory catalog but still blocks CREATE — clear it explicitly
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase)
    val fs = warehouse.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(warehouse)) fs.delete(warehouse, true)
    val w = df.write.mode("overwrite").bucketBy(numBuckets, bucketCol)
    sortCol.fold(w.sortBy(bucketCol))(c => w.sortBy(c)).format("parquet")
      .saveAsTable(table)
  }

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
