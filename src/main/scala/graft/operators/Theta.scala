package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV/θ-sketch set cardinality tooling with a DETERMINISTIC twist: the
  * "random" hash is the salted md5 slice every other engine-portable
  * operator here uses, so a sketch — and every estimate derived from it —
  * is a pure function of the data. No seeds to manage, nothing to go
  * stale, and the t47 gate hash-compares the ESTIMATE itself against a
  * DuckDB replay (an RNG-based sketch could only ever be band-checked).
  *
  * The 100 TB shape is sketch-once, intersect-many: each source's k
  * smallest distinct hashes persist as a k-row sidecar; any pairwise (or
  * n-way) overlap question later is answered from sidecars alone — k-row
  * frames, no corpus re-read, no giant distinct-join. Building a sketch
  * costs one distinct + TakeOrdered over the hashed column (the same
  * dedup shuffle an exact distinct pays ONCE, amortized over every
  * question asked afterwards).
  */
object Theta {

  /** 32-bit hash in [0, 2³²): the engine-portable md5 slice. */
  private def h32(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 8),
      16, 10).cast("long")

  /** The k smallest DISTINCT hashes of `valueCol` — the KMV sketch, as a
    * k-row DataFrame (column `h`), ready to persist as a sidecar. */
  def sketch(df: DataFrame, valueCol: String, k: Int,
      salt: String = "th"): DataFrame = {
    require(k >= 16, s"k must be >= 16 for a usable estimate, got $k")
    df.filter(col(valueCol).isNotNull)
      .select(h32(col(valueCol), salt).as("h"))
      .distinct()
      .orderBy("h")
      .limit(k)
  }

  /** Intersection-cardinality estimate from two sketches built with the
    * SAME k and salt: θ = the k-th smallest hash of the sketch union (the
    * region both sketches fully observe), `n_common` = shared hashes
    * below θ, and
    *
    *   est_intersection = ⌊n_common · 2³² / θ⌋
    *
    * (integer division — deterministic, replayable). When the union holds
    * fewer than k distinct hashes both sets were seen WHOLE: θ ≥ every
    * hash and the "estimate" is exact by construction. Returns ONE row
    * `(theta, n_common, est_intersection)`. Bias/variance are the
    * standard KMV trade-offs (σ/|A∩B| ≈ 1/√(k·J)); raise k for rare
    * overlaps. */
  def intersectEstimate(skA: DataFrame, skB: DataFrame, k: Int): DataFrame = {
    require(k >= 16, s"k must be >= 16, got $k")
    val a = skA.select(col("h"))
    val b = skB.select(col("h"))
    val kth = a.unionByName(b).distinct().orderBy("h").limit(k)
      .agg(count(lit(1)).as("__nu"), max("h").as("__kth"))
      .select(when(col("__nu") < k, lit(4294967296L))
        .otherwise(col("__kth")).as("theta"))
    val common = a.join(b, Seq("h"), "inner").distinct()
    common.crossJoin(broadcast(kth))
      .filter(col("h") < col("theta"))
      .groupBy(col("theta"))
      .agg(count(lit(1)).as("n_common"))
      // DIV, not `/`: Spark's slash on longs is DOUBLE division, whose
      // floor can flip at representability edges — the estimate must be
      // the exact integer quotient on every engine
      .select(col("theta"), col("n_common"),
        expr("n_common * 4294967296 DIV theta").as("est_intersection"))
      // an empty intersection must still return the one-row contract
      .unionByName(kth.select(col("theta"), lit(0L).as("n_common"),
        lit(0L).as("est_intersection")))
      .orderBy(desc("n_common")).limit(1)
  }
}
