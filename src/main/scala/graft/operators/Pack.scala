package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign each document to a
  * fixed-token-budget bin (a "context window") so downstream training reads
  * densely packed sequences instead of one padded row per document.
  *
  * A global greedy pack is inherently sequential, so the 100 TB shape is
  * SHARDED greedy: documents are split into `numShards` independent packing
  * streams by a deterministic function of the id, each stream is packed in
  * id order with a single O(1)-state pass. Spark-wise that is ONE hash
  * shuffle on the shard key (`repartition`), a partition-local sort
  * (`sortWithinPartitions` — no global sort, no range exchange), and one
  * streaming `mapPartitions` pass. Nothing is collected; shard count scales
  * with the cluster, and bin quality is unaffected because bins never cross
  * shards in real packers either (they're written out per task).
  */
object Pack {

  /** Greedy sequential packing: within each shard (`id % numShards`), docs
    * are taken in ascending id order; a doc opens a new bin when it would
    * overflow `budget` and the current bin is non-empty. A doc larger than
    * the whole budget therefore gets a bin of its own (real packers truncate
    * or split it downstream — assignment semantics are the same).
    *
    * Returns (idCol, shard, bin, tokens): bin ids are per-shard, 0-based.
    */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      numShards: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numShards > 0, "numShards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val staged = df
      .select(col(idCol).cast("long").as("__id"),
        col(tokensCol).cast("long").as("__tokens"),
        pmod(col(idCol).cast("long"), lit(numShards.toLong)).as("__shard"))
      .repartition(numShards.min(4096), col("__shard"))
      .sortWithinPartitions("__shard", "__id")
      .as[(Long, Long, Long)]
    staged.mapPartitions { rows =>
      var shard = -1L
      var bin = 0L
      var fill = 0L
      rows.map { case (id, tokens, sh) =>
        if (sh != shard) { shard = sh; bin = 0L; fill = 0L }
        if (fill > 0 && fill + tokens > budget) { bin += 1L; fill = tokens }
        else fill += tokens
        (id, sh, bin, tokens)
      }
    }.toDF(idCol, "shard", "bin", "tokens")
  }

  /** [[packGreedy]] with EXPLICIT group columns instead of the id-mod
    * shard: docs pack in ascending id order WITHIN each distinct
    * `groupCols` tuple, bins 0-based per group. This is the
    * bucketed-batch shape (aspect-ratio buckets for vision training,
    * length buckets for padding-free batching, per-language shards):
    * the caller's semantic key decides what may share a bin, and
    * parallelism comes from the key's cardinality — compose a
    * low-cardinality semantic key with an `id % N` shard column when
    * the corpus is large (the m17 gate does exactly that).
    *
    * Returns (idCol, groupCols…, bin, tokens). Spark shape: one
    * repartition on the group key + an in-partition sort and a single
    * streaming pass — same cost model as [[packGreedy]]; a group never
    * splits across partitions (hash partitioning on the full tuple). */
  def packGreedyBy(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      groupCols: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    // same plan-time guard as packChop/exactKeepBest: a non-integral id
    // would NULL under the long cast and collapse the join-back key.
    // CONTRACT: ids unique (the join-back fans out on duplicates).
    val idType = df.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"packGreedyBy: id column '$idCol' must be integral (pack order " +
        s"key), got ${idType.sql} — cast or map ids first")
    val spark = df.sparkSession
    import spark.implicits._
    // \u0001 separator: bare concat would alias ("a","b") with ("ab","")
    val gk = concat_ws("\u0001", groupCols.map(c => col(c).cast("string")): _*)
    val staged = df
      .select(col(idCol).cast("long").as("__id"),
        col(tokensCol).cast("long").as("__tokens"),
        gk.as("__gk"))
      .repartition(col("__gk"))
      .sortWithinPartitions("__gk", "__id")
      .as[(Long, Long, String)]
    val packed = staged.mapPartitions { rows =>
      var group: String = null
      var bin = 0L
      var fill = 0L
      rows.map { case (id, tokens, g) =>
        if (g != group) { group = g; bin = 0L; fill = 0L }
        if (fill > 0 && fill + tokens > budget) { bin += 1L; fill = tokens }
        else fill += tokens
        (id, bin, tokens)
      }
    }.toDF(idCol, "bin", "tokens")
    df.select(col(idCol).cast("long").as(idCol) +: groupCols.map(col): _*)
      .join(packed, Seq(idCol))
      .select((col(idCol) +: groupCols.map(col)) ++
        Seq(col("bin"), col("tokens")): _*)
  }

  /** Best-fit-decreasing packing (Ding et al. 2024, "Fewer Truncations
    * Improve Language Modeling" — the measured upgrade over first-fit
    * greedy for whole-document packing): within each shard, documents
    * pack in DESCENDING token order (ties to ascending id), each into
    * the open bin whose fill is LARGEST among those it still fits
    * (ties to the lowest bin index); no fit → a new bin. Long docs
    * anchor bins early, short docs backfill the gaps — measurably
    * fewer, fuller bins than [[packGreedy]]'s arrival-order first fit
    * at the same budget (PackSpec pins a fixture where BFD saves
    * bins).
    *
    * Bounded state: at most `maxOpenBins` bins stay open per shard —
    * past that, the FULLEST open bin (ties to the lowest index)
    * closes permanently, so per-task memory is O(maxOpenBins) however
    * large the shard, and each placement scans the same bounded list.
    * Closing the fullest sacrifices the least packing opportunity (it
    * had the least room). A doc larger than `budget` lands alone in
    * its own bin, like [[packGreedy]]'s overflow contract.
    *
    * Spark shape: one repartition on the shard key + an in-partition
    * sort by (tokens DESC, id) + a streaming pass — identical cost
    * model to [[packGreedy]] plus the sort key change; shard count is
    * the parallelism knob. Deterministic in (data, budget,
    * numShards, maxOpenBins). Returns (idCol, shard, bin, tokens)
    * with bins 0-based per shard in OPENING order. */
  def packBestFitDecreasing(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      numShards: Int = 256,
      maxOpenBins: Int = 1024): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numShards > 0, "numShards must be positive")
    require(maxOpenBins >= 1, "maxOpenBins must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val staged = df
      .select(col(idCol).cast("long").as("__id"),
        col(tokensCol).cast("long").as("__tokens"),
        pmod(col(idCol).cast("long"), lit(numShards.toLong)).as("__shard"))
      .repartition(numShards.min(4096), col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__tokens").desc, col("__id"))
      .as[(Long, Long, Long)]
    staged.mapPartitions { rows =>
      var shard = -1L
      var nBins = 0L
      // open bins: parallel arrays (ix, fill), scanned linearly —
      // bounded at maxOpenBins by the close-the-fullest rule
      val ixs = new scala.collection.mutable.ArrayBuffer[Long]()
      val fills = new scala.collection.mutable.ArrayBuffer[Long]()
      rows.map { case (id, tokens, sh) =>
        if (sh != shard) { shard = sh; nBins = 0L; ixs.clear(); fills.clear() }
        var best = -1
        var i = 0
        while (i < fills.length) {
          if (fills(i) + tokens <= budget &&
              (best < 0 || fills(i) > fills(best) ||
                (fills(i) == fills(best) && ixs(i) < ixs(best)))) best = i
          i += 1
        }
        val bin = if (best >= 0) {
          fills(best) += tokens
          ixs(best)
        } else {
          val ix = nBins
          nBins += 1L
          ixs += ix
          fills += tokens
          if (ixs.length > maxOpenBins) {
            var full = 0
            var j = 1
            while (j < fills.length) {
              if (fills(j) > fills(full) ||
                  (fills(j) == fills(full) && ixs(j) < ixs(full))) full = j
              j += 1
            }
            ixs.remove(full)
            fills.remove(full)
          }
          ix
        }
        (id, sh, bin, tokens)
      }
    }.toDF(idCol, "shard", "bin", "tokens")
  }

  /** GPT-style concat-and-chop packing — the causal-LM pretraining
    * shape [[packGreedy]] deliberately is not: within each shard,
    * documents concatenate in ascending-id order into one token stream
    * that is cut into `budget`-token windows ACROSS document
    * boundaries. No padding, no whole-doc constraint — every window
    * except a shard's last is exactly full.
    *
    * Returns one row per (document, window) overlap:
    * `(idCol, shard, window_ix, tok_start, tok_end, n_tokens)` where
    * `[tok_start, tok_end)` are DOC-LOCAL token offsets (the slice of
    * the doc landing in that window) — the loader reads the doc once
    * and slices. Zero-token docs drop (nothing of them is trainable);
    * window ids are per-shard, 0-based.
    *
    * Spark shape: ONE per-shard cumulative-sum window (the only
    * shuffle) and a bounded explode (a doc spans at most
    * `tokens/budget + 1` windows) — closed-form arithmetic throughout,
    * so the oracle replays every boundary. Token offsets stay far
    * below 2^53, so the double division under `floor` is exact. */
  def packChop(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      numShards: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numShards > 0, "numShards must be positive")
    // r16 ADVICE: a non-integral id would NULL under the non-strict long
    // cast below, collapsing every doc into one NULL shard with a
    // nondeterministic cumsum — refuse at plan time, like exactKeepBest.
    // CONTRACT: ids must also be UNIQUE — the ROWS-based cumsum orders
    // duplicates arbitrarily, so duplicate ids make window boundaries
    // nondeterministic (dedup upstream; uniqueness is not checkable
    // map-side without a shuffle this operator otherwise never needs).
    val idType = df.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"packChop: id column '$idCol' must be integral (shard + cumsum " +
        s"order key), got ${idType.sql} — cast or map ids first")
    val w = Window.partitionBy("__shard").orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol).cast("long").as("__id"),
        col(tokensCol).cast("long").as("__t"),
        pmod(col(idCol).cast("long"), lit(numShards.toLong)).as("__shard"))
      .filter(col("__t") > 0)
      .withColumn("__s", coalesce(sum("__t").over(w), lit(0L)))
      .withColumn("window_ix", explode(sequence(
        floor(col("__s") / budget).cast("long"),
        floor((col("__s") + col("__t") - 1) / budget).cast("long"))))
      .select(col("__id").as(idCol), col("__shard").as("shard"),
        col("window_ix"),
        greatest(lit(0L), col("window_ix") * budget - col("__s"))
          .as("tok_start"),
        least(col("__t"), (col("window_ix") + 1) * budget - col("__s"))
          .as("tok_end"))
      .withColumn("n_tokens", col("tok_end") - col("tok_start"))
  }

  /** Per-bin packing summary: docs per bin, filled tokens, utilization of
    * the budget. The natural output of a packing job's bookkeeping. */
  def binStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("fill"))
      .withColumn("utilization", col("fill").cast("double") / lit(budget.toDouble))
}
