package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-objective data prep: which tokens to corrupt (denoising
  * pretraining) and which tokens to train on (SFT) — emitted as PLANS
  * (token-offset tables), not rewritten text, so the loader applies
  * them against the tokenizer's own output and the plan stays
  * tokenizer-agnostic.
  *
  * Both planners are DETERMINISTIC by design — a salted md5 drives
  * every decision (the t8/t36 salted-uniform convention), so a data
  * build replays byte-identically anywhere and the oracle can state
  * every span. Real T5 used an RNG; for a production corpus build,
  * reproducibility is the feature, and a new salt is a new draw.
  */
object Masking {

  /** T5-style span-corruption plan: partition each document's token
    * stream into `blockSize`-token blocks and corrupt ONE
    * `spanLen`-token span per COMPLETE block, at a salted-hash offset —
    * corruption rate = spanLen/blockSize exactly (default 3/20 = 15%,
    * the paper's operating point), spans non-overlapping BY
    * CONSTRUCTION (one per block), the incomplete tail block left
    * uncorrupted (documented bias, vanishing for docs ≫ blockSize).
    *
    * Returns one row per corrupted span:
    * `(idCol, sentinel_ix, span_start, span_len)` — `sentinel_ix` is
    * the block index (= the sentinel token number in the T5 encoding),
    * `span_start` a doc-local token offset. Map-side only: a
    * per-block hash and arithmetic, no shuffle at all. */
  def spanCorruptionPlan(
      df: DataFrame, idCol: String, textCol: String,
      blockSize: Int = 20, spanLen: Int = 3,
      salt: String = "t5"): DataFrame = {
    require(blockSize >= 2 && spanLen >= 1 && spanLen < blockSize,
      s"need 1 <= spanLen < blockSize; got spanLen=$spanLen blockSize=$blockSize")
    val tokens = size(graft.functions.TextFunctions.words(col(textCol)))
      .cast("long")
    val nBlocks = (tokens / blockSize).cast("long") // complete blocks only
    val offsets = (blockSize - spanLen + 1).toLong
    df.select(col(idCol), nBlocks.as("__nb"))
      .filter(col("__nb") > 0)
      .select(col(idCol),
        explode(sequence(lit(0L), col("__nb") - 1)).as("sentinel_ix"))
      .select(col(idCol), col("sentinel_ix"),
        (col("sentinel_ix") * blockSize +
          pmod(conv(substring(md5(concat_ws(":", lit(salt),
            col(idCol).cast("string"), col("sentinel_ix").cast("string"))),
            1, 8), 16, 10).cast("long"), lit(offsets))).as("span_start"),
        lit(spanLen).as("span_len"))
  }

  /** SFT loss-mask plan over a turn table (the chat-fine-tuning data
    * shape): per conversation `keyCol`, turns order by `orderCols`,
    * each turn's token span is the running word-count interval, and
    * `trainable` marks the turns whose roles are trained on (assistant
    * turns; everything else is context with loss masked out).
    *
    * Returns one row per turn:
    * `(keyCol, turn_ix, role, tok_start, tok_end, trainable)` —
    * doc-local offsets into the conversation's concatenated token
    * stream. One keyed window (ranking + running sum share the
    * partitioning), no other shuffle. */
  def sftLossMask(
      df: DataFrame, keyCol: String, orderCols: Seq[String],
      roleCol: String, textCol: String,
      trainRoles: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(!orderCols.contains(keyCol),
      s"keyCol '$keyCol' must not repeat in orderCols — the projection " +
        "would carry an ambiguous duplicate column")
    require(trainRoles.nonEmpty, "no trainable roles — the mask would be all-off")
    val ord = orderCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val toks = size(graft.functions.TextFunctions.words(col(textCol)))
      .cast("long")
    df.select(col(keyCol) +: ord :+ col(roleCol).as("role") :+
        toks.as("__t"): _*)
      .withColumn("turn_ix", (row_number().over(w) - 1).cast("long"))
      .withColumn("tok_start", coalesce(sum("__t").over(wPrev), lit(0L)))
      .withColumn("tok_end", col("tok_start") + col("__t"))
      // a NULL role is context, not trainable — isin alone would emit a
      // null flag and a loader reading it as truthy would train on it
      .withColumn("trainable",
        coalesce(col("role").isin(trainRoles: _*), lit(false)))
      .select(col(keyCol), col("turn_ix"), col("role"),
        col("tok_start"), col("tok_end"), col("trainable"))
  }

  /** UL2 mixture-of-denoisers plan (Tay et al. 2022): each document is
    * hash-assigned ONE denoiser and planned accordingly —
    *
    *  - `R` (regular): short spans, the T5 recipe —
    *    [[spanCorruptionPlan]] at (blockSize=20, spanLen=3);
    *  - `X` (extreme): long spans — [[spanCorruptionPlan]] at
    *    (blockSize=24, spanLen=12);
    *  - `S` (sequential / prefix-LM): ONE span covering the document
    *    suffix; the split point is hash-drawn from the middle half
    *    `[n/4, 3n/4)` so neither side degenerates.
    *
    * Same contract as [[spanCorruptionPlan]]: a PLAN, not rewritten
    * text — `(idCol, denoiser, sentinel_ix, span_start, span_len)` in
    * doc-local token offsets, entirely map-side (per-row hash
    * arithmetic, no shuffle; the three branches union without a
    * barrier). Deterministic in (id, salt), so replayable by any
    * engine; documents too short for their assigned denoiser (< one
    * block, or < 4 tokens for `S`) emit no rows, exactly like the
    * base planner. */
  def ul2Plan(
      df: DataFrame, idCol: String, textCol: String,
      salt: String = "ul2"): DataFrame = {
    val mode = pmod(conv(substring(md5(concat_ws(":", lit(s"${salt}m"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long"), lit(3))
    val tagged = df.select(col(idCol), col(textCol), mode.as("__mode"))
    def branch(m: Int, tag: String, blockSize: Int, spanLen: Int) =
      spanCorruptionPlan(tagged.filter(col("__mode") === m),
          idCol, textCol, blockSize, spanLen, s"$salt$tag")
        .select(col(idCol), lit(tag.toUpperCase).as("denoiser"),
          col("sentinel_ix"), col("span_start"), col("span_len"))
    val n = size(graft.functions.TextFunctions.words(col(textCol)))
      .cast("long")
    val s = tagged.filter(col("__mode") === 2)
      .select(col(idCol), n.as("__n"))
      .filter(col("__n") >= 4)
      .select(col(idCol), col("__n"),
        ((col("__n") / 4).cast("long") +
          pmod(conv(substring(md5(concat_ws(":", lit(s"${salt}s"),
            col(idCol).cast("string"))), 1, 8), 16, 10).cast("long"),
            (col("__n") / 2).cast("long"))).as("span_start"))
      .select(col(idCol), lit("S").as("denoiser"),
        lit(0L).as("sentinel_ix"), col("span_start"),
        (col("__n") - col("span_start")).cast("int").as("span_len"))
    branch(0, "r", 20, 3)
      .unionByName(branch(1, "x", 24, 12))
      .unionByName(s)
  }
}
