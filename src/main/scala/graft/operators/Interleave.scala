package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved text+media training-sequence assembly — the modern
  * multimodal-pretraining data shape: documents arrive as ordered text
  * chunks with media placeholders woven between them, packed into
  * fixed-token context windows (docs whole, never split).
  *
  * Composes the existing primitives instead of inventing new ones:
  * [[Chunk.chunkWords]] for the text side, a fixed per-item token
  * budget for media (the patch-count convention — a vision encoder
  * emits a constant number of tokens per image at a given resolution),
  * [[Pack.packGreedy]] for the window assignment.
  *
  * Spark shape at 100 TB: chunking and placeholder projection are
  * map-side; one aggregation for per-doc totals; the pack is
  * packGreedy's single shard shuffle + streaming pass; one equi-join
  * hands each element its (shard, bin); one keyed window numbers the
  * elements inside each context window. No driver state, no global
  * sort — every stage is keyed by doc id or (shard, bin).
  */
object Interleave {

  /** Assemble per-document interleaved elements and pack documents into
    * `budget`-token context windows.
    *
    * Interleave rule (closed-form, oracle-replayable): text chunk `i`
    * sits at element position `2i`, media item `i` (by `ordCol`,
    * 0-based) at `2i+1` — chunk0, media0, chunk1, media1, …, whichever
    * side is longer trailing. Token costs: a text chunk costs its word
    * count, every media item costs `mediaTokens`. A media `ordCol`
    * that is null or negative fails LOUDLY (it would silently collide
    * with or precede the text positions).
    *
    * Returns one row per element:
    * `(idCol, shard, bin, seq, elem_ix, kind, content, tokens)` —
    * `seq` is the element's 0-based position within its (shard, bin)
    * window under (doc id, element position) order; `content` is the
    * chunk text or a media placeholder for the trainer's collator to
    * resolve against the media store — `<media:ord>` by default, or
    * `placeholderCol`'s value when named (the composition seam for
    * DECODED media metadata riding into the sequence, e.g.
    * `<image:WxH>` from the real image decoder — gate m16b). */
  def assemble(
      docs: DataFrame, idCol: String, textCol: String,
      media: DataFrame, mediaIdCol: String, ordCol: String,
      chunkSize: Int, mediaTokens: Int,
      budget: Long, numShards: Int = 256,
      placeholderCol: String = ""): DataFrame = {
    require(mediaTokens > 0, s"mediaTokens must be positive: $mediaTokens")
    val chunks = Chunk.chunkWords(docs, idCol, textCol, chunkSize, overlap = 0)
      .select(col(idCol), (col("chunk_ix") * 2).as("elem_ix"),
        lit("text").as("kind"), col("chunk").as("content"),
        // least(chunkSize, remaining) — the slice's own word count,
        // without re-tokenizing the chunk
        greatest(lit(0L), least(lit(chunkSize.toLong),
          col("n_words") - col("chunk_ix") * chunkSize)).as("tokens"))
    // loud guard on ord (left `+` operand — codegen skips the right
    // child of a null-intolerant op when the left is null)
    val ordGuard = coalesce(assert_true(col(ordCol) >= 0, concat(
      lit(s"interleave: media '$ordCol' must be a non-negative 0-based " +
        "position, got "),
      coalesce(col(ordCol).cast("string"), lit("NULL")))).cast("long"),
      lit(0L))
    // r16 ADVICE: two media rows with the same (id, ord) would silently
    // collide at one elem_ix — double-counted tokens in the pack totals
    // and arbitrary relative seq order. Refuse loudly instead (the
    // sftLossMask duplicate-key philosophy). The windowed count shuffles
    // only the media side — the lighter side by construction, and
    // placeholders shuffle right after for the pack join anyway.
    val dupW = Window.partitionBy(col(mediaIdCol), col(ordCol))
    val dupGuard = coalesce(assert_true(count(lit(1)).over(dupW) === 1,
      concat(lit("interleave: duplicate media (id, ord) = ("),
        col(mediaIdCol).cast("string"), lit(", "),
        col(ordCol).cast("string"), lit(")"))).cast("long"), lit(0L))
    val phContent =
      if (placeholderCol.isEmpty)
        concat(lit("<media:"), col(ordCol).cast("string"), lit(">"))
      else col(placeholderCol).cast("string")
    val placeholders = media.select(
      col(mediaIdCol).as(idCol),
      (ordGuard + dupGuard + col(ordCol).cast("long") * 2 + 1).as("elem_ix"),
      lit("media").as("kind"),
      phContent.as("content"),
      lit(mediaTokens.toLong).as("tokens"))
    // `elements` feeds BOTH the token totals and the final join —
    // uncached, the chunking kernel (tokenize + slice per doc) re-ran
    // for each consumer. Persist once per computation, release after
    // the caller's first action (r20 optimization round, guide §5.2).
    val elements = chunks.unionByName(placeholders)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = elements.groupBy(col(idCol))
      .agg(sum("tokens").as("__doc_tokens"))
    val packed = Pack
      .packGreedy(totals, idCol, "__doc_tokens", budget, numShards)
      .select(col(idCol), col("shard"), col("bin"))
    val w = Window.partitionBy("shard", "bin")
      .orderBy(col(idCol), col("elem_ix"))
    CacheRelease.afterFirstAction(
      elements.join(packed, idCol)
        .withColumn("seq", (row_number().over(w) - 1).cast("long"))
        .select(col(idCol), col("shard"), col("bin"), col("seq"),
          col("elem_ix"), col("kind"), col("content"), col("tokens")),
      Seq(elements))
  }
}
