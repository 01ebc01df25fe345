package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for RAG / training-context preparation: split each
  * document into overlapping windows, each chunk carrying a deterministic
  * (doc_id, chunk_ix) identity so downstream dedup/embedding/packing
  * stages key on it.
  *
  * Both variants are MAP-SIDE ONLY — a generator expression per row, no
  * shuffle, no state; at 100 TB chunking is a streaming-friendly scan
  * whose output row count is bounded by len/step per document. The
  * window arithmetic is deliberately closed-form (chunk i covers
  * [i·step, i·step + chunkSize)) so an external system — or the DuckDB
  * oracle — can reproduce chunk boundaries exactly from the parameters,
  * which is what makes chunk-level caches and incremental re-chunking
  * possible without reading the producing engine's internals.
  */
object Chunk {

  private def chunkCount(units: Column, chunkSize: Int, overlap: Int): Column = {
    val step = chunkSize - overlap
    // ceil((units - overlap) / step), floored at 1 so empty/short docs
    // still yield exactly one (possibly empty) chunk — dropping them
    // would silently lose document identity through the pipeline
    greatest(lit(1L), ceil((units.cast("double") - overlap) / step).cast("long"))
  }

  /** Fixed CHARACTER windows of `chunkSize` with `overlap` chars shared
    * between consecutive chunks. Returns (idCol, chunk_ix, chunk,
    * n_chunks). */
  def chunkChars(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize; got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    val n = chunkCount(length(col(textCol)), chunkSize, overlap)
    df.select(col(idCol), col(textCol), n.as("n_chunks"))
      .select(col(idCol), col("n_chunks"),
        posexplode(transform(sequence(lit(0L), col("n_chunks") - 1),
          i => substring(col(textCol), (i * step + 1).cast("int"), lit(chunkSize))))
          .as(Seq("chunk_ix", "chunk")))
      .select(col(idCol), col("chunk_ix").cast("long").as("chunk_ix"),
        col("chunk"), col("n_chunks"))
  }

  /** Content-defined chunking ([[graft.functions.CdcChunksExpr]]): split
    * where a rolling hash of the trailing `window` codepoints hits
    * `hash % divisor == 0`. Boundaries depend only on local content, so
    * an edit re-aligns within ~window chars instead of shifting every
    * later boundary — the dedup-stable chunking (pair with exact or
    * minhash chunk dedup to catch shifted duplicates fixed windows
    * miss). Expected chunk length ≈ `divisor` chars. Same map-side-only
    * cost model as the fixed variants. Returns (idCol, chunk_ix, chunk,
    * n_chunks). */
  def chunkContentDefined(df: DataFrame, idCol: String, textCol: String,
      window: Int = 16, divisor: Int = 64): DataFrame =
    df.select(col(idCol),
        graft.functions.CdcChunksExpr(col(textCol), window, divisor).as("__ch"))
      .select(col(idCol), size(col("__ch")).cast("long").as("n_chunks"),
        posexplode(col("__ch")).as(Seq("chunk_ix", "chunk")))
      .select(col(idCol), col("chunk_ix").cast("long").as("chunk_ix"),
        col("chunk"), col("n_chunks"))

  /** Fixed WORD windows (whitespace tokens, the
    * [[graft.functions.TextFunctions.words]] contract) of `chunkSize`
    * words with `overlap` words shared; chunks re-join with single spaces
    * — the common approximate-token windowing when a real tokenizer is
    * too expensive at corpus scale. Returns (idCol, chunk_ix, chunk,
    * n_words, n_chunks). */
  def chunkWords(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize; got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    val ws = graft.functions.TextFunctions.words(col(textCol))
    val n = chunkCount(size(ws), chunkSize, overlap)
    df.select(col(idCol), ws.as("__w"), n.as("n_chunks"))
      .select(col(idCol), size(col("__w")).cast("long").as("n_words"),
        col("n_chunks"),
        posexplode(transform(sequence(lit(0L), col("n_chunks") - 1),
          i => concat_ws(" ", slice(col("__w"), (i * step + 1).cast("int"), lit(chunkSize)))))
          .as(Seq("chunk_ix", "chunk")))
      .select(col(idCol), col("chunk_ix").cast("long").as("chunk_ix"),
        col("chunk"), col("n_words"), col("n_chunks"))
  }
}
