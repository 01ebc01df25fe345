package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DictionaryMatchExpr

/** Table-driven dictionary tagging: one-pass Aho–Corasick matching
  * ([[graft.functions.DictionaryMatchExpr]]) where the term set comes
  * from a DATAFRAME instead of a code literal — the operator form real
  * blocklists / licence-phrase / topic-lexicon sets need, because those
  * arrive as tables (thousands of rows, updated independently of code).
  *
  * Spark shape at corpus scale: the term table is collapsed to a
  * bounded driver-side dictionary (distinct, lexicographically sorted
  * for a deterministic dictionary order, collected under a LOUD cap —
  * the same bounded-driver-model discipline as the BPE and n-gram LM
  * trainers), the automaton builds ONCE and ships inside the expression
  * as a codegen reference object, and every document is scanned in one
  * O(len + matches) pass inside whole-stage codegen. The alternative — a
  * documents×terms join with a `contains` condition — is a
  * non-equi-join (nested-loop at any scale) that rescans each document
  * K times; collapsing the small side into an automaton is exactly the
  * broadcast-hash-join trade, applied at the byte level. */
object DictionaryTag {

  /** Tag `df`'s `textCol` with the distinct terms of `terms.termCol`,
    * appending `outCol` as the matched terms in lexicographic order
    * (`array<string>` — join it to a scalar before gating). Null/empty
    * terms are dropped; more than `maxTerms` distinct terms refuses
    * loudly (the automaton is driver-built state; an unbounded lexicon
    * needs a different operator, not a silent OOM). */
  def tag(
      df: DataFrame, textCol: String,
      terms: DataFrame, termCol: String,
      outCol: String = "tags", maxTerms: Int = 100000): DataFrame = {
    val collected = terms
      .select(col(termCol).cast("string").as("__t"))
      .filter(col("__t").isNotNull && col("__t") =!= "")
      .distinct()
      .orderBy("__t")
      .limit(maxTerms + 1) // +1: detect overflow without counting the table
      .collect().map(_.getString(0)).toSeq
    require(collected.length <= maxTerms,
      s"terms table has more than maxTerms=$maxTerms distinct terms — " +
        "the dictionary automaton is bounded driver state; raise the cap " +
        "deliberately or pre-filter the lexicon")
    df.withColumn(outCol,
      if (collected.isEmpty) array().cast("array<string>")
      else DictionaryMatchExpr(col(textCol), collected))
  }
}
