package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-pipeline tier — all codegen'd
  * built-ins and higher-order functions, no UDFs, so tokenization stays
  * inside WholeStageCodegen at 100 TB.
  */
object TextOps {

  /** Whitespace tokens of the (already lowercase) document text. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word-k-gram shingles ("a b c" strings) — compiled
    * expression (graft.functions.WordShingles): the HOF
    * transform/element_at form evaluates interpreted per element and was
    * the top cost of the Jaccard pipeline at sf0.1. */
  def shingles(tok: Column, k: Int): Column =
    graft.functions.TextExprs.wordShingles(tok, k, distinct = true)

  /** Adjacent-pair bigrams (non-distinct — frequency-bearing). */
  def bigrams(tok: Column): Column =
    graft.functions.TextExprs.wordShingles(tok, 2, distinct = false)
}
