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

  /** Distinct word-k-gram shingles ("a b c" strings). Requires
    * size(tokens) >= k (documents guarantee ~10+ tokens). */
  def shingles(tok: Column, k: Int): Column =
    array_distinct(transform(sequence(lit(0), size(tok) - k), i =>
      concat_ws(" ", (1 to k).map(j => element_at(tok, i + j)): _*)))

  /** Adjacent-pair bigrams (non-distinct — frequency-bearing). */
  def bigrams(tok: Column): Column =
    transform(sequence(lit(0), size(tok) - 2), i =>
      concat_ws(" ", element_at(tok, i + 1), element_at(tok, i + 2)))
}
