package graft

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.graft.{DatasetHelper, Nullability, UnsafeUdf}

/** Public facade of graft's custom column functions. The implementations
  * live under `org.apache.spark.sql.graft` because they use
  * `private[sql]` Spark internals (Column↔Expression bridging,
  * Dataset.showString). */
package object functions {

  /** Override the inferred nullability to non-nullable; the expression
    * throws at runtime if a null actually flows through. */
  def make_not_nullable(c: Column): Column = Nullability.makeNotNullable(c)

  /** Override the inferred nullability to nullable. */
  def make_nullable(c: Column): Column = Nullability.makeNullable(c)

  /** Unary UDF with an explicitly declared result DataType; `f` operates
    * on external Scala values. */
  def unsafe_unary_udf(f: Any => Any, srcType: DataType, tgtType: DataType): Column => Column =
    UnsafeUdf.unsafeUnaryUdf(f, srcType, tgtType)

  /** Render a Dataset as the `show()` table, as a String. */
  def show_string(ds: Dataset[_], numRows: Int = 20, truncate: Int = 20,
      vertical: Boolean = false): String =
    DatasetHelper.showString(ds, numRows, truncate, vertical)

  // ------------------------------------------------ tokenizer encoders
  // (learning lives in graft.text.{Bpe, WordPiece} and the unigram
  // census in LlmOps — these are the codegen'd map-side encoders a
  // caller applies with an already-learned tokenizer)

  /** BPE application under a learned merge list (word → symbols). */
  def bpe_encode(word: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.BpeTokens.bpe_encode(word, merges)

  /** Σ BPE symbol counts over a token array. */
  def bpe_count(tokens: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.BpeTokens.bpe_count(tokens, merges)

  /** WordPiece greedy longest-match encode (`##` continuations,
    * whole-word `[UNK]` on a dead end). */
  def wordpiece_encode(word: Column, initPieces: Seq[String],
      contPieces: Seq[String]): Column =
    org.apache.spark.sql.graft.WordPieceTokens
      .wordpiece_encode(word, initPieces, contPieces)

  /** Σ WordPiece piece counts over a token array ([UNK] counts 1). */
  def wordpiece_count(tokens: Column, initPieces: Seq[String],
      contPieces: Seq[String]): Column =
    org.apache.spark.sql.graft.WordPieceTokens
      .wordpiece_count(tokens, initPieces, contPieces)

  // ------------------------------------------------ text normalization

  /** Unicode canonical composition (NFC) — codegen'd, with an
    * `isNormalized` ASCII fast path. */
  def nfc_normalize(c: Column): Column =
    org.apache.spark.sql.graft.UnicodeNorm.nfc(c)

  /** Unicode canonical decomposition (NFD). */
  def nfd_normalize(c: Column): Column =
    org.apache.spark.sql.graft.UnicodeNorm.nfd(c)
}
