package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data-pipeline preprocessing over a
  * string column: tokenization, shingling, quality scoring, n-gram
  * language ID, and document fingerprinting. Everything is built from
  * codegen'd Catalyst expressions (no UDFs): at 100 TB these run inside
  * whole-stage codegen over the parquet scan with full column pruning.
  *
  * Determinism contract: all hashing is md5-hex (stable across engines),
  * ratios are single double divisions of exact integer counts, so results
  * hash-match a DuckDB oracle bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace tokens, empty strings dropped.
    *
    * PERF: callers must materialize this as its own column (withColumn)
    * before passing it to [[shingles]]/[[hitCount]] — inlined, every
    * element_at in the shingle lambda would re-run the split, turning a
    * linear pass into O(shingles × k) splits per row (measured 10×+ on
    * the sf0.1 bench). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Word k-shingles joined with single spaces; docs shorter than k
    * tokens yield an empty set. `toks` should be a materialized column. */
  def shingles(toks: Column, k: Int = 3): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k), i =>
        concat_ws(" ", (1 to k).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** BPE-style pre-tokenization pattern: alphabetic runs, digit runs, and
    * single non-space punctuation — the piece segmentation BPE vocabularies
    * merge from, usable for LLM token budgeting without a vocab file.
    * Plain character classes only, so Java and RE2-family engines agree. */
  val bpePattern: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** All BPE-style pieces of `text`, in order (one regex pass). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  /** How many tokens appear in `words` (language/stopword hit count). */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Small built-in stopword lists for the n-gram language-ID heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "y", "es", "un", "en"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "dans"))

  /** Language-ID: argmax of stopword hits with a fixed priority order
    * (first language wins ties — deterministic across engines). */
  def langId(toks: Column): Column = {
    val scores = langStopwords.map { case (l, ws) => l -> hitCount(toks, ws) }
    def argmax(rest: List[(String, Column)]): Column = rest match {
      case (l, _) :: Nil => lit(l)
      case (l, s) :: tail =>
        when(tail.map(_._2).foldLeft(lit(true))((acc, o) => acc && s >= o), lit(l))
          .otherwise(argmax(tail))
      case Nil => lit(null)
    }
    argmax(scores.toList)
  }

  /** Per-document min-hash fingerprint: lexicographic min of the md5'd
    * shingle set — a compact, order-independent document signature. */
  def fingerprint(shingleSet: Column): Column =
    array_min(transform(shingleSet, s => md5(s)))
}
