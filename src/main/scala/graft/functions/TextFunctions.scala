package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / text-analysis / fingerprint
  * operators. Everything here is a pure Catalyst column expression —
  * no UDFs — so the whole text pipeline stays inside WholeStageCodegen
  * and scales as a narrow map stage (zero shuffle until an operator
  * explicitly groups or joins).
  *
  * Cross-engine determinism (SURVEY.md §5): hashes are md5-derived —
  * `bigint(md5(x)[0:15])` parses identically in Spark (`conv(_,16,10)`)
  * and DuckDB (`('0x'||_)::BIGINT`), unlike xxhash64/murmur whose
  * seeds differ between engines.
  */
object TextFunctions {

  /** Portable 60-bit positive hash of a string expression. */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace-collapsed, trimmed, lower-cased text — the dedup
    * normal form (reference text workflows normalize before hashing).
    */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Distinct character n-grams of a (pre-normalized) text column.
    * One array-valued projection per row: no explode, no shuffle.
    */
  def charNgrams(t: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
        i => t.substr(i, lit(n))))

  /** Whitespace tokens of a (pre-normalized) text column. */
  def wsTokens(t: Column): Column = split(t, " ")

  /** Distinct word n-shingles over a token-array column. Word shingles
    * (not char n-grams) are the right dedup unit at scale: a 3-word
    * shingle space is high-entropy, so inverted postings stay short
    * and shingle-join dedup stays near-linear — char trigrams of
    * natural text are so common that postings (and the candidate-pair
    * join) go quadratic. Generation is a native codegen expression
    * (graft.functions.expr.WordShingles); the HOF formulation
    * (transform + array_join + slice) is interpreted per element.
    */
  def wordShingles(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    array_distinct(ColumnBridge.column(
      graft.functions.expr.WordShingles(ColumnBridge.expression(tokens), n)))
  }

  /** BPE-ish regex tokens: letter runs / digit runs / single
    * punctuation marks — a deterministic, engine-portable stand-in for
    * the reference's GPT-3 BPE tokenizer
    * (reference: gpt3_tokenizer.py — external model; the token-budget
    * semantics are what matter, not the exact vocab).
    */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def regexTokens(t: Column): Column = {
    // regexp_extract_all needs a foldable regex → pass via expr-free
    // function with a literal pattern column.
    regexp_extract_all(t, lit(BpeishPattern), lit(0))
  }

  /** Small multilingual stopword/marker sets for the heuristic
    * language-ID operator. Deterministic, tiny, broadcast-free (they
    * compile into the expression tree as literals).
    */
  val StopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  val MarkersEs: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "es")
  val MarkersDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu")
  val MarkersFr: Seq[String] = Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour")
  val MarkersZh: Seq[String] = Seq("的", "是", "了", "在", "和", "有", "我", "不", "人", "这")

  /** Count of tokens (array column) that appear in a fixed set, with
    * multiplicity — a native codegen kernel (see
    * graft.functions.expr.TokensInSet; the HOF filter formulation ran
    * an interpreted lambda per token).
    */
  def tokensInSet(tokens: Column, set: Seq[String]): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      graft.functions.expr.TokensInSet(ColumnBridge.expression(tokens), set))
  }
}
