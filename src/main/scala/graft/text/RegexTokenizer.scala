package graft.text

import java.util.regex.Pattern

/** The tokenizer contract the engine depends on (reference:
  * gpt3_tokenizer.py, all_MiniLM_L6_v2_tokenizer.py): `encode` → a
  * token sequence whose LENGTH drives every chunk/section budget,
  * `decode` → text round-trip for overlap and section padding.
  * Implementations: [[RegexTokenizer]] (cheap, splitter default) and
  * [[ByteBpeTokenizer]] (byte-level BPE, the reference's tiktoken
  * analogue).
  */
trait Tokenizer extends Serializable {
  def encode(text: String): Vector[String]
  def decode(tokens: Seq[String]): String
  def countTokens(text: String): Int = encode(text).length
}

/** Deterministic regex tokenizer — the cheap stand-in where only the
  * budget arithmetic matters. Tokens are "optional leading whitespace
  * + (letter run | digit run | single symbol)", so decode(encode(x))
  * reconstructs x up to trailing whitespace — the same property BPE
  * gives the reference.
  */
final class RegexTokenizer extends Tokenizer {
  @transient private lazy val pattern: Pattern =
    Pattern.compile("\\s*(?:[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])")

  def encode(text: String): Vector[String] = {
    val m = pattern.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  def decode(tokens: Seq[String]): String = tokens.mkString("")
}
