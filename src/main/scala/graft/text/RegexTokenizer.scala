package graft.text

import java.util.regex.Pattern

/** Deterministic regex tokenizer — the engine-local stand-in for the
  * reference's external BPE tokenizers (reference: gpt3_tokenizer.py,
  * all_MiniLM_L6_v2_tokenizer.py, both of which load model files this
  * zero-egress build cannot). What the engine actually depends on is
  * the Tokenizer CONTRACT: `encode` → token sequence whose length
  * drives every chunk budget, `decode` → text round-trip for overlap
  * and section padding. Tokens are "optional leading whitespace +
  * (letter run | digit run | single symbol)", so decode(encode(x))
  * reconstructs x up to trailing whitespace — the same property BPE
  * gives the reference.
  */
final class RegexTokenizer extends Serializable {
  @transient private lazy val pattern: Pattern =
    Pattern.compile("\\s*(?:[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])")

  def encode(text: String): Vector[String] = {
    val m = pattern.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  def decode(tokens: Seq[String]): String = tokens.mkString("")

  def countTokens(text: String): Int = encode(text).length
}
