package graft.text

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** One chunk of a split document (reference: text_splitter.py:28-41
  * TextChunk). Positions are char offsets into the original text;
  * overlaps are token sequences borrowed from the neighbors.
  */
final case class TextChunk(
    text: String,
    tokens: Vector[String],
    startPos: Int,
    endPos: Int,
    startOverlap: Vector[String],
    endOverlap: Vector[String])

final case class SplitterConfig(
    separators: Seq[String] = Nil,
    keepSeparators: Boolean = false,
    chunkSize: Int = 400,
    chunkOverlap: Int = 40,
    docType: Option[String] = None) {
  require(chunkSize >= 1, "chunk_size must be >= 1")
  require(chunkOverlap >= 0, "chunk_overlap must be >= 0")
  require(chunkOverlap <= chunkSize, "chunk_overlap must be <= chunk_size")
}

/** Recursive separator-based, token-budgeted text splitter — same
  * semantics as the reference (reference: text_splitter.py:44-177):
  * split on the first separator, recurse with the remaining separators
  * into any part whose token count exceeds `chunkSize` (with the
  * chars/6 shortcut that skips tokenizing obviously-too-big parts),
  * drop parts with no alphanumeric char, greedily re-merge adjacent
  * small chunks up to the budget, then attach `chunkOverlap` tokens
  * from each neighbor. Like the reference's combine_chunks, a merged
  * chunk keeps the endPos of its first constituent
  * (reference: text_splitter.py:150-174 — text/tokens grow but end_pos
  * is not advanced; mirrored for behavioral equivalence).
  *
  * The class is Serializable and per-document pure, so Spark applies
  * it with `Dataset.flatMap` — a narrow, codegen-adjacent stage that
  * chunks a 100 TB corpus with zero shuffle.
  */
final class TextSplitter(
    val config: SplitterConfig = SplitterConfig(),
    val tokenizer: Tokenizer = new RegexTokenizer) extends Serializable {

  /** Same budgets/tokenizer, doc-type-specific separator table
    * (reference: local_document_index.py:148-152 — doc_type falls back
    * to the uri extension per document).
    */
  def forDocType(docType: String): TextSplitter =
    if (config.separators.nonEmpty || docType == null || docType.isEmpty) this
    else new TextSplitter(config.copy(docType = Some(docType)), tokenizer)

  private val separators: Seq[String] =
    if (config.separators.nonEmpty) config.separators
    else TextSplitter.separatorsFor(config.docType)

  /** reference: text_splitter.py:72-92 split. */
  def split(text: String): Vector[TextChunk] = {
    val chunks = recursiveSplit(text, separators, 0)
    if (config.chunkOverlap > 0 && chunks.length > 1) {
      val n = config.chunkOverlap
      chunks.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.copy(endOverlap = chunks(1).tokens.take(n))
        else c.copy(
          startOverlap = chunks(i - 1).tokens.takeRight(n),
          endOverlap =
            if (i < chunks.length - 1) chunks(i + 1).tokens.take(n) else Vector.empty)
      }
    } else chunks
  }

  /** reference: text_splitter.py:94-148 recursive_split. */
  private def recursiveSplit(text: String, seps: Seq[String], startPos0: Int): Vector[TextChunk] = {
    val out = ArrayBuffer.empty[TextChunk]
    if (text.nonEmpty) {
      val separator = seps.headOption.getOrElse("")
      val nextSeps = if (seps.length > 1) seps.tail else Nil
      val parts: Array[String] =
        if (seps.nonEmpty) text.split(Pattern.quote(separator), -1)
        else { val half = text.length / 2; Array(text.substring(0, half), text.substring(half)) }

      var startPos = startPos0
      var i = 0
      while (i < parts.length) {
        val lastChunk = i == parts.length - 1
        var chunk = parts(i)
        val endPos = startPos + (chunk.length - 1) + (if (lastChunk) 0 else separator.length)
        if (config.keepSeparators && !lastChunk) chunk += separator

        if (containsAlphanumeric(chunk)) {
          if (chunk.length / 6 > config.chunkSize) {
            out ++= recursiveSplit(chunk, nextSeps, startPos)
          } else {
            val tokens = tokenizer.encode(chunk)
            if (tokens.length > config.chunkSize) {
              out ++= recursiveSplit(chunk, nextSeps, startPos)
            } else {
              out += TextChunk(chunk, tokens, startPos, endPos, Vector.empty, Vector.empty)
            }
          }
        }
        startPos = endPos + 1
        i += 1
      }
    }
    combineChunks(out)
  }

  /** reference: text_splitter.py:150-174 combine_chunks. */
  private def combineChunks(chunks: ArrayBuffer[TextChunk]): Vector[TextChunk] = {
    val combined = Vector.newBuilder[TextChunk]
    val separator = if (config.keepSeparators) "" else " "
    var current: TextChunk = null
    for (chunk <- chunks) {
      if (current != null) {
        if (current.tokens.length + chunk.tokens.length > config.chunkSize) {
          combined += current
          current = chunk
        } else {
          current = current.copy(
            text = current.text + separator + chunk.text,
            tokens = current.tokens ++ chunk.tokens)
        }
      } else current = chunk
    }
    if (current != null) combined += current
    combined.result()
  }

  /** reference: text_splitter.py:176-177. */
  private def containsAlphanumeric(text: String): Boolean =
    text.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9'))
}

object TextSplitter {

  private val codeCommon = Seq("\nif ", "\nfor ", "\nwhile ", "\nswitch ", "\ncase ")
  private val lines = Seq("\n\n", "\n", " ")
  private val cLike = Seq("\nclass ", "\npublic ", "\nprotected ", "\nprivate ", "\nstatic ") ++
    codeCommon ++ lines
  private val jsLike = Seq("\nclass ", "\nfunction ", "\nconst ", "\nlet ", "\nvar ", "\nclass ") ++
    codeCommon ++ Seq("\ndefault ") ++ lines
  private val pyLike = Seq("\nclass ", "\ndef ", "\n\tdef ") ++ lines

  /** Per-doc-type separator tables (reference: text_splitter.py:179-667
    * get_separators — same doc-type keys and separator priority,
    * expressed as shared family lists).
    */
  def separatorsFor(docType: Option[String]): Seq[String] = docType.getOrElse("") match {
    case "cpp" =>
      Seq("\nclass ", "\nvoid ", "\nint ", "\nfloat ", "\ndouble ") ++ codeCommon ++ lines
    case "go" =>
      Seq("\nfunc ", "\nvar ", "\nconst ", "\ntype ", "\nif ", "\nfor ", "\nswitch ", "\ncase ") ++ lines
    case "java" | "c#" | "csharp" | "cs" | "ts" | "tsx" | "typescript" => cLike
    case "js" | "jsx" | "javascript" => jsLike
    case "php" =>
      Seq("\nfunction ", "\nclass ", "\nif ", "\nforeach ", "\nwhile ", "\ndo ", "\nswitch ", "\ncase ") ++ lines
    case "proto" =>
      Seq("\nmessage ", "\nservice ", "\nenum ", "\noption ", "\nimport ", "\nsyntax ") ++ lines
    case "python" | "py" => pyLike
    case "rst" => Seq("\n===\n", "\n---\n", "\n***\n", "\n.. ") ++ lines
    case "ruby" =>
      Seq("\ndef ", "\nclass ", "\nif ", "\nunless ", "\nwhile ", "\nfor ", "\ndo ", "\nbegin ", "\nrescue ") ++ lines
    case "rust" =>
      Seq("\nfn ", "\nconst ", "\nlet ", "\nif ", "\nwhile ", "\nfor ", "\nloop ", "\nmatch ", "\nconst ") ++ lines
    case "scala" =>
      Seq("\nclass ", "\nobject ", "\ndef ", "\nval ", "\nvar ", "\nif ", "\nfor ", "\nwhile ", "\nmatch ", "\ncase ") ++ lines
    case "swift" =>
      Seq("\nfunc ", "\nclass ", "\nstruct ", "\nenum ", "\nif ", "\nfor ", "\nwhile ", "\ndo ", "\nswitch ", "\ncase ") ++ lines
    case "md" =>
      Seq("\n## ", "\n### ", "\n#### ", "\n##### ", "\n###### ", "```\n\n",
        "\n\n***\n\n", "\n\n---\n\n", "\n\n___\n\n", "<table>") ++ lines
    case "latex" =>
      Seq("\n\\chapter{", "\n\\section{", "\n\\subsection{", "\n\\subsubsection{",
        "\n\\begin{enumerate}", "\n\\begin{itemize}", "\n\\begin{description}", "\n\\begin{list}",
        "\n\\begin{quote}", "\n\\begin{quotation}", "\n\\begin{verse}", "\n\\begin{verbatim}",
        "\n\\begin{align}", "$$", "$") ++ lines
    case "html" =>
      Seq("<body>", "<div>", "<p>", "<br>", "<li>", "<h1>", "<h2>", "<h3>", "<h4>", "<h5>", "<h6>",
        "<span>", "<table>", "<tr>", "<td>", "<th>", "<ul>", "<ol>", "<header>", "<footer>", "<nav>",
        "<head>", "<style>", "<script>", "<meta>", "<title>", " ")
    case "sol" =>
      Seq("\npragma ", "\nusing ", "\ncontract ", "\ninterface ", "\nlibrary ", "\nconstructor ",
        "\ntype ", "\nfunction ", "\nevent ", "\nmodifier ", "\nerror ", "\nstruct ", "\nenum ",
        "\nif ", "\nfor ", "\nwhile ", "\ndo while ", "\nassembly ") ++ lines
    case _ => lines
  }
}
