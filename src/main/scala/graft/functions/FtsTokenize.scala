package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB fts-style tokenization options, with DuckDB's documented
  * defaults: `stemmer := 'porter'`, `stopwords := 'english'`,
  * `ignore := '(\.|[^a-z])+'`, `strip_accents := 1`, `lower := 1`
  * (the fts extension's create_fts_index signature).
  *
  * The normalization chain matches the extension's tokenize order:
  * strip accents → lower-case → replace ignore-pattern matches with a
  * space → split on whitespace → drop empties → drop stopwords → stem.
  * Document length (the BM25 `dl`) is the count AFTER stopword removal,
  * exactly as the extension's terms-table count has it.
  *
  * Divergence (documented in README): the stopword list here is the
  * public-domain Snowball English list (+ the contraction fragments the
  * default ignore-pattern produces), not the 571-word list the binary
  * extension ships — the extension cannot load offline to copy it.
  * `stopwords := 'none'` matches exactly.
  */
final case class FtsOptions(
    stemmer: String = "porter",
    stopwords: String = "english",
    ignore: String = """(\.|[^a-z])+""",
    stripAccents: Boolean = true,
    lower: Boolean = true) {
  /** The exact-token contract (r07): every normalization off. */
  def isExact: Boolean =
    stemmer == "none" && stopwords == "none" && ignore.isEmpty &&
      !stripAccents && !lower
}

object FtsTokenizer {

  /** Snowball English stopword list (public domain), plus the fragments
    * the default punctuation-stripping tokenizer produces from common
    * contractions (don't → don, t; it's → it, s; we'll → we, ll …).
    */
  val englishStopwords: Set[String] = Set(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "your", "yours", "yourself", "yourselves",
    "he", "him", "his", "himself", "she", "her", "hers", "herself",
    "it", "its", "itself", "they", "them", "their", "theirs", "themselves",
    "what", "which", "who", "whom", "this", "that", "these", "those",
    "am", "is", "are", "was", "were", "be", "been", "being",
    "have", "has", "had", "having", "do", "does", "did", "doing",
    "would", "should", "could", "ought", "cannot",
    "a", "an", "the", "and", "but", "if", "or", "because", "as",
    "until", "while", "of", "at", "by", "for", "with", "about",
    "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how",
    "all", "any", "both", "each", "few", "more", "most", "other",
    "some", "such", "no", "nor", "not", "only", "own", "same", "so",
    "than", "too", "very",
    // contraction fragments under the default ignore pattern
    "s", "t", "d", "m", "ll", "re", "ve", "don", "isn", "aren", "wasn",
    "weren", "hasn", "haven", "hadn", "doesn", "didn", "won", "wouldn",
    "shan", "shouldn", "can", "couldn", "mustn", "let", "will", "just",
    "now")

  /** NFD-decompose and drop combining marks — `strip_accents` semantics
    * for Latin text (müller → muller, café → cafe).
    */
  def stripAccents(s: String): String = {
    // ASCII fast path: English-dominant corpora skip the NFD pass (which
    // allocates a normalized copy of EVERY document) entirely
    var ascii = true
    var a = 0
    while (a < s.length && ascii) {
      if (s.charAt(a) >= 0x80) ascii = false
      a += 1
    }
    if (ascii) return s
    var hasMark = false
    val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    var i = 0
    while (i < n.length && !hasMark) {
      if (Character.getType(n.charAt(i)) == Character.NON_SPACING_MARK) hasMark = true
      i += 1
    }
    if (!hasMark) s
    else {
      val sb = new java.lang.StringBuilder(n.length)
      var j = 0
      while (j < n.length) {
        if (Character.getType(n.charAt(j)) != Character.NON_SPACING_MARK)
          sb.append(n.charAt(j))
        j += 1
      }
      sb.toString
    }
  }

  def stemFn(name: String): String => String = name match {
    case "none"    => identity
    case "porter"  => PorterStemmer.stem
    case "english" => Porter2Stemmer.stem
    case other => throw new IllegalArgumentException(
      s"unknown stemmer '$other' — available: 'none', 'porter' (DuckDB's " +
        "default), 'english' (porter2)")
  }

  def stopwordsFor(name: String): Set[String] = name match {
    case "none"    => Set.empty
    case "english" => englishStopwords
    case other => throw new IllegalArgumentException(
      s"unknown stopword list '$other' — available: 'none', 'english'")
  }

  /** Pre-compiled normalization chain — the build pass calls this once per
    * document, so the ignore/whitespace patterns must compile ONCE per
    * task, not per row (String.replaceAll/split recompile every call).
    */
  final class Compiled(o: FtsOptions) extends Serializable {
    private val ignoreP =
      if (o.ignore.nonEmpty) java.util.regex.Pattern.compile(o.ignore) else null
    private val wsP = java.util.regex.Pattern.compile("\\s+")
    private val stop = stopwordsFor(o.stopwords)
    private val stem = stemFn(o.stemmer)
    // per-task stem memo: corpora are Zipfian, so most stem calls repeat a
    // small vocabulary — bounded (the cap bounds memory on adversarial
    // vocabularies), NOT thread-safe by design (each Spark task holds its
    // own deserialized Compiled)
    @transient private lazy val memo = new java.util.HashMap[String, String](1 << 12)
    private def stemCached(w: String): String = {
      if (o.stemmer == "none") return w
      val hit = memo.get(w)
      if (hit != null) hit
      else {
        val r = stem(w)
        if (memo.size < 65536) memo.put(w, r)
        r
      }
    }
    def tokenize(text: String): Array[String] = {
      if (text == null) return Array.empty
      var s = text
      if (o.stripAccents) s = stripAccents(s)
      if (o.lower) s = s.toLowerCase(java.util.Locale.ROOT)
      if (ignoreP != null) s = ignoreP.matcher(s).replaceAll(" ")
      wsP.split(s).iterator
        .filter(_.nonEmpty)
        .filterNot(stop.contains)
        .map(stemCached)
        .toArray
    }
  }

  /** Full normalization chain; `null` text tokenizes to nothing. (One-shot
    * convenience — hot paths hold a [[Compiled]].)
    */
  def tokenize(text: String, o: FtsOptions): Array[String] =
    new Compiled(o).tokenize(text)
}

/** Catalyst expression applying [[FtsTokenizer.tokenize]] — the fts index
  * BUILD pass for non-exact options (one batch pass over the corpus; the
  * exact-token path stays on codegen'd split/filter). CodegenFallback is
  * the honest trade here: the stemmer is branchy string code that would
  * not fuse anyway, and the expression runs once per corpus build, never
  * per query.
  */
/** DuckDB fts `stem(input, stemmer)` scalar — here always available (the
  * stemmers are pure Scala), registered by the PSQL entry points.
  */
case class FtsStemExpr(child: Expression, stemmer: String)
    extends UnaryExpression with CodegenFallback {
  FtsTokenizer.stemFn(stemmer) // validate at construction
  // resolved once per task, not per row (transient: re-resolves after
  // deserialization on the executor)
  @transient private lazy val stem = FtsTokenizer.stemFn(stemmer)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(stem(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class FtsTokenizeExpr(child: Expression, options: FtsOptions)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  @transient private lazy val compiled = new FtsTokenizer.Compiled(options)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val text = if (v == null) null else v.asInstanceOf[UTF8String].toString
    val toks = compiled.tokenize(text)
    new GenericArrayData(toks.map(UTF8String.fromString(_)))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
