package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders (north-star scope): language ID, quality
  * scoring, token counting, document fingerprinting. All pure Column
  * expressions over Spark builtins/higher-order functions — codegen-capable,
  * no UDFs — with arithmetic chosen to be portable (integer ratios, md5-based
  * hashes) so DuckDB oracles can replicate results exactly.
  */
object TextFunctions {

  /** Minimal per-language stopword evidence lists for the n-gram/stopword
    * language-ID heuristic. Tiny by design: the heuristic is the operator;
    * swap in fuller lists for production use.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不")
  )

  private def hits(words: Column, lang: String): Column =
    size(array_intersect(words, array(stopwords(lang).map(lit): _*)))

  /** Predicted language by max stopword hits, with a fixed priority order
    * (en, de, fr, es, zh) breaking ties — deterministic and trivially
    * portable to the oracle SQL.
    */
  def langId(text: Column): Column = {
    val words = split(lower(text), "\\s+")
    val en = hits(words, "en"); val de = hits(words, "de")
    val fr = hits(words, "fr"); val es = hits(words, "es")
    val zh = hits(words, "zh")
    when(en >= de && en >= fr && en >= es && en >= zh, "en")
      .when(de >= fr && de >= es && de >= zh, "de")
      .when(fr >= es && fr >= zh, "fr")
      .when(es >= zh, "es")
      .otherwise("zh")
  }

  /** Quality-score components: character/word counts, mean word length,
    * punctuation/digit/whitespace ratios and a composite score in [0,1].
    * Integer counts divided as doubles — identical cross-engine.
    */
  def qualityStats(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val words = split(text, "\\s+")
    val nWords = size(words)
    val nPunct = nChars - length(regexp_replace(text, "[.,;:!?'\"()-]", ""))
    val nDigit = nChars - length(regexp_replace(text, "[0-9]", ""))
    val nSpace = nChars - length(regexp_replace(text, " ", ""))
    val meanWordLen = (nChars - nSpace).cast("double") / nWords
    val punctRatio = nPunct.cast("double") / nChars
    val digitRatio = nDigit.cast("double") / nChars
    // crude composite: long-enough, low-punct, low-digit
    val score = least(lit(1.0), nWords.cast("double") / 20) * (lit(1.0) - punctRatio) * (lit(1.0) - digitRatio)
    Seq(
      "n_chars_calc" -> nChars.cast("long"),
      "n_words" -> nWords.cast("long"),
      "mean_word_len" -> meanWordLen,
      "punct_ratio" -> punctRatio,
      "digit_ratio" -> digitRatio,
      "quality_score" -> score)
  }

  /** Whitespace token count and a BPE-ish regex token count
    * (runs of letters | runs of digits | any other non-space char).
    */
  def tokenCounts(text: Column): Seq[(String, Column)] = Seq(
    "ws_tokens" -> size(split(text, "\\s+")).cast("long"),
    "re_tokens" -> size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))

  /** Order-sensitive document fingerprint:
    * F = Σ_i (i+1)·wh(w_i) mod (2^31-1), with the per-word hash wh taken
    * from the first 7 hex digits of md5 (28 bits — products stay well under
    * int64). Portable: identical arithmetic is expressible in DuckDB SQL
    * (`('0x' || substr(md5(w),1,7))::BIGINT`).
    */
  def fingerprint(text: Column): Column = {
    val words = split(text, " ")
    val wordHash = (w: Column) => conv(substring(md5(w), 1, 7), 16, 10).cast("long")
    val weighted = transform(words, (w, i) => wordHash(w) * (i.cast("long") + 1L))
    pmod(aggregate(weighted, lit(0L), (acc, x) => acc + x), lit(2147483647L))
  }

  /** PII redaction for training text: emails, long digit runs (phone-ish),
    * and IPv4 literals become typed placeholder tokens. Pure codegen'd
    * regexp chain — one pass per pattern, applied in this order so an email
    * is consumed whole before the digit rule can chew its local part.
    * Deliberately aggressive (any 9+-char digit/space/hyphen run counts as
    * phone-like): for pre-training scrubbing, false positives are cheap and
    * misses are not. Patterns stay in the RE2 ∩ Java-regex dialect so the
    * identical expression runs in DuckDB (`regexp_replace(…, 'g')`).
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+?\\d[\\d -]{7,}\\d" -> "<PHONE>")

  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }

  /** Markup-stripping patterns, applied in order: HTML/XML tags, HTML
    * entities, markdown emphasis/heading/code markers, then whitespace
    * collapse. RE2 ∩ Java-regex dialect like [[piiPatterns]], so the
    * identical expressions run in DuckDB (`regexp_replace(…, 'g')`) — the
    * boilerplate-removal first pass of a web-crawl curation pipeline.
    */
  val markupPatterns: Seq[(String, String)] = Seq(
    "<[^>]*>" -> " ",                 // HTML/XML tags
    "&[A-Za-z]{2,8};|&#\\d{1,6};" -> " ", // character entities
    "[*_~`#]+" -> "",                 // markdown emphasis/heading/code marks
    "\\s+" -> " ")                    // collapse the holes the above leave

  def stripMarkup(text: Column): Column =
    trim(markupPatterns.foldLeft(text) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) })

  /** Train a unigram language model on a bounded deterministic sample —
    * the CCNet-style quality-scoring recipe (train a small LM on a clean
    * sample, keep the corpus rows it finds unsurprising): top `vocabSize`
    * tokens by (count desc, token asc), add-one-smoothed
    * `logp(tok) = ln((count+1)/(N+V+1))`, OOV mass `ln(1/(N+V+1))`.
    * Deterministic given the data (ordered `sampleN`-row sample, fixed
    * tiebreaks), like [[graft.operators.Similarity.trainCentroids]] — which
    * is what lets the trained log-probs ride into a DuckDB oracle as
    * literals. Tokenization is `split(text, ' ')` keeping empties (the
    * cross-engine rule used everywhere else here).
    */
  def trainUnigramLm(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int = 1024,
      sampleN: Int = 2048): (Seq[(String, Double)], Double) = {
    val texts = df.select(col(idCol), col(textCol))
      .orderBy(idCol).limit(sampleN)
      .collect().map(r => Option(r.getString(1)).getOrElse(""))
    val counts = new java.util.HashMap[String, Long]()
    var n = 0L
    texts.foreach(_.split(" ", -1).foreach { t =>
      counts.merge(t, 1L, _ + _); n += 1
    })
    import scala.jdk.CollectionConverters._
    val vocab = counts.asScala.toSeq
      .sortBy { case (t, c) => (-c, t) }
      .take(vocabSize)
    val denom = (n + vocab.length + 1).toDouble
    val logps = vocab.map { case (t, c) => t -> math.log((c + 1) / denom) }
    (logps, math.log(1 / denom))
  }

  /** Mean negative log-likelihood of a text under a trained unigram LM
    * (lower = more natural under the training sample) — an ORDERED fold
    * over the tokens so the summation matches the oracle's list arithmetic
    * term for term; rounded to 6 dp for the cross-engine cut. Empty texts
    * (no tokens is impossible — split always yields ≥1 segment) score the
    * OOV mass. Computed by the codegen'd [[graft.functions.LmScoreExpr]]
    * kernel (one tight pass per row; the interpreted HOF formulation of
    * the same fold cost ~5x).
    */
  def lmScore(text: Column, vocab: Map[String, Double], oovLogp: Double): Column =
    ShingleFunctions.lmNll(text, vocab, oovLogp)

  /** Repeated-n-gram ratio — the Gopher/C4-style repetition quality signal:
    * `1 − |distinct n-grams| / |n-grams|` (0.0 for docs too short to have
    * an n-gram). High values flag boilerplate/spam that should be filtered
    * before training. Computed per row from the codegen'd shingle-hash
    * array ([[ShingleFunctions.shingleHashes]]) — map-side, no shuffle;
    * 64-bit hashes stand in for the n-gram strings (counts equal w.h.p.,
    * the same trade as the d04 inverted index).
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val sh = ShingleFunctions.shingleHashes(text, n)
    when(size(sh) > 0,
      lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh).cast("double"))
      .otherwise(lit(0.0))
  }

  /** The Gopher stopword list (Rae et al. 2021, §A1.1 "the, be, to, of,
    * and, that, have, with" — a doc must contain at least two to pass).
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-rule metrics + verdict (Rae et al. 2021, §A1.1): word
    * count bounds [50, 100 000], mean word length in [3, 10], ≥ 80% of
    * words containing an alphabetic character, and ≥ 2 stopword hits. Each
    * metric is returned alongside the combined `gopher_pass` so filtering
    * AND diagnostics come from one map-side pass — no shuffle, all
    * codegen'd HOFs over one split. Words are the non-empty segments of a
    * single-space split (identical to DuckDB's
    * `list_filter(string_split(text,' '), w -> len(w) > 0)`); ratios round
    * to 6 dp for the cross-engine cut.
    */
  def gopherQuality(text: Column): Seq[(String, Column)] = {
    val w = filter(split(text, " ", -1), t => length(t) > lit(0))
    val n = size(w)
    val meanWl = when(n > 0,
      round(aggregate(transform(w, length(_).cast("double")), lit(0.0), _ + _)
        / n.cast("double"), 6)).otherwise(lit(0.0))
    val alphaFrac = when(n > 0,
      round(size(filter(w, t => t.rlike("[A-Za-z]"))).cast("double")
        / n.cast("double"), 6)).otherwise(lit(0.0))
    val stopLit = typedLit(gopherStopwords)
    val stopHits = size(filter(w, t => array_contains(stopLit, t))).cast("long")
    val pass = n.geq(50) && n.leq(100000) &&
      meanWl.geq(3.0) && meanWl.leq(10.0) &&
      alphaFrac.geq(0.8) && stopHits.geq(2L)
    Seq(
      "n_words" -> n.cast("long"),
      "mean_word_len" -> meanWl,
      "alpha_frac" -> alphaFrac,
      "stop_hits" -> stopHits,
      "gopher_pass" -> pass)
  }

  /** Line terminal punctuation accepted by the C4 line filter (Raffel et
    * al. 2020 §2.2: period, exclamation mark, question mark, end quote).
    */
  val c4Terminal: Seq[String] = Seq(".", "!", "?", "\"")

  /** Illustrative subset of the C4 blocklist ("List of Dirty, Naughty,
    * Obscene..." in the paper). Tiny by design — the rule mechanism is the
    * operator; production swaps in the full list.
    */
  val c4BadWords: Seq[String] = Seq("casino", "viagra", "xxx")

  /** C4 cleaning (Raffel et al. 2020, §2.2) over `\n`-separated lines:
    * keep only lines with ≥ 5 words ending in terminal punctuation; drop
    * the whole page when the kept text has < 3 sentences, or the RAW page
    * mentions "lorem ipsum", contains `{`, or hits the word blocklist.
    * Returns the cleaned text plus the per-rule diagnostics and the final
    * verdict from ONE map-side pass — no shuffle, all codegen'd HOFs, so at
    * 100 TB this is a pure scan the optimizer can pipeline into whatever
    * follows. (The paper's remaining rule — corpus-level three-sentence-span
    * dedup — is a corpus operator, not a page function: see the d-family
    * and `TrainingPipeline.decontaminateSpans` for span-level machinery.)
    */
  def c4Clean(text: Column): Seq[(String, Column)] = {
    val lines = split(text, "\n", -1)
    val kept = filter(lines, l => {
      val wc = size(filter(split(l, " ", -1), t => length(t) > lit(0)))
      wc.geq(5) && substring(l, -1, 1).isin(c4Terminal: _*)
    })
    val clean = array_join(kept, "\n")
    // sentence count = terminal-punct chars in the KEPT text (regex strip —
    // byte-identical semantics to the oracle's regexp_replace)
    val nSent = length(regexp_replace(clean, "[^.!?]", "")).cast("long")
    val badPat = "\\b(" + c4BadWords.mkString("|") + ")\\b"
    val keep = nSent.geq(3L) &&
      !contains(lower(text), lit("lorem ipsum")) &&
      !contains(text, lit("{")) &&
      !lower(text).rlike(badPat)
    Seq(
      "clean" -> clean,
      "n_lines_kept" -> size(kept).cast("long"),
      "n_sentences" -> nSent,
      "c4_keep" -> keep)
  }
}
