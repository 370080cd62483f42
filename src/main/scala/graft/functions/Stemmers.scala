package graft.functions

/** Public-domain stemming algorithms, implemented from their published
  * definitions (no code copied):
  *
  *  - [[PorterStemmer]] — M.F. Porter, "An algorithm for suffix stripping"
  *    (Program 14(3), 1980), in the canonical revised form maintained by
  *    the author (the `bli`→`ble` and `logi`→`log` step-2 updates). This
  *    is DuckDB's fts DEFAULT stemmer (`stemmer := 'porter'`).
  *  - [[Porter2Stemmer]] — the Snowball "english" stemmer, implemented
  *    from the published algorithm description (exceptional forms, R1/R2
  *    regions, steps 0–5).
  *
  * Both operate on lower-case words; the FTS tokenizer lower-cases before
  * stemming (DuckDB's `lower := 1` default). Words of length ≤ 2 return
  * unchanged (both definitions).
  */
object PorterStemmer {

  /** True when b(i) is a consonant (y after a consonant is a vowel). */
  private def cons(b: Array[Char], i: Int): Boolean = b(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => if (i == 0) true else !cons(b, i - 1)
    case _ => true
  }

  /** m: number of VC sequences in b[0..j]. */
  private def measure(b: Array[Char], j: Int): Int = {
    var n = 0
    var i = 0
    // skip initial consonants
    while (i <= j && cons(b, i)) i += 1
    while (i <= j) {
      // in a vowel run
      while (i <= j && !cons(b, i)) i += 1
      if (i <= j) {
        n += 1
        while (i <= j && cons(b, i)) i += 1
      }
    }
    n
  }

  private def vowelInStem(b: Array[Char], j: Int): Boolean =
    (0 to j).exists(i => !cons(b, i))

  private def doubleC(b: Array[Char], j: Int): Boolean =
    j >= 1 && b(j) == b(j - 1) && cons(b, j)

  /** cvc at end, where the final c is not w, x or y. */
  private def cvc(b: Array[Char], j: Int): Boolean =
    j >= 2 && cons(b, j) && !cons(b, j - 1) && cons(b, j - 2) &&
      b(j) != 'w' && b(j) != 'x' && b(j) != 'y'

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var b = word.toCharArray
    var k = b.length - 1 // index of last char of current word

    def endsWith(s: String): Boolean = {
      val l = s.length
      k + 1 >= l && (0 until l).forall(i => b(k - l + 1 + i) == s.charAt(i))
    }
    def stemM(s: String): Int = measure(b, k - s.length) // m of stem before suffix
    def setTo(suffLen: Int, repl: String): Unit = {
      val keep = k + 1 - suffLen
      val nb = new Array[Char](keep + repl.length)
      System.arraycopy(b, 0, nb, 0, keep)
      repl.getChars(0, repl.length, nb, keep)
      b = nb
      k = b.length - 1
    }

    // ---- step 1a
    if (endsWith("sses")) setTo(4, "ss")
    else if (endsWith("ies")) setTo(3, "i")
    else if (endsWith("ss")) ()
    else if (endsWith("s")) setTo(1, "")

    // ---- step 1b
    var extra = false
    if (endsWith("eed")) {
      if (stemM("eed") > 0) setTo(3, "ee")
    } else if (endsWith("ed") && vowelInStem(b, k - 2)) {
      setTo(2, ""); extra = true
    } else if (endsWith("ing") && vowelInStem(b, k - 3)) {
      setTo(3, ""); extra = true
    }
    if (extra) {
      if (endsWith("at")) setTo(2, "ate")
      else if (endsWith("bl")) setTo(2, "ble")
      else if (endsWith("iz")) setTo(2, "ize")
      else if (doubleC(b, k) && b(k) != 'l' && b(k) != 's' && b(k) != 'z')
        setTo(1, "")
      else if (measure(b, k) == 1 && cvc(b, k)) setTo(0, "e")
    }

    // ---- step 1c
    if (endsWith("y") && vowelInStem(b, k - 1)) b(k) = 'i'

    // ---- step 2 (m > 0)
    val step2: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
      "anci" -> "ance", "izer" -> "ize", "bli" -> "ble", "alli" -> "al",
      "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
      "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
      "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
      "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble", "logi" -> "log")
    step2.find { case (s, _) => endsWith(s) }.foreach { case (s, r) =>
      if (stemM(s) > 0) setTo(s.length, r)
    }

    // ---- step 3 (m > 0)
    val step3: Seq[(String, String)] = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find { case (s, _) => endsWith(s) }.foreach { case (s, r) =>
      if (stemM(s) > 0) setTo(s.length, r)
    }

    // ---- step 4 (m > 1)
    val step4: Seq[String] = Seq(
      "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.find(endsWith).foreach { s =>
      val ok = stemM(s) > 1 &&
        (s != "ion" || { val p = k - 3; p >= 0 && (b(p) == 's' || b(p) == 't') })
      if (ok) setTo(s.length, "")
    }

    // ---- step 5a
    if (endsWith("e")) {
      val m = stemM("e")
      if (m > 1 || (m == 1 && !cvc(b, k - 1))) setTo(1, "")
    }
    // ---- step 5b
    if (b(k) == 'l' && doubleC(b, k) && measure(b, k) > 1) setTo(1, "")

    new String(b)
  }
}

/** Snowball "english" (porter2), from the published algorithm definition. */
object Porter2Stemmer {

  private val exceptional: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // invariant forms
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exceptional1a: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  // 'Y' marks a consonant-y; lowercase y counts as vowel after marking
  private def isV(c: Char): Boolean = isVowel(c) && c != 'Y'

  private def markYs(w: String): String = {
    val b = w.toCharArray
    var i = 0
    while (i < b.length) {
      if (b(i) == 'y' && (i == 0 || isV(b(i - 1)))) b(i) = 'Y'
      i += 1
    }
    new String(b)
  }

  /** R1 start index (length of word when null). */
  private def r1Of(w: String): Int = {
    for (p <- Seq("gener", "commun", "arsen"))
      if (w.startsWith(p)) return p.length
    var i = 0
    while (i < w.length && !isV(w.charAt(i))) i += 1 // leading consonants
    while (i < w.length && isV(w.charAt(i))) i += 1  // vowel run
    if (i < w.length) i + 1 else w.length
  }

  private def regionFrom(w: String, start: Int): Int = {
    var i = start
    while (i < w.length && !isV(w.charAt(i))) i += 1
    while (i < w.length && isV(w.charAt(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** Short syllable ending at position `end-1` of w. */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n >= 2 && isV(w.charAt(0)) && !isV(w.charAt(1)) && n == 2) return true
    if (n >= 3) {
      val c = w.charAt(n - 1); val v = w.charAt(n - 2); val p = w.charAt(n - 3)
      if (!isV(c) && c != 'w' && c != 'x' && c != 'Y' && isV(v) && !isV(p))
        return true
    }
    false
  }

  private val doubles =
    Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

  private val liEnding = Set('c', 'd', 'e', 'g', 'h', 'k', 'm', 'n', 'r', 't')

  def stem(word0: String): String = {
    var w = word0
    if (w.length <= 2) return w
    if (w.startsWith("'")) w = w.substring(1)
    if (exceptional.contains(w)) return exceptional(w)
    if (w.length <= 2) return w
    w = markYs(w)
    // R1/R2 are INDEX positions fixed at the start (suffix edits only ever
    // truncate-and-append, so the region starts stay valid)
    val r1 = r1Of(w)
    val r2 = regionFrom(w, r1)
    def inR1(suffLen: Int): Boolean = w.length - suffLen >= r1
    def inR2(suffLen: Int): Boolean = w.length - suffLen >= r2
    def hasVowelBefore(suffLen: Int): Boolean =
      (0 until (w.length - suffLen)).exists(i => isV(w.charAt(i)))

    // step 0: remove the longest of ', 's, 's' (one removal only)
    Seq("'s'", "'s", "'").find(w.endsWith)
      .foreach(s => w = w.dropRight(s.length))

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length - 3 > 1) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s") &&
        (0 until w.length - 2).exists(i => isV(w.charAt(i))))
      w = w.dropRight(1)

    if (exceptional1a.contains(w)) return w.replace('Y', 'y')

    // step 1b
    val eedly = Seq("eedly", "eed").find(w.endsWith)
    eedly match {
      case Some(s) =>
        if (inR1(s.length)) w = w.dropRight(s.length) + "ee"
      case None =>
        val s2 = Seq("ingly", "edly", "ing", "ed").find(w.endsWith)
        s2.foreach { s =>
          if (hasVowelBefore(s.length)) {
            w = w.dropRight(s.length)
            if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
            else if (doubles.exists(w.endsWith)) w = w.dropRight(1)
            else if (r1 >= w.length && endsShortSyllable(w)) w += "e"
          }
        }
    }

    // step 1c: y/Y → i after a non-vowel that is not the first letter
    if ((w.endsWith("y") || w.endsWith("Y")) && w.length > 2 &&
        !isV(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // step 2 (longest suffix, in R1)
    val step2: Seq[(String, String)] = Seq(
      "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
      "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
      "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
      "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
      "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
      "bli" -> "ble", "ogi" -> "og", "li" -> "")
    step2.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
      if (inR1(s.length)) {
        if (s == "ogi") {
          if (w.length > 3 && w.charAt(w.length - 4) == 'l')
            w = w.dropRight(s.length) + r
        } else if (s == "li") {
          if (w.length > 2 && liEnding.contains(w.charAt(w.length - 3)))
            w = w.dropRight(2)
        } else w = w.dropRight(s.length) + r
      }
    }

    // step 3 (longest suffix, in R1; ative needs R2)
    val step3: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
      "ness" -> "", "ful" -> "")
    step3.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
      if (inR1(s.length)) {
        if (s == "ative") { if (inR2(s.length)) w = w.dropRight(s.length) }
        else w = w.dropRight(s.length) + r
      }
    }

    // step 4 (longest suffix, in R2)
    val step4: Seq[String] = Seq(
      "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
      "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")
    step4.find(w.endsWith).foreach { s =>
      if (inR2(s.length)) {
        if (s == "ion") {
          if (w.length > 3 &&
              (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
            w = w.dropRight(3)
        } else w = w.dropRight(s.length)
      }
    }

    // step 5
    if (w.endsWith("e") &&
        (inR2(1) || (inR1(1) && !endsShortSyllable(w.dropRight(1)))))
      w = w.dropRight(1)
    else if (w.endsWith("l") && inR2(1) && w.length > 1 &&
        w.charAt(w.length - 2) == 'l')
      w = w.dropRight(1)

    w.replace('Y', 'y')
  }
}
