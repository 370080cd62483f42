package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Porter2Stemmer, PorterStemmer}

/** Stemmer conformance against PUBLISHED vectors: the Porter examples are
  * the step-by-step words from the 1980 paper ("An algorithm for suffix
  * stripping"); the porter2 vectors are the exceptional forms and step
  * examples from the Snowball english-stemmer definition. No network, no
  * binary extension — these are the same public-domain definitions
  * DuckDB's fts stemmer implements.
  */
class StemmersSpec extends AnyFunSuite {

  private def check(stem: String => String, pairs: (String, String)*): Unit =
    pairs.foreach { case (in, want) =>
      assert(stem(in) == want, s"$in: got ${stem(in)}, want $want")
    }

  test("porter: step 1 examples from the paper") {
    check(PorterStemmer.stem _,
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky")
  }

  test("porter: step 2-4 examples from the paper") {
    check(PorterStemmer.stem _,
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc",
      "hesitanci" -> "hesit", "digitizer" -> "digit",
      "radicalli" -> "radic", "differentli" -> "differ",
      "vileli" -> "vile", "analogousli" -> "analog",
      "vietnamization" -> "vietnam", "predication" -> "predic",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "callousness" -> "callous", "formaliti" -> "formal",
      "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
      "defensible" -> "defens", "irritant" -> "irrit",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt",
      "communism" -> "commun", "activate" -> "activ",
      "angulariti" -> "angular", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler")
  }

  test("porter: step 5 examples and whole words") {
    check(PorterStemmer.stem _,
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll",
      // whole-pipeline words
      "generalizations" -> "gener", "oscillators" -> "oscil",
      "running" -> "run", "consistency" -> "consist",
      "knives" -> "knive", "stemming" -> "stem")
  }

  test("porter2: exceptional forms from the definition") {
    check(Porter2Stemmer.stem _,
      "skis" -> "ski", "skies" -> "sky", "dying" -> "die",
      "lying" -> "lie", "tying" -> "tie", "idly" -> "idl",
      "gently" -> "gentl", "ugly" -> "ugli", "early" -> "earli",
      "only" -> "onli", "singly" -> "singl",
      "sky" -> "sky", "news" -> "news", "howe" -> "howe",
      "atlas" -> "atlas", "cosmos" -> "cosmos", "bias" -> "bias",
      "andes" -> "andes",
      // post-1a invariants
      "inning" -> "inning", "outing" -> "outing", "canning" -> "canning",
      "herring" -> "herring", "earring" -> "earring",
      "proceed" -> "proceed", "exceed" -> "exceed", "succeed" -> "succeed")
  }

  test("porter2: step examples from the definition") {
    check(Porter2Stemmer.stem _,
      // step 1a examples
      "ties" -> "tie", "cries" -> "cri", "gas" -> "gas", "this" -> "this",
      "gaps" -> "gap", "kiwis" -> "kiwi",
      // 1b: luxuriated -> luxuriate (at+e), hopping double-undo, hoped short
      "luxuriated" -> "luxuri", "hopping" -> "hop", "hoped" -> "hope",
      // 1c
      "cry" -> "cri", "by" -> "by", "say" -> "say",
      // R1 prefix exceptions: generous/generate keep 'gener' intact
      "generate" -> "generat", "generous" -> "generous",
      "communism" -> "communism", "arsenal" -> "arsenal",
      // common whole words
      "running" -> "run", "consistency" -> "consist",
      "national" -> "nation", "rational" -> "ration",
      "relational" -> "relat", "conditional" -> "condit",
      "beautiful" -> "beauti", "happiness" -> "happi",
      "stemming" -> "stem", "stemmer" -> "stemmer",
      "argument" -> "argument", "arguments" -> "argument")
  }

  test("porter2: y-marking keeps vowel-y words stable") {
    check(Porter2Stemmer.stem _,
      "boy" -> "boy", "boys" -> "boy", "enjoy" -> "enjoy",
      "enjoying" -> "enjoy", "saying" -> "say", "crying" -> "cri")
  }
}
