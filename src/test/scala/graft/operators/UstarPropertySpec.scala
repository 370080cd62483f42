package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the ustar codec: arbitrary member sets round
  * trip bit-exactly (names, order, payload bytes — including empty and
  * block-boundary sizes), and any single corrupted header byte is rejected
  * by the checksum.
  */
class UstarPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val memberName: Gen[String] =
    for {
      n <- Gen.chooseNum(1, 60)
      cs <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar, 1 -> Gen.const('.'), 1 -> Gen.const('_')))
    } yield cs.mkString

  private val payload: Gen[Array[Byte]] = Gen.frequency(
    1 -> Gen.const(Array.empty[Byte]),
    1 -> Gen.const(new Array[Byte](512)),    // exactly one block
    1 -> Gen.const(new Array[Byte](511)),    // one under
    1 -> Gen.const(new Array[Byte](513)),    // one over
    6 -> Gen.chooseNum(0, 2000).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)))

  private val members: Gen[List[(String, Array[Byte])]] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, Gen.zip(memberName, payload)))

  test("write∘parse is the identity on member lists") {
    check("roundtrip", Prop.forAll(members) { ms =>
      val back = Ustar.parse(Ustar.write(ms))
      back.map(_._1) == ms.map(_._1) &&
        back.zip(ms).forall { case ((_, g), (_, w)) => java.util.Arrays.equals(g, w) }
    })
  }

  test("any corrupted header byte is rejected") {
    val withHeaderFlip = for {
      ms <- members.suchThat(_.nonEmpty)
      off <- Gen.chooseNum(0, 99) // a name byte of the first header
    } yield (ms, off)
    check("corruption", Prop.forAll(withHeaderFlip) { case (ms, off) =>
      val tar = Ustar.write(ms)
      tar(off) = (tar(off) ^ 0x55).toByte
      Prop.throws(classOf[IllegalArgumentException])(Ustar.parse(tar))
    })
  }
}
