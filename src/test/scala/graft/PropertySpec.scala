package graft

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Property-based guards for the pure (driver-side) invariants the
  * engine's correctness arguments lean on — the cases a hand-picked
  * fixture can miss. No SparkSession needed: these laws are about the
  * arithmetic itself. Raw ScalaCheck (no scalatest-plus bridge in the
  * offline cache): each test checks a Prop and fails with the shrunk
  * counterexample.
  */
class PropertySpec extends AnyFunSuite {

  private def check(label: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  // ---- stratified-sampling bucket arithmetic ------------------------------
  // sampleByStrata/q_hash_sample compute the Knuth bucket as
  // ((id mod 1000)·761) pmod 1000. The law that makes the overflow fix
  // safe: it equals exact BigInt (id·2654435761) mod 1000 for EVERY
  // long — including ids ≥ ~3.47e9 where the naive multiply overflows,
  // and negative ids where signed % flips sign.
  private def modBucket(id: Long): Long = {
    val m = ((id % 1000) + 1000) % 1000
    (m * 761) % 1000
  }

  test("mod-1000 Knuth bucket equals exact BigInt arithmetic for every long") {
    check("bucket", Prop.forAll { (id: Long) =>
      modBucket(id) == (BigInt(id) * BigInt(2654435761L)).mod(BigInt(1000)).toLong
    })
    // the overflow frontier explicitly
    for (id <- Seq(Long.MaxValue, Long.MinValue, 3470000000L, -3470000000L))
      assert(modBucket(id) ==
        (BigInt(id) * BigInt(2654435761L)).mod(BigInt(1000)).toLong)
  }

  // ---- sort-key comparison (teraValidate/teraSummary) ---------------------
  // keyCompare must be a total order consistent with Spark's UTF8String
  // (= UTF-8 byte) order for strings — Java's UTF-16 compareTo disagrees
  // exactly on supplementary-plane characters, so the generator mixes
  // them in.
  private val unicodeString: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.choose(' ', 'ힿ').map(_.toString),
    1 -> Gen.choose(0x10000, 0x1FFFF).map(Character.toChars(_).mkString)
  )).map(_.mkString)

  private def utf8Order(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  test("keyCompare on strings is exactly UTF-8 byte order (total, antisymmetric)") {
    check("utf8", Prop.forAll(unicodeString, unicodeString) { (a, b) =>
      val c = Relational.keyCompare(a, b)
      Integer.signum(c) == Integer.signum(utf8Order(a, b)) &&
        Integer.signum(Relational.keyCompare(b, a)) == -Integer.signum(c) &&
        Relational.keyCompare(a, a) == 0
    })
  }

  test("keyCompare sorts mixed longs and nulls into a consistent total order") {
    val key: Gen[Any] = Gen.oneOf(
      Gen.const(null: Any),
      Arbitrary.arbitrary[Long].map(l => l: Any))
    check("order", Prop.forAll(Gen.listOfN(6, key)) { ks =>
      val sorted = ks.sortWith(Relational.keyCompare(_, _) < 0)
      sorted.sliding(2).forall {
        case Seq(x, y) => Relational.keyCompare(x, y) <= 0
        case _         => true
      }
    })
  }
}
