package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the text-hash kernels — pure JVM, no Spark session.
  * (Raw scalacheck generators sampled with fixed seeds, same pattern as
  * GzipSpec — scalatestplus is not on the classpath.) */
class TextHashPropertySpec extends AnyFunSuite {

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(" ", "\t", "\n", "!", "?", ",", "世"))).map(_.mkString(" "))

  private def samples(n: Int): Seq[String] =
    (0 until n).map(i => textGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("fingerprint is invariant under case and whitespace-run changes (property)") {
    samples(200).foreach { s =>
      val a = TextHash.fingerprint(UTF8String.fromString(s))
      val b = TextHash.fingerprint(UTF8String.fromString(
        "  " + s.toUpperCase.replace(" ", "   ") + "\t"))
      assert(a == b, s"fingerprint not invariant for: $s")
    }
  }

  test("minhashText is deterministic with exactly k lanes (property)") {
    samples(100).zipWithIndex.foreach { case (s, i) =>
      val k = 1 + (i % 128)
      val u = UTF8String.fromString(s)
      val sig1 = TextHash.minhashText(u, 3, k, 42L)
      val sig2 = TextHash.minhashText(u, 3, k, 42L)
      assert(sig1.numElements() == k)
      assert((0 until k).forall(j => sig1.getLong(j) == sig2.getLong(j)))
    }
  }

  test("identical texts agree on all minhash lanes; disjoint texts on few") {
    val a = TextHash.minhashText(UTF8String.fromString(
      "alpha beta gamma delta epsilon zeta"), 3, 64, 42L)
    val b = TextHash.minhashText(UTF8String.fromString(
      "alpha beta gamma delta epsilon zeta"), 3, 64, 42L)
    val c = TextHash.minhashText(UTF8String.fromString(
      "one two three four five six seven"), 3, 64, 42L)
    val agreeAB = (0 until 64).count(i => a.getLong(i) == b.getLong(i))
    val agreeAC = (0 until 64).count(i => a.getLong(i) == c.getLong(i))
    assert(agreeAB == 64)
    assert(agreeAC <= 8) // jaccard 0 ⇒ expected lane agreement ~0
  }

  test("shingleHashSet is sorted+distinct; merge-walk intersect == set intersect (property)") {
    val texts = samples(100)
    texts.zip(texts.reverse).foreach { case (s1, s2) =>
      val a = TextHash.shingleHashSet(UTF8String.fromString(s1), 3)
      val b = TextHash.shingleHashSet(UTF8String.fromString(s2), 3)
      def toSeq(x: org.apache.spark.sql.catalyst.util.ArrayData) =
        (0 until x.numElements()).map(x.getLong)
      val (sa, sb) = (toSeq(a), toSeq(b))
      assert(sa == sa.sorted && sa.distinct == sa)
      assert(TextHash.sortedIntersectSize(a, b) == sa.toSet.intersect(sb.toSet).size)
    }
  }

  test("simhashText of near-identical token multisets differs in few bits") {
    val a = TextHash.simhashText(UTF8String.fromString(
      "spark catalyst tungsten codegen shuffle partition broadcast join"))
    val b = TextHash.simhashText(UTF8String.fromString(
      "spark catalyst tungsten codegen shuffle partition broadcast merge"))
    assert(TextHash.hamming64(a, a) == 0)
    assert(TextHash.hamming64(a, b) <= 24) // one word of eight changed
  }
}
