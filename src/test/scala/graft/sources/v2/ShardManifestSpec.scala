package graft.sources.v2

import org.scalatest.funsuite.AnyFunSuite

/** The manifest format itself: round-trip identity and strict parsing
  * (this package so the test reaches the `private[v2]` helper without
  * widening production visibility). */
class ShardManifestSpec extends AnyFunSuite {

  test("serialize/parse round-trips, including the empty manifest") {
    val where = new org.apache.hadoop.fs.Path("/t/_MANIFEST")
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 20) {
      val entries = (0 until rnd.nextInt(6)).map(i =>
        (s"part-$i-${java.util.UUID.randomUUID()}.jsonl", rnd.nextInt(1000).toLong))
      assert(ShardManifest.parse(ShardManifest.serialize(entries), where) == entries)
    }
  }

  test("strict on malformed input: no tab, bad count, empty name") {
    val where = new org.apache.hadoop.fs.Path("/t/_MANIFEST")
    intercept[IllegalArgumentException] {
      ShardManifest.parse("name-without-tab", where)
    }
    intercept[IllegalArgumentException] {
      ShardManifest.parse("name\tnot-a-number", where)
    }
    intercept[IllegalArgumentException] {
      ShardManifest.parse("\t5", where)
    }
  }
}
