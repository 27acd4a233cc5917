package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RpSpec extends SparkSpec {
  import spark.implicits._

  test("sign matrix is deterministic, ±1/√k, and seed-sensitive") {
    val m1 = Rp.signMatrix(8, 16, seed = 42L)
    val m2 = Rp.signMatrix(8, 16, seed = 42L)
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    val inv = 1.0 / math.sqrt(8.0)
    assert(m1.flatten.forall(v => v == inv || v == -inv))
    val m3 = Rp.signMatrix(8, 16, seed = 43L)
    assert(m1.map(_.toSeq).toSeq != m3.map(_.toSeq).toSeq)
    // signs should be balanced-ish, not constant (a broken hash would
    // collapse the matrix to one sign and still pass ±1/√k)
    val pos = m1.flatten.count(_ > 0)
    assert(pos > 32 && pos < 96, s"suspicious sign balance: $pos/128")
  }

  test("projection equals the hand-computed matrix product") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "v")
    val out = Rp.project(df, "v", k = 2, seed = 7L)
      .select(col("rp")).head().getSeq[Double](0)
    val m = Rp.signMatrix(2, 4, seed = 7L)
    val x = Array(1.0, 2.0, 3.0, 4.0)
    val want = m.map(row => row.zip(x).map(p => p._1 * p._2).sum)
    assert(out.length == 2)
    out.zip(want).foreach { case (got, w) => assert(math.abs(got - w) < 1e-12) }
  }

  test("caller-supplied-d overload is bit-identical to the probing overload") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir).limit(20)
    val probed = Rp.project(emb, "embedding", k = 8)
      .select(col("vec_id"), col("rp")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val given = Rp.project(emb, "embedding", k = 8, d = 64, seed = 42L,
      outCol = "rp")
      .select(col("vec_id"), col("rp")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(probed == given) // exact equality — same plan literal, same kernel
  }

  test("linearity: projection of a difference is the difference of projections") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir).limit(50)
    val proj = Rp.project(emb, "embedding", k = 16)
    val rows = proj.select(col("vec_id"), col("embedding"), col("rp"))
      .collect()
    val m = Rp.signMatrix(16, rows.head.getSeq[Float](1).length)
    rows.take(5).foreach { r =>
      val x = r.getSeq[Float](1).map(_.toDouble).toArray
      val got = r.getSeq[Double](2)
      val want = m.map(row => row.zip(x).map(p => p._1 * p._2).sum)
      got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
    }
  }
}
