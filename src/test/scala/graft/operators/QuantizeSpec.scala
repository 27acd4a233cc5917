package graft.operators

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("scalarQuantize: codes span [0,255], extremes map to the ends") {
    val df = Seq(
      (1L, Seq(0.0f, 10.0f)),
      (2L, Seq(5.0f, 20.0f)),
      (3L, Seq(10.0f, 30.0f))
    ).toDF("vec_id", "embedding")
    val out = Quantize.scalarQuantize(df, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // dim 0: range [0,10] → 0 → 0, 5 → 127, 10 → 255 (clamped)
    assert(out((1L, 0L)) == 0L)
    assert(out((2L, 0L)) == 127L)
    assert(out((3L, 0L)) == 255L)
    // dim 1: range [10,30] → ends map to 0 / 255
    assert(out((1L, 1L)) == 0L && out((3L, 1L)) == 255L)
    assert(out.values.forall(q => q >= 0L && q <= 255L))
  }

  test("scalarQuantize: constant dimension quantizes to 0, not NaN") {
    val df = Seq((1L, Seq(7.0f, 1.0f)), (2L, Seq(7.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = Quantize.scalarQuantize(df, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 0L)) == 0L && out((2L, 0L)) == 0L)
    assert(out((1L, 1L)) == 0L && out((2L, 1L)) == 255L)
  }

  test("quantization preserves per-dimension order") {
    val df = (1L to 30L).map(i => (i, Seq(i * 0.37f, 100.0f - i)))
      .toDF("vec_id", "embedding")
    val out = Quantize.scalarQuantize(df, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect()
    val dim0 = out.filter(_._2 == 0L).sortBy(_._1).map(_._3)
    assert(dim0.zip(dim0.tail).forall { case (a, b) => a <= b },
      "monotone input must stay monotone after quantization")
  }
}
