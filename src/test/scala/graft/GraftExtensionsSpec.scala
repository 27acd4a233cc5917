package graft

class GraftExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from pure SQL") {
    // shared test session already exists → use the running-session hook
    // (the builder-time path `withExtensions(new GraftExtensions)` routes
    // through the same registry entries)
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  gunzip_string(gzip_string('hello graft')) AS roundtrip,
        |  cosine_similarity(array(cast(1.0 as float), cast(0.0 as float)),
        |                    array(cast(1.0 as float), cast(0.0 as float))) AS cos_self,
        |  doc_fingerprint('Hello  World') = doc_fingerprint('hello world') AS fp_folds,
        |  size(minhash_text('one two three four five', 3, 64, 42)) AS lanes,
        |  simhash_text('same text') = simhash_text('same text') AS sh_stable,
        |  sorted_intersect_size(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS inter
        |""".stripMargin).collect()(0)
    assert(r.getString(0) == "hello graft")
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
    assert(r.getBoolean(2))
    assert(r.getInt(3) == 64)
    assert(r.getBoolean(4))
    assert(r.getInt(5) == 2)
  }

  test("vector kernels accept SQL double-literal arrays (analyzer casts to float)") {
    GraftExtensions.register(spark)
    // array(1.0D, ...) is array<double> — before the declared input types,
    // the float kernel read 4-byte lanes out of 8-byte slots and returned
    // garbage silently; now the analyzer inserts the array<float> cast
    val r = spark.sql(
      """SELECT
        |  cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos_self,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  l2_distance(array(0.0D, 3.0D), array(4.0D, 0.0D)) AS l2,
        |  lane_match_count(array(1, 2, 5), array(1, 3, 5)) AS lanes
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 11.0) < 1e-6)
    assert(math.abs(r.getDouble(2) - 5.0) < 1e-6)
    assert(r.getInt(3) == 2)
  }

  test("model kernels (argmin_l2 family) are callable from pure SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  argmin_l2(array(1.0D, 0.0D), array(array(0.0D, 0.0D), array(1.0D, 0.1D))) AS cell,
        |  argmax_dot(array(1.0D, 0.0D), array(array(0.0D, 1.0D), array(3.0D, 0.0D))) AS ip_cell,
        |  min_l2(array(1.0D, 0.0D), array(array(1.0D, 0.0D), array(9.0D, 9.0D))) AS dmin,
        |  hyperplane_bucket(array(1.0D, 2.0D), array(array(1.0D, 0.0D), array(0.0D, -1.0D))) AS bucket,
        |  centroid_residual(array(3.0D, 4.0D), array(array(1.0D, 1.0D)), 0) AS res,
        |  gunzip_string(gzip_string('ok'), 1048576) AS bounded_rt
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) == 1)
    assert(r.getInt(1) == 1)
    assert(r.getDouble(2) == 0.0)
    assert(r.getLong(3) == 1L)
    assert(r.getSeq[Float](4) == Seq(2f, 3f))
    assert(r.getString(5) == "ok")
  }
}
