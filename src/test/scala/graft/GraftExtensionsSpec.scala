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
}
