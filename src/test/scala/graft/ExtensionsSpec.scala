package graft

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_* SQL functions registered via SparkSessionExtensions") {
    Seq((Array(1.0f, 0.0f), Array(0.0f, 2.0f)), (Array(3.0f, 4.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val got = spark.sql(
      """SELECT round(graft_dot(a, b), 6) AS d,
        |       round(graft_l2norm(a), 6) AS n,
        |       round(graft_cosine(a, b), 6) AS c
        |  FROM vecs""".stripMargin)
      .as[(Double, Double, Double)].collect().toSeq
    assert(got == Seq((0.0, 1.0, 0.0), (25.0, 5.0, 1.0)))
  }

  test("graft_md5prefix64 equals the builtin chain from pure SQL") {
    Seq("hello", "", "spark graft").toDF("s").createOrReplaceTempView("strs")
    val got = spark.sql(
      """SELECT graft_md5prefix64(s) AS fused,
        |       CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) AS chain
        |  FROM strs""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    assert(got.forall { case (f, c) => f == c && f >= 0 })
  }

  test("graft_cosine returns null on a zero-norm vector") {
    Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .createOrReplaceTempView("zvec")
    val got = spark.sql("SELECT graft_cosine(a, b) FROM zvec")
      .as[Option[Double]].collect().toSeq
    assert(got == Seq(None))
  }
}
