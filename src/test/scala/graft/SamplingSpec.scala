package graft

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = (1 to 200).map { i =>
    (i.toLong, if (i % 2 == 0) "g1" else "g2",
     if (i == 10) 1e6 else 1e-3)
  }.toDF("id", "g", "w")

  test("weighted reservoir: k rows per group, ranks 1..k") {
    val out = Sampling.weightedReservoirPerGroup(fixture, "g", "id", "w", 5)
      .select("g", "rk").as[(String, Long)].collect()
    val byGroup = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byGroup == Map("g1" -> Seq(1L, 2L, 3L, 4L, 5L),
                          "g2" -> Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("weight dominates: a 10^9-times-heavier row always ranks first") {
    val out = Sampling.weightedReservoirPerGroup(fixture, "g", "id", "w", 5)
      .where($"g" === "g1").orderBy("rk")
      .select("id").as[Long].collect()
    assert(out.head == 10L, s"heavy row must win its group, got ${out.toSeq}")
  }

  test("deterministic: identical kept set across runs") {
    def run() = Sampling.weightedReservoirPerGroup(fixture, "g", "id", "w", 5)
      .select("id", "rk").as[(Long, Long)].collect().toSet
    assert(run() == run())
  }

  test("non-positive weights are excluded") {
    val df = Seq((1L, "g", 1.0), (2L, "g", 0.0), (3L, "g", -2.0))
      .toDF("id", "g", "w")
    val kept = Sampling.weightedReservoirPerGroup(df, "g", "id", "w", 10)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }
}
