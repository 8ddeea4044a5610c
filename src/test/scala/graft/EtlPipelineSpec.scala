package graft

import graft.sources.odata.testkit.ODataStubServer

class EtlPipelineSpec extends SparkSpec {

  test("full pipeline: odata stub → connector → transforms → duplicate-name CSV") {
    // both structure candidates present in the data; the probe picks
    // C0CHAR (COCHAR 404s), and the rename maps BOTH to "Structure"
    val rows = (0 until 6).map { i =>
      Map(
        "TEMPLOYEE_UUID" -> s"Emp ${i / 2}", // dups after projection
        "CEMPLOYEE_UUID" -> (i / 2).toString,
        "C0CHAR_STRUCTURE" -> s"S${i % 2}")
    }
    val srv = new ODataStubServer(rows, "C0CHAR_STRUCTURE").start()
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString + "/csv"
    try {
      EtlPipeline.run(spark, EtlPipeline.Config(
        baseUrl = srv.url, servicePath = "svc", entity = "Employees",
        selectFields = Seq("TEMPLOYEE_UUID", "CEMPLOYEE_UUID"),
        structureCandidates = Seq("COCHAR_STRUCTURE", "C0CHAR_STRUCTURE"),
        renameMap = Map(
          "TEMPLOYEE_UUID" -> "Employee", "CEMPLOYEE_UUID" -> "EmployeeID",
          "C0CHAR_STRUCTURE" -> "Structure"),
        expectedOrder = Seq("Employee", "EmployeeID", "Structure"),
        outputPath = out))
      val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
      assert(files.length == 1)
      val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
      assert(lines.head == "Employee,EmployeeID,Structure")
      // 3 distinct employees × 2 structures = 6 distinct rows
      assert(lines.size == 7)
    } finally srv.stop()
  }

  test("emptyGuard warns and passes through an empty frame (R10)") {
    import spark.implicits._
    var warned: Seq[String] = Nil
    val empty = Seq.empty[(Int, String)].toDF("a", "b")
    val out = graft.operators.Etl.emptyGuard(empty, m => warned :+= m)
    assert(out.count() == 0 && warned.nonEmpty)
    warned = Nil
    graft.operators.Etl.emptyGuard(Seq((1, "x")).toDF("a", "b"), m => warned :+= m)
    assert(warned.isEmpty)
  }
}
