package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{ConsumeJob, ConsumeParams, ConsumePipeline, IterationSpec}
import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("composed pipeline produces rows with expected shape") {
    val out = ConsumePipeline.build(spark, sf)
    val cols = out.columns.toSeq
    assert(cols.contains("price_src") && cols.contains("iteration") &&
      cols.contains("partition_month"))
    val n = out.count()
    assert(n > 0)
    // both iterations contribute, price_src carries both labels
    val labels = out.select("price_src").distinct().collect().map(_.getString(0)).toSet
    assert(labels == Set("current", "previous"))
  }

  test("iterations partition users disjointly (union has no cross-dup)") {
    val out = ConsumePipeline.build(spark, sf)
    val perUser = out.groupBy("user_id").agg(countDistinct("iteration").as("n"))
    assert(perUser.filter(col("n") > 1).count() == 0)
  }

  test("ConsumeJob writes json/csv per iteration and final partitioned table") {
    val outDir = Files.createTempDirectory("graft-job").toString
    val result = ConsumeJob.run(spark, sf, outDir)
    assert(result.count() > 0)

    for (it <- Seq("it1", "it2")) {
      val json = new java.io.File(s"$outDir/json/$it")
        .listFiles.filter(_.getName.endsWith(".json.gz"))
      assert(json.length == 1, s"json export missing for $it")
      val csv = new java.io.File(s"$outDir/csv/$it")
        .listFiles.filter(_.getName.endsWith(".csv.gz"))
      assert(csv.length == 1, s"csv export missing for $it")
    }
    // nested JSON really is nested: user.id struct round-trips
    val back = spark.read.json(s"$outDir/json/it1")
    assert(back.schema("user").dataType.typeName == "struct")

    // final table partitioned by month, delete-insert safe to re-run
    val table = spark.read.parquet(s"$outDir/table")
    assert(table.count() == result.count())
    val again = ConsumeJob.run(spark, sf, outDir)
    val table2 = spark.read.parquet(s"$outDir/table")
    assert(table2.count() == again.count(), "re-run must not duplicate partitions")
  }

  test("config drop/keep lists reshape the exports (script/main.py:349-372)") {
    val outDir = Files.createTempDirectory("graft-job-cfg").toString
    // prefix families AND the keep whitelist both ride in the config
    // (script/helper.py:157-163); the n_ family exists in the synthetic
    // output, so the drop is observable: n_clicks survives by whitelist,
    // n_views / n_name fall with the family (JSON branch only)
    val cfg = graft.io.JobConfig.parse(
      """{"colsToDropBaseData": ["props"],
        |  "colsToDropJson": ["ts"],
        |  "geoDropColumns": ["geoid"],
        |  "jsonDropPrefixes": ["n_"],
        |  "colsToKeep": ["n_clicks"]}""".stripMargin)
    // date-keyed export layout (script/main.py:377-393): full_refresh runs
    // key by the literal, dated runs by the resolved partition date
    val seg = graft.pipeline.DateWindows.exportSegment("2024-05-21", "full_refresh")
    assert(seg == "full_refresh")
    assert(graft.pipeline.DateWindows.exportSegment("2024-05-21", "10") == "2024-05-21")
    val result = ConsumeJob.run(spark, sf, outDir, ConsumeParams(), Some(cfg),
      dateSegment = Some(seg))
    // colsToDropBaseData and geoDropColumns shape the accumulated table too
    assert(!result.columns.contains("props"))
    assert(!result.columns.contains("geoid"))
    val table = spark.read.parquet(s"$outDir/table")
    assert(!table.columns.contains("props"))
    // exports land under the date segment
    val csvDir = s"$outDir/csv/it1/partitioncreateddate=$seg"
    assert(new java.io.File(csvDir).listFiles.exists(_.getName.endsWith(".csv.gz")),
      "csv export missing its partitioncreateddate segment")
    // colsToDropJson shapes the file exports only
    val csv = spark.read.option("header", "true").csv(csvDir)
    assert(!csv.columns.contains("ts") && !csv.columns.contains("props"))
    // the prefix family drop is JSON-branch-only: CSV keeps all n_* columns
    assert(csv.columns.contains("n_clicks") && csv.columns.contains("n_views"))
    assert(table.columns.contains("ts"), "table keeps colsToDropJson columns")
    // JSON: family dropped except the whitelist, survivors re-nested
    val json = spark.read.json(s"$outDir/json/it1/partitioncreateddate=$seg")
    val n = json.schema("n").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(n.fieldNames.contains("clicks") && !n.fieldNames.contains("views"))
    assert(!n.fieldNames.contains("name"), "family member without whitelist must drop")
  }

  test("CSV lookup feeds the broadcast geo join end-to-end (script/main.py:128-154)") {
    // write a nation-shaped CSV, load via Sources.csvLookup, feed modify()
    val csvDir = Files.createTempDirectory("graft-geo-csv").toString
    Tables.nation(spark, sf).select("n_nationkey", "n_name")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(csvDir)
    val lookup = graft.io.Sources.csvLookup(spark, csvDir)
    val base = ConsumePipeline.build(spark, sf).drop("geoid", "n_name", "partition_month")
    val out = ConsumePipeline.modify(base, lookup)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"expected the CSV lookup to broadcast:\n$p")
    assert(out.filter(col("n_name").isNotNull).count() > 0)
  }

  test("custom iteration matrix is honored") {
    val params = ConsumeParams(iterations =
      Seq(IterationSpec.bySegments("only", Seq("BUILDING", "AUTOMOBILE",
        "MACHINERY", "HOUSEHOLD", "FURNITURE"))))
    val out = ConsumePipeline.build(spark, sf, params)
    assert(out.select("iteration").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("only"))
  }

  test("iteration matrix builds from a reference-shaped config") {
    val cfg = graft.io.JobConfig.parse(
      """{"countryValues":[
        |  {"geoid":108,"country_name":"GERMANY","distribution_type":"BUY","data_source":"SELL"},
        |  {"geoid":103,"country_name":"AUSTRIA","distribution_type":"RENT","data_source":"RENTAL"}
        |]}""".stripMargin)
    val params = ConsumeParams.fromConfig(cfg, r =>
      if (r.geoid == 108) col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
      else col("c_mktsegment").isin("MACHINERY", "HOUSEHOLD", "FURNITURE"))
    assert(params.iterations.map(_.name) == Seq("germany_buy", "austria_rent"))
    val out = ConsumePipeline.build(spark, sf, params)
    assert(out.select("iteration").distinct().count() == 2)
  }
}
