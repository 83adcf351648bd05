package graft

import org.apache.spark.sql.functions._
import graft.pipeline.DataPrep

class DataPrepSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val sw = Seq("the", "a", "of", "and", "is", "in", "to", "it")
  private val rates = Map("en" -> 500, "es" -> 400, "de" -> 300,
    "fr" -> 200, "zh" -> 100)

  test("prepare: survivors pass every rule, fingerprints unique, partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val out = DataPrep.prepare(docs, sw, rates).cache()
    try {
      val n = out.count()
      assert(n > 0 && n < docs.count())
      // quality rules hold on survivors
      assert(out.filter(col("n_tokens") < 20 || col("n_tokens") > 90).count() == 0)
      // dedup: one row per fingerprint
      assert(out.select("fingerprint").distinct().count() == n)
      // sampling respected the per-stratum permille cut
      assert(out.filter(col("sample_bucket") >= 500).count() == 0)
      // identical output when the input arrives partitioned differently
      val again = DataPrep.prepare(docs.repartition(17), sw, rates)
      assert(again.orderBy("doc_id").collect().toSeq ==
        out.orderBy("doc_id").collect().toSeq)
    } finally out.unpersist()
  }

  test("curate: span-deduped corpus, mixture-derived rates, partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val targets = Map("src0" -> 300, "src1" -> 200, "src2" -> 150, "src3" -> 100)
    val out = DataPrep.curate(docs, sw, targets, defaultPermille = 25).cache()
    try {
      val n = out.count()
      assert(n > 0 && n < docs.count())
      // every survivor's bucket clears its source's derived rate
      assert(out.filter(
        col("sample_bucket") * 1000 >= col("sample_rate_ppm")).count() == 0)
      // rates: at least one source keeps everything (the normalization
      // anchor) and targeted sources out-rank the default-weight tail
      val rates = out.select("source", "sample_rate_ppm").distinct()
        .as[(String, Long)].collect().toMap
      assert(rates.valuesIterator.max == 1000000L)
      val tail = rates.view.filterKeys(s => !targets.contains(s)).values
      assert(tail.forall(r => r <= rates.getOrElse("src0", 1000000L)))
      // identical output under a different input partitioning
      val again = DataPrep.curate(docs.repartition(17), sw, targets,
        defaultPermille = 25)
      assert(again.orderBy("doc_id").collect().toSeq ==
        out.orderBy("doc_id").collect().toSeq)
    } finally out.unpersist()
  }

  test("pretrain: budgets bind per source, docs unique, shard positions dense") {
    val docs = Tables.documents(spark, sf)
    val budgets = Map("src0" -> 300, "src1" -> 200, "src2" -> 150, "src3" -> 100)
    val out = DataPrep.pretrain(docs, sw, budgets, totalBudget = 20000L,
      defaultPermille = 25, epoch = 1, nShards = 8).cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty)
      assert(rows.map(_.getLong(0)).distinct.length == rows.length)
      // every source's selected token mass fits its floor(total·permille/1000)
      rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
        val budget = 20000L * budgets.getOrElse(src, 25) / 1000
        assert(rs.map(_.getLong(2)).sum <= budget, s"$src over budget")
      }
      // positions are dense 0..n-1 within every shard
      rows.groupBy(_.getLong(4)).values.foreach { rs =>
        assert(rs.map(_.getInt(5)).sorted.toSeq == (0 until rs.length))
      }
    } finally out.unpersist()
  }

  test("prepare plans exactly one shuffle (the fingerprint exchange)") {
    spark.conf.set("spark.graft.parallelizeInputs", "false")
    try {
      val p = DataPrep.prepare(Tables.documents(spark, sf), sw, rates)
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$p")
    } finally spark.conf.set("spark.graft.parallelizeInputs", "true")
  }

  test("corpusQc: each gate drops its target, keep-best picks the longest dup") {
    val docs = Seq(
      // doc 0 is the eval slice (0 % 11 == 0)
      (0L, "alpha beta gamma delta", "en", "s0", 22L),
      (1L, "the cat sat on a mat today fine", "en", "s1", 50L),
      // contaminated: shares 2 of its 5 trigrams with eval (400000 ppm)
      (2L, "alpha beta gamma delta extra words here", "en", "s1", 40L),
      (3L, "tiny doc", "en", "s1", 8L), // under the word floor
      // exact near-dup of doc 1, longer — keep-best must pick THIS one
      (4L, "the cat sat on a mat today fine", "en", "s1", 60L),
      (5L, "we like big data jobs running fast here ok", "en", "s2", 42L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DataPrep.corpusQc(docs)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // s1: only doc 4 survives (1 lost the dup vote, 2 contaminated,
    // 3 too short); s2: doc 5 untouched
    assert(out == Map("s1" -> ((1L, 60L, 1L)), "s2" -> ((1L, 42L, 1L))))
  }
}
