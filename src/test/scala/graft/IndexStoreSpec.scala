package graft

import java.nio.file.Files
import graft.index.IndexStore
import graft.rank.BM25

class IndexStoreSpec extends SparkSpec {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-index").toString
    val docs = table(spark, "/root/testdata/sf0.001", "documents")
    IndexStore.write(docs, d, buckets = 16)
    d
  }

  test("stored-index search equals recompute search") {
    val docs = table(spark, "/root/testdata/sf0.001", "documents")
    val fresh = BM25.search(spark, docs, "spark join window").collect().toSeq
    val stored = BM25.searchStored(spark, dir, "spark join window")
      .collect().toSeq
    assert(stored == fresh)
  }

  test("stored batch search equals the recompute batch search") {
    import spark.implicits._
    val docs = table(spark, "/root/testdata/sf0.001", "documents")
    val qs = Seq((1L, "spark join window"), (2L, "batch stream"))
    val fresh = BM25.searchMany(spark, docs, qs.toDF("query_id", "query"))
      .collect().toSeq
    val stored = BM25.searchManyStored(spark, dir, qs)
      .collect().toSeq
    assert(stored.nonEmpty && stored == fresh)
    // serving plan invariant: the batch path prunes postings scans too
    val scans = BM25.searchManyStored(spark, dir, qs)
      .queryExecution.executedPlan.collectLeaves().map(_.toString)
    val postingScans = scans.filter(_.contains("term_frequency_in_doc"))
    assert(postingScans.nonEmpty)
    postingScans.foreach { s =>
      assert(s.contains("PartitionFilters") && s.contains("term_bucket"),
        s"batch postings scan not pruned:\n$s")
    }
  }

  test("term lookup partition-prunes to the term's hash buckets") {
    val df = IndexStore.postingsForTerms(spark, dir, Seq("spark"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("term_bucket"),
      s"no partition pruning in:\n$plan")
    // the scan must read strictly fewer than all 16 bucket directories
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(df.select("term").distinct().collect().map(_.getString(0)).toSet
      == Set("spark"))
  }

  test("searchStored's whole plan partition-prunes the postings scan") {
    // the declared bm25_stored query's serving plan: the scan itself must
    // carry term_bucket PartitionFilters (Cassandra-token-routing parity),
    // not filter after reading all buckets
    val q = BM25.searchStored(spark, dir, "spark join window")
    val scans = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val postingScans = scans.filter(_.contains("term_frequency_in_doc"))
    assert(postingScans.nonEmpty)
    postingScans.foreach { s =>
      assert(s.contains("PartitionFilters") && s.contains("term_bucket"),
        s"postings scan not pruned:\n$s")
    }
  }

  test("stored tables round-trip the index contracts") {
    val docs = table(spark, "/root/testdata/sf0.001", "documents")
    assert(IndexStore.docInfo(spark, dir).count() == docs.count())
    assert(IndexStore.corpusInfo(spark, dir).count() == 1)
    val vocabSize = IndexStore.vocabulary(spark, dir).count()
    assert(vocabSize == graft.index.InvertedIndex.docFrequency(docs).count())
  }

  test("stored phrase search equals recompute and prunes per-term buckets") {
    val docs = table(spark, "/root/testdata/sf0.001", "documents")
    val stored = IndexStore.phraseMatchStored(spark, dir, "the value")
    val fresh = graft.index.InvertedIndex.phraseMatch(docs, "the value")
      .collect().toSeq
    assert(fresh.nonEmpty && stored.collect().toSeq == fresh)
    // every positional scan in the chain must carry bucket pruning
    val scans = stored.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val posScans = scans.filter(_.contains("positional_postings"))
    assert(posScans.nonEmpty)
    posScans.foreach { s =>
      assert(s.contains("PartitionFilters") && s.contains("term_bucket"),
        s"positional scan not pruned:\n$s")
    }
  }

  test("stored proximity equals recompute and prunes both term buckets") {
    val docs = table(spark, "/root/testdata/sf0.001", "documents")
    val stored = IndexStore.proximityMatchStored(spark, dir, "the", "value", 8)
    val fresh = graft.index.InvertedIndex.proximityMatch(docs, "the", "value", 8)
      .collect().toSeq
    assert(fresh.nonEmpty && stored.collect().toSeq == fresh)
    // AQE may fold one side under a reused exchange, so pin that every
    // SURVIVING positional leaf carries bucket pruning (same pattern as
    // the phrase pin)
    val scans = stored.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val posScans = scans.filter(_.contains("positional_postings"))
    assert(posScans.nonEmpty)
    posScans.foreach(s => assert(
      s.contains("PartitionFilters") && s.contains("term_bucket"),
      s"positional scan not pruned:\n$s"))
  }

  test("ingest carries the positional table: new-doc phrases become servable") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-index-pp").toString
    val docs = table(spark, "/root/testdata/sf0.001", "documents")
    IndexStore.write(docs, d, buckets = 16)
    val delta = Seq((900001L, "zzzalpha zzzbeta zzzalpha zzzbeta"))
      .toDF("doc_id", "text")
    IndexStore.ingest(delta, d)
    val hit = IndexStore.phraseMatchStored(spark, d, "zzzalpha zzzbeta")
      .as[(Long, Long)].collect().toSeq
    assert(hit == Seq((900001L, 2L)))
    // pre-existing phrases still served after the swap
    assert(IndexStore.phraseMatchStored(spark, d, "the value").count() ==
      graft.index.InvertedIndex.phraseMatch(docs, "the value").count())
  }

  test("OOV query against the stored index is empty with intact schema") {
    val res = BM25.searchStored(spark, dir, "zzzznotaword")
    assert(res.columns.toSeq == Seq("doc_id", "doc_rank"))
    assert(res.count() == 0)
  }
}
