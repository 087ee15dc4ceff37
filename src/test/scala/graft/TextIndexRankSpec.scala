package graft

import graft.index.InvertedIndex
import graft.rank.BM25

class TextIndexRankSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "Apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry, it's cherry!"),
    (4L, ""), // empty doc: length 0, no postings
  ).toDF("doc_id", "text")

  test("term frequency counts occurrences per (doc, term)") {
    val tf = InvertedIndex.termFrequency(corpus)
      .as[(Long, String, Long)].collect().toSet
    assert(tf.contains((1L, "apple", 2L)))
    assert(tf.contains((3L, "cherry", 4L)))
    assert(tf.contains((3L, "it's", 1L))) // apostrophes kept by [a-z0-9_']
    assert(!tf.exists(_._1 == 4L))
  }

  test("doc frequency counts each doc once per term") {
    val df = InvertedIndex.docFrequency(corpus)
      .as[(String, Long)].collect().toMap
    assert(df("banana") == 2L)
    assert(df("cherry") == 2L)
    assert(df("apple") == 1L)
  }

  test("postingsCompression: block-local deltas, absolute heads, varint widths") {
    // term "t" in docs 0, 100, 4096, 4100 (block width 4096):
    // block 0 encodes head 0 (1B) + gap 100 (1B); block 1 encodes
    // head 4096 absolute (2B) + gap 4 (1B) -> varint 5 of raw 32
    val docs = Seq((0L, "t"), (100L, "t"), (4096L, "t"), (4100L, "t"),
      (1L, "other")).toDF("doc_id", "text")
    val rows = InvertedIndex.postingsCompression(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(rows == Seq(
      ("other", 1L, 8L, 1L, 1L, 0.125),
      ("t", 4L, 32L, 5L, 2L, 0.1563)))
  }

  test("phrase match: consecutive positions only, overlaps counted") {
    val docs = Seq(
      (1L, "a b a b a"),      // "a b a" at start-pos 0 and 2 (overlap)
      (2L, "a c b"),          // both words present but not adjacent
      (3L, "b a"),            // reversed order
      (4L, "x a b a y")).toDF("doc_id", "text")
    val out = InvertedIndex.phraseMatch(docs, "a b a")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 4L -> 1L))
    // single-term phrase degenerates to occurrence counting
    assert(InvertedIndex.phraseMatch(docs, "a")
      .as[(Long, Long)].collect().toMap == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // case folding and punctuation follow the pinned tokenizer
    assert(InvertedIndex.phraseMatch(docs, "A, b!? a")
      .as[(Long, Long)].collect().toMap == Map(1L -> 2L, 4L -> 1L))
  }

  test("phrase snippets: first occurrence, clamped at doc start, truncated end") {
    val docs = Seq(
      (1L, "one two three a b four five six seven"), // interior window
      (2L, "a b early context"),                     // clamp at doc start
      (3L, "x a b"),                                 // truncate at doc end
      (4L, "no match here")).toDF("doc_id", "text")
    val out = InvertedIndex.phraseSnippets(docs, "a b", 2)
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, "two three a b four five"), // 2 ctx + phrase + 2 ctx
      (2L, 0L, "a b early context"),       // start clamped, window truncated
      (3L, 1L, "x a b")))                  // end truncated
  }

  test("proximity match: window boundary inclusive, band edges dup-free") {
    val docs = Seq(
      (1L, "a x x x b"),      // distance 4: inside window 4, outside 3
      (2L, "b a"),            // reversed order, distance 1
      (3L, "a x x x x x x b"),// distance 7: outside window 4
      (4L, "a b x a")).toDF("doc_id", "text") // pairs: (0,1)=1, (3,1)=2
    val w4 = InvertedIndex.proximityMatch(docs, "a", "b", 4)
      .as[(Long, Long, Long)].collect()
      .map { case (k, n, d) => k -> (n, d) }.toMap
    assert(w4 == Map(1L -> (1L, 4L), 2L -> (1L, 1L), 4L -> (2L, 1L)))
    val w3 = InvertedIndex.proximityMatch(docs, "a", "b", 3)
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(w3 == Set(2L, 4L)) // the distance-4 pair drops at window 3
  }

  test("doc info = token count incl. duplicates; empty doc has length 0") {
    val dl = InvertedIndex.docInfo(corpus).as[(Long, Long)].collect().toMap
    assert(dl == Map(1L -> 3L, 2L -> 2L, 3L -> 5L, 4L -> 0L))
  }

  test("corpus info aggregates globally") {
    val row = InvertedIndex.corpusInfo(corpus).collect().head
    assert(row.getLong(0) == 4L)
    assert(row.getLong(1) == 10L)
    assert(math.abs(row.getDouble(2) - 2.5) < 1e-12)
  }

  test("BM25 matches hand-computed score (k1=1, b=0.75, raw ln idf)") {
    val res = BM25.search(spark, corpus, "apple")
      .as[(Long, Double)].collect()
    assert(res.map(_._1).toSeq == Seq(1L))
    val n = 4.0; val df = 1.0; val tf = 2.0; val dlen = 3.0; val avgdl = 2.5
    val expected = math.log(n / df) * (2.0 * tf) /
      (1.0 * (0.25 + 0.75 * dlen / avgdl) + tf)
    assert(math.abs(res.head._2 - math.rint(expected * 1e4) / 1e4) <= 1e-9)
  }

  test("multi-term query sums per-term scores; ranking is descending") {
    val res = BM25.search(spark, corpus, "banana cherry")
      .as[(Long, Double)].collect()
    assert(res.length == 3)
    assert(res.map(_._2).toSeq == res.map(_._2).toSeq.sorted.reverse)
    // short doc matching BOTH terms beats the long single-term-heavy doc
    assert(res.head._1 == 2L)
  }

  test("all-OOV query returns empty result with intact schema (S9)") {
    val res = BM25.search(spark, corpus, "zzz qqq")
    assert(res.columns.toSeq == Seq("doc_id", "doc_rank"))
    assert(res.count() == 0)
  }

  test("searchMany with a single query matches search") {
    val single = BM25.search(spark, corpus, "banana cherry")
      .as[(Long, Double)].collect().toSeq
    val multi = BM25.searchMany(spark, corpus,
      Seq((7L, "banana cherry")).toDF("query_id", "query"))
      .select("doc_id", "doc_rank").as[(Long, Double)].collect().toSeq
    assert(multi == single)
  }

  test("query term dedup + case fold (T6): repeated terms score once") {
    val once = BM25.search(spark, corpus, "apple").as[(Long, Double)].collect()
    val twice = BM25.search(spark, corpus, "Apple APPLE apple")
      .as[(Long, Double)].collect()
    assert(once.toSeq == twice.toSeq)
  }

  test("champion lists keep per-term top-m by tf with doc_id tie-break") {
    val ch = InvertedIndex.championLists(corpus, 1)
      .select("term", "doc_id", "term_frequency")
      .as[(String, Long, Long)].collect().toSet
    // banana: tf 1 in docs 1 and 2 -> tie broken by doc_id -> doc 1
    assert(ch.contains(("banana", 1L, 1L)) && !ch.exists(
      t => t._1 == "banana" && t._2 == 2L))
    assert(ch.contains(("cherry", 3L, 4L))) // top tf wins
    assert(ch.contains(("apple", 1L, 2L)))
  }

  test("champion-served BM25: exact at m >= df, exact-subset at m=1") {
    val exact = BM25.search(spark, corpus, "banana cherry")
      .as[(Long, Double)].collect().toSeq
    val full = BM25.searchChampions(spark, corpus, "banana cherry", m = 10)
      .as[(Long, Double)].collect().toSeq
    assert(full == exact) // m covers every posting list -> identical
    val pruned = BM25.searchChampions(spark, corpus, "banana cherry", m = 1)
      .as[(Long, Double)].collect().toSeq
    val exactScores = exact.toMap
    // every surviving doc keeps its EXACT score (pruning drops candidates,
    // never changes the formula)
    assert(pruned.nonEmpty && pruned.forall { case (d, s) => exactScores(d) == s })
    assert(pruned.map(_._1).toSet.subsetOf(exact.map(_._1).toSet))
  }

  test("RM3 expansion: mined terms and the weighted re-ranking, hand-computed") {
    // 3 docs, every dl = 2 = avgdl, every df = 2 -> per-term bm25 = ln(1.5)
    val docs = Seq((1L, "banana apple"), (2L, "banana cherry"),
      (3L, "apple cherry")).toDF("doc_id", "text")
    def r(v: Double, s: Int): Double =
      BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val l = math.log(1.5)
    // feedback docs for "banana" = {1, 2}; candidates apple/cherry both
    // carry weight 1 * ln(3/2), tie broken alphabetically
    val exp = BM25.expansionTerms(spark, docs, "banana")
      .as[(String, Double)].collect().toSeq
    assert(exp == Seq(("apple", r(l, 6)), ("cherry", r(l, 6))))
    // expanded ranking: d1 = d2 = 1.5*ln(1.5); d3 (expansion-only) = ln(1.5)
    val got = BM25.searchExpanded(spark, docs, "banana")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, r(1.5 * l, 4)), (2L, r(1.5 * l, 4)),
      (3L, r(l, 4))))
  }

  test("RRF hybrid: fused score is exactly 1/(60+r) summed over present arms") {
    // lexical arm: doc 1 beats doc 2 on "cat"; doc 3 lexical-absent.
    // dense arm vs query vec 0: vec 2 (r1), vec 3 (r2), vec 1 (r3).
    val docs = Seq(
      (0L, "filler filler"), (1L, "cat cat cat"), (2L, "cat dog"),
      (3L, "dog dog"))
      .toDF("doc_id", "text")
    val embs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 0),
      (2L, Array(1f, 0f), 0), (3L, Array(0.9f, 0.1f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = graft.rank.Hybrid.rrfSearch(spark, docs, embs, "cat", 0L)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getDouble(3))).toSeq
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rrf(rs: Seq[Int]): Double = r6(rs.map(r => 1.0 / (60.0 + r)).sum)
    // doc 2 (bm r2 + ann r1) outfuses doc 1 (bm r1 + ann r3)
    assert(got == Seq(
      (2L, Some(2), Some(1), rrf(Seq(2, 1))),
      (1L, Some(1), Some(3), rrf(Seq(1, 3))),
      (3L, None, Some(2), rrf(Seq(2)))))
  }

  test("WAND search equals the exact unpruned search on the real corpus") {
    val docs = table(spark, "/root/testdata/sf0.001", "documents")
    for (q <- Seq("spark join window", "hash merge stream", "the", "dup big"))
      assert(
        graft.rank.BM25.searchWand(spark, docs, q).collect().toSeq ==
          graft.rank.BM25.search(spark, docs, q).collect().toSeq, s"query: $q")
  }

  test("WAND pruning is lossless when the bound pass can drop most docs") {
    // 30 docs mention only 'filler'; 3 docs carry the query terms with
    // distinct tf -> theta from champions prunes every filler doc (their
    // cap-sum is 0 < theta), and the result still equals exact search
    val docs = ((1L to 30L).map(i => (i, "filler " * 5)) ++ Seq(
      (31L, "alpha beta alpha filler"),
      (32L, "alpha filler filler filler"),
      (33L, "beta beta filler"))).toDF("doc_id", "text")
    val wand = graft.rank.BM25.searchWand(spark, docs, "alpha beta", topK = 2)
      .collect().toSeq
    val exact = graft.rank.BM25.search(spark, docs, "alpha beta", topK = 2)
      .collect().toSeq
    assert(wand == exact && wand.nonEmpty)
  }

  test("block-max search equals the exact unpruned search on the real corpus") {
    val docs = table(spark, "/root/testdata/sf0.001", "documents")
    for (q <- Seq("spark join window", "hash merge stream", "the", "dup big"))
      assert(
        graft.rank.BM25.searchBlockMax(spark, docs, q).collect().toSeq ==
          graft.rank.BM25.search(spark, docs, q).collect().toSeq, s"query: $q")
  }

  test("block-max skips WHOLE postings blocks whose cap-sum is below theta") {
    // Two doc-id blocks (width 4096). Block 0: strong docs — query terms
    // at high tf. Block 1: 50 weak docs — one 'alpha' drowned in filler,
    // so the block's cap-sum stays below the champions' k-th score and
    // the ENTIRE block is skipped before any per-doc work.
    val w = graft.index.InvertedIndex.PostingsBlockWidth
    val docs = (Seq(
      (1L, "alpha beta alpha beta alpha"),
      (2L, "alpha beta alpha alpha"),
      (3L, "alpha beta beta")) ++
      (0L until 50L).map(i => (w + i, "alpha " + ("filler " * 200)))
      ).toDF("doc_id", "text")
    import org.apache.spark.sql.functions.{broadcast => bc, _}
    val spark2 = spark; import spark2.implicits._
    val qTerms = Seq("alpha", "beta").toDF("term")
    val tf = graft.index.InvertedIndex.termFrequency(docs)
      .join(bc(qTerms), Seq("term"))
    val qdf = graft.index.InvertedIndex.docFrequencyFromTf(tf)
    val stats = graft.index.InvertedIndex.corpusInfo(docs)
    // theta = exact 2nd-best score (topK = 2): block 0 docs all contain
    // both terms; block 1's cap-sum is alpha-only at maxtf 1
    val exact = graft.rank.BM25.search(spark, docs, "alpha beta", topK = 2)
    val theta = exact.collect().last.getAs[Double]("doc_rank")
    val cand = graft.rank.BM25
      .blockMaxCandidates(tf, qdf, stats, 1.0, 0.75, theta)
      .as[Long].collect().toSet
    // the whole weak block is pruned; every strong doc survives
    assert(cand.forall(_ < w), s"weak-block doc survived: $cand")
    assert(Set(1L, 2L, 3L).subsetOf(cand))
    // and the full pruned search is still exact
    assert(graft.rank.BM25.searchBlockMax(spark, docs, "alpha beta", topK = 2)
      .collect().toSeq == exact.collect().toSeq)
  }

  test("snippets pick the densest hit-anchored window, earliest on ties") {
    // doc 10: 'alpha' at pos 1 and a dense 'alpha beta' pair at 20-21;
    // the window [20, 34] holds 2 distinct terms and must win over the
    // earlier 1-term window. doc 11: two equal 1-term windows -> the
    // EARLIEST start (pos 2) wins.
    val filler = (1 to 18).map(i => s"x$i").mkString(" ")
    val filler2 = (1 to 20).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (10L, s"alpha $filler alpha beta"),
      (11L, s"pad alpha $filler2 alpha pad")
    ).toDF("doc_id", "text")
    val out = graft.rank.BM25
      .searchSnippets(spark, docs, "alpha beta", window = 15, topK = 10)
      .select("doc_id", "start", "n_terms", "snippet")
      .as[(Long, Long, Long, String)].collect().toMap2
    val (s10, n10, sn10) = out(10L)
    assert(s10 == 20L && n10 == 2L)
    assert(sn10.startsWith("alpha beta"))
    val (s11, n11, _) = out(11L)
    assert(s11 == 2L && n11 == 1L)
  }

  implicit class Map2[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("spell suggest ranks by distance then df, exact term at dist 0") {
    val docs = Seq(
      (1L, "grape grape banana"), (2L, "grape banana"), (3L, "grapes"),
      (4L, "grade"), (5L, "banana")
    ).toDF("doc_id", "text")
    val out = graft.rank.BM25.spellSuggest(spark, docs, "grape bananna", 2, 3)
      .as[(String, String, Long, Long, Int)].collect()
    val grape = out.filter(_._1 == "grape").toSeq
    // exact vocab hit ranks first at distance 0, then dist-1 by df
    assert(grape.head == (("grape", "grape", 0L, 2L, 1)))
    // grade/grapes are both dist 1, df 1 -> term-ASC tiebreak
    assert(grape.map(_._2).take(3) == Seq("grape", "grade", "grapes"))
    val ban = out.filter(_._1 == "bananna").toSeq
    assert(ban.head._2 == "banana" && ban.head._3 == 1L)
  }

  test("prefix search: single-match prefix equals the literal-term search exactly") {
    val docs = Seq(
      (1L, "spark runs the query fast"),
      (2L, "the query planner is spark"),
      (3L, "tables join other tables"),
    ).toDF("doc_id", "text")
    val literal = BM25.search(spark, docs, "spark")
      .as[(Long, Double)].collect().toSeq
    val prefixed = BM25.searchPrefix(spark, docs, "spar")
      .as[(Long, Double)].collect().toSeq
    assert(literal.nonEmpty && prefixed == literal)
  }

  test("prefix search: expansion is df-capped highest-df first; dropped terms don't score") {
    // prefix 'a': df(apple)=3 > df(april)=2 > df(axiom)=1; cap 2 keeps
    // apple+april, so the axiom-only doc 4 must NOT appear at all
    val docs = Seq(
      (1L, "apple april things"), (2L, "apple april other"),
      (3L, "apple alone"), (4L, "axiom only here"),
    ).toDF("doc_id", "text")
    val got = BM25.searchPrefix(spark, docs, "a", maxExpand = 2)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L))
    // doc 3 ('alone' also matches 'a' but is rank 4 by (df, term)) still
    // appears through its 'apple' hit — expansion drops TERMS, not docs
    assert(got.map(_._1).contains(3L))
  }
}
