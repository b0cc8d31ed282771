package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.analysis.Analyzer
import graft.corpus.WebCorpus
import graft.index.{Deleter, IndexBuilder, IndexConfig, SegmentMerger}
import graft.search.{Occur, Query, Searcher}
import graft.streaming.StreamingIndexer

/** The reference's `functional_test.rs` analog: a seeded random sequence of
  * index operations (append batch / delete term / delete key / merge /
  * retention-merge / snapshot rollback) is
  * replayed against a driver-side model of the alive corpus; after every
  * op, engine results must equal the model's for a probe query set (counts
  * AND matched url sets, including a phrase and a boolean).
  */
class FunctionalSoakSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  /** Model-side match sets. */
  private def modelMatches(alive: Map[String, Seq[String]], q: Query): Set[String] = q match {
    case Query.Term(_, t, _) => alive.collect { case (u, ts) if ts.contains(t) => u }.toSet
    case Query.Phrase(_, ts, slop) =>
      alive.collect { case (u, toks) if phraseAt(toks, ts, slop) => u }.toSet
    case Query.Bool(cs, _) =>
      val musts = cs.collect { case (Occur.Must, c) => modelMatches(alive, c) }
      val nots = cs.collect { case (Occur.MustNot, c) => modelMatches(alive, c) }
      val shoulds = cs.collect { case (Occur.Should, c) => modelMatches(alive, c) }
      val base =
        if (musts.nonEmpty) musts.reduce(_ intersect _)
        else if (shoulds.nonEmpty) shoulds.reduce(_ union _)
        else alive.keySet.toSet
      nots.foldLeft(base)(_ diff _)
    case other => fail(s"model does not support $other")
  }

  private def phraseAt(toks: Seq[String], phrase: Seq[String], slop: Int): Boolean = {
    if (slop == 0) toks.sliding(phrase.length).exists(_ == phrase)
    else fail("model only checks exact phrases")
  }

  private def engineMatches(s: Searcher, q: Query): Set[String] = {
    val m = s.allMatches(q, scored = false)
    m.join(s.docmapDF, Seq("segment", "docId")).select(col("url"))
      .collect().map(_.getString(0)).toSet
  }

  test("random op soak: engine == model after every append/delete/merge") {
    val dir = java.nio.file.Files.createTempDirectory("graft-soak").toString
    // one-off extended soaks: GRAFT_SOAK_OPS=60 GRAFT_SOAK_SEED=... sbt ...
    val soakOps = sys.env.getOrElse("GRAFT_SOAK_OPS", "14").toInt
    val rnd = new scala.util.Random(
      sys.env.getOrElse("GRAFT_SOAK_SEED", "20260818").toLong)
    val cfg = IndexConfig(numPartitions = 3)

    // op 0: initial build
    var nextId = 0L
    var alive = Map.empty[String, Seq[String]]

    def appendDocs(n: Int, batchId: Long): Unit = {
      val docs = (0 until n).map(_ => { val d = WebCorpus.genDoc(nextId); nextId += 1; d })
      val df = spark.createDataFrame(docs)
      if (batchId < 0) IndexBuilder.build(spark, df, dir, cfg, resume = false)
      else StreamingIndexer.appendBatch(spark, df, dir, cfg, batchId)
      docs.foreach(d => alive += d.url -> Analyzer.terms(d.text).toSeq)
    }

    appendDocs(250, batchId = -1L)

    val probeTerms = Seq("alpha", "beta", "gamma", "w00003", "w00010")
    def probes: Seq[Query] = Seq(
      Query.Term("text", "alpha"),
      Query.must(Query.Term("text", "alpha"), Query.Term("text", "beta")),
      Query.Bool(Seq(Occur.Must -> Query.Term("text", "alpha"),
        Occur.MustNot -> Query.Term("text", "gamma"))),
      Query.should(Query.Term("text", "w00003"), Query.Term("text", "w00010")),
      Query.Phrase("text", Seq("alpha", "beta")))

    def check(tag: String): Unit = {
      val s = new Searcher(spark, dir)
      probes.foreach { q =>
        val e = engineMatches(s, q)
        val m = modelMatches(alive, q)
        assert(e == m, s"$tag: $q — engine ${e.size} vs model ${m.size}; " +
          s"only-engine=${(e diff m).take(3)} only-model=${(m diff e).take(3)}")
        assert(s.count(q) == m.size.toLong, s"$tag count: $q")
      }
    }
    check("initial")

    // snapshot-seq -> model state, for rollback ops (the snapshot log makes
    // every committed state addressable; rollback must land exactly on it)
    def curSeq: Long = graft.index.IndexManifest.read(spark, dir).get.commitSeq
    var history = Map(curSeq -> alive)

    var batch = 0L
    for (op <- 1 to soakOps) {
      rnd.nextInt(7) match {
        case 0 => // append
          appendDocs(80 + rnd.nextInt(120), batch); batch += 1
        case 1 => // delete a term (kills every doc containing it, older segments)
          val t = probeTerms(rnd.nextInt(probeTerms.size))
          Deleter.deleteTerm(spark, dir, "text", t)
          alive = alive.filterNot { case (_, ts) => ts.contains(t) }
        case 2 => // delete one doc by key
          if (alive.nonEmpty) {
            val u = alive.keys.toSeq.sorted.apply(rnd.nextInt(alive.size))
            Deleter.deleteKey(spark, dir, u)
            alive -= u
          }
        case 3 => // merge round (purges dead docs)
          val m = graft.index.IndexManifest.read(spark, dir).get
          if (m.segments.size > 1)
            SegmentMerger.merge(spark, dir, SegmentMerger.plan(m, fanIn = 3))
        case 4 => // snapshot-retention merge (readers keep old files)
          val m = graft.index.IndexManifest.read(spark, dir).get
          if (m.segments.size > 1)
            SegmentMerger.merge(spark, dir, SegmentMerger.plan(m, fanIn = 4), keepOld = true)
        case 5 => // rollback to a random retained snapshot (or a loud refusal
          // when its segments were reclaimed by a non-retention merge)
          val seqs = graft.index.Snapshots.list(spark, dir)
          val target = seqs(rnd.nextInt(seqs.size))
          try {
            graft.index.Snapshots.rollback(spark, dir, target)
            alive = history(target)
          } catch { case e: IllegalArgumentException =>
            assert(e.getMessage.contains("cannot roll back"), e.getMessage)
          }
        case 6 => // delete-by-query (tombstones an arbitrary boolean)
          val t1 = probeTerms(rnd.nextInt(probeTerms.size))
          val t2 = probeTerms(rnd.nextInt(probeTerms.size))
          val (qs, mq) =
            if (rnd.nextBoolean())
              (s"$t1 AND $t2", Query.must(Query.Term("text", t1), Query.Term("text", t2)))
            else
              (s"$t1 AND NOT $t2", Query.Bool(Seq(
                Occur.Must -> Query.Term("text", t1),
                Occur.MustNot -> Query.Term("text", t2))))
          Deleter.deleteQuery(spark, dir, qs)
          alive = alive -- modelMatches(alive, mq)
      }
      history += curSeq -> alive
      check(s"op $op")
    }

    // guaranteed delete-query round (the random mix may skip case 6),
    // checked both before and after the purge merge below
    Deleter.deleteQuery(spark, dir, "alpha AND beta")
    alive = alive -- modelMatches(alive,
      Query.must(Query.Term("text", "alpha"), Query.Term("text", "beta")))
    check("delete-query")

    // final: merge to one segment and re-check everything
    val mf = graft.index.IndexManifest.read(spark, dir).get
    if (mf.segments.size > 1)
      SegmentMerger.merge(spark, dir, SegmentMerger.plan(mf, fanIn = 64))
    check("final merge")
  }
}
