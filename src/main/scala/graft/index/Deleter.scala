package graft.index

import org.apache.spark.sql.SparkSession

/** Delete-by-term — the reference's `IndexWriter::delete_term`
  * (`/root/reference/src/indexer/index_writer.rs:680`,
  * `src/indexer/delete_queue.rs`): a tombstone recorded with the commit
  * opstamp in the atomically-swapped manifest. Docs matching the term in
  * segments committed BEFORE the tombstone are dead: excluded at query
  * time (executor-side, from the term's own postings — the alive-bitset
  * analog) and physically purged by the next merge of their segment.
  *
  * SINGLE WRITER: like the reference (one `IndexWriter` holds the directory
  * lock, `src/indexer/index_writer.rs`), manifest mutators —
  * `Deleter.deleteTerm`/`deleteKey`, `IndexBuilder.build`, and
  * `SegmentMerger.merge` — each do a read-modify-write of the manifest; all
  * of them now take the [[WriterLock]] (the INDEX_WRITER_LOCK analog), so a
  * concurrent mutator in ANY process fails fast with LockBusy instead of
  * silently dropping the other's update.
  */
object Deleter {

  def deleteTerm(spark: SparkSession, indexDir: String, field: String, term: String)
      : IndexManifest = WriterLock.withLock(spark, indexDir) {
    val m = IndexManifest.read(spark, indexDir)
      .getOrElse(throw new IllegalStateException(s"no manifest at $indexDir"))
    val opstamp = m.commitSeq + 1
    val out = m.copy(
      commitSeq = opstamp,
      deletes = m.deletes :+ DeleteTerm(field, term, opstamp))
    IndexManifest.write(spark, indexDir, out)
    out
  }

  /** Delete-by-query — the reference's `IndexWriter::delete_query`
    * (`src/indexer/index_writer.rs:698`): tombstone an arbitrary engine
    * query. Resolution is LAZY and per segment, exactly like delete-by-term:
    * the query string is parsed with the index's recorded analyzer and
    * evaluated inside each kernel task against that segment's own postings
    * (no doc-id lists ever cross the network or bloat the manifest), and
    * the next merge physically purges the matches. Docs added after the
    * tombstone's opstamp survive, matching the reference's semantics.
    *
    * The query must be expressible in the engine's parser syntax (terms,
    * phrases, booleans, ranges, prefixes, ...) — it is parse-validated here
    * so a typo fails at delete time, not at first search.
    */
  def deleteQuery(spark: SparkSession, indexDir: String, query: String)
      : IndexManifest = WriterLock.withLock(spark, indexDir) {
    val m = IndexManifest.read(spark, indexDir)
      .getOrElse(throw new IllegalStateException(s"no manifest at $indexDir"))
    // fail fast on unparseable input with the index's own analyzer chain
    new graft.search.QueryParser(m.textField, analyzer = m.textAnalyzer,
      fieldAnalyzers = m.textFieldAnalyzers).parse(query)
    val opstamp = m.commitSeq + 1
    val out = m.copy(
      commitSeq = opstamp,
      deletes = m.deletes :+ DeleteTerm(DeleteTerm.QueryField, query, opstamp))
    IndexManifest.write(spark, indexDir, out)
    out
  }

  /** Delete by primary key (the keyField raw term). */
  def deleteKey(spark: SparkSession, indexDir: String, key: String): IndexManifest = {
    val m = IndexManifest.read(spark, indexDir)
      .getOrElse(throw new IllegalStateException(s"no manifest at $indexDir"))
    deleteTerm(spark, indexDir, m.keyField, key)
  }

  /** The reference's `IndexWriter::delete_all_documents`
    * (`src/indexer/index_writer.rs:~660`): commit an empty index in one
    * opstamp — the manifest's segment list empties and pending tombstones
    * retire. Segment FILES are left for retained snapshots (time travel to
    * pre-wipe states keeps working); `Snapshots.expire` reclaims them.
    */
  def deleteAll(spark: SparkSession, indexDir: String): IndexManifest =
    WriterLock.withLock(spark, indexDir) {
      val m = IndexManifest.read(spark, indexDir)
        .getOrElse(throw new IllegalStateException(s"no manifest at $indexDir"))
      val out = m.copy(commitSeq = m.commitSeq + 1, segments = Nil, deletes = Nil)
      IndexManifest.write(spark, indexDir, out)
      out
    }
}
