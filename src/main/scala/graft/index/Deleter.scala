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
  * SINGLE-WRITER REQUIREMENT: like the reference (one `IndexWriter` holds
  * the directory lock, `src/indexer/index_writer.rs`), manifest mutators —
  * `Deleter.deleteTerm`/`deleteKey`, `IndexBuilder.build`, and
  * `SegmentMerger.merge` — must not run concurrently against the same index
  * directory: each does an unlocked read-modify-write of the manifest, so a
  * concurrent commit could drop the other's update. Serialize them through
  * one driver (the streaming indexer's microbatch loop already does).
  */
object Deleter {

  def deleteTerm(spark: SparkSession, indexDir: String, field: String, term: String)
      : IndexManifest = {
    val m = IndexManifest.read(spark, indexDir)
      .getOrElse(throw new IllegalStateException(s"no manifest at $indexDir"))
    val opstamp = m.commitSeq + 1
    val out = m.copy(
      commitSeq = opstamp,
      deletes = m.deletes :+ DeleteTerm(field, term, opstamp))
    IndexManifest.write(spark, indexDir, out)
    out
  }

  /** Delete by primary key (the keyField raw term). */
  def deleteKey(spark: SparkSession, indexDir: String, key: String): IndexManifest = {
    val m = IndexManifest.read(spark, indexDir)
      .getOrElse(throw new IllegalStateException(s"no manifest at $indexDir"))
    deleteTerm(spark, indexDir, m.keyField, key)
  }
}
