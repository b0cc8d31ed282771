package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.{IndexBuilder, IndexConfig, IndexManifest}

/** Structured Streaming ingestion: the reference's `IndexWriter` pipeline
  * (channel of AddBatches -> worker threads -> segments -> atomic commit,
  * `/root/reference/src/indexer/index_writer.rs:183-226,618-680`) maps to
  * `foreachBatch` appending a segment batch per micro-batch, with the
  * checkpointed batch id as the opstamp:
  *
  *  - each micro-batch builds its own segment range
  *    (segmentBase = (batchId+1) * BatchSegmentStride), so concurrent history
  *    never collides and a replayed batch (after failure) is idempotent —
  *    partial output of an uncommitted batch range is cleaned before rebuild
  *    and the manifest only ever advances atomically;
  *  - the manifest swap is the commit; `IndexReader`-style freshness =
  *    constructing a new Searcher on the updated manifest.
  *
  * Merge policy runs out-of-band (`SegmentMerger`), exactly like the
  * reference's background merge threads.
  */
object StreamingIndexer {

  val BatchSegmentStride: Int = 1 << 20

  /** Append one (batch) DataFrame to the index — also usable directly for
    * incremental batch ingestion.
    */
  def appendBatch(spark: SparkSession, batch: DataFrame, indexDir: String,
      cfg: IndexConfig, batchId: Long): IndexManifest =
    IndexBuilder.build(spark, batch, indexDir, cfg, resume = true,
      segmentBase = ((batchId + 1) * BatchSegmentStride).toInt)

  /** Start the streaming ingestion query. */
  def start(stream: DataFrame, indexDir: String, cfg: IndexConfig,
      checkpointDir: String): StreamingQuery =
    startCurated(stream, indexDir, cfg, checkpointDir, identity)

  /** Curate-then-index in one stream: `curate` runs on each micro-batch
    * BEFORE the segment append — inside `foreachBatch` the batch is a plain
    * DataFrame, so the full batch curation toolkit (gopher/C4 rule
    * batteries, repetition scoring, PII redaction, dedup screens, ...)
    * composes unchanged, including aggregating ops that Structured
    * Streaming would reject on an unbounded stream. A doc dropped by
    * curation never reaches a segment; replays stay idempotent because the
    * filter is deterministic and [[appendBatch]] keys the segment range by
    * the checkpointed batch id.
    */
  def startCurated(stream: DataFrame, indexDir: String, cfg: IndexConfig,
      checkpointDir: String, curate: DataFrame => DataFrame): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch.sparkSession, curate(batch), indexDir, cfg, batchId)
        ()
      }
      .start()
}
