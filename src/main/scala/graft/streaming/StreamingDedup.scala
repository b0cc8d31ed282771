package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.PipelineOps

/** Continuous-ingest deduplication — the streaming counterpart of
  * `PipelineOps.dedupExact` for pipelines that index a crawl as it arrives
  * (`StreamingIndexer`) rather than in batches.
  *
  * The fingerprint is the SAME md5-of-analyzed-tokens as the batch op, so a
  * document admitted by the streaming filter and one admitted by the batch
  * pass agree on identity. State semantics: `dropDuplicatesWithinWatermark`
  * keys the state store on the fingerprint alone but evicts an entry once
  * the event-time watermark passes its timestamp + horizon, so state is
  * bounded by (dedup horizon × ingest rate), not corpus size — the property
  * that keeps a 100 TB/day ingest viable. The state store hash-partitions
  * fingerprints across executors exactly like the batch `groupBy(fp)`
  * shuffle, so hot boilerplate spreads the same way.
  *
  * Stateless pipeline ops (htmlExtract, urlNormalize, quality/lang scoring,
  * piiRedact, repetitionScore) are per-row codegen maps and run on a
  * streaming DataFrame unchanged; this op exists because dedup is the one
  * stage that genuinely needs cross-batch state.
  */
object StreamingDedup {

  /** Emit only the first-seen document per content fingerprint within the
    * event-time horizon. `tsCol` must be the event-time column.
    */
  def exactDedup(stream: DataFrame, tsCol: String = "warc_ts",
      horizon: String = "1 hour"): DataFrame =
    stream
      .withColumn("fp",
        md5(concat_ws(" ", graft.functions.ShingleOps.sql_tokens(col("text")))))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Continuous FUZZY dedup — the streaming cell of the dedup matrix
    * (exact/fuzzy × batch/incremental/streaming; `PipelineOps.dedupMinHash`
    * is within-corpus batch, `minHashNewDocs` incremental batch): each
    * micro-batch first collapses its OWN near-dup clusters
    * (band candidates → exact-Jaccard verify → connected-components
    * canonical, all the proven batch kernels), then screens the cluster
    * representatives against the accumulated survivor store, and appends
    * only the genuinely new docs.
    *
    * State is the survivor Parquet dir itself (the same pattern as
    * `StreamingIndexer`'s segments, NOT the state store — shingle sets per
    * doc would blow a state store, while the survivor table is exactly what
    * the pipeline wants to ship anyway). Per-batch subdirectories keyed by
    * the checkpointed batch id make replays idempotent: a re-delivered
    * batch overwrites its own subdir and is screened only against OTHER
    * batches' survivors. Requires columns (doc_id: long, text: string).
    */
  def minHashDedup(stream: DataFrame, survivorsDir: String,
      checkpointDir: String, threshold: Double = 0.5): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendMinHashBatch(batch.sparkSession, batch, survivorsDir, batchId, threshold)
        ()
      }
      .start()

  /** One micro-batch of [[minHashDedup]] — also usable directly for
    * incremental batch ingestion.
    */
  def appendMinHashBatch(spark: SparkSession, batch: DataFrame,
      survivorsDir: String, batchId: Long, threshold: Double): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(survivorsDir)
    val fs = root.getFileSystem(conf)
    // survivors of all OTHER batches (replay safety: never screen a batch
    // against its own previous partial output)
    val priorDirs =
      if (!fs.exists(root)) Seq.empty[String]
      else fs.listStatus(root).toSeq.map(_.getPath)
        .filter(p => p.getName.startsWith("batch=") && p.getName != s"batch=$batchId")
        .map(_.toString)
    // 1) within-batch collapse to cluster representatives
    val pairs = PipelineOps.dedupMinHash(batch, threshold)
      .select(col("ia").as("a"), col("ib").as("b"))
    val reps = batch.join(
      PipelineOps.dedupResolve(batch.select("doc_id"), pairs)
        .where(col("is_kept")).select("doc_id"),
      "doc_id")
    // 2) screen representatives against the accumulated survivors
    val newDocs =
      if (priorDirs.isEmpty) reps
      else reps.join(
        PipelineOps.minHashNewDocs(reps, spark.read.parquet(priorDirs: _*), threshold),
        "doc_id")
    newDocs.write.mode("overwrite").parquet(s"$survivorsDir/batch=$batchId")
  }
}
