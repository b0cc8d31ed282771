package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
