package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Iceberg-style snapshot log over the index manifest.
  *
  * Every commit (`IndexManifest.write`) appends an immutable copy of the
  * manifest to `manifests/manifest-<seq>.json` next to the `manifest.json`
  * current pointer — the same shape as an Iceberg table's metadata history
  * (the reference's single `meta.json`, `ARCHITECTURE.md:51-53`, generalized
  * for a multi-reader cluster). Because segments are immutable, a retained
  * snapshot is fully described by its manifest's segment list:
  *
  *  - **time travel**: `Searcher.atSnapshot(spark, dir, seq)` serves the
  *    index exactly as of commit `seq`;
  *  - **reader isolation across merges**: `SegmentMerger.merge(keepOld =
  *    true)` leaves the merged-away segment files in place, so searchers
  *    opened before the merge (and time-travel searchers) keep answering
  *    identically — the searcher's scan is pinned to ITS manifest's segment
  *    set by a partition filter;
  *  - **expiry**: `expire(keepLast = k)` drops history entries beyond the
  *    last `k` and deletes segment directories no retained snapshot
  *    references (Iceberg `expire_snapshots`).
  *
  * At 10^12-doc scale this is the operational model: merges run continuously
  * while query clusters hold day-old snapshots; expiry runs as a janitor job
  * bounded by the retention window.
  */
object Snapshots {

  def manifestsDir(indexDir: String): Path = new Path(indexDir, "manifests")

  def manifestPath(indexDir: String, seq: Long): Path =
    new Path(manifestsDir(indexDir), f"manifest-$seq%012d.json")

  /** Commit seqs present in the snapshot log, ascending. */
  def list(spark: SparkSession, indexDir: String): Seq[Long] = {
    val dir = manifestsDir(indexDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("manifest-") && n.endsWith(".json") =>
        n.stripPrefix("manifest-").stripSuffix(".json").toLong
      }
      .toSeq.sorted
  }

  /** The manifest as of commit `seq` (None when expired or never written). */
  def readAt(spark: SparkSession, indexDir: String, seq: Long): Option[IndexManifest] = {
    val path = manifestPath(indexDir, seq)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      in.close()
      Some(IndexManifest.fromJson(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
    }
  }

  /** Segment ids referenced by ANY retained snapshot or the current pointer.
    * Build-resume cleanup and expiry both treat these as live.
    */
  def referencedSegments(spark: SparkSession, indexDir: String): Set[Int] = {
    val hist = list(spark, indexDir).flatMap(readAt(spark, indexDir, _))
    val cur = IndexManifest.read(spark, indexDir)
    (hist ++ cur).flatMap(_.segmentIds).toSet
  }

  /** Roll the current pointer back to retained snapshot `seq` (Iceberg's
    * `rollback_to_snapshot`; operationally the recovery for a bad merge or
    * ingest batch). History stays append-only: the rolled-back state is
    * published as a NEW commit (seq = current + 1) whose content is the old
    * manifest, so the bad commits remain inspectable until expiry. Requires
    * the target snapshot's segments to still be on disk
    * (`merge(keepOld = true)` retention + the `expire` window).
    */
  def rollback(spark: SparkSession, indexDir: String, seq: Long): IndexManifest =
    WriterLock.withLock(spark, indexDir) {
      val target = readAt(spark, indexDir, seq).getOrElse(
        throw new IllegalArgumentException(s"snapshot $seq not retained at $indexDir"))
      val cur = IndexManifest.read(spark, indexDir).getOrElse(
        throw new IllegalStateException(s"no manifest at $indexDir"))
      val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val missing = target.segmentIds.filterNot(id =>
        fs.exists(new Path(indexDir, s"postings/segment=$id")))
      require(missing.isEmpty,
        s"snapshot $seq references expired segments ${missing.mkString(",")} -- cannot roll back")
      val out = target.copy(commitSeq = cur.commitSeq + 1)
      IndexManifest.write(spark, indexDir, out)
      out
    }

  /** Expire old snapshots: keep the last `keepLast` history entries (the
    * current commit always survives), delete the rest, then delete segment
    * directories referenced by NO surviving snapshot. Returns
    * (manifests deleted, segment dirs deleted).
    */
  def expire(spark: SparkSession, indexDir: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val conf = spark.sparkContext.hadoopConfiguration
    val seqs = list(spark, indexDir)
    val current = IndexManifest.read(spark, indexDir).map(_.commitSeq)
    val keep = (seqs.takeRight(keepLast) ++ current).toSet
    val drop = seqs.filterNot(keep)

    val kept = keep.toSeq.sorted.flatMap(readAt(spark, indexDir, _)) ++
      (if (current.exists(c => !seqs.contains(c))) IndexManifest.read(spark, indexDir) else None)
    val live: Set[Int] = kept.flatMap(_.segmentIds).toSet

    val mdir = manifestsDir(indexDir)
    val fs = mdir.getFileSystem(conf)
    var mDeleted = 0
    drop.foreach { s =>
      if (fs.delete(manifestPath(indexDir, s), false)) mDeleted += 1
    }

    var sDeleted = 0
    val pdir = new Path(indexDir, "postings")
    if (fs.exists(pdir)) {
      fs.listStatus(pdir).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("segment=")) {
          val id = name.stripPrefix("segment=").toInt
          if (!live.contains(id)) {
            fs.delete(st.getPath, true)
            sDeleted += 1
          }
        }
      }
    }
    (mDeleted, sDeleted)
  }
}
