package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** A parquet-backed table with Iceberg-style snapshot history.
  *
  * The sandbox ships no Iceberg jar (coursier is offline), so this layer
  * reproduces the reference's Iceberg semantics — snapshot append + history
  * + time travel (`scripts/05_append_campaigns.py:110-123` inspects
  * `table.snapshots()` before/after an append), DELETE/UPDATE
  * (`scripts/33_schema_sync_task.sql:70-71,427-433`), CREATE OR REPLACE
  * (`:47-59`) — on plain parquet directories.
  *
  * Layout: `<root>/<snap-id>/` parquet dirs plus a tiny `<snap-id>.meta`
  * marker recording the snapshot kind. Read resolution walks back from the
  * newest snapshot to the nearest `base` and unions the `append` deltas
  * after it — so at 100 TB an append writes ONLY its delta (like an Iceberg
  * fast-append manifest), while DELETE/UPDATE are copy-on-write rewrites
  * (the reference's DML runs on Iceberg COW tables too). All heavy lifting
  * is `spark.read.parquet` over multiple dirs — distributed, no driver
  * materialization.
  */
final class SnapshotTable(
    val spark: SparkSession,
    val root: String,
    writeGuard: () => Unit = () => ()) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def snapDir(id: Long): Path = new Path(root, f"snap-$id%05d")
  private def metaFile(id: Long): Path = new Path(root, f"snap-$id%05d.meta")

  /** (id, kind) for every committed snapshot, ascending — the table history
    * (S7: `SELECT * FROM t.snapshots`). The meta line is `kind` or
    * `kind|p1,p2` when the snapshot was written partitioned (S4). */
  def snapshots(): Seq[(Long, String)] = {
    val p = new Path(root)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".meta"))
      .map { n =>
        val id = n.stripPrefix("snap-").stripSuffix(".meta").toLong
        val in = fs.open(metaFile(id))
        val kind = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
        (id, kind.split('|').head)
      }
      .sortBy(_._1)
  }

  /** The partition spec of the current base snapshot (empty = unpartitioned). */
  def partitionSpec(): Seq[String] = {
    val metas = {
      val p = new Path(root)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.map(_.getPath.getName).filter(_.endsWith(".meta"))
        .map { n =>
          val id = n.stripPrefix("snap-").stripSuffix(".meta").toLong
          val in = fs.open(metaFile(id))
          val line = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
          (id, line)
        }.sortBy(_._1)
    }
    metas.reverse.find(_._2.startsWith("base")).toSeq
      .flatMap(_._2.split('|').drop(1).flatMap(_.split(',')).filter(_.nonEmpty))
  }

  def exists: Boolean = snapshots().nonEmpty
  def currentSnapshotId: Option[Long] = snapshots().lastOption.map(_._1)

  private def commit(df: DataFrame, kind: String, parts: Seq[String] = Seq.empty): Long = {
    writeGuard() // BCDR: unpromoted secondaries refuse writes (D11)
    val id = currentSnapshotId.getOrElse(0L) + 1
    val writer = df.write.mode(SaveMode.ErrorIfExists)
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer)
      .parquet(snapDir(id).toString)
    val line = if (parts.nonEmpty) s"$kind|${parts.mkString(",")}" else kind
    val out = fs.create(metaFile(id)) // marker written last = commit point
    try out.write(line.getBytes("UTF-8")) finally out.close()
    id
  }

  /** CREATE OR REPLACE TABLE AS (D7): new `base` snapshot; history is kept.
    * `partitionBy` (S4) lays the snapshot out hive-style so partition-key
    * filters prune directories at scan time — the 100 TB table layout. */
  def createOrReplace(df: DataFrame, partitionBy: Seq[String] = Seq.empty): Long =
    commit(df, "base", partitionBy)

  /** CREATE TABLE IF NOT EXISTS semantics (D3). */
  def createIfNotExists(df: DataFrame, partitionBy: Seq[String] = Seq.empty): Long =
    currentSnapshotId.getOrElse(commit(df, "base", partitionBy))

  /** Snapshot append (S7/D4): writes only the delta, in the table's
    * partition layout. */
  def append(df: DataFrame): Long = {
    require(exists, s"append to non-existent table at $root")
    commit(df, "append", partitionSpec())
  }

  /** Table state at a snapshot: nearest base ≤ id, unioned with appends.
    * Snapshot dirs are read separately and unioned (each dir does its own
    * hive partition discovery — one multi-path read would reject the
    * mixed snapshot-dir/partition-dir layout as conflicting structures). */
  def asOf(id: Long): DataFrame = {
    val snaps = snapshots().takeWhile(_._1 <= id)
    require(snaps.nonEmpty, s"no snapshot ≤ $id at $root")
    val fromBase = snaps.drop(snaps.lastIndexWhere(_._2 == "base"))
    fromBase.map(s => spark.read.parquet(snapDir(s._1).toString))
      .reduce(_ unionByName _)
  }

  /** Current table state. */
  def read(): DataFrame = asOf(currentSnapshotId.getOrElse(
    throw new IllegalStateException(s"table at $root does not exist")))

  /** The rows appended strictly after snapshot `id` — the incremental-read
    * path (an Iceberg incremental scan between snapshots). Returns None if
    * a `base` snapshot (replace/DELETE/UPDATE rewrite) intervened: deltas
    * are no longer sufficient and the caller must fall back to a full
    * read. Reading N append dirs scans ONLY the delta bytes. */
  def appendsSince(id: Long): Option[DataFrame] = {
    val later = snapshots().dropWhile(_._1 <= id)
    if (later.exists(_._2 != "append")) None
    else if (later.isEmpty) Some(read().limit(0)) // schema-preserving empty
    else Some(later.map(s => spark.read.parquet(snapDir(s._1).toString))
      .reduce(_ unionByName _))
  }

  /** DELETE FROM ... WHERE cond (D5) — copy-on-write, returns rows deleted. */
  def delete(cond: org.apache.spark.sql.Column): Long = {
    val parts = partitionSpec()
    val cur = read()
    val kept = cur.filter(!cond)
    val removed = cur.count() - kept.count()
    commit(kept, "base", parts)
    removed
  }

  /** UPDATE ... SET col = value WHERE cond (D6) — copy-on-write. */
  def update(cond: org.apache.spark.sql.Column,
             sets: Map[String, org.apache.spark.sql.Column]): Long = {
    import org.apache.spark.sql.functions.when
    val parts = partitionSpec()
    val cur = read()
    val updated = sets.foldLeft(cur) { case (df, (c, v)) =>
      df.withColumn(c, when(cond, v).otherwise(df(c)))
    }
    commit(updated, "base", parts)
    currentSnapshotId.get
  }

  /** DROP TABLE (D8). */
  def drop(): Unit = {
    writeGuard()
    val p = new Path(root)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
