package graft.tables

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file column min/max bounds recorded for one snapshot. `min`/`max`
  * are the bound values rendered as strings in the column's own type
  * (null when every value in the file is null); `dtype` is the column's
  * recorded SQL type, which decides how the bounds compare at prune time. */
final case class FileColStats(path: String, column: String, dtype: String,
                              min: Option[String], max: Option[String],
                              nulls: Long, rows: Long)

/** File-level min/max data skipping — the Iceberg manifest-stats analog
  * for [[TableIO]] tables. `analyze` records per-(file, column) bounds as
  * a snapshot sidecar (`snapshot-N-stats.jsonl`); `readBetween` prunes
  * every file whose recorded [min, max] cannot intersect the requested
  * range BEFORE Spark plans the scan, then applies the range predicate to
  * the survivors.
  *
  * The contract that keeps this safe:
  *  - pruning is CONSERVATIVE — a file with no stats row for the probe
  *    column (never analyzed, or an all-null bound) is always kept;
  *  - the residual filter always runs, so results never depend on the
  *    sidecar being present, fresh, or even correct — stats only ever
  *    REMOVE work, and [[DataSkippingSpec]] pins result identity between
  *    the pruned and unpruned reads;
  *  - stats bind to a snapshot id (immutable files), so time travel prunes
  *    with that snapshot's own bounds and [[TableIO.expireSnapshots]]
  *    reclaims the sidecar with the snapshot.
  *
  * Scale shape: `analyze` is ONE distributed scan (per-file min/max is a
  * map-side-combined agg keyed on `input_file_name`, shuffling one row per
  * file×column); pruning reads only the manifest-sized sidecar on the
  * driver — at 100 TB the win is proportional to how well the layout
  * clusters the column (range partitioning, [[ZOrder]]), exactly like
  * Iceberg/Delta file skipping.
  */
object DataSkipping {

  private def statsPath(dir: String, snap: Long) =
    TableIO.metaDir(dir).resolve(s"snapshot-$snap-stats.jsonl")

  private val StatsSchema =
    "path STRING, column STRING, dtype STRING, min STRING, max STRING, nulls BIGINT, rows BIGINT"

  /** Compute and commit per-file min/max bounds for `columns` of a
    * snapshot (default: current). One distributed scan; overwrites any
    * previous sidecar for that snapshot. Returns the number of stats rows
    * (files × columns). */
  def analyze(spark: SparkSession, dir: String, columns: Seq[String],
              snapshotId: Option[Long] = None): Long = {
    require(columns.nonEmpty, "analyze needs at least one column")
    val snap = snapshotId.orElse(TableIO.currentSnapshotId(dir)).getOrElse(
      throw new IllegalStateException(s"no snapshot at $dir"))
    val df = TableIO.read(spark, dir, Some(snap))
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in snapshot $snap: ${missing.mkString(", ")}")
    val dtypes = columns.map(c => c -> df.schema(c).dataType.sql).toMap
    val aggs = columns.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).cast("string").as(s"_min$i"),
          max(col(c)).cast("string").as(s"_max$i"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null$i"))
    }
    val byFile = df.groupBy(input_file_name().as("_file"))
      .agg(count(lit(1)).as("_rows"), aggs: _*)
      .collect() // one row per data FILE — manifest-sized, not data-sized
    val stats = byFile.toSeq.flatMap { r =>
      // input_file_name is an absolute URI; the manifest path is relative
      // to the table dir — recover it by suffix under data/
      val uri = r.getAs[String]("_file")
      val at = uri.indexOf("/data/snap-")
      require(at >= 0, s"scanned file $uri is not under the table's data dir")
      val rel = uri.substring(at + 1)
      columns.zipWithIndex.map { case (c, i) =>
        FileColStats(rel, c, dtypes(c),
          Option(r.getAs[String](s"_min$i")), Option(r.getAs[String](s"_max$i")),
          r.getAs[Long](s"_null$i"), r.getAs[Long]("_rows"))
      }
    }
    import spark.implicits._
    spark.createDataset(stats).coalesce(1).write.mode(SaveMode.Overwrite)
      .json(statsPath(dir, snap).toString)
    stats.size.toLong
  }

  /** The recorded sidecar for a snapshot ([[analyze]] must have run). */
  def stats(spark: SparkSession, dir: String,
            snapshotId: Option[Long] = None): Seq[FileColStats] = {
    val snap = snapshotId.orElse(TableIO.currentSnapshotId(dir)).getOrElse(
      throw new IllegalStateException(s"no snapshot at $dir"))
    val p = statsPath(dir, snap)
    if (!Files.exists(p)) return Seq.empty
    import spark.implicits._
    spark.read.schema(StatsSchema).json(p.toString)
      .as[FileColStats].collect().toSeq
  }

  /** True when a [min, max] bound pair can intersect [lo, hi] under the
    * column's type. Numeric types compare as exact decimals (string
    * rendering of long/double/decimal roundtrips exactly, so no float
    * widening can flip a bound); everything else compares as the rendered
    * string — correct for the sortable renderings (DATE, TIMESTAMP) and
    * for STRING itself. Null bounds (all-null file) never prune. */
  private[tables] def mayOverlap(dtype: String, mn: Option[String], mx: Option[String],
                                 lo: String, hi: String): Boolean = {
    val numeric = Set("TINYINT", "SMALLINT", "INT", "BIGINT", "FLOAT", "DOUBLE")
    val isNum = numeric.contains(dtype) || dtype.startsWith("DECIMAL")
    (mn, mx) match {
      case (Some(a), Some(b)) =>
        if (isNum) {
          val (ba, bb) = (BigDecimal(a), BigDecimal(b))
          !(bb < BigDecimal(lo) || ba > BigDecimal(hi))
        } else !(b < lo || a > hi)
      case _ => true // no usable bounds — keep the file
    }
  }

  /** Manifest paths of the files a range probe must scan: everything the
    * sidecar cannot PROVE disjoint from [lo, hi]. Also the spec's hook for
    * asserting that pruning actually pruned. */
  def survivingFiles(spark: SparkSession, dir: String, column: String,
                     lo: String, hi: String,
                     snapshotId: Option[Long] = None): Seq[String] = {
    val snap = snapshotId.orElse(TableIO.currentSnapshotId(dir)).getOrElse(
      throw new IllegalStateException(s"no snapshot at $dir"))
    val bounds = stats(spark, dir, Some(snap)).filter(_.column == column)
      .map(s => s.path -> s).toMap
    TableIO.manifest(spark, dir, Some(snap)).map(_.path).filter(_.nonEmpty)
      .filter { p =>
        bounds.get(p) match {
          case Some(s) => mayOverlap(s.dtype, s.min, s.max, lo, hi)
          case None => true // unanalyzed file — conservative keep
        }
      }
  }

  /** `SELECT * WHERE column BETWEEN lo AND hi` over a snapshot, scanning
    * only [[survivingFiles]]. `lo`/`hi` are rendered in the column's type
    * (they are cast back for the residual predicate). */
  def readBetween(spark: SparkSession, dir: String, column: String,
                  lo: String, hi: String,
                  snapshotId: Option[Long] = None): DataFrame = {
    val snap = snapshotId.orElse(TableIO.currentSnapshotId(dir)).getOrElse(
      throw new IllegalStateException(s"no snapshot at $dir"))
    val keep = survivingFiles(spark, dir, column, lo, hi, Some(snap)).toSet
    val df = TableIO.readFiltered(spark, dir, Some(snap), keep.contains)
    val dt = df.schema(column).dataType
    df.where(col(column).between(lit(lo).cast(dt), lit(hi).cast(dt)))
  }
}
