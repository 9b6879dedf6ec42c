package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** One data file tracked by a snapshot manifest. `partition` is the table's
  * logical partition key value ("" for unpartitioned); `fingerprint` is the
  * lineage fingerprint of the INPUT that produced this partition — the
  * resume key. */
final case class FileEntry(path: String, rows: Long, partition: String,
                           fingerprint: String)

final case class SnapshotMeta(snapshot_id: Long, parent_id: Long,
                              operation: String, schema_ddl: String)

/** Iceberg-layout table IO: partitioned parquet data files + JSON
  * snapshot/manifest metadata with per-partition lineage fingerprints.
  *
  * No Iceberg runtime jar exists in this offline environment (SURVEY.md
  * §7.0), so the layout is provided by this module with the same moving
  * parts an Iceberg catalog would give us:
  *  - immutable data files under `data/`, never rewritten in place;
  *  - numbered snapshots (`_graft_meta/snapshot-N-meta.json` +
  *    `snapshot-N-files.jsonl`), each listing exactly the files that are
  *    part of that snapshot with per-partition lineage fingerprints;
  *  - an atomically-swapped `current` pointer (commit = pointer move);
  *  - time travel = reading an older snapshot id;
  *  - resume = diffing a new input's partition fingerprints against the
  *    current snapshot's and rewriting only changed partitions.
  *
  * Manifests are read/written with Spark's own JSON source — no bespoke
  * parser to drift.
  */
object TableIO {

  private[tables] def metaDir(dir: String): Path = Paths.get(dir, "_graft_meta")

  def currentSnapshotId(dir: String): Option[Long] = {
    val p = metaDir(dir).resolve("current")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  /** Write `df` as a new snapshot of the table at `dir`.
    *
    * `partitions`: per-partition lineage (partitionValue → fingerprint);
    * partitioned tables write one subdir per partition value of
    * `partitionCol`. Returns the new snapshot id. */
  def write(df: DataFrame, dir: String, operation: String,
            partitionCol: Option[String] = None,
            partitions: Map[String, String] = Map.empty): Long = {
    val spark = df.sparkSession
    val snapId = currentSnapshotId(dir).getOrElse(0L) + 1
    val dataDir = Paths.get(dir, "data", s"snap-$snapId")
    partitionCol match {
      case Some(c) =>
        df.write.mode(SaveMode.Overwrite).partitionBy(c).parquet(dataDir.toString)
      case None =>
        df.write.mode(SaveMode.Overwrite).parquet(dataDir.toString)
    }
    commitExisting(spark, dir, snapId, operation, df.schema.toDDL, partitionCol, partitions)
    snapId
  }

  /** Commit data already written under data/snap-<snapId> (used by writers
    * that reuse unchanged partition files from a parent snapshot via
    * hard links — see [[writeResumable]]). */
  private def commitExisting(spark: SparkSession, dir: String, snapId: Long,
                             operation: String, schemaDdl: String,
                             partitionCol: Option[String],
                             partitions: Map[String, String],
                             knownRows: Map[(String, String), Long] = Map.empty): Unit = {
    val dataDir = Paths.get(dir, "data", s"snap-$snapId")
    val dataFiles = listParquet(dataDir).map { p =>
      val rel = Paths.get(dir).relativize(p).toString
      val part = partitionCol.map { c =>
        p.getParent.getFileName.toString.stripPrefix(s"$c=")
      }.getOrElse("")
      // files carried over from a parent snapshot (hard links) keep their
      // recorded row counts — only freshly written files get a footer read
      val rows = knownRows.getOrElse((part, p.getFileName.toString), rowCount(p))
      FileEntry(rel, rows, part, partitions.getOrElse(part, ""))
    }
    // partitions with ZERO data files still carry lineage (path "" marks the
    // synthetic row; read() skips it) — otherwise an empty bucket's
    // fingerprint is never persisted and resume rebuilds it every run
    val present = dataFiles.map(_.partition).toSet
    val files = dataFiles ++ partitions.collect {
      case (p, fp) if !present.contains(p) => FileEntry("", 0L, p, fp)
    }
    val meta = metaDir(dir)
    Files.createDirectories(meta)
    import spark.implicits._
    val parent = currentSnapshotId(dir).getOrElse(0L)
    spark.createDataset(Seq(SnapshotMeta(snapId, parent, operation, schemaDdl)))
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .json(meta.resolve(s"snapshot-$snapId-meta.json").toString)
    spark.createDataset(files).coalesce(1).write.mode(SaveMode.Overwrite)
      .json(meta.resolve(s"snapshot-$snapId-files.jsonl").toString)
    // atomic commit: write pointer to temp, move into place
    val tmp = meta.resolve("current.tmp")
    Files.write(tmp, snapId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, meta.resolve("current"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Snapshot metadata row (operation, schema DDL, parent pointer). */
  def snapshotMeta(spark: SparkSession, dir: String, snapshotId: Long): Option[SnapshotMeta] = {
    val p = metaDir(dir).resolve(s"snapshot-$snapshotId-meta.json")
    if (!Files.exists(p)) None
    else {
      import spark.implicits._
      spark.read
        .schema("snapshot_id BIGINT, parent_id BIGINT, operation STRING, schema_ddl STRING")
        .json(p.toString).as[SnapshotMeta].collect().headOption
    }
  }

  /** Files of a snapshot (default: current). Time travel to an id whose
    * metadata is gone — expired by [[expireSnapshots]], or never committed —
    * fails loudly HERE with the cause, not with a bare path error three
    * layers down. */
  def manifest(spark: SparkSession, dir: String,
               snapshotId: Option[Long] = None): Seq[FileEntry] = {
    val snap = snapshotId.orElse(currentSnapshotId(dir)).getOrElse(
      throw new IllegalStateException(s"no snapshot at $dir"))
    val p = metaDir(dir).resolve(s"snapshot-$snap-files.jsonl")
    if (!Files.exists(p))
      throw new IllegalStateException(
        s"snapshot $snap at $dir does not exist or has been expired " +
        s"(committed snapshots: ${snapshotIds(dir).mkString(", ")})")
    import spark.implicits._
    spark.read.schema("path STRING, rows BIGINT, partition STRING, fingerprint STRING")
      .json(p.toString)
      .as[FileEntry].collect().toSeq
  }

  /** All COMMITTED snapshot ids at `dir`, ascending (gaps where ids were
    * expired). */
  def snapshotIds(dir: String): Seq[Long] = {
    val meta = metaDir(dir)
    if (!Files.exists(meta)) return Seq.empty
    val s = Files.list(meta)
    val re = "snapshot-(\\d+)-meta\\.json".r
    try s.iterator().asScala.flatMap(p => p.getFileName.toString match {
      case re(id) => Some(id.toLong)
      case _ => None
    }).toSeq.sorted
    finally s.close()
  }

  /** Iceberg `expire_snapshots` analog: retain the `keepLast` highest
    * committed snapshot ids (which always include the `current` pointer's),
    * delete every older snapshot's metadata AND its `data/snap-<id>/`
    * directory. Returns the expired ids.
    *
    * Hard-link aware BY LAYOUT, not by refcounting: every snapshot's
    * manifest references files only under its own snap dir —
    * [[writeResumable]] carries unchanged partitions forward as hard LINKS
    * into the new snapshot's dir — so deleting an expired snapshot's dir
    * removes directory entries only. A carried file's inode survives
    * through every retained snapshot that links it and its bytes are
    * reclaimed by the filesystem exactly when the LAST retainer expires.
    * Time travel to an expired id fails loudly ([[manifest]]).
    *
    * Production note (object stores): this layout trades Iceberg's
    * shared-file refcount walk for hard links, which need a POSIX
    * filesystem; on S3-like stores the resumable writer would copy (or
    * remote-link) instead, and expiry would diff retained manifests the
    * same way Iceberg's delete-orphans does. */
  def expireSnapshots(dir: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val cur = currentSnapshotId(dir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $dir"))
    val ids = snapshotIds(dir)
    require(ids.contains(cur), s"current pointer $cur has no metadata at $dir")
    val retained = ids.takeRight(keepLast).toSet + cur
    val expired = ids.filterNot(retained)
    for (id <- expired) {
      // data first, metadata second: a crash mid-expiry leaves a snapshot
      // whose manifest names missing files (read fails loudly) rather than
      // orphan data files that nothing references or ever deletes
      deleteRecursively(Paths.get(dir, "data", s"snap-$id"))
      deleteRecursively(metaDir(dir).resolve(s"snapshot-$id-files.jsonl"))
      deleteRecursively(metaDir(dir).resolve(s"snapshot-$id-meta.json"))
      deleteRecursively(metaDir(dir).resolve(s"snapshot-$id-stats.jsonl"))
    }
    expired
  }

  /** Read a snapshot (default current) — time travel via `snapshotId`. An
    * empty snapshot (zero data files — e.g. an empty source committed by
    * [[writeResumable]]) reads as an empty DataFrame with the snapshot's
    * recorded schema rather than Spark's zero-path inference error.
    *
    * Partitioned tables read with `basePath` = the snapshot's data dir so
    * the partition COLUMN is inferred from the `col=value` directories —
    * without it, empty and non-empty snapshots of one table would present
    * two different schemas (the recorded DDL includes the partition column;
    * a bare leaf-file read strips it). Columns are then re-ordered to the
    * recorded DDL (inference appends partition columns last). */
  def read(spark: SparkSession, dir: String,
           snapshotId: Option[Long] = None): DataFrame =
    readFiltered(spark, dir, snapshotId, _ => true)

  /** [[read]] restricted to the manifest paths `keep` accepts — the scan
    * half of [[DataSkipping.readBetween]]'s file pruning. The recorded
    * schema/column-order handling is identical to a full read; an
    * everything-pruned snapshot reads as the same empty frame an empty
    * snapshot does. */
  private[tables] def readFiltered(spark: SparkSession, dir: String,
                                   snapshotId: Option[Long],
                                   keep: String => Boolean): DataFrame = {
    val snap = snapshotId.orElse(currentSnapshotId(dir)).getOrElse(
      throw new IllegalStateException(s"no snapshot at $dir"))
    val files = manifest(spark, dir, Some(snap))
      .filter(_.path.nonEmpty) // skip synthetic empty-partition lineage rows
      .filter(f => keep(f.path))
      .map(f => s"$dir/${f.path}")
    val ddl = snapshotMeta(spark, dir, snap).map(_.schema_ddl).getOrElse("")
    if (files.nonEmpty) {
      val reader = spark.read
        .option("basePath", Paths.get(dir, "data", s"snap-$snap").toString)
      if (ddl.isEmpty) reader.parquet(files: _*)
      else {
        // apply the RECORDED schema: without it Spark's partition-column
        // type inference turns a numeric-LOOKING string partition value
        // ("01") into an integer (1) — silently mutating the value, and
        // corrupting directory names + lineage keys if the frame is ever
        // rewritten (compact). With an explicit schema the partition
        // column keeps its committed type and the raw directory string.
        // Spark still APPENDS partition columns after data columns, so the
        // recorded column ORDER is restored with a select.
        val want = org.apache.spark.sql.types.StructType.fromDDL(ddl)
        val df = reader.schema(want).parquet(files: _*)
        df.select(want.fieldNames.filter(df.columns.contains)
          .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      }
    } else {
      require(ddl.nonEmpty, s"empty snapshot $snap at $dir records no schema")
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(ddl))
    }
  }

  /** Per-partition fingerprints recorded in a snapshot (the lineage). */
  def lineage(spark: SparkSession, dir: String,
              snapshotId: Option[Long] = None): Map[String, String] =
    manifest(spark, dir, snapshotId)
      .groupBy(_.partition).map { case (p, fs) => p -> fs.head.fingerprint }

  /** Resumable partitioned write: compares each partition's input
    * fingerprint against the current snapshot's lineage; partitions whose
    * fingerprint matches are carried over via hard links (no recompute, no
    * rewrite), only changed/new partitions have `compute(partition)` run.
    * Returns (snapshotId, rebuiltPartitions, reusedPartitions). */
  def writeResumable(spark: SparkSession, dir: String, operation: String,
                     partitionCol: String,
                     inputFingerprints: Map[String, String],
                     compute: Set[String] => DataFrame): (Long, Set[String], Set[String]) = {
    // commitExisting recovers partition values by PARSING the Spark-written
    // directory names; a value Spark escapes in paths (':', '/', space, …)
    // would parse back escaped, miss the fingerprint map, and silently
    // degrade resume to a full rebuild every run — reject it up front
    inputFingerprints.keys.foreach { p =>
      require(p.matches("[A-Za-z0-9_.-]+"),
        s"partition value '$p' contains path-escaped characters; use a path-safe encoding")
    }
    val parentManifest =
      if (currentSnapshotId(dir).isDefined) manifest(spark, dir) else Seq.empty[FileEntry]
    val prior = parentManifest.groupBy(_.partition)
      .map { case (p, fs) => p -> fs.head.fingerprint }
    val reuse = inputFingerprints.keySet.filter(p => prior.get(p).contains(inputFingerprints(p)))
    val rebuild = inputFingerprints.keySet -- reuse

    val snapId = currentSnapshotId(dir).getOrElse(0L) + 1
    val dataDir = Paths.get(dir, "data", s"snap-$snapId")
    // a prior attempt may have written data files here and died before the
    // pointer commit (commit = the atomic `current` move, so an existing
    // snap-<id> dir above the current pointer is by definition uncommitted
    // garbage); without this purge, carried hard links land NEXT TO the
    // orphans and the manifest double-counts the partition
    deleteRecursively(dataDir)
    Files.createDirectories(dataDir)

    var rebuiltSchemaDdl: Option[String] = None
    if (rebuild.nonEmpty) {
      val computed = compute(rebuild)
      rebuiltSchemaDdl = Some(computed.schema.toDDL)
      // partitionBy from T tasks writes up to T files PER partition value —
      // the classic small-files explosion (manifest bloat, a footer read per
      // file on every commit, an open per file on every read). One shuffle on
      // the partition column collapses that to one file per value; at
      // production scale cap file size with spark.sql.files.maxRecordsPerFile
      // (Spark re-splits oversized partitions at write).
      computed.repartition(org.apache.spark.sql.functions.col(partitionCol))
        .write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCol).parquet(dataDir.toString)
    }
    // carry over unchanged partitions from the parent snapshot via hard
    // links (synthetic empty-partition rows have no file to link)
    val carried = parentManifest.filter(f => reuse.contains(f.partition) && f.path.nonEmpty)
    for (f <- carried) {
      val src = Paths.get(dir, f.path)
      val dstDir = dataDir.resolve(s"$partitionCol=${f.partition}")
      Files.createDirectories(dstDir)
      Files.createLink(dstDir.resolve(src.getFileName), src)
    }
    // schema lineage: the rebuilt DataFrame's DDL, or — when everything was
    // reused via hard links — the parent snapshot's recorded schema
    val schemaDdl = rebuiltSchemaDdl.getOrElse(
      currentSnapshotId(dir).flatMap(p => snapshotMeta(spark, dir, p))
        .map(_.schema_ddl).getOrElse(""))
    val knownRows = carried.map { f =>
      (f.partition, Paths.get(f.path).getFileName.toString) -> f.rows
    }.toMap
    commitExisting(spark, dir, snapId, operation, schemaDdl, Some(partitionCol),
      inputFingerprints, knownRows)
    (snapId, rebuild, reuse)
  }

  /** Iceberg `rewrite_data_files` analog: rewrite the CURRENT snapshot's
    * data as a new compacted snapshot — same rows, fewer right-sized files —
    * and commit it with operation "compact". Content, schema, and lineage
    * fingerprints carry over unchanged (compaction moves bytes, not data),
    * so a resumable writer's next run still reuses every partition.
    *
    * Why it exists: every hourly `writeResumable` commit rewrites only the
    * CHANGED partitions but leaves each rebuilt partition with however many
    * files its write produced; streaming-ish ingest accretes small files,
    * and at 10^12 rows the table's read cost becomes open()s and footer
    * reads, not bytes. Compaction collapses a partitioned table to one file
    * per partition value (ONE shuffle on the partition column — the same
    * collapse writeResumable applies to rebuilt partitions) and an
    * unpartitioned table to `ceil(rows / targetRowsPerFile)` files.
    *
    * No-op safe: if the table is already compact the current snapshot id is
    * returned and nothing is written. The pre-compaction snapshot stays
    * time-travelable until [[expireSnapshots]] reclaims it.
    */
  def compact(spark: SparkSession, dir: String,
              partitionCol: Option[String] = None,
              targetRowsPerFile: Long = 10_000_000L): Long = {
    require(targetRowsPerFile > 0, s"targetRowsPerFile must be positive")
    val cur = currentSnapshotId(dir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $dir"))
    val files = manifest(spark, dir, Some(cur)).filter(_.path.nonEmpty)
    val targetFiles = math.max(1L,
      (files.map(_.rows).sum + targetRowsPerFile - 1) / targetRowsPerFile)
    val alreadyCompact = partitionCol match {
      case Some(_) => files.groupBy(_.partition).values.forall(_.size <= 1)
      case None => files.size <= targetFiles
    }
    if (alreadyCompact) return cur

    val df = read(spark, dir, Some(cur))
    val snapId = cur + 1
    val dataDir = Paths.get(dir, "data", s"snap-$snapId")
    deleteRecursively(dataDir) // uncommitted leftovers of a crashed attempt
    partitionCol match {
      case Some(c) =>
        df.repartition(org.apache.spark.sql.functions.col(c))
          .write.mode(SaveMode.Overwrite).partitionBy(c).parquet(dataDir.toString)
      case None =>
        df.repartition(targetFiles.toInt)
          .write.mode(SaveMode.Overwrite).parquet(dataDir.toString)
    }
    val schemaDdl = snapshotMeta(spark, dir, cur).map(_.schema_ddl).getOrElse("")
    commitExisting(spark, dir, snapId, "compact", schemaDdl, partitionCol,
      lineage(spark, dir, Some(cur)))
    snapId
  }

  /** MERGE INTO analog (copy-on-write, like Delta/Iceberg CoW): applies a
    * keyed changeset to the current snapshot and commits the result as a
    * NEW snapshot — the old one stays time-travelable until
    * [[expireSnapshots]] reclaims it.
    *
    * `changes` carries the key column plus an `opCol` of `'upsert'` or
    * `'delete'`: an upsert row replaces every base row with its key (or
    * inserts if absent), a delete removes the key. Duplicate keys in one
    * changeset are refused loudly — "which copy wins" must not depend on
    * shuffle order.
    *
    * Scale shape: one anti-join on the key (base side never collected,
    * changeset side usually broadcast-size) + a union — the whole table is
    * rewritten, which is the honest CoW trade. A table whose merges touch
    * few partitions should instead route through [[writeResumable]], whose
    * fingerprint lineage rewrites only changed partitions; this entry
    * point is the keyed-changeset surface on top of the same snapshot log. */
  def merge(spark: SparkSession, dir: String, changes: DataFrame,
            keyCol: String, opCol: String = "_op"): Long = {
    val c = org.apache.spark.sql.functions.col _
    val ops = changes.select(opCol).distinct()
      .collect().map(r => Option(r.getString(0)).getOrElse("<null>")).toSet
    require(ops.subsetOf(Set("upsert", "delete")),
      s"unknown ops in changeset: ${(ops -- Set("upsert", "delete")).mkString(", ")}")
    val dupKeys = changes.groupBy(keyCol)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .filter(c("n") > 1).limit(5).collect().map(_.get(0))
    require(dupKeys.isEmpty,
      s"changeset has duplicate keys (shuffle-order-dependent winner): ${dupKeys.mkString(", ")}")
    val base = read(spark, dir)
    val survivors = base.join(
      changes.select(keyCol).distinct(), Seq(keyCol), "left_anti")
    val upserts = changes.filter(c(opCol) === "upsert").drop(opCol)
      .select(base.columns.map(c).toIndexedSeq: _*)
    write(survivors.unionByName(upserts), dir, "merge")
  }

  // ------------------------------------------------------------------ helpers
  private def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
      finally s.close() // Files.walk holds open DirectoryStreams (fd leak)
    }

  private def listParquet(root: Path): Seq[Path] = {
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq.sortBy(_.toString)
    finally s.close()
  }

  /** Row count from the parquet footer (no data read). */
  private def rowCount(p: Path): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.{Path => HPath}
    val in = HadoopInputFile.fromPath(new HPath(p.toString), new Configuration())
    val r = ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }
}
