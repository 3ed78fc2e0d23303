package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Persistence for indexed frames — Spark-native analog of the
  * reference's write/open/have lifecycle
  * (/root/reference/src/main/scala/com/futurice/iodf/Dfs.scala:489-554:
  * writeIndexedDf / openIndexedDf / haveIndexedDf over a memory-mapped
  * dir).
  *
  * Layout: `<dir>/data` (the rows, parquet) and `<dir>/index` (the
  * (field,value,f) index frame, parquet, sorted by field,value so
  * min/max stats give per-file pruning on index lookups). Parquet is
  * the mmap analog — reopening is O(footers), columns decode on
  * demand, and both parts scale out instead of living in one file.
  */
object Store {

  // ------------------------------------------------------- generations
  //
  // Index GENERATIONS make compaction reader-safe. The live index is
  // the HIGHEST COMMITTED generation: `<dir>/index` is generation 0,
  // each compact writes a complete replacement under
  // `<dir>/index_g<k+1>` and marks it live by creating `_COMMITTED`
  // (created only after the parquet write finishes — the atomic
  // publish point). Readers resolve the highest committed generation
  // when their frame is built; compact retains the immediately
  // previous generation, so a reader planned before a compact keeps
  // reading files that still exist. Only generations at least two
  // compacts old are reclaimed. This is the standard log-structured
  // publish protocol (what table formats do with a manifest), done
  // with directories + a marker file so it works on any Hadoop FS.

  private def fsFor(spark: SparkSession, p: String) = {
    val path = new org.apache.hadoop.fs.Path(p)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** (root path, generation number) of the highest committed index
    * generation; generation 0 is the base `<dir>/index` layout.
    */
  private[core] def currentIndexRoot(spark: SparkSession,
                                     dir: String): (String, Int) = {
    val (fs, base) = fsFor(spark, dir)
    val gens =
      if (!fs.exists(base)) Seq.empty[Int]
      else fs.listStatus(base).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("index_g"))
        .flatMap(n => scala.util.Try(n.stripPrefix("index_g").toInt).toOption)
        .filter(g => fs.exists(
          new org.apache.hadoop.fs.Path(s"$dir/index_g$g/_COMMITTED")))
    if (gens.isEmpty) (s"$dir/index", 0)
    else (s"$dir/index_g${gens.max}", gens.max)
  }

  // -------------------------------------------------- snapshot manifests
  // Each index segment records WHICH data files its append persisted
  // (a `_MANIFEST` text file inside the segment dir — parquet readers
  // ignore `_`-prefixed files). The manifest is what makes segments
  // SNAPSHOTS: "the store as of segment N" = the union of manifests
  // 0..N, which is exactly the manifest-list protocol table formats
  // (Iceberg/Delta) use for time travel — no data is ever copied, a
  // snapshot read just plans over fewer files. File NAMES are stored
  // relative to <dir>/data so the store directory can be relocated.

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
                            segDir: String, files: Seq[String]): Unit = {
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$segDir/_MANIFEST"), true)
    try out.write(files.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
                           segDir: String): Option[Seq[String]] = {
    val p = new org.apache.hadoop.fs.Path(s"$segDir/_MANIFEST")
    if (!fs.exists(p)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try {
        in.readFully(buf)
        Some(new String(buf, "UTF-8")
          .split("\n").toSeq.map(_.trim).filter(_.nonEmpty))
      } finally in.close()
    }
  }

  // ------------------------------------------------------ schema sidecars
  // Each segment also records the PHYSICAL SCHEMA of the data files
  // its append persisted (`_SCHEMA`, the StructType json) — the
  // add-column schema-evolution protocol table formats use: readers
  // build the live schema from metadata (union of segment schemas in
  // first-seen field order) instead of sniffing parquet footers
  // (Spark's mergeSchema — O(files) footer reads, the wrong shape at
  // 100 TB), and old segments' missing columns read as null. Because
  // the union is computed over the SNAPSHOT's segments, time travel
  // ([[openAt]]) automatically serves the schema as of that snapshot.
  // Evolution is ADD-COLUMN ONLY: a changed type for an existing
  // field fails loudly at open (silent coercion corrupts data).

  private def writeSchemaSidecar(fs: org.apache.hadoop.fs.FileSystem,
                                 segDir: String,
                                 schema: org.apache.spark.sql.types.StructType): Unit = {
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$segDir/_SCHEMA"), true)
    try out.write(schema.json.getBytes("UTF-8"))
    finally out.close()
  }

  private def readSchemaSidecar(fs: org.apache.hadoop.fs.FileSystem,
                                segDir: String): Option[org.apache.spark.sql.types.StructType] = {
    val p = new org.apache.hadoop.fs.Path(s"$segDir/_SCHEMA")
    if (!fs.exists(p)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try {
        in.readFully(buf)
        Some(org.apache.spark.sql.types.DataType
          .fromJson(new String(buf, "UTF-8"))
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      } finally in.close()
    }
  }

  /** union of per-segment schemas, first-seen field order. Fields
    * absent from any contributing segment become nullable (their
    * rows read as null); a same-name field with a DIFFERENT type is
    * a contract violation (add-column only), failed loudly.
    */
  private[core] def unionSchema(
      ss: Seq[org.apache.spark.sql.types.StructType]): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val order = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    val seenIn = scala.collection.mutable.HashMap.empty[String, Int]
    ss.foreach(_.fields.foreach { f =>
      seenIn(f.name) = seenIn.getOrElse(f.name, 0) + 1
      order.get(f.name) match {
        case None => order(f.name) = f
        case Some(g) =>
          require(g.dataType == f.dataType,
            s"schema evolution is add-column only: field '${f.name}' " +
              s"changed type ${g.dataType.simpleString} -> ${f.dataType.simpleString}")
          if (f.nullable && !g.nullable) order(f.name) = g.copy(nullable = true)
      }
    })
    StructType(order.values.toSeq.map { f =>
      if (seenIn(f.name) < ss.size) f.copy(nullable = true) else f
    })
  }

  /** the metadata-derived schema of the store (as of snapshot
    * `upTo`, or live), or None when any participating segment
    * predates the sidecar protocol — all-or-nothing, because a
    * sidecar-less segment may carry columns the union cannot see,
    * and an explicit read schema would silently DROP them.
    */
  private def storedSchema(spark: SparkSession, dir: String,
                           upTo: Option[Int]): Option[org.apache.spark.sql.types.StructType] = {
    val (root, _) = currentIndexRoot(spark, dir)
    val (fs, _) = fsFor(spark, dir)
    val ids = snapshots(spark, dir).filter(id => upTo.forall(id <= _))
    if (ids.isEmpty) None
    else {
      val sides = ids.map(id => readSchemaSidecar(fs, s"$root/seg_$id"))
      if (sides.exists(_.isEmpty)) None
      else Some(unionSchema(sides.flatten))
    }
  }

  /** the store's data frame under the evolution protocol: metadata
    * schema when every segment carries a sidecar (missing columns of
    * old segments read as null), otherwise the legacy plain read.
    */
  private def dataFrame(spark: SparkSession, dir: String): DataFrame =
    storedSchema(spark, dir, None) match {
      case Some(u) => spark.read.schema(u).parquet(s"$dir/data")
      case None    => spark.read.parquet(s"$dir/data")
    }

  /** write rows + index as segment 0 (reference writeIndexedDf).
    * Only the store-owned `data/` and index subdirs are cleared —
    * never the whole target dir, which may be a path the caller also
    * keeps unrelated files under (a recursive root delete here would
    * silently destroy them).
    */
  def write(df: DataFrame, dir: String, spec: IndexSpec): Unit = {
    val spark = df.sparkSession
    val (fs, base) = fsFor(spark, dir)
    // store-owned generation dirs are EXACTLY index_g<int> — the same
    // numeric parse currentIndexRoot applies, so a caller's unrelated
    // "index_global/" or "index_gen_notes/" is never deleted
    val stale = Seq(s"$dir/data", s"$dir/index") ++
      (if (fs.exists(base)) fs.listStatus(base).toSeq.map(_.getPath.getName)
          .filter(n => n.startsWith("index_g") &&
            scala.util.Try(n.stripPrefix("index_g").toInt).isSuccess)
          .map(n => s"$dir/$n")
       else Nil)
    stale.foreach { sub => // fresh store: clear prior segments + generations
      fs.delete(new org.apache.hadoop.fs.Path(sub), true)
    }
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/data")
    // index the WRITTEN data, not the input plan: re-executing `df`
    // for the index would recompute the whole upstream (2× cost) and,
    // for a nondeterministic input (sample/rand/changing source),
    // index a DIFFERENT row set than the one persisted
    val persisted = spark.read.parquet(s"$dir/data")
    val ix = IndexedFrame(persisted, spec)
    ix.entries.write.mode(SaveMode.Overwrite).parquet(s"$dir/index/seg_0")
    // optional per-entry row-refs artifact (the reference's bitmap
    // payload, Dfs.scala:330-408) — segment-parallel to the f index
    if (spec.rowRefs.isDefined)
      ix.rowRefs.write.mode(SaveMode.Overwrite).parquet(s"$dir/index/rows_0")
    val dataNames = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/data"))
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSeq
    writeManifest(fs, s"$dir/index/seg_0", dataNames)
    writeSchemaSidecar(fs, s"$dir/index/seg_0", persisted.schema)
  }

  /** reopen a written frame + its persisted index (openIndexedDf);
    * the served index is the merge-on-read union of all segments
    */
  def open(spark: SparkSession, dir: String, spec: IndexSpec): StoredFrame =
    StoredFrame(
      IndexedFrame(dataFrame(spark, dir), spec),
      mergedIndex(spark, dir),
      rowRefsFrame(spark, dir))

  /** Available snapshot ids of the live generation, ascending — each
    * append segment with a manifest is one snapshot; pass an id to
    * [[openAt]].
    */
  def snapshots(spark: SparkSession, dir: String): Seq[Int] = {
    val (root, _) = currentIndexRoot(spark, dir)
    val (fs, _) = fsFor(spark, dir)
    val rp = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rp)) Nil
    else fs.listStatus(rp).map(_.getPath.getName).toSeq
      .collect { case s if s.startsWith("seg_") => s.drop(4).toInt }
      .filter(id => readManifest(fs, s"$root/seg_$id").isDefined)
      .sorted
  }

  /** TIME-TRAVEL read: the store AS OF append snapshot `upToSeg` —
    * data is planned over exactly the files the manifests of segments
    * 0..upToSeg name (later appends invisible; nothing copied), the
    * served index is the merge of the same segments, row-refs
    * likewise. This is the reproducibility contract a training
    * pipeline needs ("train on snapshot N while ingest continues"):
    * at 100 TB a snapshot read costs the same as a live read over the
    * same rows, because both are just file lists handed to the
    * parquet scan. Snapshots live within the current generation;
    * [[compact]] collapses history to the latest (manifest union) —
    * the table-format log-compaction semantics.
    */
  def openAt(spark: SparkSession, dir: String, spec: IndexSpec,
             upToSeg: Int): StoredFrame = {
    import org.apache.spark.sql.functions._
    val (root, _) = currentIndexRoot(spark, dir)
    val (fs, _) = fsFor(spark, dir)
    val ids = snapshots(spark, dir).filter(_ <= upToSeg)
    require(ids.nonEmpty,
      s"no snapshot <= $upToSeg in $dir (available: ${snapshots(spark, dir)})")
    val files = ids.flatMap { id =>
      readManifest(fs, s"$root/seg_$id").getOrElse(Seq.empty)
    }.distinct.map(n => s"$dir/data/$n")
    // snapshot-scoped schema: columns appended AFTER upToSeg are
    // invisible, exactly as the data files are
    val data = storedSchema(spark, dir, Some(upToSeg)) match {
      case Some(u) => spark.read.schema(u).parquet(files: _*)
      case None    => spark.read.parquet(files: _*)
    }
    val segFrames = ids.map(id => spark.read.parquet(s"$root/seg_$id"))
    val index =
      if (segFrames.size == 1) segFrames.head
      else segFrames.reduce(_ unionByName _)
        .groupBy("field", "value").agg(sum("f").as("f"))
    val rows = {
      val present = ids.filter(id => fs.exists(
        new org.apache.hadoop.fs.Path(s"$root/rows_$id")))
      if (present.isEmpty) None
      else Some(present.map(id => spark.read.parquet(s"$root/rows_$id"))
        .reduce(_ unionByName _))
    }
    StoredFrame(IndexedFrame(data, spec), index, rows)
  }

  /** write-if-absent then open (haveIndexedDf). "Present" means BOTH
    * halves exist — a write() that died between the data and index
    * writes must be repaired by re-providing, not served half-broken
    * forever.
    */
  def have(spark: SparkSession, dir: String, spec: IndexSpec)
          (provide: => DataFrame): StoredFrame = {
    val (fs, _) = fsFor(spark, dir)
    val dataOk = fs.exists(new org.apache.hadoop.fs.Path(s"$dir/data"))
    val (root, _) = currentIndexRoot(spark, dir)
    val indexOk = fs.exists(new org.apache.hadoop.fs.Path(root))
    // a spec asking for row-refs is not satisfied by a store written
    // without them — re-provide rather than serve a refs-less frame
    val rowsOk = spec.rowRefs.isEmpty ||
      rowRefsFrame(spark, dir).isDefined
    if (!dataOk || !indexOk || !rowsOk) write(provide, dir, spec)
    open(spark, dir, spec)
  }

  /** incremental SEGMENTED append — the reference's merge-sorted
    * segment story (writeMergedIndexedDf, Dfs.scala:476-487) as
    * streaming ingest: new rows append as a parquet data segment and
    * the batch's index is written as a NEW index segment under
    * `<dir>/index/seg_<n>` — the existing index is neither read nor
    * rewritten, so append cost is O(batch), independent of how much
    * index already exists (the r2 version rewrote the full index per
    * batch — O(index) per append, quadratic over a stream's life).
    * Readers merge on read ([[mergedIndex]]); [[compact]] folds
    * accumulated segments back to one when read amplification grows.
    * Usable directly as a foreachBatch sink:
    * `.foreachBatch((b, _) => Store.append(b, dir, spec))`.
    *
    * SINGLE WRITER: append and [[compact]] may not run concurrently
    * against the same store (a compact that supersedes generation g
    * while an append is still writing a segment into g would strand
    * that segment — the generation protocol makes readers safe under
    * one writer, not writers safe against each other). foreachBatch
    * already serializes batches; schedule compact between batches
    * (e.g. inside the same foreachBatch, every N batches).
    *
    * DELIVERY: at-least-once, like any foreachBatch sink without a
    * transactional target — the data append and the index-segment
    * write are two separate commits, so a crash between them leaves
    * the batch's rows unindexed until the streaming engine redelivers
    * the batch (which then re-appends the rows: duplicates the
    * downstream exact-dedup pass absorbs, the reason dedup_exact
    * keys on content hash). Exactly-once needs an idempotent target
    * layout (e.g. batchId-keyed segments), which this minimal store
    * does not implement.
    */
  def append(batch: DataFrame, dir: String, spec: IndexSpec): Unit = {
    val spark = batch.sparkSession
    var (root, gen) = currentIndexRoot(spark, dir)
    val (fs, _) = fsFor(spark, dir)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    // NOTE: a committed g1 coexisting with a still-present <dir>/index
    // is EITHER a migration that died between commit and delete OR the
    // previous generation compact deliberately retains for in-flight
    // readers — indistinguishable here, and eagerly deleting would
    // break compact's one-generation retention window. Both cases are
    // benign (readers resolve the highest COMMITTED generation, never
    // the legacy dir) and the next compact reclaims the directory.
    // LEGACY MIGRATION: a pre-segment store wrote its index parquet
    // directly under <dir>/index. Appending seg_* files next to those
    // loose part-files would flip readers into segment mode and
    // silently DROP the whole original index from every merge — so
    // the legacy index becomes seg_0 of a fresh generation first.
    // CRASH-ATOMIC via the same publish protocol as compact: COPY the
    // legacy files into the (invisible, uncommitted) new generation,
    // publish with _COMMITTED, only then delete the legacy dir. Dying
    // before the commit leaves the legacy index untouched and live (a
    // retry overwrites the partial copy); dying after it leaves an
    // orphaned legacy dir that is invisible to readers and reclaimed
    // by the next compact (see NOTE above). A plain rename would be
    // O(1) but destroys the old location BEFORE the new one is
    // published — a crash in between loses the index.
    if (gen == 0 && fs.exists(rootPath) &&
        !fs.listStatus(rootPath).exists(_.getPath.getName.startsWith("seg_")) &&
        fs.listStatus(rootPath).nonEmpty) {
      val g1seg = new org.apache.hadoop.fs.Path(s"$dir/index_g1/seg_0")
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/index_g1"), true)
      org.apache.hadoop.fs.FileUtil.copy(fs, rootPath, fs, g1seg,
        false /* keep source until committed */,
        spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(s"$dir/index_g1/_COMMITTED"))
        .close()
      fs.delete(rootPath, true)
      root = s"$dir/index_g1"; gen = 1
    }
    val liveRoot = new org.apache.hadoop.fs.Path(root)
    val segId =
      if (!fs.exists(liveRoot)) 0
      else fs.listStatus(liveRoot)
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("seg_") => s.drop(4).toInt }
        .foldLeft(-1)(math.max) + 1
    // capture which data files THIS append writes (listing diff —
    // legal under the single-writer contract above), so the index
    // segment is built from a READ-BACK of exactly those files: the
    // same hazard write() guards against applies here, only sharper —
    // re-executing `batch` for the index would recompute the upstream
    // (2× cost) and, for a nondeterministic batch (sample/rand/
    // changing source), index a DIFFERENT row set than the one the
    // data append just persisted.
    val dataPath = new org.apache.hadoop.fs.Path(s"$dir/data")
    def dataFiles(): Set[String] =
      if (!fs.exists(dataPath)) Set.empty
      else fs.listStatus(dataPath).map(_.getPath.toString)
        .filterNot(p => {
          val n = p.substring(p.lastIndexOf('/') + 1)
          n.startsWith("_") || n.startsWith(".")
        }).toSet
    // VALIDATE BEFORE MUTATING: a type-changed column rejected only by
    // unionSchema at open()/compact() time would already have
    // persisted its data files and sidecar — leaving the store
    // unreadable (both open and compact throw) with no in-API repair
    // path. Checking the incoming batch against the existing segments'
    // union here makes the contract violation fail while the store is
    // still intact. Sidecar-less legacy stores skip the check (their
    // physical schema is unknowable without footer sniffing).
    storedSchema(spark, dir, None)
      .foreach(existing => unionSchema(Seq(existing, batch.schema)))
    val before = dataFiles()
    batch.write.mode(SaveMode.Append).parquet(s"$dir/data")
    val written = (dataFiles() -- before).toSeq.sorted
    if (written.nonEmpty) {
      val ix = IndexedFrame(spark.read.parquet(written: _*), spec)
      ix.entries
        .write.mode(SaveMode.Overwrite).parquet(s"$root/seg_$segId")
      // row-refs segment mirrors the f segment 1:1 — O(batch), the
      // existing refs are neither read nor rewritten
      if (spec.rowRefs.isDefined)
        ix.rowRefs
          .write.mode(SaveMode.Overwrite).parquet(s"$root/rows_$segId")
      writeManifest(fs, s"$root/seg_$segId",
        written.map(p => p.substring(p.lastIndexOf('/') + 1)))
      writeSchemaSidecar(fs, s"$root/seg_$segId",
        spark.read.parquet(written: _*).schema)
    }
  }

  /** merge-on-read over all index segments: union of the per-segment
    * (field,value,f) frames re-aggregated. One shuffle over index
    * entries (small by construction — the index is the aggregate, not
    * the data); parquet's field/value column stats still prune
    * per-segment point reads.
    *
    * SINGLE-SEGMENT FAST PATH: a store that was write()n once or has
    * been compacted holds exactly one segment, which is already
    * aggregated and written in sorted (field, value) clustering — it
    * is served AS-IS, so a point f() lookup is a pruned parquet read
    * with no shuffle at all (the mmap-bitmap-open analog; this is the
    * steady-state shape, since compact exists precisely to return a
    * store to one segment). Row ORDER of the returned frame is
    * unspecified in both paths — consumers order as needed (they all
    * do); an always-on global sort here would bill every point lookup
    * for a display order nothing consumes.
    */
  private[core] def mergedIndex(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val (root, _) = currentIndexRoot(spark, dir)
    // layout compat: the pre-segment layout wrote the index parquet
    // directly under <dir>/index — serve it as-is when no seg_* dirs
    // exist rather than failing the path glob
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs =
      if (!fs.exists(rootPath)) Array.empty[String]
      else fs.listStatus(rootPath).map(_.getPath.getName)
        .filter(_.startsWith("seg_"))
    if (segs.isEmpty) spark.read.parquet(root)
    else if (segs.length == 1) spark.read.parquet(s"$root/${segs.head}")
    else spark.read.parquet(s"$root/seg_*")
      .groupBy("field", "value").agg(sum("f").as("f"))
  }

  /** the persisted row-refs (field, value, row_key) across all
    * segments of the live generation, or None if the store was
    * written without [[IndexSpec.withRowRefs]]. No merge shuffle:
    * row keys are unique across segments by construction (each data
    * row is appended once), so the union IS the merged refs table;
    * per-segment (field,value) parquet stats still prune point reads.
    */
  private[core] def rowRefsFrame(spark: SparkSession,
                                 dir: String): Option[DataFrame] = {
    val (root, _) = currentIndexRoot(spark, dir)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasRows = fs.exists(rootPath) &&
      fs.listStatus(rootPath).exists(_.getPath.getName.startsWith("rows_"))
    if (hasRows) Some(spark.read.parquet(s"$root/rows_*")) else None
  }

  /** fold all index segments into one — run when a stream has
    * accumulated enough segments that merge-on-read amplification
    * matters (the reference's explicit writeMergedIndexedDf step).
    *
    * READER-SAFE: the merged index is written as a brand-new
    * generation and published by its `_COMMITTED` marker; nothing the
    * previous generation's readers hold is touched. Only generations
    * OLDER than the one being replaced are reclaimed, so a frame
    * opened before this compact stays readable until the NEXT compact
    * — `append` is advertised as a foreachBatch sink, and a sink must
    * never invalidate a concurrent reader mid-query.
    *
    * SINGLE WRITER: reader-safe does not mean writer-safe — see the
    * contract on [[append]]; do not run compact concurrently with an
    * in-flight append on the same store.
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    // eager checkpoint: every read of the old generation completes
    // here, before any directory is created or deleted
    val merged = mergedIndex(spark, dir).localCheckpoint(true)
    val rows = rowRefsFrame(spark, dir).map(_.localCheckpoint(true))
    val (fs, base) = fsFor(spark, dir)
    val (oldRoot, gen) = currentIndexRoot(spark, dir)
    val newRoot = s"$dir/index_g${gen + 1}"
    // snapshot history COLLAPSES at compact (documented: like table-
    // format log compaction): the folded seg_0's manifest is the
    // union of the old generation's manifests, so "latest" stays
    // time-travel-readable while intermediate snapshots retire with
    // their generation
    val oldSegNames = {
      val rp = new org.apache.hadoop.fs.Path(oldRoot)
      if (!fs.exists(rp)) Seq.empty[String]
      else fs.listStatus(rp).map(_.getPath.getName)
        .filter(_.startsWith("seg_")).toSeq.sorted
    }
    val oldManifests = oldSegNames.map(s => readManifest(fs, s"$oldRoot/$s"))
    val oldSchemas = oldSegNames.map(s => readSchemaSidecar(fs, s"$oldRoot/$s"))
    // sorted (field,value) clustering belongs to the WRITE, not the
    // read ([[mergedIndex]] serves unordered): the folded segment's
    // parquet stats must prune point reads like a write()n one's do
    merged.orderBy("field", "value")
      .write.mode(SaveMode.Overwrite).parquet(s"$newRoot/seg_0")
    // row-refs fold to one re-clustered segment inside the same
    // atomic publish (the _COMMITTED marker below covers both)
    rows.foreach(_
      .repartitionByRange(col("field"), col("value"), col("row_key"))
      .sortWithinPartitions("field", "value", "row_key")
      .write.mode(SaveMode.Overwrite).parquet(s"$newRoot/rows_0"))
    // only when EVERY old segment carried a manifest is the union a
    // faithful snapshot description (a legacy store stays legacy)
    if (oldManifests.nonEmpty && oldManifests.forall(_.isDefined))
      writeManifest(fs, s"$newRoot/seg_0",
        oldManifests.flatMap(_.get).distinct)
    // the folded segment's schema is the union of the retired
    // segments' schemas (same all-or-nothing rule as storedSchema)
    if (oldSchemas.nonEmpty && oldSchemas.forall(_.isDefined))
      writeSchemaSidecar(fs, s"$newRoot/seg_0", unionSchema(oldSchemas.flatten))
    fs.create(new org.apache.hadoop.fs.Path(s"$newRoot/_COMMITTED")).close()
    // reclaim generations at least two compacts old (never `gen`
    // itself — in-flight readers may still be planned against it)
    reclaimBelow(fs, base, dir, gen)
  }

  private def reclaimBelow(fs: org.apache.hadoop.fs.FileSystem,
                           base: org.apache.hadoop.fs.Path,
                           dir: String, gen: Int): Unit = {
    val stale =
      (if (gen > 0) Seq(s"$dir/index") else Nil) ++
      fs.listStatus(base).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("index_g"))
        .flatMap(n => scala.util.Try(n.stripPrefix("index_g").toInt).toOption)
        .filter(_ < gen)
        .map(g => s"$dir/index_g$g")
    stale.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }

  /** reclaim every superseded generation INCLUDING the one the last
    * compact retained — without paying for a merge. Use when the
    * retention window has served its purpose (no reader still holds a
    * frame planned before the last compact); a reader that does hold
    * one will fail on its next execution, which is exactly the
    * contract violation the caller asserted away. [[compact]] already
    * reclaims generations two compacts old on its own, so vacuum is
    * only needed to trim the LAST retained generation of a store that
    * has stopped compacting.
    */
  def vacuum(spark: SparkSession, dir: String): Unit = {
    val (fs, base) = fsFor(spark, dir)
    // here gen IS the live generation (inside compact it is the one
    // being superseded), so "strictly below gen" spares exactly the
    // live index and reclaims everything else, retained or legacy
    val (_, gen) = currentIndexRoot(spark, dir)
    reclaimBelow(fs, base, dir, gen)
  }

  /** Hive-layout partitioned write: `<dir>/data/<col>=<value>/…`. A
    * read with an equality/range predicate on the partition column
    * lists and scans ONLY the matching directories (partition
    * pruning: `PartitionFilters` in the scan, zero bytes read from
    * other partitions). This is the coarse-grained sibling of the
    * (field,value) index — at 100 TB the directory layout is the
    * first index any query hits, and it composes with the row-group
    * pushdown the plain layout already gets.
    */
  def writePartitioned(df: DataFrame, dir: String, partCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol)
      .parquet(s"$dir/data")

  /** reopen a partitioned write (partition column comes back as a
    * directory-derived column)
    */
  def openPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/data")

  /** Z-ORDER clustered write (§2a.12i — the OPTIMIZE ZORDER layout
    * device of the table formats): rows sort by the Morton interleave
    * of two non-negative long keys ([[graft.functions.ZInterleave]],
    * a codegen'd expression), so each parquet file's (a, b) min/max
    * bounding box is a small square of the key plane instead of a
    * full-domain stripe — and a RANGE PREDICATE ON EITHER column (or
    * both) prunes most files from their footer stats alone. The 1-D
    * sorted layout ([[write]]'s index clustering, or a plain sort)
    * gives that pruning for one leading column only; z-order is what
    * a 100 TB store does when two query dimensions matter at once.
    * One range-partition exchange on the z key + a within-partition
    * sort — the layout cost is a single extra shuffle at write time,
    * amortized over every pruned read. StoreSpec asserts the actual
    * pruning property: per-file bounding-box area ≪ the unclustered
    * write's, on both dimensions.
    */
  def writeZOrdered(df: DataFrame, dir: String, a: Column, b: Column,
                    numFiles: Int = 16): Unit = {
    import org.apache.spark.sql.functions.{col, floor, least, lit, max, min}
    val al = a.cast("long")
    val bl = b.cast("long")
    // DOMAIN NORMALIZATION (what the table formats' OPTIMIZE ZORDER
    // does before interleaving): each key is min/max-scaled to a
    // 16-bit bucket id, then the BUCKETS are Morton-interleaved.
    // Interleaving raw values breaks on unequal domains — with
    // a ∈ [0, 2^20) and b ∈ [0, 2^14) the top 6 z bits come from `a`
    // alone, so the top-level file split degenerates to a 1-D sort on
    // `a` and a b-range predicate prunes almost nothing (measured:
    // 58% of rows still read; buckets cut it to ~12% — ZOrderStudy,
    // SURVEY §5). Normalization also makes ANY long domain (negative
    // keys included) legal and well-ordered — the contract hole
    // ZInterleave's low-32-bit read would otherwise leave opens only
    // on 2^32-wide BUCKET ids, which cannot occur. The min/max pass
    // is one agg over the write set — write-time cost, amortized over
    // every pruned read. Scaling is double-math: it shapes the LAYOUT
    // only (the data columns are untouched), so float rounding at
    // bucket edges is harmless.
    val stats = df.agg(min(al), max(al), min(bl), max(bl)).head()
    val clustered =
      if (stats.isNullAt(0) || stats.isNullAt(2)) df // empty/all-null keys
      else {
        def bucket(c: Column, lo: Long, hi: Long): Column =
          if (hi == lo) lit(0L)
          else least(lit(65535L), floor(
            (c.cast("double") - lit(lo.toDouble)) /
              (lit(hi.toDouble) - lit(lo.toDouble) + 1.0) * 65536.0)
            .cast("long"))
        val z = graft.functions.ZInterleave(
          bucket(al, stats.getLong(0), stats.getLong(1)),
          bucket(bl, stats.getLong(2), stats.getLong(3)))
        df.withColumn("__z", z)
          .repartitionByRange(numFiles, col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
      }
    clustered.write.mode(SaveMode.Overwrite).parquet(s"$dir/data")
  }

  /** bucketed write for co-located joins: tables bucketed+sorted on
    * the same key join with NO shuffle on either side (the 100 TB
    * answer to "this join is run every day on the same key" — the
    * reference's single-node analog is its presorted merge,
    * Dfs.scala:222-228). Bucketing requires the table catalog, hence
    * saveAsTable rather than a path write.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}

/** a reopened frame: live IndexedFrame + the persisted index table
  * (pre-aggregated — index_freqs-style lookups hit the small sorted
  * parquet instead of rescanning the data).
  */
final case class StoredFrame(frame: IndexedFrame, persistedIndex: DataFrame,
                             rowRefs: Option[DataFrame] = None) {
  /** frequency of (field,value) from the persisted index — a pruned
    * point read, the analog of opening one bitmap's popcount.
    */
  def f(field: String, value: String): DataFrame = {
    import org.apache.spark.sql.functions._
    persistedIndex
      .where(col("field") === field && col("value") === value)
      .select(col("f"))
  }

  /** row keys matching one (field,value) served INDEX-ONLY from the
    * persisted row-refs — the analog of opening one bitmap and reading
    * its set bits (the base table is never touched; the point
    * predicate prunes to the refs files whose (field,value) stats
    * straddle the entry). Requires the store to have been written
    * with [[IndexSpec.withRowRefs]].
    */
  def rowsOf(field: String, value: String): DataFrame = {
    import org.apache.spark.sql.functions._
    rowRefs.getOrElse(throw new IllegalStateException(
        s"store has no row-refs artifact — write with withRowRefs"))
      .where(col("field") === field && col("value") === value)
      .select(col("row_key"))
  }
}
