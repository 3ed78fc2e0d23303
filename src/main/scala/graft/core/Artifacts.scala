package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once / reopen lifecycle for derived artifacts (payload
  * caches, fitted centroids/codebooks, Knn weight tables) — the
  * reference's writeIndexedDf / openIndexedDf / haveIndexedDf
  * contract (/root/reference/src/main/scala/com/futurice/iodf/
  * Dfs.scala:489-554) applied to snapshot-keyed parquet dirs.
  *
  * The cache dir NAME carries the source table's snapshot key, so
  * freshness is a driver-side `exists` — zero Spark jobs. At 100 TB
  * the analogous key is the table format's snapshot/version id,
  * available for free from the catalog.
  */
object Artifacts {

  /** Cache dir for a dataset's derived artifacts. Keyed on the
    * ABSOLUTE path hash, not just the basename: two datasets named
    * `sf0.1` living at different paths must never share a cache.
    */
  def datasetCacheDir(d: String): String = {
    val abs = new java.io.File(d).getAbsolutePath
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    s"/tmp/graft_cache_${new java.io.File(d).getName}_$key"
  }

  /** O(file-listing) snapshot key of a source parquet table: md5 of
    * the sorted (name, length, modificationTime) of its data files.
    * A dataset REGENERATED at the same path — even byte-identical —
    * rewrites its files (new mtimes), so any cache keyed on this
    * value rebuilds instead of serving stale derived artifacts. Costs
    * one driver-side directory listing: NO Spark job, no table scan.
    */
  def tableSnapshotKey(s: SparkSession, tablePath: String): String = {
    val p = new org.apache.hadoop.fs.Path(tablePath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val leaves =
      if (st.isDirectory)
        fs.listStatus(p).filterNot(_.getPath.getName.startsWith("_")).toSeq
      else Seq(st)
    val manifest = leaves
      .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      .sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(manifest.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }

  /** build-once derived parquet: freshness is the key IN the dir
    * name; completeness is the _SUCCESS marker (a build that died
    * mid-write leaves a dir without one — rebuild over it instead of
    * crash-looping on a partial parquet forever). Superseded
    * generations of the same artifact family are GC'd.
    */
  def haveParquet(s: SparkSession, dir: String)
                 (build: => DataFrame): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val done = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    if (!fs.exists(done)) build.write.mode("overwrite").parquet(dir)
    gcSiblings(s, dir)
    // serve with an explicit schema: a schema-less parquet read runs
    // a one-task inference JOB per call (~0.1 s), paid on EVERY
    // steady-state open of every artifact (r15 optimization round).
    // The `_SCHEMA` sidecar is written once (backfilled for caches
    // built before it existed) and read driver-side thereafter.
    readParquet(s, dir)
  }

  /** read a parquet dir with its `_SCHEMA` sidecar (zero Spark
    * jobs); absent sidecar → one inference job, then backfill the
    * sidecar so the next open is free. For any snapshot-keyed
    * artifact dir this repo writes.
    */
  def readParquet(s: SparkSession, dir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    Store.readSchemaSidecar(fs, dir) match {
      case Some(sc) => s.read.schema(sc).parquet(dir)
      case None =>
        val df = s.read.parquet(dir)
        Store.writeSchemaSidecar(fs, dir, df.schema)
        df
    }
  }

  /** build-once STORE lifecycle (r14 — the store-incr bench split):
    * `build` runs the store's ingest lifecycle (write/append/delete/
    * append) only when the `_INGESTED` marker is absent, so a bench
    * rep or repeated query call serves the STEADY STATE instead of
    * re-paying the one-time ingest. The dir name must carry the
    * source snapshot key (see [[tableSnapshotKey]]); a partial build
    * (died mid-lifecycle, no marker) is wiped and rebuilt.
    */
  def haveStore(s: SparkSession, dir: String)
               (build: String => Unit): String = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val ready = new org.apache.hadoop.fs.Path(dir, "_INGESTED")
    if (!fs.exists(ready)) {
      fs.delete(path, true)
      build(dir)
      fs.create(ready, true).close()
      gcSiblings(s, dir)
    }
    dir
  }

  /** GC superseded generations of a snapshot-keyed artifact: the dir
    * name is <family>_<key>, so siblings sharing the prefix up to the
    * key are stale builds of THIS artifact against an older source
    * snapshot — without this, every dataset regeneration orphans a
    * corpus-sized derived parquet in /tmp.
    */
  def gcSiblings(s: SparkSession, dir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val prefix = dir.substring(dir.lastIndexOf('/') + 1)
      .reverse.dropWhile(_ != '_').reverse // "images_v1_", "ivf_centroids_"
    val parent = path.getParent
    // compare NAMES: listStatus returns fully-qualified paths
    // (file:/tmp/...) that never equal the unqualified `path`
    if (prefix.nonEmpty && fs.exists(parent))
      fs.listStatus(parent).foreach { st =>
        if (st.getPath.getName.startsWith(prefix) &&
            st.getPath.getName != path.getName)
          fs.delete(st.getPath, true)
      }
  }
}
