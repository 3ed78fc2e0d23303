package graft

import graft.core.{IndexSpec, Store}
import org.apache.spark.sql.functions._

/** r12: the concurrent-writer commit protocol (claimed unit ids) and
  * the r11-advice protocol fixes — upsert crash-atomicity, the
  * compact high-water idempotence gate, and the all-or-nothing rule
  * for mixed (legacy+manifest) stores.
  */
class StoreConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private val spec = IndexSpec(Seq("cat"))

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def touch(p: String): Unit = {
    val fs = fsOf(p)
    fs.mkdirs(new org.apache.hadoop.fs.Path(p).getParent)
    fs.create(new org.apache.hadoop.fs.Path(p), true).close()
  }

  test("concurrent appenders commit independent segments — no clobber") {
    val dir = java.nio.file.Files.createTempDirectory("conc").toString
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // 4 writers × 3 appends each, racing on one store: under the r11
    // listing-based max+1 two of them claim the same seg id and the
    // later Overwrite destroys the earlier segment (rows lost); under
    // claimed ids every append commits its own unit
    val writers = (0 until 4).map { w =>
      Future {
        (0 until 3).foreach { b =>
          val base = (w * 3 + b) * 10
          val batch = (base until base + 10)
            .map(i => (i.toLong, s"c${i % 5}", i.toDouble))
            .toDF("id", "cat", "v")
          Store.append(batch, dir, spec)
        }
      }
    }
    Await.result(Future.sequence(writers), 300.seconds)
    val st = Store.open(spark, dir, spec)
    assert(st.frame.df.count() === 120)
    assert(st.frame.df.select("id").distinct().count() === 120)
    // 12 committed segments with 12 DISTINCT ids, each claim-backed
    val snaps = Store.snapshots(spark, dir)
    assert(snaps.size === 12 && snaps.distinct.size === 12)
    val fs = fsOf(dir)
    snaps.foreach { id =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$dir/index/_claim_$id")), s"claim missing for unit $id")
    }
    // merged index agrees with a one-shot ground truth
    val perCat = st.persistedIndex.orderBy("value").collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(perCat === (0 until 120).groupBy(i => s"c${i % 5}")
      .map { case (k, v) => k -> v.size.toLong })
  }

  test("append concurrent with delete (disjoint keys): both units survive") {
    val dir = java.nio.file.Files.createTempDirectory("concdel").toString
    Store.write((0L until 40L).map(i => (i, s"c${i % 4}", i.toDouble))
      .toDF("id", "cat", "v"), dir, spec)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val del = Future {
      Store.delete(spark, dir, spec, "id",
        (0L until 10L).toDF("id")) // keys live only in seg_0
    }
    val app = Future {
      Store.append((100L until 120L).map(i => (i, s"c${i % 4}", i.toDouble))
        .toDF("id", "cat", "v"), dir, spec)
    }
    Await.result(Future.sequence(Seq(del.map(_ => ()), app)), 300.seconds)
    val live = Store.open(spark, dir, spec).frame.df
    assert(live.count() === 50) // 40 - 10 deleted + 20 appended
    assert(live.where($"id" < 10).count() === 0)
    assert(live.where($"id" >= 100).count() === 20)
    // ids never reused: the delete and the append own distinct units
    val hist = Store.history(spark, dir)
    assert(hist.map(_._1).distinct.size === hist.size)
    assert(hist.count(_._2 == "delete") === 1)
    assert(hist.count(_._2 == "append") === 2)
  }

  test("a crashed writer's bare claim is skipped, never reused") {
    val dir = java.nio.file.Files.createTempDirectory("claim").toString
    Store.append(Seq((1L, "a", 1.0)).toDF("id", "cat", "v"), dir, spec)
    // simulate a writer that claimed id 1 and died before committing
    touch(s"$dir/index/_claim_1")
    Store.append(Seq((2L, "b", 2.0)).toDF("id", "cat", "v"), dir, spec)
    // the second append must take id 2 — reusing the crashed claim
    // would collide with a writer that might still be alive
    assert(Store.snapshots(spark, dir) === Seq(0, 2))
    assert(Store.open(spark, dir, spec).frame.df.count() === 2)
  }

  test("upsert is ordered tombstone-then-segment and both commit") {
    val dir = java.nio.file.Files.createTempDirectory("upsord").toString
    Store.write(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "v"),
      dir, spec)
    Store.upsert(Seq((2L, "bb", 20.0), (3L, "c", 3.0)).toDF("id", "cat", "v"),
      dir, spec, "id")
    val hist = Store.history(spark, dir)
    val delId = hist.find(_._2 == "delete").get._1
    val segIds = hist.filter(_._2 == "append").map(_._1)
    // the tombstone precedes its replacement segment, so its scope is
    // exactly the pre-existing segments
    assert(delId < segIds.max)
    val live = Store.open(spark, dir, spec).frame.df
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(live.toSeq === Seq((1L, "a"), (2L, "bb"), (3L, "c")))
  }

  test("an uncommitted tombstone (upsert crash before append commit) is invisible and vacuumable") {
    val dir = java.nio.file.Files.createTempDirectory("upscrash").toString
    Store.write(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "v"),
      dir, spec)
    val before = Store.open(spark, dir, spec).frame.df.orderBy("id")
      .collect().toSeq
    // simulate the crash window: a fully-written tombstone unit with
    // NO _COMMITTED (what upsert leaves if it dies before its append
    // commits — the r11 eager commit left the keys DELETED here)
    val root = s"$dir/index"
    Seq(2L).toDF("key").write.parquet(s"$root/del_9/keys")
    Seq(("cat", "b", -1L)).toDF("field", "value", "f")
      .write.parquet(s"$root/del_9/ixdelta")
    val kc = fsOf(dir).create(
      new org.apache.hadoop.fs.Path(s"$root/del_9/_KEYCOL"), true)
    kc.write("id".getBytes("UTF-8")); kc.close()
    touch(s"$root/_claim_9")
    // readers serve the store byte-for-byte unchanged
    assert(Store.open(spark, dir, spec).frame.df.orderBy("id")
      .collect().toSeq === before)
    assert(Store.open(spark, dir, spec).f("cat", "b").head().getLong(0) === 1L)
    // vacuum reclaims the orphaned tombstone
    Store.vacuum(spark, dir)
    assert(!fsOf(dir).exists(new org.apache.hadoop.fs.Path(s"$root/del_9")))
    // and the repair path: re-running the upsert covers both windows
    Store.upsert(Seq((2L, "bb", 20.0)).toDF("id", "cat", "v"), dir, spec, "id")
    assert(Store.open(spark, dir, spec).frame.df.where($"cat" === "bb")
      .count() === 1L)
  }

  test("compact high-water: a folded batchId redelivery is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("hw").toString
    def batch(b: Int) = (0 until 5)
      .map(i => ((b * 5 + i).toLong, s"c${i % 2}", i.toDouble))
      .toDF("id", "cat", "v")
    assert(Store.appendBatch(batch(0), dir, spec, 0L))
    assert(Store.appendBatch(batch(1), dir, spec, 1L))
    assert(Store.appendBatch(batch(2), dir, spec, 2L))
    Store.compact(spark, dir)
    // r11 bug: the fold keeps only the max retired id's manifest, so a
    // redelivery of batch 1 (a stream restarted from an old
    // checkpoint) passed the manifest gate and duplicated its rows
    assert(!Store.appendBatch(batch(1), dir, spec, 1L))
    assert(Store.open(spark, dir, spec).frame.df.count() === 15)
    // later batches still land
    assert(Store.appendBatch(batch(3), dir, spec, 3L))
    assert(Store.open(spark, dir, spec).frame.df.count() === 20)
  }

  test("high-water never swallows a batch that only CLAIMED before the compact") {
    val dir = java.nio.file.Files.createTempDirectory("hwclaim").toString
    def batch(b: Int) = (0 until 5)
      .map(i => ((b * 5 + i).toLong, s"c${i % 2}", i.toDouble))
      .toDF("id", "cat", "v")
    assert(Store.appendBatch(batch(0), dir, spec, 0L))
    assert(Store.appendBatch(batch(1), dir, spec, 1L))
    // batch 5's first attempt died right after claiming
    touch(s"$dir/index/_claim_5")
    Store.compact(spark, dir)
    // the fold id (and high-water) must NOT have been raised to the
    // crashed claim — batch 5's redelivery is legitimate new data
    assert(Store.appendBatch(batch(5), dir, spec, 5L))
    assert(Store.open(spark, dir, spec).frame.df.count() === 15)
  }

  test("mixed legacy+manifest store: all-or-nothing serving, vacuum keeps, compact modernizes") {
    val dir = java.nio.file.Files.createTempDirectory("mixed").toString
    Store.write(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "v"),
      dir, spec)
    // hand-plant a PRE-MANIFEST segment (the r11-advice scenario: a
    // store migrated by the pre-diff append, whose seg carries no
    // _MANIFEST and no claim): loose data file + bare index segment
    Seq((3L, "c", 3.0)).toDF("id", "cat", "v")
      .coalesce(1).write.parquet(s"$dir/data/legacy_extra")
    val fs = fsOf(dir)
    // move the part file up to the data root (legacy layout)
    val part = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/data/legacy_extra"))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/data/${part.getName}"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/data/legacy_extra"), true)
    Seq(("cat", "c", 1L)).toDF("field", "value", "f")
      .write.parquet(s"$dir/index/seg_7")
    // r11 served the manifest-scoped read here: row 3 silently gone
    // and vacuum then DELETED its file. r12: all-or-nothing.
    assert(Store.open(spark, dir, spec).frame.df.count() === 3)
    assert(Store.open(spark, dir, spec).f("cat", "c").head().getLong(0) === 1L)
    Store.vacuum(spark, dir)
    assert(Store.open(spark, dir, spec).frame.df.count() === 3,
      "vacuum must never reclaim a mixed store's data files")
    // manifest-scoped features refuse rather than mis-serve
    intercept[IllegalArgumentException] {
      Store.delete(spark, dir, spec, "id", Seq(1L).toDF("id"))
    }
    intercept[IllegalArgumentException] {
      Store.appendBatch(Seq((9L, "z", 9.0)).toDF("id", "cat", "v"),
        dir, spec, 9L)
    }
    // compact folds the mixed store into a fully-modern one
    Store.compact(spark, dir)
    assert(Store.open(spark, dir, spec).frame.df.count() === 3)
    Store.delete(spark, dir, spec, "id", Seq(3L).toDF("id"))
    assert(Store.open(spark, dir, spec).frame.df.count() === 2)
  }
}
