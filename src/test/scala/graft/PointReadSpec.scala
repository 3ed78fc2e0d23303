package graft

import graft.core.{IndexSpec, Store}
import org.apache.spark.sql.functions._

/** r12: the driver-side single-point read path (core/PointRead) —
  * fPoint/rowsOfPoint must equal the plan path exactly, take the
  * fast (no-Spark-job) route only when the store is eligible, and
  * fall back transparently after delete/rename.
  */
class PointReadSpec extends SparkSpec {
  import spark.implicits._

  private val spec = IndexSpec(Seq("cat", "tag")).withRowRefs("id")

  private def mkDf(ids: Range) =
    ids.map(i => (i.toLong, s"c${i % 7}", s"t${i % 13}", i * 1.5))
      .toDF("id", "cat", "tag", "v")

  private def planRows(st: graft.core.StoredFrame, f: String, v: String) =
    st.rowsOf(f, v).collect().map(_.getLong(0)).sorted.toSeq

  private def fastRows(st: graft.core.StoredFrame, f: String, v: String) =
    st.rowsOfPoint(f, v).map(_.asInstanceOf[Long]).sorted

  private def planF(st: graft.core.StoredFrame, f: String, v: String) =
    st.f(f, v).collect().map(_.getLong(0)).sum

  test("point reads equal the plan path on a written store") {
    val dir = java.nio.file.Files.createTempDirectory("pt").toString
    Store.write(mkDf(0 until 500), s"$dir/s", spec)
    val st = Store.open(spark, s"$dir/s", spec)
    for (v <- Seq("c0", "c3", "c6")) {
      assert(fastRows(st, "cat", v) === planRows(st, "cat", v))
      assert(st.fPoint("cat", v) === planF(st, "cat", v))
    }
    assert(fastRows(st, "tag", "t11") === planRows(st, "tag", "t11"))
    // absent entries: empty refs, zero frequency
    assert(st.rowsOfPoint("cat", "zzz").isEmpty)
    assert(st.fPoint("cat", "zzz") === 0L)
    assert(st.fPoint("nosuchfield", "c0") === 0L)
  }

  test("multi-segment store: point read unions segments like the plan") {
    val dir = java.nio.file.Files.createTempDirectory("pt").toString
    Store.write(mkDf(0 until 200), s"$dir/s", spec)
    Store.append(mkDf(200 until 350), s"$dir/s", spec)
    Store.append(mkDf(350 until 420), s"$dir/s", spec)
    val st = Store.open(spark, s"$dir/s", spec)
    for (v <- Seq("c1", "c5")) {
      assert(fastRows(st, "cat", v) === planRows(st, "cat", v))
      // f is summed across the three raw segments
      assert(st.fPoint("cat", v) === planF(st, "cat", v))
    }
  }

  test("no Spark job runs on the fast path") {
    val dir = java.nio.file.Files.createTempDirectory("pt").toString
    Store.write(mkDf(0 until 300), s"$dir/s", spec)
    val st = Store.open(spark, s"$dir/s", spec)
    st.rowsOfPoint("cat", "c2") // warm the footer cache too
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    val r = st.rowsOfPoint("cat", "c4")
    val fq = st.fPoint("cat", "c4")
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after === before, "fast point read must not schedule a Spark job")
    assert(r.nonEmpty && fq > 0)
  }

  test("delete makes the store ineligible — fallback stays correct") {
    val dir = java.nio.file.Files.createTempDirectory("pt").toString
    Store.write(mkDf(0 until 280), s"$dir/s", spec)
    val victims = (0 until 280 by 7).map(_.toLong).toDF("id")
    Store.delete(spark, s"$dir/s", spec, "id", victims) // all of c0
    val st = Store.open(spark, s"$dir/s", spec)
    assert(st.rowsOfPoint("cat", "c0").isEmpty)
    assert(st.fPoint("cat", "c0") === 0L)
    assert(fastRows(st, "cat", "c3") === planRows(st, "cat", "c3"))
    assert(st.fPoint("cat", "c3") === planF(st, "cat", "c3"))
    // compact folds the tombstone physically: fast path is live again
    Store.compact(spark, s"$dir/s")
    val st2 = Store.open(spark, s"$dir/s", spec)
    assert(st2.rowsOfPoint("cat", "c0").isEmpty)
    assert(fastRows(st2, "cat", "c3") === planRows(st2, "cat", "c3"))
    assert(st2.fPoint("cat", "c3") === planF(st2, "cat", "c3"))
  }

  test("rename makes the store ineligible — fallback serves new names") {
    val dir = java.nio.file.Files.createTempDirectory("pt").toString
    val sp = IndexSpec(Seq("cat"))
    Store.write(mkDf(0 until 100), s"$dir/s", sp)
    Store.renameColumn(spark, s"$dir/s", "cat", "category")
    val st = Store.open(spark, s"$dir/s", IndexSpec(Seq("category")))
    // raw segment files still carry 'cat'; the fallback plan path
    // maps them — a raw fast read would have missed the entry
    assert(st.fPoint("category", "c2") === planF(st, "category", "c2"))
    assert(st.fPoint("category", "c2") > 0L)
  }

  test("a handle's point face is pinned to its open-time snapshot") {
    // an append committed AFTER open() must not surface through
    // fPoint/rowsOfPoint while the same handle's plan DataFrames
    // still serve the open-time segments
    val dir = java.nio.file.Files.createTempDirectory("pt").toString
    Store.write(mkDf(0 until 140), s"$dir/s", spec)
    val st = Store.open(spark, s"$dir/s", spec)
    val before = st.fPoint("cat", "c1")
    Store.append(mkDf(140 until 280), s"$dir/s", spec)
    assert(st.fPoint("cat", "c1") === before)
    assert(st.fPoint("cat", "c1") === planF(st, "cat", "c1"))
    // a FRESH open serves the appended rows through both faces
    val st2 = Store.open(spark, s"$dir/s", spec)
    assert(st2.fPoint("cat", "c1") === planF(st2, "cat", "c1"))
    assert(st2.fPoint("cat", "c1") > before)
  }

  test("string row keys read back as strings") {
    val dir = java.nio.file.Files.createTempDirectory("pt").toString
    val df = (0 until 120)
      .map(i => (s"k$i", s"c${i % 4}")).toDF("name", "cat")
    val sp = IndexSpec(Seq("cat")).withRowRefs("name")
    Store.write(df, s"$dir/s", sp)
    val st = Store.open(spark, s"$dir/s", sp)
    val fast = st.rowsOfPoint("cat", "c1").map(_.asInstanceOf[String]).sorted
    val plan = st.rowsOf("cat", "c1").collect().map(_.getString(0)).sorted.toSeq
    assert(fast === plan && fast.nonEmpty)
  }
}
