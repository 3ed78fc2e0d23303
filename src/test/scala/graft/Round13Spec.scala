package graft

import graft.core.{IndexSpec, SegmentedAgg, Store}
import org.apache.spark.sql.functions._

/** r13 advice fixes:
  *  - PointRead prunes in parquet's unsigned UTF-8 byte order, so
  *    values with supplementary characters (where UTF-16 String order
  *    inverts against byte order) are never falsely pruned;
  *  - SegmentedAgg validates the buildCounts schema contract loudly;
  *  - write/append reject user columns/index fields in the reserved
  *    __graft_dropped_* namespace.
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  test("point read is not pruned by UTF-16 vs UTF-8 order inversion") {
    // "" (UTF-8: EE 80 80) byte-compares BELOW the emoji
    // (U+1F600, UTF-8: F0 9F 98 80) but UTF-16-compares ABOVE it
    // (surrogate 0xD83D < 0xE000) — a String-ordered prune against
    // parquet's byte-ordered stats drops the file holding the emoji.
    val emoji = new String(Character.toChars(0x1F600))
    val priv = ""
    val dir = java.nio.file.Files.createTempDirectory("r13pt").toString
    val df = (0 until 60).map { i =>
      val cat = i % 3 match {
        case 0 => emoji
        case 1 => priv
        case _ => "plain"
      }
      (i.toLong, cat)
    }.toDF("id", "cat")
    val spec = IndexSpec(Seq("cat")).withRowRefs("id")
    Store.write(df.coalesce(1), s"$dir/s", spec)
    val st = Store.open(spark, s"$dir/s", spec)
    for (v <- Seq(emoji, priv, "plain")) {
      val plan = st.rowsOf("cat", v).collect().map(_.getLong(0)).sorted.toSeq
      val fast = st.rowsOfPoint("cat", v).map(_.asInstanceOf[Long]).sorted
      assert(plan.nonEmpty, s"oracle setup: '$v' must have rows")
      assert(fast === plan, s"fast path lost rows for '$v'")
      assert(st.fPoint("cat", v) ===
        st.f("cat", v).collect().map(_.getLong(0)).sum)
    }
  }

  test("SegmentedAgg rejects a buildCounts output with no Long column") {
    val dir = java.nio.file.Files.createTempDirectory("r13agg").toString
    val spec = IndexSpec(Seq("cat"))
    Store.write((0 until 40).map(i => (i.toLong, s"c${i % 4}"))
      .toDF("id", "cat"), dir, spec)
    val e = intercept[IllegalArgumentException] {
      SegmentedAgg.have(spark, dir, "bad", "id")(
        d => d.groupBy("cat").agg(count(lit(1)).cast("int").as("n")))
    }
    assert(e.getMessage.contains("no LongType column"))
  }

  test("SegmentedAgg rejects the delete key carried through as Long") {
    val dir = java.nio.file.Files.createTempDirectory("r13agg").toString
    val spec = IndexSpec(Seq("cat"))
    Store.write((0 until 40).map(i => (i.toLong, s"c${i % 4}"))
      .toDF("id", "cat"), dir, spec)
    val e = intercept[IllegalArgumentException] {
      SegmentedAgg.have(spark, dir, "bad2", "id")(
        d => d.groupBy("cat", "id").agg(count(lit(1)).as("n")))
    }
    assert(e.getMessage.contains("delete key column"))
  }

  test("write/append reject the reserved dropped-column namespace") {
    val dir = java.nio.file.Files.createTempDirectory("r13ns").toString
    val bad = (0 until 10).map(i => (i.toLong, s"c$i"))
      .toDF("id", "__graft_dropped_0_x")
    val spec = IndexSpec(Seq("id"))
    val e1 = intercept[IllegalArgumentException] {
      Store.write(bad, s"$dir/s", spec)
    }
    assert(e1.getMessage.contains("reserved"))
    // a good store refuses a bad APPEND batch too
    val good = (0 until 10).map(i => (i.toLong, s"c$i")).toDF("id", "cat")
    Store.write(good, s"$dir/s2", IndexSpec(Seq("cat")))
    val e2 = intercept[IllegalArgumentException] {
      Store.append(bad, s"$dir/s2", IndexSpec(Seq("cat")))
    }
    assert(e2.getMessage.contains("reserved"))
    // and an index spec naming a hidden field is refused
    val e3 = intercept[IllegalArgumentException] {
      Store.write(good, s"$dir/s3", IndexSpec(Seq("__graft_dropped_1_y")))
    }
    assert(e3.getMessage.contains("reserved"))
  }
}
