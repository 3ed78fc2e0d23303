package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioural specs for the round-9 additions beyond their DuckDB
  * hash oracles: changepoint vs a brute-force scan, survivor-selection
  * invariants against the pair graph, and the two-stage bounded-heap
  * diversified top-k vs the window row_number spelling.
  */
class Round9OpsSpec extends SparkSpec {

  test("events_changepoint equals the brute-force per-user sliding scan") {
    val got = SparkEntry.queries("events_changepoint")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted

    val rows = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    val expected = rows.groupBy(_._2).toSeq.flatMap { case (uid, es) =>
      val s = es.sortBy(e => (e._3, e._1))
      val mv = s.map(e => math.round(e._4 * 1e6))
      s.indices.flatMap { i =>
        if (i >= 8 && i + 8 < s.length) {
          val sb = (i - 8 until i).map(mv).sum
          val sa = (i + 1 to i + 8).map(mv).sum
          if (math.abs(sa - sb) >= 400000000L)
            Some((s(i)._1, uid,
              BigDecimal((sa - sb).toDouble / 8e6)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          else None
        } else None
      }
    }.sorted
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("dedup_survivor: every drop is backed by a pair it loses on quality") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val out = SparkEntry.queries("dedup_survivor")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pairs = graft.ops.Dedup
      .ngramJaccard(docs, col("text"), col("doc_id"))
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val len = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.size === out.size) // one verdict per loser
    out.foreach { case (loser, keeper) =>
      assert(loser !== keeper)
      // the reported keeper actually beat the loser in a real pair
      val lo = math.min(loser, keeper); val hi = math.max(loser, keeper)
      assert(pairs.contains((lo, hi)), s"no pair backing ($loser, $keeper)")
      // and on the documented quality rule
      assert(len(keeper) > len(loser) ||
        (len(keeper) == len(loser) && keeper < loser),
        s"keeper $keeper does not dominate loser $loser")
    }
  }

  test("search_diverse_topk equals the window spelling; label cap binds") {
    val out = SparkEntry.queries("search_diverse_topk")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq

    // cap: never more than 2 rows per (query, label)
    out.groupBy(t => (t._1, t._4)).foreach { case (k, rs) =>
      assert(rs.size <= 2, s"label cap violated at $k")
    }
    // ranks are contiguous from 1 per query
    out.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted === (1L to rs.size).toSeq, s"ranks at $q")
    }

    // independent spelling: same scored base, two row_number windows
    import graft.functions.VecMath.{vecDot, vecNorm}
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val c = e.select(col("vec_id"), col("label"), col("embedding"),
      vecNorm(col("embedding")).as("cn"))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        vecNorm(col("embedding")).as("qn"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nbr"),
        col("label").cast("long").as("label"),
        round(vecDot(col("qv"), col("embedding")) / (col("qn") * col("cn")), 6)
          .as("cos"))
    val expected = scored
      .withColumn("lr", row_number().over(
        Window.partitionBy("qid", "label").orderBy(desc("cos"), asc("nbr"))))
      .where(col("lr") <= 2)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cos"), asc("nbr"))).cast("long"))
      .where(col("rnk") <= 15)
      .select(col("qid"), col("rnk"), col("nbr"), col("label"), col("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(out.sorted === expected.sorted)
  }

  test("search_mmr equals the brute-force greedy selection") {
    val got = SparkEntry.queries("search_mmr")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted

    // recompute greedily from first principles on the driver
    import graft.functions.VecMath.{vecDot, vecNorm}
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        vecNorm(col("embedding")).as("qn"))
    val scored = e.select(col("vec_id"), col("embedding"),
        vecNorm(col("embedding")).as("cn"))
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nbr"),
        round(vecDot(col("qv"), col("embedding")) / (col("qn") * col("cn")), 6)
          .as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos6(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.indices.foldLeft(0.0)((acc, i) =>
          acc + x(i).toDouble * y(i).toDouble)
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = scored.groupBy(_._1).toSeq.flatMap { case (qid, rs) =>
      val short = rs.sortBy(t => (-t._3, t._2)).take(20)
        .map(t => (t._2, t._3))
      val selected = scala.collection.mutable.ArrayBuffer(short.head)
      (2 to 5).foreach { _ =>
        val pick = short
          .filterNot(c => selected.exists(_._1 == c._1))
          .map { case (nbr, c) =>
            val ms = selected.map(s => cos6(vecs(nbr), vecs(s._1))).max
            (nbr, c, 0.5 * c - 0.5 * ms)
          }
          .minBy(t => (-t._3, t._1))
        selected += ((pick._1, pick._2))
      }
      selected.zipWithIndex.map { case ((nbr, c), i) =>
        (qid, (i + 1).toLong, nbr, c)
      }
    }.sorted
    assert(got.size === 50)
    assert(got === expected)
  }

  test("pipeline_batches: batch shape and waste vs arrival-order batching") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val out = SparkEntry.queries("pipeline_batches")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out.nonEmpty)
    // every batch but each part's last is exactly full, and the waste
    // identity holds
    out.groupBy(_._1).foreach { case (_, bs) =>
      val byBatch = bs.sortBy(_._2)
      byBatch.init.foreach(b => assert(b._3 === 32L))
      byBatch.foreach { case (_, _, n, mx, tot, waste) =>
        assert(waste === n * mx - tot)
        assert(waste >= 0)
      }
    }
    // the point of length-sorting: total padding waste never exceeds
    // the arrival-order (doc_id-sorted) batching of the same docs
    val ntoks = docs
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val arrivalWaste = ntoks.groupBy(_._1).toSeq.map { case (_, ds) =>
      ds.sortBy(_._2).map(_._3).grouped(32)
        .map(b => b.size * b.max - b.sum).sum
    }.sum
    val sortedWaste = out.map(_._6).sum
    assert(sortedWaste <= arrivalWaste)
  }

  test("pipeline_interleave equals the brute-force merged schedule") {
    val got = SparkEntry.queries("pipeline_interleave")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got.map(_._1) === (1L to got.size))

    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      val n = math.sqrt(ds.size.toDouble)
      ds.sortBy(d => (d._3, d._2)).zipWithIndex.map { case (d, i) =>
        val r = (i + 1).toLong
        (r.toDouble / n, src, d._2, r)
      }
    }.sortBy(t => (t._1, t._2, t._4)).take(got.size)
      .zipWithIndex.map { case ((pos, src, id, r), i) =>
        ((i + 1).toLong, src, id, r,
          BigDecimal(pos).setScale(9, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }
    assert(got === expected)
  }
}
