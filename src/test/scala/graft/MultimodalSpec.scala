package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "tiny payload"),
    (1L, "a somewhat longer payload with more bytes in it")
  ).toDF("doc_id", "text")

  test("payload table has binary payload + typed metadata") {
    val p = Multimodal.asPayload(docs, col("text"), col("doc_id"))
    val r = p.orderBy("doc_id").collect()
    assert(r(0).getAs[Array[Byte]]("payload").length === 12)
    assert(r(0).getStruct(2).getInt(0) === 12) // meta.n_bytes
  }

  test("metadata projection prunes the payload column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    Multimodal.asPayload(docs, col("text"), col("doc_id"))
      .write.mode("overwrite").parquet(dir)
    val meta = Multimodal.metaOnly(spark.read.parquet(dir))
    val plan = meta.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), s"payload not pruned:\n$plan")
    assert(meta.count() === 2)
  }

  test("stub decoder is batch-shaped and deterministic") {
    val p = Multimodal.asPayload(docs, col("text"), col("doc_id"))
    val f1 = Multimodal.stubDecode(p).orderBy("doc_id").collect()
    val f2 = Multimodal.stubDecode(p).orderBy("doc_id").collect()
    assert(f1.map(_.toString).sameElements(f2.map(_.toString)))
    assert(f1(0).getAs[Seq[Float]]("feature").length === 8)
  }

  test("decode summary emits only scalar (sortable) columns") {
    val p = Multimodal.asPayload(docs, col("text"), col("doc_id"))
    val s = Multimodal.decodeSummary(Multimodal.stubDecode(p))
    assert(s.schema.fields.forall(f =>
      !f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
    val rows = s.orderBy("doc_id").collect()
    assert(rows.length === 2)
    assert(rows.forall(r => r.getString(3).length === 32)) // md5 hex
  }
}
