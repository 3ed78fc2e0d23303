package graft

import org.apache.spark.sql.functions._

/** r12 items: VecUnit null-element semantics (r11 advice), plus the
  * round's plan-shape assertions (added as the items land).
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  test("vec_unit: null elements propagate as null, never as wrong values") {
    val df = Seq(
      (1L, Seq[java.lang.Float](3.0f, 4.0f)),
      (2L, Seq[java.lang.Float](1.0f, null, 2.0f)),
      (3L, Seq[java.lang.Float](null, null)),
      (4L, Seq.empty[java.lang.Float])
    ).toDF("id", "v")
    // input is nullable-element (the parquet embeddings shape)
    assert(df.schema("v").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    // the staged spelling vec_unit documents itself bit-identical to:
    // null elements contribute 0 to the norm and stay null
    val acc = (a: org.apache.spark.sql.Column,
               x: org.apache.spark.sql.Column) =>
      a + coalesce(x.cast("double"), lit(0.0)) *
        coalesce(x.cast("double"), lit(0.0))
    val nrm = greatest(
      sqrt(aggregate(col("v"), lit(0.0), acc)), lit(1e-30))
    val rows = df.select(col("id"),
        graft.functions.VecMath.vecUnit(col("v")).as("fast"),
        transform(col("v"), x => (x.cast("double") / nrm).cast("float"))
          .as("staged"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.getSeq[java.lang.Float](1) === r.getSeq[java.lang.Float](2),
        s"id=${r.getLong(0)}")
    }
    // null-free vectors keep exact values (3-4-5 triangle)
    assert(rows(0).getSeq[java.lang.Float](1) === Seq(0.6f, 0.8f))
    // nulls stayed null; non-null elements normalized by the
    // nulls-as-zero norm
    assert(rows(1).getSeq[java.lang.Float](1)(1) === null)
  }
}
