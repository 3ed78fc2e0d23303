package graft

import graft.ops.Knn
import org.apache.spark.sql.functions._

/** Mirrors the reference's MlTest."knn" scenario
  * (/root/reference/src/test/scala/com/futurice/iodf/MlTest.scala):
  * animals with tokenized feature text, predicting isDuck.
  */
class KnnSpec extends SparkSpec {
  import spark.implicits._

  // MlTest.scala:23-29, with features pre-tokenized into columns the
  // identity-indexed Knn consumes (legs + each feature word as a field)
  private def animals = Seq(
    (0L, 2, "yellow walks", false),
    (1L, 4, "moo white walks", false),
    (2L, 4, "moo black walks", false),
    (3L, 2, "flies white swims", false),
    (4L, 2, "flies yellow swims", true),
    (5L, 2, "flies yellow swims", true)
  ).toDF("id", "legs", "features", "is_duck")
    .withColumn("has_flies", array_contains(split(col("features"), " "), "flies").cast("string"))
    .withColumn("has_swims", array_contains(split(col("features"), " "), "swims").cast("string"))
    .withColumn("has_moo", array_contains(split(col("features"), " "), "moo").cast("string"))

  private val fields = Seq("legs", "has_flies", "has_swims", "has_moo")

  test("duck-predictive features get the heaviest weights") {
    val w = Knn.keyValueWeights(animals, fields, col("is_duck") === true)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // flies/swims=true co-occur with ducks; moo=true never does —
    // both directions should carry non-trivial weight
    assert(w(("has_flies", "true")) > 0.1)
    assert(w(("has_swims", "true")) > 0.1)
    assert(w(("has_moo", "true")) > 0.1)
  }

  test("nearest neighbours of a duck-like query are the ducks") {
    val w = Knn.keyValueWeights(animals, fields, col("is_duck") === true)
    // query: 2 legs, flies+swims (duck-shaped, like MlTest's tAnimal)
    val top = Knn.topK(animals, w, fields,
        Map("legs" -> "2", "has_flies" -> "true", "has_swims" -> "true",
          "has_moo" -> "false"),
        "id", 3)
      .collect().map(_.getLong(0))
    // ducks (4, 5) and the duck-adjacent swimmer (3) are the closest
    assert(top.toSet === Set(3L, 4L, 5L))
  }

  test("null targets drop out of the weights via the defined mask") {
    // reference Knn.keyValueWeights masks every CoStats count by
    // outDefined (ml/Knn.scala:87-97) — here: label unobservable on
    // row 1; weights must equal those computed on the defined subset
    val withNull = animals.withColumn("duck_label",
      when(col("id") === 1L, lit(null).cast("boolean"))
        .otherwise(col("is_duck")))
    val masked = Knn.keyValueWeights(withNull, fields,
        col("duck_label") === true, defined = col("duck_label").isNotNull)
      .collect().map(_.toString).toSeq
    val direct = Knn.keyValueWeights(animals.where(col("id") =!= 1L), fields,
        col("is_duck") === true)
      .collect().map(_.toString).toSeq
    assert(masked === direct)
    // and the mask changes the result vs the unmasked weights
    val unmasked = Knn.keyValueWeights(animals, fields,
      col("is_duck") === true).collect().map(_.toString).toSeq
    assert(masked !== unmasked)
  }

  test("persisted weights: build once, serve every query from the artifact") {
    val dir = s"/tmp/graft_knnspec_w_${System.nanoTime()}"
    try {
      var builds = 0
      def build = { builds += 1
        Knn.keyValueWeights(animals, fields, col("is_duck") === true) }
      val w1 = Knn.haveWeights(spark, dir)(build)
      val w2 = Knn.haveWeights(spark, dir)(build)
      assert(builds === 1) // second call never evaluates the fit
      // the served plan is a tiny parquet scan — NO CoStats aggregation
      val plan = w2.queryExecution.executedPlan.toString
      assert(!plan.contains("HashAggregate") && !plan.contains("Exchange"))
      // and topK over the artifact matches topK over fresh weights
      val q = Map("legs" -> "2", "has_flies" -> "true",
        "has_swims" -> "true", "has_moo" -> "false")
      val fromArtifact = Knn.topK(animals, w1, fields, q, "id", 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val fresh = Knn.topK(animals,
          Knn.keyValueWeights(animals, fields, col("is_duck") === true),
          fields, q, "id", 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(fromArtifact === fresh)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("candidate filter restricts which rows compete for the k slots") {
    val w = Knn.keyValueWeights(animals, fields, col("is_duck") === true)
    val top = Knn.topK(animals, w, fields,
        Map("legs" -> "2", "has_flies" -> "true", "has_swims" -> "true",
          "has_moo" -> "false"),
        "id", 3, rowFilter = col("legs") === 4)
      .collect().map(_.getLong(0))
    // only the 4-legged animals (1, 2) pass the filter
    assert(top.toSet === Set(1L, 2L))
  }
}
