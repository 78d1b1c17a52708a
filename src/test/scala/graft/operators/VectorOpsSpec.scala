package graft.operators

import graft.SparkSpec

/** Similarity-search semantics: exact ranking, LSH recall, near-dup
  * symmetry. */
class VectorOpsSpec extends SparkSpec {

  private def top(q: graft.QueryDef): Seq[(Long, Double)] =
    q.run(spark, sfDir).select("vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("q27 brute force: similarities sorted desc, within [-1, 1]") {
    val res = top(VectorOps.q27CosineTopK)
    assert(res.size == 10)
    assert(res.map(_._2) == res.map(_._2).sorted.reverse)
    assert(res.forall { case (_, s) => s >= -1.0001 && s <= 1.0001 })
  }

  test("multi-probe LSH: recall grows with probe radius, exact at full probe") {
    val exact = top(VectorOps.q27CosineTopK).map(_._1).toSet
    def recall(r: Int): Double =
      VectorOps.annLshQuery(spark, sfDir, r).select("vec_id").collect()
        .map(_.getLong(0)).count(exact.contains) / 10.0
    // measured on the fixed seed-42 corpus: 0.0 / 0.3 / 0.9 / 1.0 —
    // random uncorrelated embeddings need multi-probe; assert conservative
    // floors and monotonicity
    val r1 = recall(1); val r2 = recall(2); val r3 = recall(3)
    assert(r1 >= 0.2, s"radius-1 recall $r1")
    assert(r2 >= 0.7 && r2 >= r1, s"radius-2 recall $r2")
    assert(r3 >= 0.9 && r3 >= r2, s"radius-3 recall $r3")
    // ranking inside the probed set is exact and sorted
    val approx = top(VectorOps.q28AnnLsh)
    assert(approx.map(_._2) == approx.map(_._2).sorted.reverse)
  }

  test("native cosine_sim is registered for SQL users") {
    graft.functions.GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s, " +
      "cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS o").head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(1)) < 1e-12)
  }

  test("q29 near-dup pairs are consistent with q27 scoring (same kernel)") {
    val pairs = VectorOps.q29CosinePairs.run(spark, sfDir).collect()
    // every reported pair clears the threshold
    assert(pairs.forall(_.getDouble(2) >= 0.45))
  }
}
