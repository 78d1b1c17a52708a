package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Scale-shape checks for the partitioning utilities. */
class ScaleToolsSpec extends SparkSpec {

  test("bucketed tables sort-merge join with NO exchange (co-located join)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      ScaleTools.writeBucketed(Tables.orders(spark, sfDir), "orders_b", "o_custkey", 4)
      ScaleTools.writeBucketed(
        Tables.customer(spark, sfDir).withColumnRenamed("c_custkey", "cust_key"),
        "customer_b", "cust_key", 4)
      val j = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("cust_key"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketing must eliminate shuffles:\n$plan")
      assert(j.count() == Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("salted join matches plain join results under skew") {
    // skew: all lineitems of a few orders; dim = orders
    val fact = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val dim = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderstatus")
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    val salted = ScaleTools.saltedJoin(fact, dim, "l_orderkey", "o_orderkey", salt = 4).count()
    assert(salted == plain)
  }

  test("bloom-pruned join: identical results, fact pruned in the scan, no UDF") {
    val dim = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F" && col("o_orderkey") % 10 === 0)
      .select("o_orderkey", "o_orderstatus")
    val fact = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val joined = ScaleTools.bloomPrunedJoin(fact, dim, "l_orderkey", "o_orderkey",
      expectedItems = 10000)
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == plain.count())
    // the bloom test runs as a codegen'd catalyst expression, not a UDF
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"bloom filter missing from plan:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), "must not be a UDF")
    // and it actually prunes: far fewer fact rows survive than exist
    val survivors = fact.filter(graft.functions.GraftFunctions.mightContain(
      lit({ val b = new java.io.ByteArrayOutputStream()
            dim.select(xxhash64(col("o_orderkey")).as("h"))
              .stat.bloomFilter("h", 10000, 0.01).writeTo(b); b.toByteArray }),
      xxhash64(col("l_orderkey")))).count()
    assert(survivors < fact.count() / 2, s"bloom pruned nothing: $survivors")
  }

  test("bloom-pruned join works on STRING keys (hash-based, not cast-based)") {
    val dim = Tables.nation(spark, sfDir)
      .filter(col("n_regionkey") === 0).select(col("n_name"))
    val fact = Tables.nation(spark, sfDir).select(col("n_name").as("f_name"), col("n_nationkey"))
    val joined = ScaleTools.bloomPrunedJoin(fact, dim, "f_name", "n_name", expectedItems = 100)
    val plain = fact.join(dim, col("f_name") === col("n_name"))
    assert(joined.count() == plain.count() && plain.count() > 0,
      "string-keyed bloom join must match the plain join")
  }

  test("keySkew surfaces the heaviest keys") {
    val skew = ScaleTools.keySkew(Tables.lineitem(spark, sfDir), "l_returnflag", 3)
    assert(skew.length == 3 && skew.head._2 >= skew.last._2)
  }

  test("coPartition pre-shuffles both sides to the same partitioning") {
    val (a, b) = ScaleTools.coPartition(
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir),
      "o_custkey", "c_custkey", 8)
    assert(a.rdd.getNumPartitions == 8 && b.rdd.getNumPartitions == 8)
  }

  test("q167: sampled boundaries partition the table and balance within sampling error") {
    val rows = ScaleTools.q167RangeBoundaryAudit.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_._2).sum == total, "bucket counts partition the scan")
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    assert(rows.map(_._1).forall(b => b >= 0 && b < ScaleTools.RangeBuckets.toLong))
    // every realized bucket is populated and no bucket grossly dominates —
    // the property RangePartitioner's sample exists to deliver (loose
    // bound: a small sample at sf0.001 carries real sampling error)
    assert(rows.forall(_._2 > 0))
    assert(rows.forall(_._4 < 150000L), s"deviation within 15pp: $rows")
    // share arithmetic is internally consistent
    rows.foreach { case (_, n, share, dev) =>
      assert(share == n * 1000000L / total)
      assert(dev == math.abs(share - 125000L))
    }
  }

  test("q219: manifest counts match; checksum recomputes and detects a lost row") {
    val out = ScaleTools.q219TableChecksums.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == 10)
    assert(out("nation")._1 == Tables.nation(spark, sfDir).count())
    assert(out("lineitem")._1 == Tables.lineitem(spark, sfDir).count())
    // driver-side recompute of one table's checksum, then drop a row:
    // the sum must move (the whole point of the manifest)
    val keys = Tables.nation(spark, sfDir).select(col("n_nationkey").cast("string"))
      .collect().map(_.getString(0))
    def h(k: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(("nation#" + k).getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000000L
    }
    val full = keys.map(h).sum
    assert(full == out("nation")._2, "driver recompute must equal the engine checksum")
    assert(keys.drop(1).map(h).sum != full, "a lost row must move the checksum")
  }

  test("q218: blowup estimate equals the materialized self-join exactly") {
    val out = ScaleTools.q218JoinBlowup.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = out.find(_._1 == -1L).get
    val li = Tables.lineitem(spark, sfDir).select(col("l_partkey").cast("long").as("key"))
    // the estimate IS the join: Σf² = |lineitem ⋈ lineitem on l_partkey|
    val joined = li.as("a").join(li.as("b"), "key").count()
    assert(total._3 == joined, s"estimate ${total._3} != materialized $joined")
    assert(total._2 == li.count())
    // per-key rows: est_pairs = f² and the share algebra holds
    out.filter(_._1 >= 0).foreach { case (_, f, est, share) =>
      assert(est == f * f)
      assert(share == est * 1000000L / total._3)
    }
  }
}
