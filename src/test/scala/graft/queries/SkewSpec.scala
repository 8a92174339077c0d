package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Skew mitigation: salted aggregation/join must be exactly
  * result-preserving on a hot-keyed fixture, and the salted plans must
  * actually spread the hot key (salt in the shuffle keys).
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** 10k rows, ~96% of them key 0 — the hot-key regime. Parquet-backed
    * so the salt expression survives in the plan (a LocalRelation would
    * constant-fold it away). */
  private lazy val skewed = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_skew_fix").toString
    (0 until 10000).map { i =>
      val k = if (i % 20 != 0) 0L else (i % 100).toLong
      (k, s"v${i % 700}")
    }.toDF("key", "value").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("saltedDistinct equals the plain distinct count on a hot key") {
    val salted = Skew.saltedDistinct(skewed, col("key"), col("value"), 16, "nd")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = skewed.groupBy("key").agg(count_distinct(col("value")).as("nd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    // hot key 0 holds rows with i%20 != 0 (9500) plus i%100 == 0 (100):
    // value space {i%700 : i%20 != 0} has 665 residues, plus the 7
    // multiples of 100 the i%100 == 0 rows add → 672 distinct values
    assert(salted(0L) == 672)
  }

  test("saltedDistinct plan: first shuffle partitions on (key, salt)") {
    val p = Skew.saltedDistinct(skewed, col("key"), col("value"), 16, "nd")
      .queryExecution.executedPlan.toString
    // the optimizer renames the salt to _groupingexpression; the hash
    // expression and the shuffle ladder are the witnesses. count_distinct
    // expands to dedup→count, so the ladder is (k,salt,v) → (k,salt) → (k):
    // every stage's hot-key load is bounded (values spread, then salts)
    assert(p.contains("xxhash64("), s"expected the value-hash salt:\n$p")
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).length == 3,
      s"expected the three-stage salted ladder:\n$p")
    assert(p.contains("_groupingexpression") || p.contains("salt"),
      s"expected the salt among the shuffle keys:\n$p")
  }

  test("saltedJoin equals the plain join on a hot key, and salts the shuffle") {
    import spark.implicits._
    val dim = (0 until 100).map(k => (k.toLong, s"dim$k")).toDF("dkey", "dval")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val salted = Skew.saltedJoin(skewed, dim, "key", "dkey", 8)
        .groupBy("key", "dval").count()
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val plain = skewed.join(dim, col("key") === col("dkey"))
        .groupBy("key", "dval").count()
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(salted == plain)
      assert(plain((0L, "dim0")) == 9600L) // 9500 (i%20 != 0) + 100 (i%100 == 0)
      val p = Skew.saltedJoin(skewed, dim, "key", "dkey", 8)
        .queryExecution.executedPlan.toString
      assert(p.contains("__salt"), s"expected __salt in the join keys:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
