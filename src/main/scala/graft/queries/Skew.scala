package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation operators. AQE's runtime skew-join split
  * (enabled in ExtractJob) handles sort-merge skew automatically; these
  * cover the two cases AQE cannot: a holistic aggregate whose hot key
  * would serialize one reducer, and a shuffle join whose hot side
  * cannot be broadcast away.
  */
object Skew {

  /** Exact distinct-count per key with NO stage ever concentrating a
    * whole hot key on one reducer: salt by a hash of the VALUE — not a
    * random salt — so each key's distinct-value space is sliced into
    * disjoint buckets and the per-bucket distinct counts ADD exactly.
    * Spark's own count_distinct expansion already spreads the DEDUP
    * stage by value; what it cannot fix is the counting stage, where a
    * key with 10^9 distinct values still lands 10^9 deduped rows on one
    * reducer — the salt caps that stage at bucket granularity
    * ((k,salt,v) → (k,salt) → (k), each step bounded). The salt hash
    * never affects the result (any value partitioning sums the same),
    * so an engine-specific hash is fine here.
    */
  def saltedDistinct(df: DataFrame, key: Column, value: Column,
                     salts: Int, out: String): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .groupBy(col("k"), pmod(xxhash64(col("v")), lit(salts.toLong)).as("salt"))
      .agg(count_distinct(col("v")).as("part"))
      .groupBy(col("k")).agg(sum(col("part")).as(out))

  /** Salted equi-join for a hot-keyed big side against a small side too
    * big to broadcast: each big row gets a row-varying salt in
    * [0, salts) and the small side is replicated once per salt, so a
    * hot key lands on `salts` reducers instead of one. The salt value
    * is plan-internal — any per-row assignment yields the same join
    * result (every (key, salt) pair has its small-side replica).
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String, salts: Int): DataFrame = {
    val b = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, b(bigKey) === s(smallKey) && b("__salt") === s("__salt"))
      .drop(b("__salt")).drop(s("__salt"))
  }

  /** Per-language exact distinct-text count via the salted two-stage
    * aggregation — the oracle is the salt-free GROUP BY, so the salting
    * must be exactly count-preserving.
    */
  val q48SaltedDistinct = QueryDef(
    "q48_salted_distinct",
    (s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      saltedDistinct(docs, col("lang"), col("text"), 32, "n_distinct_texts")
        .withColumnRenamed("k", "lang")
        .orderBy("lang")
    },
    Some("""
      SELECT lang, count(DISTINCT text) AS n_distinct_texts
      FROM documents GROUP BY lang ORDER BY lang
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(q48SaltedDistinct)
}
