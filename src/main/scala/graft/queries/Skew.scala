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

  /** Exact distinct-count per key via explicit value-hash salting: the
    * salt is a hash of the VALUE — not a random salt — so each key's
    * distinct-value space is sliced into disjoint buckets and the
    * per-bucket distinct counts ADD exactly ((k,salt,v) → (k,salt) →
    * (k), every stage's hot-key load bounded). Honest scoping: Spark's
    * own count_distinct expansion already achieves a bounded-stage
    * shape internally (dedup shuffles on (k,v), partial counts compress
    * before the final exchange), so for plain count_distinct this
    * explicit ladder is a portability template, not a speedup — its
    * value is for aggregations the engine does NOT expand (custom
    * UDAFs, combined holistic aggregates), where the same value-hash
    * slicing is the only way to bound per-stage hot-key state. The salt
    * hash never affects the result (any value partitioning sums the
    * same), so an engine-specific hash is fine here.
    */
  def saltedDistinct(df: DataFrame, key: Column, value: Column,
                     salts: Int, out: String): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .groupBy(col("k"), pmod(xxhash64(col("v")), lit(salts.toLong)).as("salt"))
      .agg(count_distinct(col("v")).as("part"))
      .groupBy(col("k")).agg(sum(col("part")).as(out))

  /** Salted equi-join for a hot-keyed big side against a small side too
    * big to broadcast: each big row gets a content-derived salt in
    * [0, salts) and the small side is replicated once per salt, so a
    * hot key lands on `salts` reducers instead of one. The salt hashes
    * the WHOLE big row (never monotonically_increasing_id or rand: a
    * task retry after a shuffle-fetch failure must re-derive the SAME
    * salt per row, or rows double-join or vanish across attempts);
    * identical duplicate rows sharing a salt is correct, just slightly
    * less spread. The salt value is otherwise plan-internal — every
    * (key, salt) pair has its small-side replica.
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String, salts: Int): DataFrame = {
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin: inputs must not already carry a __salt column")
    // hash the non-map columns (xxhash64 rejects MapType); if the row is
    // ALL maps, fall back to the key — degenerate spread but still correct
    val hashable = big.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toIndexedSeq
    val saltSrc = if (hashable.nonEmpty) hashable else IndexedSeq(col(bigKey))
    val b = big.withColumn("__salt",
      pmod(xxhash64(struct(saltSrc: _*)), lit(salts.toLong)).cast("int"))
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
