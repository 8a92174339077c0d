package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the embeddings table: brute-force cosine top-k
  * (the exactness baseline) and the IVF building blocks (centroids +
  * nearest-centroid assignment) as the scale path. Dot products are
  * ordered left-folds (`zip_with` + `aggregate`), ranking keys are
  * rounded, and distances go through exact decimals — so the DuckDB
  * oracle matches bit-for-bit.
  *
  * Scale notes: the query side of top-k is broadcast (small), candidates
  * stream map-only into a per-query top-k window; IVF assignment is a
  * broadcast join against the centroid set, turning O(n²) search into
  * O(n·k) — the standard ANN partitioning trade.
  */
object Similarity {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  val q23CosineTopk = QueryDef(
    "q23_cosine_topk",
    (s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val c = e.filter(col("vec_id") >= 5).select(col("vec_id").as("cid"), col("embedding").as("ce"))
      val sim = dot(col("qe"), col("ce")) /
        (sqrt(dot(col("qe"), col("qe"))) * sqrt(dot(col("ce"), col("ce"))))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim6").desc, col("cid").asc)
      c.join(broadcast(q))
        .withColumn("sim6", round(sim, 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("qid", "rk", "cid", "sim6")
        .orderBy("qid", "rk")
    },
    Some("""
      WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 5),
      p AS (SELECT qid, cid,
        list_sum(list_transform(generate_series(1, len(qe)), i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) AS dp,
        list_sum(list_transform(generate_series(1, len(qe)), i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
        list_sum(list_transform(generate_series(1, len(ce)), i -> CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) AS nc
        FROM q, c),
      r AS (SELECT qid, cid, round(dp / (sqrt(nq) * sqrt(nc)), 6) AS sim6,
                   row_number() OVER (PARTITION BY qid
                     ORDER BY round(dp / (sqrt(nq) * sqrt(nc)), 6) DESC, cid ASC) AS rk
            FROM p)
      SELECT qid, CAST(rk AS INT) AS rk, cid, sim6 FROM r WHERE rk <= 3 ORDER BY qid, rk
    """.trim)
  )

  /** Per-label centroids (the IVF coarse quantizer training step):
    * exact decimal mean per dimension.
    */
  val q24Centroids = QueryDef(
    "q24_centroids",
    (s, dir) =>
      s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
        .select(col("label"), (col("pos0") + 1).as("pos"),
          round(col("v").cast("double"), 6).cast("decimal(9,6)").as("r6"))
        .groupBy("label", "pos")
        .agg((sum(col("r6")).cast("double") / count(lit(1))).as("centroid"))
        .orderBy("label", "pos"),
    Some("""
      WITH x AS (SELECT label,
                        unnest(generate_series(1, len(embedding))) AS pos,
                        unnest(embedding) AS v
                 FROM embeddings)
      SELECT label, CAST(pos AS INT) AS pos,
             CAST(sum(CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(9,6))) AS DOUBLE) / count(*) AS centroid
      FROM x GROUP BY label, pos ORDER BY label, pos
    """.trim)
  )

  /** IVF assignment: nearest of 4 probe centroids (vec_id 0..3) by exact
    * decimal squared L2 — broadcastable small side, deterministic argmin.
    */
  val q25IvfAssign = QueryDef(
    "q25_ivf_assign",
    (s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      def expl(df: org.apache.spark.sql.DataFrame, idName: String) =
        df.select(col("vec_id").as(idName), posexplode(col("embedding")).as(Seq("pos0", "v")))
          .select(col(idName), (col("pos0") + 1).as("pos"),
            round(col("v").cast("double"), 6).cast("decimal(9,6)").as("x"))
      val v = expl(e.filter(col("vec_id") >= 4), "vid").withColumnRenamed("x", "vx")
      val c = broadcast(expl(e.filter(col("vec_id") < 4), "cid").withColumnRenamed("x", "cx"))
      val d = v.join(c, "pos")
        .groupBy("vid", "cid")
        .agg(sum((col("vx") - col("cx")) * (col("vx") - col("cx"))).as("d2"))
      val w = Window.partitionBy(col("vid")).orderBy(col("d2").asc, col("cid").asc)
      d.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("vid"), col("cid"), col("d2").cast("double").as("dist2"))
        .orderBy("vid")
    },
    Some("""
      WITH u AS (SELECT vec_id,
                        unnest(generate_series(1, len(embedding))) AS pos,
                        unnest(embedding) AS v0
                 FROM embeddings),
      v AS (SELECT vec_id AS vid, pos,
                   CAST(round(CAST(v0 AS DOUBLE), 6) AS DECIMAL(9,6)) AS x
            FROM u WHERE vec_id >= 4),
      c AS (SELECT vec_id AS cid, pos,
                   CAST(round(CAST(v0 AS DOUBLE), 6) AS DECIMAL(9,6)) AS x
            FROM u WHERE vec_id < 4),
      d AS (SELECT vid, cid, sum((v.x - c.x) * (v.x - c.x)) AS d2
            FROM v JOIN c ON v.pos = c.pos GROUP BY vid, cid),
      a AS (SELECT vid, cid, CAST(d2 AS DOUBLE) AS dist2,
                   row_number() OVER (PARTITION BY vid ORDER BY d2 ASC, cid ASC) AS rk
            FROM d)
      SELECT vid, cid, dist2 FROM a WHERE rk = 1 ORDER BY vid
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(q23CosineTopk, q24Centroids, q25IvfAssign)
}
