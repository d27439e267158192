package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.ColFns._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Brute-force cosine (ExtensionQueries.simCosineTopk) is the correctness
  * baseline; this module adds the scale path: sign-LSH (random-hyperplane)
  * bucketing. Hyperplane weights come from a deterministic integer LCG
  * (w(p,d) = ((1103515245·(p·64+d) + 12345) mod 2^16) − 2^15) so both
  * engines compute identical buckets with pure bigint arithmetic — no
  * engine RNG, no float divergence. At 100 TB: bucketing is a map-side
  * expression (one pass, codegen'd), the join is equi-key on bucket, and
  * probe count × bucket size bounds the pair work; more planes / multi-probe
  * trades recall vs. fan-in without changing the plan shape.
  */
object SimilarityQueries {

  type Q = (SparkSession, String) => DataFrame

  private val NPlanes = 4

  /** Hyperplane p's weights — shared formula in [[ColFns.lshWeights]]. */
  private def weights(p: Int): Array[Long] = lshWeights(p)

  /** 4-bit sign-LSH bucket id (16 buckets): NPlanes codegen'd qdots
    * against constant weight arrays — pure map-side compute. */
  private def lshBucket(qv: Column): Column =
    (0 until NPlanes).map(p =>
      when(qdot(qv, typedlit(weights(p))) > 0L, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** ANN top-5 per probe — multi-probe sign-LSH: each probe searches its
    * own bucket plus the NPlanes buckets at Hamming distance 1 (one
    * flipped hyperplane sign), the standard recall lever that leaves the
    * equi-join plan shape untouched — the probe side just explodes to
    * (NPlanes+1) bucket keys. Results remain approximate by design; the
    * oracle computes the identical multi-probe bucketing so the check
    * stays exact. */
  val simAnnLsh: Q = (s, d) => {
    val q = Tables.embeddings(s, d)
      .select(col("vec_id"), quantizeVec(col("embedding")).as("qv"))
      .withColumn("n2", qnorm2(col("qv")))
      .withColumn("bucket", lshBucket(col("qv")))
    val probeBuckets = transform(sequence(lit(0), lit(NPlanes)), i =>
      when(i === 0, col("bucket"))
        .otherwise(expr("bucket").bitwiseXOR(call_function("shiftleft", lit(1L), i - 1))))
    val probes = q.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("qv").as("pv"),
              col("n2").as("pn2"), explode(probeBuckets).as("pbucket"))
    val cos: Column = qdot(col("pv"), col("qv")) /
      (sqrt(col("pn2")) * sqrt(col("n2")))
    val scored = q.join(broadcast(probes),
        col("bucket") === col("pbucket") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"), cos.as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(desc("cos"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("cand_id"), round(col("cos"), 6).as("score"))
      .orderBy("probe_id", "cand_id")
  }

  /** IVF-style ANN: coarse quantizer = per-label centroids built by
    * aggregation; each probe searches only its nearest centroid's
    * partition. All centroid math stays in exact integers by clearing
    * denominators: nearest centroid minimizes |n_l·q − S_l|² (≡ n_l²·|q −
    * S_l/n_l|²), where S_l is the per-dimension sum and n_l the partition
    * size — no division, no floats, oracle-identical. A millunit (1e3)
    * quantization keeps the squared sums within BIGINT (DuckDB raises on
    * overflow). At 100 TB the centroid table is tiny (built by one
    * aggregate, broadcast everywhere) and the search join is equi-key on
    * the partition label — same shape as a trained IVF index. */
  val simAnnIvf: Q = (s, d) => {
    val q3 = Tables.embeddings(s, d).select(
      col("vec_id"), col("label"),
      transform(col("embedding"), x => round(x.cast("double") * 1000d).cast("long")).as("q3"),
      quantizeVec(col("embedding")).as("qv"))
    val sumCols = (0 until 64).map(i => sum(element_at(col("q3"), i + 1)).as(s"s$i"))
    val cents = q3.groupBy("label")
      .agg(count(lit(1)).as("n_l"), sumCols: _*)
      .select(col("label").as("c_label"), col("n_l"),
        array((0 until 64).map(i => col(s"s$i")): _*).as("cs"))
    val probes = q3.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("q3").as("p3"),
              col("qv").as("pv"))
    // nearest centroid per probe: dist = |n_l * p3 - S_l|^2, ties by label
    val dist = qdot(zip_with(col("p3"), col("cs"), (x, s_) => col("n_l") * x - s_),
                    zip_with(col("p3"), col("cs"), (x, s_) => col("n_l") * x - s_))
    val wN = Window.partitionBy("probe_id").orderBy(asc("dist"), asc("c_label"))
    val assigned = probes.crossJoin(broadcast(cents))
      .withColumn("dist", dist)
      .withColumn("rk", row_number().over(wN))
      .filter(col("rk") === 1)
      .select(col("probe_id"), col("pv"), col("c_label"))
    // exact cosine search within the assigned partition
    val cand = q3.select(col("vec_id"), col("label"), col("qv"),
                         qnorm2(col("qv")).as("n2"))
    val cos: Column = qdot(col("pv"), col("qv")) /
      (sqrt(qnorm2(col("pv"))) * sqrt(col("n2")))
    val scored = cand.join(broadcast(assigned),
        col("label") === col("c_label") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"), cos.as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(desc("cos"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("cand_id"), round(col("cos"), 6).as("score"))
      .orderBy("probe_id", "cand_id")
  }

  val queries: Map[String, Q] = Map(
    "sim_ann_lsh" -> simAnnLsh,
    "sim_ann_ivf" -> simAnnIvf,
  )

  val oracles: Map[String, String] = Map(
    "sim_ann_ivf" ->
      """WITH q AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q3,
        |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        |  FROM embeddings
        |), qn AS (
        |  SELECT vec_id, label, q3, qv,
        |         (SELECT SUM(u * u) FROM UNNEST(qv) AS t(u)) AS n2
        |  FROM q
        |), cexp AS (
        |  SELECT label, unnest(q3) AS v, unnest(generate_series(1, 64)) AS d FROM q
        |), cents AS (
        |  SELECT label AS c_label, d, SUM(v) AS s_d, COUNT(*) AS n_l
        |  FROM cexp GROUP BY label, d
        |), pexp AS (
        |  SELECT vec_id AS probe_id, unnest(q3) AS v, unnest(generate_series(1, 64)) AS d
        |  FROM q WHERE vec_id < 5
        |), adist AS (
        |  SELECT probe_id, c_label,
        |         SUM((n_l * v - s_d) * (n_l * v - s_d)) AS dist
        |  FROM pexp JOIN cents USING (d)
        |  GROUP BY probe_id, c_label
        |), assigned AS (
        |  SELECT probe_id, c_label FROM (
        |    SELECT probe_id, c_label,
        |           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY dist, c_label) AS rk
        |    FROM adist) WHERE rk = 1
        |), pairs AS (
        |  SELECT a.probe_id, c.vec_id AS cand_id,
        |         (SELECT SUM(x * y) FROM (SELECT UNNEST(p.qv) AS x, UNNEST(c.qv) AS y)) /
        |           (sqrt(p.n2) * sqrt(c.n2)) AS cos
        |  FROM assigned a
        |  JOIN qn p ON p.vec_id = a.probe_id
        |  JOIN qn c ON c.label = a.c_label AND c.vec_id <> a.probe_id
        |), ranked AS (
        |  SELECT probe_id, cand_id, cos,
        |         ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rank
        |  FROM pairs
        |)
        |SELECT probe_id, cand_id, round(cos, 6) AS score
        |FROM ranked WHERE rank <= 5 ORDER BY probe_id, cand_id""".stripMargin,
    "sim_ann_lsh" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        |  FROM embeddings
        |), qb AS (
        |  SELECT vec_id, qv,
        |         (SELECT SUM(u * u) FROM UNNEST(qv) AS t(u)) AS n2,
        |         CAST(list_sum(list_transform(generate_series(0, 3), p ->
        |           CASE WHEN list_sum(list_transform(generate_series(1, 64), dd ->
        |                  qv[dd] * ((1103515245 * (p * 64 + (dd - 1)) + 12345) % 65536 - 32768))) > 0
        |                THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket
        |  FROM q
        |), pb AS (
        |  SELECT vec_id AS probe_id, qv AS pqv, n2 AS pn2,
        |         UNNEST(list_transform(generate_series(0, 4), i ->
        |           CASE WHEN i = 0 THEN bucket
        |                ELSE xor(bucket, CAST(1 AS BIGINT) << (i - 1)) END)) AS pbucket
        |  FROM qb WHERE vec_id < 5
        |), pairs AS (
        |  SELECT p.probe_id, c.vec_id AS cand_id,
        |         (SELECT SUM(x * y) FROM (SELECT UNNEST(p.pqv) AS x, UNNEST(c.qv) AS y)) /
        |           (sqrt(p.pn2) * sqrt(c.n2)) AS cos
        |  FROM pb p JOIN qb c ON p.pbucket = c.bucket AND c.vec_id <> p.probe_id
        |), ranked AS (
        |  SELECT probe_id, cand_id, cos,
        |         ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rank
        |  FROM pairs
        |)
        |SELECT probe_id, cand_id, round(cos, 6) AS score
        |FROM ranked WHERE rank <= 5 ORDER BY probe_id, cand_id""".stripMargin,
  )
}
