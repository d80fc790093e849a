package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.llm.AnnSearch

/** Embedding-corpus hygiene audits — the pre-flight checks a training
  * pipeline runs BEFORE spending compute on ANN indexing or semantic
  * dedup: vector-norm sanity, per-dimension collapse detection, and a
  * centroid-margin label-noise screen (reference operator surface:
  * aggregate framework `utils/rowgroup/rowaggregation.h`; the audits
  * themselves are the standard embedding-QC battery from the
  * representation-learning literature).
  *
  * Determinism contract for the DuckDB hash compare: float SUMs are
  * partitioning-dependent, so every cross-row mean runs on an integer
  * AUDIT GRID — `floor(x * 2^20)` (or 1e8 for norms, 1e6 for margins)
  * quantizes each double to a BIGINT, integer sums are exact and
  * order-independent, and one double division at the end reconstructs
  * the mean. floor() on an exact IEEE product is bit-deterministic in
  * both engines, unlike decimal CAST rounding (Spark HALF_UP vs
  * DuckDB HALF_EVEN ties on the float grid).
  *
  * 100 TB shape: dim-audit is one posexplode + a dim-sized hash agg
  * (map-side partial → 64 rows); centroids are label×dim (tiny,
  * broadcast); the margin join is N×L with L = #labels — linear in
  * corpus size, never pairwise.
  */
object EmbeddingQueries {
  import Q._

  /** floor-grid quantization: exact int64 on the 1/scale grid. */
  private def q(c: Column, scale: Double): Column = floor(c * lit(scale))

  val queries: Map[String, QFn] = Map(
    "q_emb_norm_audit" -> ((s, dir) => {
      // Per-label L2-norm hygiene: unit-norm drift, zero vectors, NaN
      // payloads. Norms ride the native vec_dot kernel (sequential
      // fold — bit-matches DuckDB list_inner_product); min/max/mean
      // on the 1e8 audit grid.
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
      val withNorm = emb.withColumn("nrm", AnnSearch.norm(col("v")))
        .withColumn("qn", q(col("nrm"), 1e8))
      withNorm.groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("nrm") === 0, 1L).otherwise(0L)).as("n_zero"),
          sum(when(isnan(col("nrm")), 1L).otherwise(0L)).as("n_nan"),
          (min(col("qn")) / lit(1e8)).as("min_norm"),
          (max(col("qn")) / lit(1e8)).as("max_norm"),
          (sum(col("qn")).cast("double") / (count(lit(1)) * lit(1e8)))
            .as("mean_norm"))
        .orderBy(col("label"))
    }),
    "q_emb_dim_audit" -> ((s, dir) => {
      // Per-dimension collapse/deadness screen: mean, variance, range
      // and near-zero mass for each of the 64 coordinates. A dead dim
      // (var≈0) or a runaway dim (|mean|≫0 on unit vectors) is the
      // classic symptom of a collapsed encoder. One posexplode, one
      // 64-group partial agg; moments on the 2^20 grid (qx ≤ 2^21, so
      // Σqx² fits int64 comfortably below ~2^40 rows — the decimal
      // escalation for beyond-that corpora is a one-line cast).
      val byDim = t(s, dir, "embeddings")
        .select(posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "x")))
        .withColumn("qx", q(col("x"), 1048576.0))
      val n = count(lit(1))
      val meanQ = sum(col("qx")).cast("double") / n
      byDim.groupBy(col("pos"))
        .agg(n.as("n"),
          (sum(col("qx")).cast("double") / (n * lit(1048576.0))).as("mean_x"),
          ((sum(col("qx") * col("qx")).cast("double") / n - meanQ * meanQ)
            / lit(1048576.0 * 1048576.0)).as("var_x"),
          (min(col("qx")) / lit(1048576.0)).as("min_x"),
          (max(col("qx")) / lit(1048576.0)).as("max_x"),
          (sum(when(abs(col("x")) < 0.01, 1L).otherwise(0L)).cast("double") / n)
            .as("near_zero_frac"))
        .orderBy(col("pos"))
    }),
    "q_emb_label_margin" -> ((s, dir) => {
      // Label-noise screen: cosine margin of each vector to its OWN
      // label centroid vs the best OTHER centroid; a negative margin
      // flags a likely mislabel. Centroids are per-(label, pos) grid
      // means (label×dim rows — broadcast), the scoring join is N×L.
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
      val cen = emb
        .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .withColumn("qx", q(col("x"), 1048576.0))
        .groupBy(col("label"), col("pos"))
        .agg((sum(col("qx")).cast("double") / (count(lit(1)) * lit(1048576.0)))
          .as("cx"))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          e => e.getField("cx")).as("cv"))
        .select(col("label").as("clabel"), col("cv"))
      val scored = emb.join(broadcast(cen))
        .withColumn("cos", AnnSearch.cosine(col("v"), col("cv")))
      val per = scored.groupBy(col("vec_id"), col("label"))
        .agg(max(when(col("clabel") === col("label"), col("cos"))).as("cos_own"),
          max(when(col("clabel") =!= col("label"), col("cos"))).as("best_other"))
        .withColumn("margin", col("cos_own") - col("best_other"))
        .withColumn("qm", q(col("margin"), 1e6))
      per.groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("margin") < 0, 1L).otherwise(0L)).as("n_mislabeled"),
          (sum(col("qm")).cast("double") / (count(lit(1)) * lit(1e6)))
            .as("mean_margin"),
          (min(col("qm")) / lit(1e6)).as("min_margin"),
          (max(col("qm")) / lit(1e6)).as("max_margin"))
        .orderBy(col("label"))
    }),

    "q_emb_jl" -> ((s, dir) => {
      // Johnson-Lindenstrauss distance-preservation audit: project
      // 64-dim embeddings to 16 dims through the seeded ±1 sign
      // matrix (Projection.jlProject — k native vec_dot kernels per
      // row, zero shuffles) and report, for a deterministic pair
      // sample, the original vs projected squared distance and their
      // ratio. Distances use the dot-identity d² = aa − 2ab + bb so
      // both engines fold the SAME three sequential dot products —
      // bit-identical doubles before the 1e-6 grid.
      val m = graft.llm.Projection.seededSignMatrix(dOut = 16, dIn = 64)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("pv", graft.llm.Projection.jlColumn(col("v"), m))
      val a = e.where(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("id_a"), col("v").as("va"), col("pv").as("pa"))
      val b = e.select((col("vec_id") - 1).as("id_a"), col("vec_id").as("id_b"),
        col("v").as("vb"), col("pv").as("pb"))
      def d2(x: Column, y: Column): Column =
        AnnSearch.dot(x, x) - lit(2.0) * AnnSearch.dot(x, y) + AnnSearch.dot(y, y)
      a.join(b, "id_a")
        .withColumn("d2o", d2(col("va"), col("vb")))
        .withColumn("d2p", d2(col("pa"), col("pb")))
        .select(col("id_a"), col("id_b"),
          round(col("d2o"), 6).as("d2_orig"),
          round(col("d2p"), 6).as("d2_proj"),
          round(col("d2p") / col("d2o"), 6).as("ratio"))
        .orderBy(col("id_a"))
    })
  )

  /** The 16×64 seeded JL sign matrix as DuckDB VALUES rows. */
  private def jlMatrixRows: String =
    graft.llm.Projection.seededSignMatrix(dOut = 16, dIn = 64).zipWithIndex
      .map { case (r0, j) => s"($j, [${r0.mkString(", ")}]::DOUBLE[])" }
      .mkString(",\n")

  val oracle: Map[String, String] = Map(
    "q_emb_jl" ->
      s"""WITH r(j, rw) AS (VALUES
        |$jlMatrixRows),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT e.vec_id, e.v,
        |  (SELECT list(list_dot_product(e.v, r.rw) / sqrt(16.0) ORDER BY r.j)
        |   FROM r) AS pv
        |  FROM e),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_dot_product(a.v, a.v) - 2.0 * list_dot_product(a.v, b.v)
        |      + list_dot_product(b.v, b.v) AS d2o,
        |    list_dot_product(a.pv, a.pv) - 2.0 * list_dot_product(a.pv, b.pv)
        |      + list_dot_product(b.pv, b.pv) AS d2p
        |  FROM p a JOIN p b ON b.vec_id = a.vec_id + 1
        |  WHERE a.vec_id % 10 = 0)
        |SELECT id_a, id_b, round(d2o, 6) AS d2_orig, round(d2p, 6) AS d2_proj,
        |  round(d2p / d2o, 6) AS ratio
        |FROM pairs ORDER BY id_a""".stripMargin,
    "q_emb_norm_audit" ->
      """WITH e AS (SELECT label,
        |  sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |g AS (SELECT label, nrm, CAST(floor(nrm * 1e8) AS BIGINT) AS qn FROM e)
        |SELECT label, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  CAST(SUM(CASE WHEN isnan(nrm) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
        |  MIN(qn) / 1e8 AS min_norm,
        |  MAX(qn) / 1e8 AS max_norm,
        |  CAST(SUM(qn) AS DOUBLE) / (COUNT(*) * 1e8) AS mean_norm
        |FROM g GROUP BY label ORDER BY label""".stripMargin,
    "q_emb_dim_audit" ->
      """WITH d AS (
        |  SELECT unnest(generate_series(0, len(embedding) - 1)) AS pos,
        |         unnest(embedding::DOUBLE[]) AS x
        |  FROM embeddings),
        |g AS (SELECT pos, x, CAST(floor(x * 1048576.0) AS BIGINT) AS qx FROM d)
        |SELECT CAST(pos AS INT) AS pos, COUNT(*) AS n,
        |  CAST(SUM(qx) AS DOUBLE) / (COUNT(*) * 1048576.0) AS mean_x,
        |  (CAST(SUM(qx * qx) AS DOUBLE) / COUNT(*)
        |    - (CAST(SUM(qx) AS DOUBLE) / COUNT(*)) * (CAST(SUM(qx) AS DOUBLE) / COUNT(*)))
        |    / (1048576.0 * 1048576.0) AS var_x,
        |  MIN(qx) / 1048576.0 AS min_x,
        |  MAX(qx) / 1048576.0 AS max_x,
        |  CAST(SUM(CASE WHEN abs(x) < 0.01 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
        |    AS near_zero_frac
        |FROM g GROUP BY pos ORDER BY pos""".stripMargin,
    "q_emb_label_margin" ->
      """WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |qd AS (SELECT label, pos, CAST(floor(x * 1048576.0) AS BIGINT) AS qx FROM (
        |  SELECT label, unnest(generate_series(0, len(v) - 1)) AS pos, unnest(v) AS x
        |  FROM emb)),
        |cs AS (SELECT label, pos,
        |  CAST(SUM(qx) AS DOUBLE) / (COUNT(*) * 1048576.0) AS cx
        |  FROM qd GROUP BY label, pos),
        |cen AS (SELECT label AS clabel, list(cx ORDER BY pos) AS cv FROM cs GROUP BY label),
        |sc AS (SELECT e.vec_id, e.label, c.clabel,
        |  list_inner_product(e.v, c.cv) AS ip,
        |  sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(c.cv, c.cv)) AS dn
        |  FROM emb e CROSS JOIN cen c),
        |cosd AS (SELECT vec_id, label, clabel,
        |  least(greatest(CASE WHEN dn > 0 THEN ip / dn ELSE 0.0 END, -1.0), 1.0) AS cos
        |  FROM sc),
        |per AS (SELECT vec_id, label,
        |  MAX(CASE WHEN clabel = label THEN cos END) AS cos_own,
        |  MAX(CASE WHEN clabel <> label THEN cos END) AS best_other
        |  FROM cosd GROUP BY vec_id, label),
        |m AS (SELECT label, cos_own - best_other AS margin,
        |  CAST(floor((cos_own - best_other) * 1e6) AS BIGINT) AS qm FROM per)
        |SELECT label, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN margin < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_mislabeled,
        |  CAST(SUM(qm) AS DOUBLE) / (COUNT(*) * 1e6) AS mean_margin,
        |  MIN(qm) / 1e6 AS min_margin,
        |  MAX(qm) / 1e6 AS max_margin
        |FROM m GROUP BY label ORDER BY label""".stripMargin
  )
}
