package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: normalize vectors ONCE map-side (cosine becomes a plain
  * dot product), then
  *  - brute-force top-k = broadcast the (small) query set against the
  *    corpus scan — one pass over the corpus, no corpus shuffle, partial
  *    top-k per partition via the rank window on (query, score);
  *  - LSH variant = random-hyperplane signatures (deterministic md5-seeded
  *    planes) bucket both sides; only bucket-mates are scored. At 100 TB
  *    the bucket join replaces the corpus-wide scan per query; plane count
  *    trades recall for bucket selectivity.
  *
  * All vector math is `zip_with`/`aggregate` over the array column —
  * codegen'd, no UDFs, sequential (index-order) summation so results are
  * bit-reproducible.
  */
object Similarity {

  /** Sum of an array<double> column, sequential order. */
  private def asum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    asum(zip_with(a, b, (x, y) => x * y))

  def norm(a: Column): Column = sqrt(asum(transform(a, x => x * x)))

  /** Cast float vector to double and scale to unit norm (zero vectors pass
    * through so downstream dot products yield 0, not NaN).
    */
  def normalized(a: Column): Column = {
    val d = transform(a, x => x.cast("double"))
    val n = norm(d)
    when(n > 0.0, transform(d, x => x / n)).otherwise(d)
  }

  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** All pairs (a < b) with cosine ≥ threshold — the embedding near-dup
    * primitive. O(n²) scoring: correct baseline at verification scale; use
    * [[lshTopK]]-style bucketing as the 100 TB path.
    */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val v = emb.select(col(idCol).as("id"), normalized(col(vecCol)).as("nv"))
    val l = v.as("l"); val r = v.as("r")
    l.join(r, col("l.id") < col("r.id"))
      .withColumn("cos", dot(col("l.nv"), col("r.nv")))
      .where(col("cos") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("cos"))
  }

  /** Brute-force cosine top-k: every query row against every corpus row,
    * rank by (cosine desc, corpus id asc), keep k. Broadcast the query side.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), normalized(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), normalized(col(vecCol)).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Deterministic random hyperplanes: component d of plane p is an md5-seeded
    * uniform in [-1, 1]. Driver-side constants, shipped as literals.
    */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dim) { (p, d) =>
      val h = mdig.digest(s"plane:$p:$d".getBytes("UTF-8"))
      val u = ((h(0) & 0xffL) << 24 | (h(1) & 0xffL) << 16 |
        (h(2) & 0xffL) << 8 | (h(3) & 0xffL)).toDouble / (1L << 32).toDouble
      u * 2.0 - 1.0
    }
  }

  /** Sign-bit LSH signature: bit p = (v · plane_p) > 0, emitted as one int
    * per `bandBits`-bit band for direct bucket equi-joins.
    */
  def lshBands(v: Column, planes: Array[Array[Double]], bandBits: Int): Column = {
    val bits = planes.map { pl =>
      val plc = array(pl.map(lit): _*)
      when(dot(v, plc) > 0.0, 1).otherwise(0)
    }
    val nBands = planes.length / bandBits
    array((0 until nBands).map { b =>
      (0 until bandBits).map(i => bits(b * bandBits + i) * (1 << i)).reduce(_ + _)
    }: _*)
  }

  /** LSH-bucketed approximate top-k: candidates = corpus rows sharing ≥1
    * signature band with the query; exact cosine rank within candidates.
    * Recall < 1 by construction — the scale path when brute force is too
    * expensive; recall is property-tested against [[bruteForceTopK]].
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 16, bandBits: Int = 4): DataFrame = {
    val planes = hyperplanes(nPlanes, 64)
    def prep(df: DataFrame, id: String) = {
      val nv = normalized(col(vecCol))
      df.select(col(idCol).as(id), nv.as(s"${id}_v"),
          posexplode(lshBands(nv, planes, bandBits)).as(Seq("band", "bk")))
    }
    val q = broadcast(prep(queries, "query_id"))
    val c = prep(corpus, "neighbor_id")
    val cand = c.join(q, c("band") === q("band") && c("bk") === q("bk") &&
        q("query_id") =!= c("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("query_id_v"), col("neighbor_id_v"))
      .distinct()
    cand.withColumn("cos", dot(col("query_id_v"), col("neighbor_id_v")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
