package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, rank per
  * query). Scale paths: IVF (deterministic seed centroids, probe the
  * nearest lists) and random-hyperplane LSH bucketing for near-duplicate
  * pairs. The dot product / norms are pure Catalyst HOFs (`aggregate` over
  * `zip_with`) with strictly sequential summation — which makes the doubles
  * bit-identical to the DuckDB oracle's list_reduce.
  */
object Similarity {

  /** Sequential-order dot product of two double arrays (codegen HOF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k: every `stride`-th vector is a query;
    * queries are broadcast (small side), candidates scanned once, ranked
    * per query. Self-matches excluded. O(Q x N) — the correctness anchor
    * and the right plan when Q is small.
    */
  def bruteTopK(emb: DataFrame, k: Int = 10, stride: Int = 50): DataFrame = {
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val queries = base.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q"))
    val scored = base.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q"), col("v")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "cos", "rank")
  }

  /** IVF-style ANN: `nlist` deterministic seed centroids (every N/nlist-th
    * vector), one broadcast pass assigns each vector to its nearest
    * centroid; a query searches only its `nprobe` nearest lists. Exchanges:
    * none for assignment (broadcast), one for the candidate join. Recall
    * is tested against bruteTopK.
    */
  def ivfTopK(emb: DataFrame, k: Int = 10, stride: Int = 50, nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val n = base.count()
    val cstride = math.max(1L, n / nlist)
    val centroids = base.filter(col("vec_id") % cstride === 0)
      .limit(nlist)
      .select(col("vec_id").as("c_id"), col("v").as("c"))

    // assignment: cross with broadcast centroids, rank by cosine
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("ccos").desc, col("c_id").asc)
    val assigned = base.join(broadcast(centroids), lit(true))
      .withColumn("ccos", cosine(col("v"), col("c")))
      .withColumn("crank", row_number().over(wv))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("v"), col("c_id").as("list_id"))

    val queries = assigned.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q"))
    val probes = queries.join(broadcast(centroids), lit(true))
      .withColumn("ccos", cosine(col("q"), col("c")))
      .withColumn("crank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("ccos").desc, col("c_id").asc)))
      .filter(col("crank") <= nprobe)
      .select(col("q_id"), col("q"), col("c_id").as("list_id"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    probes.join(assigned, "list_id")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "cos", "rank")
  }

  /** Random-hyperplane LSH code: bit j = sign of <v, h_j> where hyperplane
    * h_j's components are deterministic pseudo-random +/-1 derived from
    * xxhash64(j, dim_index). Near-dup pairs = same `prefixBits`-bit code
    * bucket, verified by exact cosine >= threshold.
    */
  def lshCosinePairs(emb: DataFrame, planes: Int = 16,
      threshold: Double = 0.9): DataFrame = {
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val code = aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, j) => {
        val proj = aggregate(
          zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
            (x, d) => when(call_function("shiftright", xxhash64(j, d), lit(7)).bitwiseAND(1) === 1, x)
              .otherwise(-x)),
          lit(0.0), (a, x) => a + x)
        acc.bitwiseOR(when(proj > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L))
      })
    val coded = base.withColumn("code", code)
    coded.as("a").join(coded.as("b"),
        col("a.code") === col("b.code") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
