package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY.md §2.6), as
  * higher-order Column expressions (`zip_with`/`aggregate`/`transform`) —
  * codegen-friendly, no UDF serialization, and oracle-comparable because the
  * fold order is the sequential left-to-right order DuckDB's list kernels use.
  *
  * All arithmetic is forced to double precision (the fixtures store float32;
  * folding in float would diverge from any SQL oracle).
  *
  * Reference semantics: cosine KNN over 384-dim vectors, cosine metric
  * (/root/reference/src/feature_pipeline/vector_storage/index_manager.py:38,371).
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product: sum_i a_i * b_i. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dotProduct(a, a)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** Scala-side cosine: identical fold order (and therefore bit-identical
    * doubles) to the Column-expression form, but compiled — the interpreted
    * higher-order-function tree costs ~1 ms per 64-dim pair, this ~1 µs.
    * Used by every hot path; the Column form remains for reference. */
  def cosineScala(a: Seq[Float], b: Seq[Float]): Double = {
    if (a == null || b == null) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Primitive-array twin of cosineScala for tight kernels (no Seq boxing). */
  def cosineArrays(a: Array[Float], b: Array[Float]): Double = {
    if (a == null || b == null) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Cosine similarity in [-1, 1]; null-safe, 0.0 when either norm is 0.
    * Backed by the native codegen Catalyst expression
    * (graft.expressions.CosineSimilarityExpr) — no UDF boundary, stays
    * inside whole-stage codegen, bit-identical to the sequential-fold forms. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.expressions.CosineSimilarityExpr(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** Column-expression cosine (kept for contexts that must stay UDF-free;
    * same fold order and results as cosineSimilarity). */
  def cosineSimilarityExpr(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(a.isNull || b.isNull || denom === 0.0, lit(0.0))
      .otherwise(dotProduct(a, b) / denom)
  }

  /** Atlas-style score mapping: (1 + cosine) / 2 ∈ [0, 1] — the score scale
    * the reference's thresholds (0.7 / 0.75) are calibrated against. */
  def cosineScore(a: Column, b: Column): Column =
    (cosineSimilarity(a, b) + 1.0) / 2.0

  /** Euclidean distance (used by the LSH scale path, where euclidean on
    * l2-normalized vectors preserves cosine ordering). */
  def euclideanDistance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** L2-normalize a vector; returns the zero vector unchanged. */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, asDouble(a)).otherwise(transform(asDouble(a), x => x / n))
  }

  /** Jaccard word-set similarity (advanced_search.py:297-311): |A∩B|/|A∪B|
    * over lowercased whitespace-split word sets; 1.0 when both empty, 0.0
    * when exactly one is empty. */
  def jaccardWords(a: Column, b: Column): Column = {
    def wordSet(c: Column): Column =
      array_distinct(filter(split(lower(c), "\\s+"), w => length(w) > 0))
    val wa = wordSet(a)
    val wb = wordSet(b)
    when(size(wa) === 0 && size(wb) === 0, lit(1.0))
      .when(size(wa) === 0 || size(wb) === 0, lit(0.0))
      .otherwise(size(array_intersect(wa, wb)).cast("double") /
                 size(array_union(wa, wb)).cast("double"))
  }
}
