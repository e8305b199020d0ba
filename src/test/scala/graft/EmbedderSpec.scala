package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Embedder

class EmbedderSpec extends AnyFunSuite {

  test("produces 384-dim l2-normalized vectors") {
    val v = Embedder.embedText("the quick brown fox jumps over the lazy dog")
    assert(v.length === Embedder.Dim)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("deterministic across calls") {
    val a = Embedder.embedText("spark catalyst tungsten")
    val b = Embedder.embedText("spark catalyst tungsten")
    assert(a.toSeq === b.toSeq)
  }

  test("empty/null text maps to the zero vector") {
    assert(Embedder.embedText("").forall(_ == 0f))
    assert(Embedder.embedText(null).forall(_ == 0f))
  }

  test("distinct texts map to distinct vectors") {
    val a = Embedder.embedText("completely different subject matter")
    val b = Embedder.embedText("spark catalyst tungsten")
    assert(a.toSeq !== b.toSeq)
  }

  test("bag-of-features: token order does not change the vector") {
    val a = Embedder.embedText("alpha beta gamma")
    val b = Embedder.embedText("gamma alpha beta")
    assert(a.toSeq === b.toSeq)
  }

  test("mapPartitions batch form agrees with the per-row form") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val docs = Seq((1L, "spark engine"), (2L, "quality filter"), (3L, "")).toDF("id", "text")
    val batched = Embedder.embedPartitions(docs, "id", "text", batchSize = 2)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(batched("1") === Embedder.embedText("spark engine").toSeq)
    assert(batched("3").forall(_ == 0f))
  }

  test("a custom TextEmbedder drops into embedPartitions without operator changes") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    // stand-in for an ONNX MiniLM: 4-dim unit vector keyed on text length
    object FakeModel extends graft.operators.TextEmbedder {
      val name = "fake-4d"; val dim = 4
      def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] =
        texts.map { t =>
          val v = new Array[Float](dim); v(t.length % dim) = 1f; v
        }
    }
    val docs = Seq((1L, "ab"), (2L, "abcde")).toDF("id", "text")
    val out = Embedder.embedPartitions(docs, "id", "text", batchSize = 1, model = FakeModel)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(out("1") === Seq(0f, 0f, 1f, 0f))
    assert(out("2") === Seq(0f, 1f, 0f, 0f))
  }

  test("similar texts are closer than dissimilar ones (cosine)") {
    def cos(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (a, b) => a.toDouble * b }.sum
    val base  = Embedder.embedText("spark sql query engine optimizer")
    val near  = Embedder.embedText("spark sql query engine planner")
    val far   = Embedder.embedText("banana smoothie breakfast recipe")
    assert(cos(base, near) > cos(base, far))
  }

  test("featurePipeline runs unchanged under a second TextEmbedder (the V1 seam)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val docs = Seq(
      (1L, "spark engine quality documents with enough words to chunk " * 25),
      (2L, "a second document body about storage catalogs and joins " * 30))
      .toDF("doc_id", "text")
    val model = new graft.operators.RandomProjectionEmbedder(dim = 16)
    val default = graft.pipelines.Pipelines.featurePipeline(docs, qualityThreshold = 0.0)
    val swapped = graft.pipelines.Pipelines.featurePipeline(docs, qualityThreshold = 0.0,
      embedder = model)
    // same chunks either way: the model swap touches only the embed stage
    assert(default.select("chunk_id").collect().map(_.getString(0)).sorted.toSeq ===
      swapped.select("chunk_id").collect().map(_.getString(0)).sorted.toSeq)
    val rows = swapped.select("content", "embedding", "embedding_model").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(2) === model.name)
      val got = r.getSeq[Float](1)
      assert(got.length === model.dim)
      // the distributed mapPartitions path emits exactly what the model
      // emits driver-side — batch plumbing can't reorder or mis-pair
      assert(got === model.embedBatch(Iterator(r.getString(0))).next().toSeq)
      val norm = math.sqrt(got.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
    // and the plan is a narrow map — no exchange introduced by the swap
    val plan = swapped.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"embed stage must not shuffle:\n$plan")
  }
}
