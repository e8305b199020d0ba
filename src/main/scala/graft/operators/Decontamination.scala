package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation set — the curation step that keeps test data
  * out of the training corpus (the GPT-3/PaLM-style n-gram overlap rule).
  *
  * Shape at 100 TB: the eval side is always small (benchmarks are KBs to
  * MBs) — its distinct grams BROADCAST; the training side streams through
  * scan → explode → broadcast-hash-join, so the only shuffle carries the
  * matched (doc, gram) pairs, which the join has already reduced to
  * near-nothing (unrelated prose shares no 8-grams). Never a train-side
  * distinct before the join: de-duplicating the exploded corpus would
  * shuffle |corpus|×grams rows to save work the broadcast join does for
  * free.
  */
object Decontamination {

  /** Per-training-doc count of distinct word n-grams shared with the eval
    * set; docs with no overlap are absent (filter or anti-join against
    * this to drop contaminated docs). Documents shorter than n words
    * contribute their whole token string, so short exact copies still
    * flag. */
  def overlapCounts(train: DataFrame, evalSet: DataFrame, n: Int = 8,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // gram generation via the compiled shingle kernel (minHashShingleTable),
    // not the transform/slice Column tree: Spark's array HOFs are
    // interpreted, and per-doc interpretation was 30x the scan cost here
    def grams(df: DataFrame) =
      Dedup.minHashShingleTable(df, n, idCol, textCol)
        .select(col(idCol), explode(col("sh")).as("gram"))
    val evalGrams = broadcast(grams(evalSet).select("gram").distinct())
    // (doc, gram) is already unique here — the shingle kernel emits distinct
    // grams per doc and the eval side is distinct — so a plain count gives
    // the same n_overlap without countDistinct's two-phase Expand re-shuffle
    grams(train)
      .join(evalGrams, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
  }
}
