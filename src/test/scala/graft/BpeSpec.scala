package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE tokenizer: training determinism, encoder/merge-order semantics,
  * the frozen deployment table, and the stored catalog. The registered
  * rows (`ana_token_counts_bpe`, `samp_pack_bpe`) are oracle-checked —
  * DuckDB replays the encoder one splice at a time — so this spec pins
  * the pieces the oracle composes. */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("training merges the most frequent pair first; ranks reflect frequency") {
    // pairs: (a,b) 2·10+5 = 25, (b,a) 10, (b,c) 5
    val m = Bpe.trainFromCounts(Seq("abab" -> 10L, "abc" -> 5L), 10)
    assert(m.head === ("a", "b"))
    // after merge 1 the words are [ab ab]×10 and [ab c]×5
    assert(m(1) === ("ab", "ab"))
  }

  test("a pair seen fewer than twice is never merged (frequency floor)") {
    assert(Bpe.trainFromCounts(Seq("xy" -> 1L), 10) === Vector.empty)
    // the floor is weighted: one word with count 2 IS frequency 2
    assert(Bpe.trainFromCounts(Seq("xy" -> 2L), 10).head === ("x", "y"))
  }

  test("ties break lexicographically — training is a pure function of counts") {
    // (a,b) and (c,d) both weight 2 → (a,b) wins by pair order
    val m = Bpe.trainFromCounts(Seq("ab" -> 2L, "cd" -> 2L), 1)
    assert(m === Vector(("a", "b")))
    assert(Bpe.trainFromCounts(Seq("cd" -> 2L, "ab" -> 2L), 1) === m)
  }

  test("encoding applies merges in rank order and reconstructs every word") {
    // training continues past rank 2: (ab,c) still weighs 5 → "abc" is a
    // learned token; "abd"'s (ab,d) never reached weight 2 and splits
    val m = Bpe.trainFromCounts(Seq("abab" -> 10L, "abc" -> 5L), 10)
    assert(Bpe.tokensScala("abab abc abd zq", m).toSeq ===
      Seq("abab", "abc", "ab", "d", "z", "q"))
    // concatenating a word's tokens is the word, for any input
    val words = Seq("interleaving", "abcabc", "zzz", "a")
    words.foreach { w =>
      assert(Bpe.tokensScala(w, Bpe.frozen).mkString("") === w)
    }
  }

  test("the frozen table loads, is rank-ordered and alnum-symbol only") {
    val f = Bpe.frozen
    assert(f.nonEmpty)
    assert(f.forall { case (l, r) => (l + r).matches("[a-z0-9]+") },
      "symbols must be embeddable as plain SQL literals")
    // every merged symbol was created by an earlier merge or is a char —
    // the invariant that makes merge-all == one-at-a-time (oracle parity)
    val known = scala.collection.mutable.Set.empty[String]
    f.foreach { case (l, r) =>
      assert(l.length == 1 || known(l), s"left symbol '$l' unseen at its rank")
      assert(r.length == 1 || known(r), s"right symbol '$r' unseen at its rank")
      known += (l + r)
    }
  }

  test("the stored catalog trains once and reloads the identical table") {
    val dir = "/root/testdata/sf0.001"
    val name = TableStore.tableName("bpe60", dir)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val first = BpeCatalog.merges(spark, dir, nMerges = 60)
    assert(first.nonEmpty)
    // second read resolves the stored table, not a retrain
    assert(BpeCatalog.merges(spark, dir, nMerges = 60) === first)
    // and matches a direct train on the same corpus (pure function)
    assert(first === Bpe.train(Tables.documents(spark, dir), "text", 60))
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }
}
