package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.operators.RecursiveSplitter
import graft.functions.PorterStemmer
import graft.queries.DuckSql

/** Cross-engine fuzz dump for the two pure-SQL kernel replays
  * (DuckSql.chunkCtes / DuckSql.porterStemCtes): generates a deterministic
  * adversarial corpus far richer than the fixtures' vocabulary, runs the
  * SCALA kernels on it, and writes inputs + expected outputs + the replay
  * SQL to `outDir` for `tools/fuzz_check.py` to compare in DuckDB.
  *
  * The per-round driver gate pins the replays on the shared sf0.01 fixture;
  * this harness is the maintenance gate for the replay FRAGMENTS themselves
  * — texts with deep separator nesting, whitespace runs, unsplittable
  * blobs, and pathological (chunkSize, overlap) pairs the fixture never
  * reaches, plus a stemmer word matrix over every rule family. Run after
  * touching RecursiveSplitter / PorterStemmer / either DuckSql fragment:
  *
  * {{{
  *   sbt "runMain graft.SqlReplayFuzz /tmp/fuzz_out"
  *   python3 tools/fuzz_check.py /tmp/fuzz_out
  * }}}
  */
object SqlReplayFuzz {

  /** (chunkSize, overlap) grid: the two production shapes, the two
    * hierarchy shapes, and three adversarial corners (overlap ≈ size,
    * tiny sizes forcing char-level splits). */
  val Configs: Seq[(Int, Int)] =
    Seq((1000, 200), (2000, 400), (400, 100), (100, 20), (30, 29), (10, 3))

  private val Words = Vector("alpha", "be", "gamma9", "delta", "x",
    "longerword", "q2", "zz", "supercalifragilistic", "mid", "token", "a")

  private def genText(rng: scala.util.Random, style: Int): String = style match {
    case 0 => // paragraphs
      Seq.fill(1 + rng.nextInt(8)) {
        Seq.fill(rng.nextInt(61))(Words(rng.nextInt(Words.length))).mkString(" ")
      }.mkString("\n\n")
    case 1 => // lines
      Seq.fill(1 + rng.nextInt(12)) {
        Seq.fill(rng.nextInt(31))(Words(rng.nextInt(Words.length))).mkString(" ")
      }.mkString("\n")
    case 2 => // unsplittable blob (forces the char level)
      "x" * (1 + rng.nextInt(300))
    case 3 => // mixed separators, embedded blobs
      Seq.fill(1 + rng.nextInt(20)) {
        rng.nextInt(10) match {
          case 0 | 1          => "\n\n"
          case 2 | 3          => "\n"
          case 4              => " "
          case 5              => "x" * (50 + rng.nextInt(151))
          case _              => Words(rng.nextInt(Words.length))
        }
      }.mkString(" ")
    case _ => // whitespace-heavy
      Seq.fill(1 + rng.nextInt(120)) {
        Seq(" ", "\n", "\n\n", "w", "longishword ")(rng.nextInt(5))
      }.mkString
  }

  private def genWords(rng: scala.util.Random): Seq[String] = {
    val battery = graft.queries.TextQueries.StemSuffixes
    val bases = Seq("connect", "deriv", "activ", "nation", "form", "gener",
      "oper", "caress", "poni", "sky", "feed", "controll", "syzygy", "yy")
    val matrix = for (b <- bases; s <- battery) yield b + s
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val vowely = "aeiouywxlszbcdt"
    val rand = Seq.fill(3000) {
      val src = if (rng.nextBoolean()) alpha else vowely
      val n = 1 + rng.nextInt(12)
      Seq.fill(n)(src(rng.nextInt(src.length))).mkString
    }
    (matrix ++ rand).distinct
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_fuzz")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    new java.io.File(outDir).mkdirs()
    val rng = new scala.util.Random(7)
    val texts: Seq[(String, String)] =
      (0 until 150).map(i => (f"g$i%03d", genText(rng, i % 5))) ++
        Seq(("empty_ish", "   \n\n  \n "), ("one", "word"))
    texts.toDF("gid", "txt").coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/texts")

    val sqls = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for ((c, o) <- Configs) {
      val name = s"chunks_${c}_$o"
      val expected = texts.flatMap { case (gid, txt) =>
        RecursiveSplitter.splitText(txt, c, o).zipWithIndex.map {
          case (chunk, idx) => (gid, idx, chunk)
        }
      }
      expected.toDF("gid", "seq", "chunk").coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      sqls(name) =
        s"""WITH RECURSIVE src AS (SELECT gid, txt FROM texts),
            ${DuckSql.chunkCtes("ck", "src", c, o)}
            SELECT gid, seq, chunk FROM ck_chunks"""
    }

    val words = genWords(new scala.util.Random(42))
    words.toDF("w").coalesce(1).write.mode("overwrite").parquet(s"$outDir/words")
    words.map(w => (w, PorterStemmer.stem(w))).toDF("word", "stem").coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/stems")
    sqls("stems") =
      s"""WITH pw AS (SELECT w FROM words),
          ${DuckSql.porterStemCtes("pw")}
          SELECT w AS word, stem FROM stems"""

    // the hashing embedder on the same adversarial texts: nonzero
    // components, float32-exact (integer bucket sums + one normalize
    // rounding — DuckSql.embedCtes replays both)
    val embExpected = texts.flatMap { case (gid, txt) =>
      graft.operators.Embedder.embedText(txt).zipWithIndex.collect {
        case (v, i) if v != 0f => (gid, i, v)
      }
    }
    embExpected.toDF("gid", "dim", "val").coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/embeddings")
    sqls("embeddings") =
      s"""WITH RECURSIVE tsrc AS (SELECT gid, txt FROM texts),
          ${DuckSql.embedCtes("tsrc")}
          SELECT gid, dim, val FROM emb"""

    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
      case ch => ch.toString
    } + "\""
    val json = sqls.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/fuzz_sql.json"), json)
    println(s"[fuzz] ${texts.size} texts x ${Configs.size} configs + ${words.size} words -> $outDir")
    spark.stop()
  }
}
