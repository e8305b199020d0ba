package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKAggregator

class TopKAggregatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bounded top-k equals sort+limit, with tie-break by id") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 5000L).map(i => (i, math.floor(rnd.nextDouble() * 100) / 100))
    val ds = rows.toDS().repartition(8)
    val viaAgg = ds.select(new TopKAggregator[Long](20).toColumn).head()
    val viaSort = rows.sortBy { case (id, s) => (-s, id) }.take(20)
    assert(viaAgg.toSeq === viaSort.toSeq)
  }

  test("k larger than input returns everything ranked") {
    import spark.implicits._
    val ds = Seq((1L, 0.5), (2L, 0.9), (3L, 0.1)).toDS()
    val out = ds.select(new TopKAggregator[Long](10).toColumn).head()
    assert(out === Seq((2L, 0.9), (1L, 0.5), (3L, 0.1)))
  }

  test("empty input yields empty result") {
    import spark.implicits._
    val ds = spark.emptyDataset[(Long, Double)]
    assert(ds.select(new TopKAggregator[Long](5).toColumn).head() === Seq.empty)
  }
}
