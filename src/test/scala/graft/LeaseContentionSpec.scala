package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CROSS-JVM lease contention, modeled faithfully in-process: two
  * [[LeaseArbiter]] instances share NOTHING but the filesystem — separate
  * per-scope JVM locks, separate keepalive daemons, separate reentrancy
  * state — exactly the footing two real driver JVMs have. The same-JVM
  * tests (MaintenanceLeaseSpec) never exercise the file protocol under
  * true concurrency because the per-scope JVM lock serializes first; here
  * every acquisition from arbiter A races arbiter B's through
  * create/verify/break alone.
  *
  * Two legs per property: the local FS's atomic hard-link publish (the
  * default), and `linkPublishEnabled = false` forcing the non-atomic
  * exists-then-create fallback — the object-store shape (s3a/gs/abfs PUT)
  * where only the delayed double verify stands between two same-instant
  * creators and a double-held scope. */
class LeaseContentionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkArbiter(atomicLink: Boolean): LeaseArbiter =
    if (atomicLink) new LeaseArbiter {}
    else new LeaseArbiter { override protected def linkPublishEnabled = false }

  /** N acquisitions per thread, two threads per arbiter, all storming one
    * scope: a shared counter proves at most one holder at any instant. */
  private def storm(scope: String, atomicLink: Boolean): Unit = {
    val a = mkArbiter(atomicLink)
    val b = mkArbiter(atomicLink)
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val entries = new java.util.concurrent.atomic.AtomicInteger(0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val perThread = 6
    val threads = Seq(a, a, b, b).zipWithIndex.map { case (arb, i) =>
      new Thread(() => {
        try {
          var n = 0
          while (n < perThread) {
            arb.withLease(spark, scope, waitMs = 30 * 1000L) {
              val now = inside.incrementAndGet()
              maxSeen.accumulateAndGet(now, math.max)
              entries.incrementAndGet()
              Thread.sleep(15)
              inside.decrementAndGet()
            }
            n += 1
          }
        } catch { case t: Throwable => errors.add(t) }
      }, s"storm-$scope-$i")
    }
    threads.foreach(_.start()); threads.foreach(_.join(120 * 1000L))
    assert(errors.isEmpty, s"storm threads failed: ${errors.peek()}")
    assert(entries.get() === 4 * perThread, "every acquisition completed")
    assert(maxSeen.get() === 1,
      s"scope '$scope' was held by ${maxSeen.get()} writers at once — " +
        "the cross-JVM file protocol double-held")
  }

  test("two isolated arbiters storm one scope, atomic link publish: never two holders") {
    storm("xjvm_storm_link", atomicLink = true)
  }

  test("two isolated arbiters storm one scope, non-atomic create forced (object-store shape): never two holders") {
    storm("xjvm_storm_put", atomicLink = false)
  }

  test("keepalive defends a LIVE holder against the other arbiter's TTL break; release hands over cleanly") {
    val a = mkArbiter(atomicLink = true)
    val b = mkArbiter(atomicLink = true)
    val scope = "xjvm_keepalive"
    val holderDone = new java.util.concurrent.CountDownLatch(1)
    val holderStarted = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      // ttl 600 ms but the job runs 3 s: only the keepalive's mtime
      // refreshes keep arbiter B from TTL-breaking the live lease
      a.withLease(spark, scope, ttlMs = 600L, waitMs = 5 * 1000L) {
        holderStarted.countDown()
        Thread.sleep(3000)
      }
      holderDone.countDown()
    }, "xjvm-holder")
    holder.start()
    assert(holderStarted.await(10, java.util.concurrent.TimeUnit.SECONDS))
    Thread.sleep(900) // the raw file is now older than its 600 ms TTL would allow unrefreshed
    val denied = intercept[IllegalStateException] {
      b.withLease(spark, scope, ttlMs = 600L, waitMs = 1200L) {
        fail("arbiter B must never enter while A's keepalive holds the scope")
      }
    }
    assert(denied.getMessage.contains(scope))
    assert(holderDone.await(10, java.util.concurrent.TimeUnit.SECONDS))
    holder.join()
    // after A releases, B acquires the same scope without breaking anything
    var entered = false
    b.withLease(spark, scope, ttlMs = 600L, waitMs = 5 * 1000L) { entered = true }
    assert(entered)
  }

  test("a dead foreign writer's stale lease is TTL-broken by the other arbiter") {
    val b = mkArbiter(atomicLink = true)
    val scope = "xjvm_dead_writer"
    val path = MaintenanceLease.leasePath(spark, scope)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    out.write("crashed-jvm:pid0:dead:0".getBytes("UTF-8")); out.close()
    fs.setTimes(path, System.currentTimeMillis() - 60 * 60 * 1000L, -1)
    var entered = false
    b.withLease(spark, scope, ttlMs = 1000L, waitMs = 5 * 1000L) { entered = true }
    assert(entered, "a lease older than its TTL belongs to a dead writer and must break")
    assert(!fs.exists(path), "released cleanly after the break-acquire")
  }
}
