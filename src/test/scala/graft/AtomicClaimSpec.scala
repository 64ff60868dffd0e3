package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import graft.operators.AtomicClaim

/** The commit-claim primitive under every versioned log in the
  * engine: exactly one winner per destination, corpse healing that
  * can never destroy a valid commit.
  */
class AtomicClaimSpec extends SparkTestBase {

  private def fsAndConf = {
    val conf = spark.sparkContext.hadoopConfiguration
    (FileSystem.getLocal(conf), conf)
  }

  private def readBack(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  test("N concurrent claimants: exactly one wins, content is the winner's") {
    val (f, conf) = fsAndConf
    val dst = new Path(tmpDir("claim") + "/_commits/7")
    val n = 8
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val pool = scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(n))
    try {
      val wins = (0 until n).map { i =>
        Future {
          AtomicClaim.claim(f, conf, dst, s"writer-$i".getBytes("UTF-8"),
            () => readBack(f, dst).startsWith("writer-"))
        }(pool)
      }.map(Await.result(_, Duration("60s")))
      assert(wins.count(identity) === 1,
        s"expected exactly one winner, got ${wins.count(identity)}")
      val content = readBack(f, dst)
      val winner = wins.indexOf(true)
      assert(content === s"writer-$winner",
        s"dst must hold the winner's content, got $content")
    } finally pool.shutdown()
  }

  test("corpse is healed exactly once; concurrent claimants never destroy the healed winner") {
    // plant an unparseable corpse (a writer died mid-publish), then
    // race claimants at it: the heal lock must serialize the delete,
    // one claimant must win, and the final content must be a VALID
    // claimant's — the dual-winner / valid-commit-destroyed TOCTOU
    // would surface here as zero or two winners or corpse content
    val (f, conf) = fsAndConf
    for (round <- 0 until 5) {
      val dst = new Path(tmpDir("claimheal") + s"/_commits/r$round")
      f.mkdirs(dst.getParent)
      val out = f.create(dst, true)
      out.write("GARBAGE".getBytes("UTF-8")); out.close()
      val n = 6
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      val pool = scala.concurrent.ExecutionContext.fromExecutorService(
        java.util.concurrent.Executors.newFixedThreadPool(n))
      try {
        val wins = (0 until n).map { i =>
          Future {
            AtomicClaim.claim(f, conf, dst, s"writer-$i".getBytes("UTF-8"),
              () => scala.util.Try(readBack(f, dst).startsWith("writer-"))
                .getOrElse(false))
          }(pool)
        }.map(Await.result(_, Duration("60s")))
        assert(wins.count(identity) === 1,
          s"round $round: expected exactly one winner, got $wins")
        assert(readBack(f, dst) === s"writer-${wins.indexOf(true)}",
          s"round $round: final content must be the winner's")
      } finally pool.shutdown()
    }
  }

  test("claim against an existing valid commit loses without touching it") {
    val (f, conf) = fsAndConf
    val dst = new Path(tmpDir("claimlose") + "/_commits/3")
    f.mkdirs(dst.getParent)
    val out = f.create(dst, true)
    out.write("writer-original".getBytes("UTF-8")); out.close()
    val won = AtomicClaim.claim(f, conf, dst, "writer-late".getBytes("UTF-8"),
      () => readBack(f, dst).startsWith("writer-"))
    assert(!won)
    assert(readBack(f, dst) === "writer-original")
  }

  test("tryExclusiveCreate: one winner among racers") {
    val (f, _) = fsAndConf
    val lock = new Path(tmpDir("claimlock") + "/_commits/.lock")
    f.mkdirs(lock.getParent)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val pool = scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(6))
    try {
      val wins = (0 until 6).map { _ =>
        Future(AtomicClaim.tryExclusiveCreate(f, lock, isLocal = true))(pool)
      }.map(Await.result(_, Duration("30s")))
      assert(wins.count(identity) === 1, s"got $wins")
    } finally pool.shutdown()
  }
}
