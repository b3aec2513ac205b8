package graft

import org.apache.spark.sql.functions._

import graft.search.Ingest

/** Blue/green generation lifecycle: time travel by number, vacuum
  * retention, and the CURRENT-is-sacred rule. */
class GenerationsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft-genspec").toString

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, s"text $i"))
      .toDF("doc_id", "text").withColumn("collection_id", lit("c"))

  test("every retained generation reads back by number with its own " +
      "contents; unknown generations fail loudly") {
    val root = freshRoot()
    Ingest.reindexSwap(spark, docs(3), root)
    Ingest.reindexSwap(spark, docs(5), root)
    assert(Ingest.readGeneration(spark, root, 0).count() == 3)
    assert(Ingest.readGeneration(spark, root, 1).count() == 5)
    assert(Ingest.readCurrent(spark, root).count() == 5)
    assert(Ingest.listGenerations(root) == Seq(0, 1))
    val ex = intercept[IllegalArgumentException] {
      Ingest.readGeneration(spark, root, 7)
    }
    assert(ex.getMessage.contains("not retained"))
  }

  test("vacuum keeps the newest `keep` generations, returns the " +
      "reclaimed set, and NEVER deletes the CURRENT target") {
    val root = freshRoot()
    for (n <- Seq(1, 2, 3, 4)) Ingest.reindexSwap(spark, docs(n), root)
    val deleted = Ingest.vacuumGenerations(root, keep = 2)
    assert(deleted == Seq(0, 1))
    assert(Ingest.listGenerations(root) == Seq(2, 3))
    assert(Ingest.readCurrent(spark, root).count() == 4)
    // CURRENT pinned to an OLD generation: vacuum must spare it even
    // when the keep window would reclaim it
    val tmp = new java.io.File(root, "CURRENT.tmp")
    java.nio.file.Files.writeString(tmp.toPath, "gen-2")
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(root, "CURRENT").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // after a pointer ROLLBACK to gen-2, the next swap must allocate a
    // FRESH number past the retained gen-3 — never overwrite retained
    // history (the r14 allocation rule: max(pointer, dirs, claims)+1)
    Ingest.reindexSwap(spark, docs(6), root)
    assert(Ingest.readCurrent(spark, root).count() == 6)
    assert(Ingest.readGeneration(spark, root, 3).count() == 4)
    assert(Ingest.listGenerations(root) == Seq(2, 3, 4))
    val del2 = Ingest.vacuumGenerations(root, keep = 1)
    assert(del2 == Seq(2, 3))
    val cur = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(root, "CURRENT").toPath)).trim
    assert(Ingest.listGenerations(root)
      .contains(cur.stripPrefix("gen-").toInt))
  }

  test("generation numbers are NEVER reused (VERDICT r14 #5): rollback " +
      "+ vacuum-all-above still allocates a fresh number via HIGHWATER") {
    val root = freshRoot()
    for (n <- Seq(1, 2, 3)) Ingest.reindexSwap(spark, docs(n), root)
    // roll the pointer back to gen-0 (time travel) ...
    val tmp = new java.io.File(root, "CURRENT.tmp")
    java.nio.file.Files.writeString(tmp.toPath, "gen-0")
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(root, "CURRENT").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // ... then remove EVERYTHING above it: vacuum reclaims gen-1 (it
    // always spares the newest + CURRENT), and gen-2 — dir AND claim
    // marker — goes the way an external cleanup / crashed host would
    // take it. This is the exact state that let
    // max(pointer, dirs, claims)+1 re-allocate an old number.
    val deleted = Ingest.vacuumGenerations(root, keep = 1)
    assert(deleted == Seq(1))
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
        st.iterator().asScala.toSeq
      }.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists)
    }
    rmTree(new java.io.File(root, "gen-2").toPath)
    java.nio.file.Files.deleteIfExists(
      new java.io.File(root, "gen-2.CLAIM").toPath)
    assert(Ingest.listGenerations(root) == Seq(0))
    // the next swap must take a number no stale reader has ever seen
    Ingest.reindexSwap(spark, docs(9), root)
    assert(Ingest.listGenerations(root) == Seq(0, 3))
    assert(Ingest.readCurrent(spark, root).count() == 9)
  }

  test("orphan claim markers below the pointer are reclaimed by " +
      "vacuum; the number still never comes back (ADVICE r14)") {
    val root = freshRoot()
    for (n <- Seq(1, 2)) Ingest.reindexSwap(spark, docs(n), root)
    // simulate a writer that crashed between claim and pointer flip:
    // gen-0's claim marker survives but its directory is gone — a
    // marker BELOW the pointer with no matching directory
    val orphan = new java.io.File(root, "gen-0.CLAIM")
    assert(orphan.exists()) // writer 0's real claim
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
        st.iterator().asScala.toSeq
      }.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists)
    }
    rmTree(new java.io.File(root, "gen-0").toPath)
    Ingest.vacuumGenerations(root, keep = 2)
    assert(!orphan.exists())
    // HIGHWATER still prevents reuse of any number ever claimed
    Ingest.reindexSwap(spark, docs(7), root)
    assert(Ingest.listGenerations(root) == Seq(1, 2))
  }

  test("two-writer race (VERDICT r13 #7): the claim mutex makes a tie " +
      "fail loudly, and overlapping writers take disjoint generations " +
      "with single-writer content") {
    val root = freshRoot()
    // the mutex primitive: exactly one claimant per generation number
    Ingest.claimGeneration(root, 5)
    val ex = intercept[IllegalStateException] {
      Ingest.claimGeneration(root, 5)
    }
    assert(ex.getMessage.contains("already claimed"))
    java.nio.file.Files.delete(
      new java.io.File(root, "gen-5.CLAIM").toPath)

    // end-to-end interleave: writer A claims its generation and blocks
    // mid-write; writer B starts while A is in flight. B must see A's
    // claim, take the NEXT number, and complete — both generations end
    // up single-writer, no silent file interleave, pointer at one of
    // them.
    val root2 = freshRoot()
    Ingest.reindexSwap(spark, docs(1), root2) // gen-0, both racers read it
    // latches live in the companion object (a closure-captured latch
    // would have to serialize with the task) and are RESET here so a
    // re-run of this body in one JVM still exercises the interleave
    // instead of sailing through already-open latches
    GenerationsSpec.reset()
    val aDf = docs(7).coalesce(1) // ONE blocked task, so writer B's job
                                  // still finds free local[32] slots
    var aTarget: String = null
    val writerA = new Thread(() => {
      aTarget = Ingest.reindexSwapRaw(spark, aDf.mapPartitions { it =>
        // executor-side block: the claim is already on disk when the
        // task runs, so the latch models a long in-flight write
        GenerationsSpec.aClaimed.countDown()
        GenerationsSpec.aRelease.await()
        it
      }(org.apache.spark.sql.Encoders.row(aDf.schema)), root2)
    })
    writerA.start()
    GenerationsSpec.aClaimed.await()
    // release A even if writer B throws — an un-counted latch would
    // otherwise hang the suite at join() with no timeout
    val bTarget =
      try Ingest.reindexSwapRaw(spark, docs(9), root2) // writer B
      finally GenerationsSpec.aRelease.countDown()
    writerA.join(120000)
    assert(!writerA.isAlive, "writer A did not finish after release")
    assert(aTarget != bTarget, "racing writers must take disjoint generations")
    assert(spark.read.parquet(aTarget).count() == 7)
    assert(spark.read.parquet(bTarget).count() == 9)
    assert(Ingest.listGenerations(root2) == Seq(0, 1, 2))
    val cur2 = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(root2, "CURRENT").toPath)).trim
    assert(Seq("gen-1", "gen-2").contains(cur2),
      s"pointer must land on one racer's generation, got $cur2")
  }
}

/** Latch holder for the two-writer race test — object fields reach
  * executor tasks by classloading, not closure serialization; reset()
  * makes the one-shot latches per-run. */
object GenerationsSpec {
  @volatile var aClaimed = new java.util.concurrent.CountDownLatch(1)
  @volatile var aRelease = new java.util.concurrent.CountDownLatch(1)
  def reset(): Unit = {
    aClaimed = new java.util.concurrent.CountDownLatch(1)
    aRelease = new java.util.concurrent.CountDownLatch(1)
  }
}
