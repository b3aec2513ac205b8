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
    Ingest.reindexSwap(spark, docs(6), root) // gen-3 exists -> gen-3? no: next = cur+1 = 3
    // after repoint to gen-2, the next swap writes gen-3 (overwrite
    // mode makes this safe); vacuum keep=1 must still spare CURRENT
    val del2 = Ingest.vacuumGenerations(root, keep = 1)
    assert(!del2.contains(3) || Ingest.listGenerations(root).contains(3))
    val cur = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(root, "CURRENT").toPath)).trim
    assert(Ingest.listGenerations(root)
      .contains(cur.stripPrefix("gen-").toInt))
  }
}
