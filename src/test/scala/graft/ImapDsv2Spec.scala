package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.v2.ImapDataSource

/** DataSource V2 staged-mailbox connector: format registration, parse
  * parity with the helper scan, filter pushdown that provably prunes
  * file reads, and column pruning that skips reads entirely. */
class ImapDsv2Spec extends SparkSpec {
  import spark.implicits._

  private def msg(uid: Long, body: String): String =
    s"From: a@example.com\r\nTo: b@example.com\r\n" +
      s"Message-ID: <m$uid@example.com>\r\nSubject: doc $uid\r\n" +
      s"Date: Thu, 01 Feb 2024 10:30:00 GMT\r\n\r\n$body"

  private lazy val root: String = {
    val r = Files.createTempDirectory("imap-dsv2").toString
    for ((mb, uv) <- Seq("INBOX" -> 7L, "Archive" -> 12L)) {
      val dir = Paths.get(r, mb)
      Files.createDirectories(dir)
      Files.write(dir.resolve("UIDVALIDITY"),
        uv.toString.getBytes(StandardCharsets.UTF_8))
      for (uid <- 1L to 10L)
        Files.write(dir.resolve(s"$uid.eml"),
          msg(uid, s"body $mb $uid").getBytes(StandardCharsets.UTF_8))
    }
    r
  }

  private def read() =
    spark.read.format("graft-imap").option("host", "mail.example.com")
      .load(root)

  test("reads and parses the staged tree via the registered short name") {
    val rows = read().orderBy("mailbox", "uid").collect()
    assert(rows.length === 20)
    val first = rows.head
    assert(first.getAs[String]("mailbox") === "Archive")
    assert(first.getAs[Long]("uidvalidity") === 12L)
    assert(first.getAs[String]("subject") === "doc 1")
    assert(first.getAs[String]("body") === "body Archive 1")
    assert(first.getAs[String]("uri") ===
      "imap://mail.example.com/Archive;uid=1")
  }

  test("mailbox + uid pushdown prunes files before they are opened") {
    ImapDataSource.filesOpened.set(0)
    val got = read()
      .filter(col("mailbox") === "INBOX" && col("uid") > 7)
      .select("mailbox", "uid", "body").collect()
    assert(got.map(_.getAs[Long]("uid")).sorted.toSeq === Seq(8L, 9L, 10L))
    assert(got.forall(_.getAs[String]("mailbox") == "INBOX"))
    // only the 3 surviving files were ever read — directory and
    // filename pruning happened at planning time
    assert(ImapDataSource.filesOpened.get() === 3L)
  }

  test("column pruning: stat-only projections never open a file") {
    ImapDataSource.filesOpened.set(0)
    val got = read().select("mailbox", "uid", "size_bytes", "change_hint")
      .collect()
    assert(got.length === 20)
    assert(got.forall(_.getAs[Long]("size_bytes") > 0))
    assert(ImapDataSource.filesOpened.get() === 0L)
  }

  test("DSv2 custom metrics report opened vs statted counts per scan") {
    def scanMetrics(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      df.collect()
      val scans = df.queryExecution.executedPlan.collectLeaves()
      scans.flatMap(_.metrics).map { case (k, m) => k -> m.value }.toMap
    }
    val full = scanMetrics(read().select("mailbox", "uid", "body"))
    assert(full.get("filesOpened").contains(20L), full)
    assert(full.get("filesStatted").contains(0L), full)
    val slim = scanMetrics(read().select("mailbox", "uid", "size_bytes"))
    assert(slim.get("filesOpened").contains(0L), slim)
    assert(slim.get("filesStatted").contains(20L), slim)
  }

  test("pushdown appears in the scan description; results match the " +
      "unpushed plan") {
    val filtered = read().filter(col("uid") <= 2)
    val desc = filtered.queryExecution.executedPlan.toString
    assert(desc.contains("graft-imap"), desc)
    val unpushed = read().collect().filter(_.getAs[Long]("uid") <= 2)
    assert(filtered.collect().map(_.toString).sorted.toSeq ===
      unpushed.map(_.toString).sorted.toSeq)
  }
}
