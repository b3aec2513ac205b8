package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2: Git repository connector (SURVEY.md §2.1).
  *
  * Semantics mirror packages/shared/connectors/git.py:
  *  - clone-or-fetch staging into a cache dir (shallow by default,
  *    git.py:471-560), checkout of a branch/tag/commit ref with a
  *    fetch fallback, commit sha resolved via rev-parse
  *  - enumeration skips the .git dir, empty files, and files over
  *    max_file_size (git.py:678-735)
  *  - uri = git://{repo_url}/{rel_path}; change_hint = the git BLOB
  *    sha of the content (git.py:714-721)
  *
  * Split of work: the clone/fetch runs on the DRIVER (network + git
  * binary — the same out-of-Spark staging step the reference performs);
  * everything after is the S1 distributed binaryFile scan over the
  * worktree. The blob sha is pure column arithmetic —
  * sha1("blob {size}\0" || content) — so the change hint costs no
  * driver work per file.
  */
object GitConnector {

  /** Connector config (ref git.py:79-247 config surface). */
  final case class GitSourceConfig(
      repoUrl: String,
      ref: String = "main",
      shallowDepth: Int = 1, // 0 = full history
      cacheDir: Option[String] = None,
      includeGlob: Option[String] = None,
      excludePattern: Option[String] = None,
      maxFileSize: Long = 50L * 1024 * 1024)

  final case class Staged(repoDir: String, commitSha: String)

  private def run(cwd: Option[File], cmd: String*): (Int, String, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    cwd.foreach(pb.directory)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val err = new String(p.getErrorStream.readAllBytes())
    val rc = p.waitFor()
    (rc, out.trim, err.trim)
  }

  private def git(cwd: File, args: String*): (Int, String, String) =
    run(Some(cwd), "git" +: args: _*)

  /** Clone (or fetch into an existing cache) and checkout the ref.
    * Returns the worktree dir and resolved commit sha.
    * Ref: git.py:471-560 (_clone_or_fetch). */
  def cloneOrFetch(cfg: GitSourceConfig): Staged = {
    val dir = new File(cfg.cacheDir.getOrElse(
      Files.createTempDirectory("graft-git-").toString))
    if (new File(dir, ".git").isDirectory) {
      val (rc, _, err) = git(dir, "fetch", "origin")
      require(rc == 0, s"git fetch failed: $err")
      // fetch only moves origin/<ref>; without this the stale local
      // branch checks out successfully and the scan silently reads the
      // OLD tree. Branches fast-forward to origin/<ref>; tags/commits
      // fall through to the plain checkout below.
      val (rcv, _, _) = git(dir, "rev-parse", "--verify",
        s"origin/${cfg.ref}")
      if (rcv == 0) {
        val (rcb, _, errb) =
          git(dir, "checkout", "-B", cfg.ref, s"origin/${cfg.ref}")
        require(rcb == 0, s"git checkout -B ${cfg.ref} failed: $errb")
      }
    } else {
      dir.mkdirs()
      val depthArgs =
        if (cfg.shallowDepth > 0)
          Seq("--depth", cfg.shallowDepth.toString)
        else Seq.empty
      val (rc, _, err) = run(None,
        Seq("git", "clone") ++ depthArgs ++
          Seq(cfg.repoUrl, dir.getAbsolutePath): _*)
      require(rc == 0, s"git clone ${cfg.repoUrl} failed: $err")
    }
    // checkout the ref; if unknown locally, fetch it first (git.py:525-543)
    val (rc0, _, _) = git(dir, "checkout", cfg.ref)
    if (rc0 != 0) {
      git(dir, "fetch", "origin", cfg.ref)
      val (rc1, _, err1) = git(dir, "checkout", cfg.ref)
      require(rc1 == 0, s"cannot checkout ref '${cfg.ref}': $err1")
    }
    val (rc2, sha, err2) = git(dir, "rev-parse", "HEAD")
    require(rc2 == 0, s"git rev-parse failed: $err2")
    Staged(dir.getAbsolutePath, sha)
  }

  /** Git blob sha of a binary content column:
    * sha1("blob {size}\0" || content) — bit-identical to
    * `git hash-object` for any file. Pure codegen column op. */
  def blobSha(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sha1(concat(
      concat(lit("blob "), length(content).cast("string"), lit("\u0000"))
        .cast("binary"),
      content))

  /** Relational half of [[scan]] (ref git.py:663-770 _enumerate_repo):
    * enumeration skip rules (empty files, max_file_size — the .git-dir
    * exclusion is a scan-time pathfilter), the git:// uri rewrite, and
    * the blob-sha change hint, over an already-staged scan relation
    * with (uri, content, size_bytes) columns. Pure column ops — usable
    * against any staged tree, including synthetic fixtures. */
  def toFileRefs(scanned: DataFrame, repoUrl: String, repoDir: String,
                 ref: String, commitSha: String,
                 maxFileSize: Long = 50L * 1024 * 1024): DataFrame = {
    val repoPrefix =
      s"^file:${java.util.regex.Pattern.quote(repoDir)}/"
    scanned
      .filter(col("size_bytes") > 0) // ref skips empty files
      .filter(col("size_bytes") <= maxFileSize)
      .withColumn("relative_path",
        regexp_replace(col("uri"), repoPrefix, ""))
      .withColumn("uri",
        concat(lit(s"git://$repoUrl/"), col("relative_path")))
      .withColumn("commit_sha", lit(commitSha))
      .withColumn("ref", lit(ref))
      .withColumn("change_hint", blobSha(col("content")))
  }

  /** Incremental-sync classification between two enumerated trees
    * (ref git.py:747-770: the change_hint is WHY the connector emits a
    * blob sha — downstream skips files whose hint is unchanged):
    * full-outer join on relative_path, status ∈ added/modified/
    * unchanged/deleted by hint comparison. */
  def diffByChangeHint(current: DataFrame, previous: DataFrame): DataFrame = {
    val cur = current.select(col("relative_path"),
      col("change_hint").as("_cur_hint"))
    val prev = previous.select(col("relative_path"),
      col("change_hint").as("_prev_hint"))
    cur.join(prev, Seq("relative_path"), "full_outer")
      .withColumn("status",
        when(col("_prev_hint").isNull, lit("added"))
          .when(col("_cur_hint").isNull, lit("deleted"))
          .when(col("_cur_hint") === col("_prev_hint"), lit("unchanged"))
          .otherwise(lit("modified")))
      .select("relative_path", "status")
  }

  /** Full S2 scan: stage the repo, then the distributed S1 scan over the
    * worktree. Output = the S1 FileReference schema plus
    * (relative_path, commit_sha, ref, change_hint), with uri rewritten
    * to git://{repo_url}/{rel_path}. */
  def scan(spark: SparkSession, cfg: GitSourceConfig): DataFrame = {
    val staged = cloneOrFetch(cfg)
    val gitDirPattern = "/\\.git/"
    val exclude = cfg.excludePattern match {
      case Some(p) => s"(?:$p)|$gitDirPattern"
      case None => gitDirPattern
    }
    toFileRefs(
      Sources.scanDirectory(spark, staged.repoDir, cfg.includeGlob,
        Some(exclude)),
      cfg.repoUrl, staged.repoDir, cfg.ref, staged.commitSha,
      cfg.maxFileSize)
  }
}
