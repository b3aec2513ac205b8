package graft

import java.io.File
import java.nio.file.Files

import graft.sources.GitConnector
import graft.sources.GitConnector.GitSourceConfig

/** S2 git connector over a locally-initialized fixture repo: clone
  * staging, ref checkout, .git/empty-file exclusion, uri/change_hint
  * contract (ref shared/connectors/git.py:663-770). */
class GitConnectorSpec extends SparkSpec {

  private def sh(cwd: File, cmd: String*): String = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val err = new String(p.getErrorStream.readAllBytes())
    assert(p.waitFor() == 0, s"${cmd.mkString(" ")} failed: $err")
    out.trim
  }

  private lazy val fixtureRepo: File = {
    val dir = Files.createTempDirectory("graft-git-fixture-").toFile
    sh(dir, "git", "init", "-b", "main", ".")
    Files.writeString(new File(dir, "README.md").toPath,
      "# graft fixture\nhello spark\n")
    new File(dir, "src").mkdirs()
    Files.writeString(new File(dir, "src/code.py").toPath,
      "print('hi')\n")
    Files.writeString(new File(dir, "empty.txt").toPath, "")
    sh(dir, "git", "add", "-A")
    sh(dir, "git", "-c", "user.email=t@t", "-c", "user.name=t",
      "commit", "-q", "-m", "fixture")
    dir
  }

  test("scan clones, checks out, and lists the worktree (S2 -> S1)") {
    val cfg = GitSourceConfig(repoUrl = fixtureRepo.getAbsolutePath)
    val got = GitConnector.scan(spark, cfg).collect()
    val byRel = got.map(r =>
      r.getAs[String]("relative_path") -> r).toMap
    // empty.txt skipped; .git contents never listed
    assert(byRel.keySet == Set("README.md", "src/code.py"))
    assert(got.forall(!_.getAs[String]("uri").contains("/.git/")))
    // uri contract: git://{repo_url}/{rel_path}
    assert(byRel("README.md").getAs[String]("uri") ==
      s"git://${fixtureRepo.getAbsolutePath}/README.md")
    // commit sha resolved and stamped on every row
    val expectedSha = sh(fixtureRepo, "git", "rev-parse", "HEAD")
    assert(got.forall(_.getAs[String]("commit_sha") == expectedSha))
    assert(got.forall(_.getAs[String]("ref") == "main"))
    // mime routing survives the rewrite
    assert(byRel("src/code.py").getAs[String]("mime_type") == "text/x-python")
  }

  test("change_hint is the exact git blob sha") {
    val cfg = GitSourceConfig(repoUrl = fixtureRepo.getAbsolutePath)
    val got = GitConnector.scan(spark, cfg).collect()
      .map(r => r.getAs[String]("relative_path") ->
        r.getAs[String]("change_hint")).toMap
    for (rel <- Seq("README.md", "src/code.py")) {
      val expected = sh(fixtureRepo, "git", "hash-object", rel)
      assert(got(rel) == expected, s"blob sha mismatch for $rel")
    }
  }

  test("unknown ref fails with a clear error; commit ref works") {
    val bad = GitSourceConfig(repoUrl = fixtureRepo.getAbsolutePath,
      ref = "no-such-branch")
    val e = intercept[IllegalArgumentException](
      GitConnector.cloneOrFetch(bad))
    assert(e.getMessage.contains("no-such-branch"))
    // a full-depth clone can check out an explicit commit sha
    val sha = sh(fixtureRepo, "git", "rev-parse", "HEAD")
    val byCommit = GitSourceConfig(repoUrl = fixtureRepo.getAbsolutePath,
      ref = sha, shallowDepth = 0)
    assert(GitConnector.cloneOrFetch(byCommit).commitSha == sha)
  }

  test("fetch path reuses an existing cache dir AND follows new commits") {
    val cache = Files.createTempDirectory("graft-git-cache-").toString
    val cfg = GitSourceConfig(repoUrl = fixtureRepo.getAbsolutePath,
      cacheDir = Some(cache))
    val first = GitConnector.cloneOrFetch(cfg)
    val second = GitConnector.cloneOrFetch(cfg) // hits the fetch branch
    assert(first.repoDir == second.repoDir)
    assert(first.commitSha == second.commitSha)
    // advance the remote: the cached checkout must fast-forward, not
    // silently serve the stale tree
    Files.writeString(new File(fixtureRepo, "NEW.md").toPath, "new\n")
    sh(fixtureRepo, "git", "add", "-A")
    sh(fixtureRepo, "git", "-c", "user.email=t@t", "-c", "user.name=t",
      "commit", "-q", "-m", "advance")
    val advanced = sh(fixtureRepo, "git", "rev-parse", "HEAD")
    val third = GitConnector.cloneOrFetch(cfg)
    assert(third.commitSha == advanced, "stale cache not fast-forwarded")
    assert(new File(third.repoDir, "NEW.md").isFile)
  }
}
