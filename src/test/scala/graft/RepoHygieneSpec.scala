package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Repo hygiene: the root may contain only the known build/doc/driver
  * artifacts. Catches accidental junk (a round-3 audit found a stray
  * 1-byte file whose name was a sed argument) before it gets committed. */
class RepoHygieneSpec extends AnyFunSuite with Matchers {

  private val allowed = List(
    "\\..*",                 // dotfiles: .git, .bsp, .scalafmt.conf, …
    "project", "src", "target",
    "build\\.sbt",
    "[A-Za-z0-9_.-]+\\.md",  // SURVEY.md, PLANS.md, …
    "[A-Za-z0-9_.-]+\\.json",// BASELINE/BENCH_r*/CORRECTNESS_r*/…
    "[A-Za-z0-9_.-]+\\.jsonl"
  ).map(_.r)

  test("repo root has no unexpected files") {
    // tests run from the repo root — don't hardcode a checkout path, and
    // treat an unreadable root as a FAILURE, not a vacuous pass
    val root = new java.io.File(sys.props("user.dir"))
    assert(new java.io.File(root, "build.sbt").isFile,
      s"$root is not the repo root — spec must run from it")
    val listing = root.listFiles
    assert(listing != null, s"could not list $root")
    val offenders = listing
      .map(_.getName)
      .filterNot(n => allowed.exists(_.matches(n)))
      .sorted
    withClue("unexpected files at repo root (delete or allow-list): ") {
      offenders shouldBe empty
    }
  }
}
