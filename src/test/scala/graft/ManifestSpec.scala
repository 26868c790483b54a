package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.checkpoint.Manifest

/** Checkpoint-manifest semantics: atomic completion records, lineage
  * round-trip, resume anti-filter (SURVEY.md §5e). The end-to-end
  * kill-and-resume flow is exercised through graft.cli.Main (see
  * .claude/skills/verify/SKILL.md). */
class ManifestSpec extends AnyFunSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_mf").toString + "/manifest.jsonl"

  test("round-trip: markComplete then load preserves lineage + metrics") {
    val p = tmp()
    Manifest.markComplete(p, "3", rows = 1000, violations = 7, pass = false,
      snapshotId = "snap-42", files = Seq("f1.parquet", "f2.parquet"))
    val st = Manifest.load(p)
    assert(st.isComplete("3"))
    assert(!st.isComplete("4"))
    val e = st.entries("3")
    assert(e.rows === 1000 && e.violations === 7 && !e.pass)
    assert(e.snapshotId === "snap-42")
    assert(e.files === Seq("f1.parquet", "f2.parquet"))
  }

  test("re-marking a partition overwrites its entry (idempotent rerun)") {
    val p = tmp()
    Manifest.markComplete(p, "0", 10, 1, pass = false)
    Manifest.markComplete(p, "0", 10, 0, pass = true)
    val st = Manifest.load(p)
    assert(st.entries.size === 1)
    assert(st.entries("0").pass)
  }

  test("resume anti-filter: only absent partitions remain") {
    val p = tmp()
    Seq("0", "1", "2").foreach(Manifest.markComplete(p, _, 5, 0, pass = true))
    val st = Manifest.load(p)
    val todo = (0 to 5).map(_.toString).filterNot(st.isComplete)
    assert(todo === Seq("3", "4", "5"))
  }

  test("missing manifest file loads as empty (fresh run)") {
    assert(Manifest.load("/nonexistent/manifest.jsonl").entries.isEmpty)
  }

  test("escaping: partitions and files with quotes/backslashes survive") {
    val p = tmp()
    Manifest.markComplete(p, """part"weird\name""", 1, 0, pass = true,
      files = Seq("""a"b\c.parquet"""))
    val st = Manifest.load(p)
    assert(st.isComplete("""part"weird\name"""))
    assert(st.entries("""part"weird\name""").files === Seq("""a"b\c.parquet"""))
  }
}
