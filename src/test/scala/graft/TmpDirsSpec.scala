package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.tables.TmpDirs

/** TmpDirs — the process-scoped scratch-root lifecycle that stops
  * session-lifetime temp tables from accumulating across runs (the r16
  * sf1 IO adjudication's root cause). Pins:
  *   - create() nests under this process's `graft-run-<pid>` root;
  *   - the orphan sweep removes roots owned by DEAD pids and keeps both
  *     live-pid roots and non-graft entries;
  *   - sweep and delete are best-effort (never throw on weird input).
  */
class TmpDirsSpec extends AnyFunSuite {

  test("create nests under this process's graft-run root") {
    val d = TmpDirs.create("graft-spec")
    assert(Files.isDirectory(d))
    val root = d.getParent
    assert(root.getFileName.toString ==
      s"graft-run-${ProcessHandle.current().pid()}")
    TmpDirs.deleteRecursively(d)
  }

  test("sweepOrphans reclaims dead-pid roots, keeps live and foreign entries") {
    val tmp = Files.createTempDirectory("tmpdirs-spec")
    // A root owned by a pid that cannot be alive (max pid is < 2^22 on
    // Linux by default; 4194304+ is unreachable even with pid_max raised
    // to its ceiling — the value IS pid_max, and pids are < pid_max).
    val dead = tmp.resolve("graft-run-9999999999")
    Files.createDirectories(dead.resolve("inner"))
    Files.write(dead.resolve("inner/f"), Array[Byte](1, 2, 3))
    // This process's own root name: must survive.
    val mine = tmp.resolve(s"graft-run-${ProcessHandle.current().pid()}")
    Files.createDirectories(mine)
    // Non-numeric suffix and a non-graft sibling: untouched.
    val junk = tmp.resolve("graft-run-notapid")
    Files.createDirectories(junk)
    val foreign = tmp.resolve("somebody-else")
    Files.createDirectories(foreign)

    TmpDirs.sweepOrphans(tmp)

    assert(!Files.exists(dead), "dead-pid root should be reclaimed")
    assert(Files.exists(mine), "own root must survive the sweep")
    assert(Files.exists(junk), "non-numeric suffix is not ours to delete")
    assert(Files.exists(foreign), "non-graft entries are never touched")
    TmpDirs.deleteRecursively(tmp)
    assert(!Files.exists(tmp))
  }

  test("sweep and delete never throw on missing paths") {
    val gone = Files.createTempDirectory("tmpdirs-spec-gone")
    Files.delete(gone)
    TmpDirs.sweepOrphans(gone)     // listing a missing dir: swallowed
    TmpDirs.deleteRecursively(gone) // deleting a missing path: no-op
  }
}
