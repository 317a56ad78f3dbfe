package graft

import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** Marks tests that need their own JVM topology (local-cluster spawns
  * real executor JVMs and cannot coexist with the shared local[4]
  * SparkContext). Excluded from plain `sbt test` via build.sbt;
  * run with `sbt "testOnly graft.ClusterSpec"` — Test/fork gives the
  * suite a fresh JVM when invoked alone. */
object ClusterTag extends Tag("graft.ClusterTag")

/** The multi-JVM CI tier: everything in
  * [[graft.tools.ClusterCheck]] under `local-cluster[2,4,2048]` —
  * real executor processes, real shuffle fetches, real custom-
  * aggregate buffer transport, and an executor-kill recovery case.
  * See ClusterCheck's scaladoc for what this catches that local[32]
  * cannot. */
class ClusterSpec extends AnyFunSuite {
  test("local-cluster battery: serialization, shuffle transport, DML, " +
      "executor loss", ClusterTag) {
    assert(graft.tools.ClusterCheck.run() == 0)
  }
}
