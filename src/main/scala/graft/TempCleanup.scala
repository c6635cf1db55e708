package graft

import java.util.concurrent.ConcurrentLinkedQueue

/** JVM-exit cleanup for per-run temp work dirs. One shutdown hook total —
  * callers register directories instead of adding a hook per invocation
  * (a bench loop runs pipelines hundreds of times; per-call hooks accumulate
  * in the JVM for its whole lifetime).
  */
object TempCleanup {

  private val dirs = new ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val installHook: Unit = {
    sys.addShutdownHook {
      dirs.forEach(p => rm(p.toFile))
    }
    ()
  }

  private def rm(p: java.io.File): Unit = {
    Option(p.listFiles()).foreach(_.foreach(rm))
    p.delete()
    ()
  }

  /** Register `dir` for recursive deletion at JVM exit. */
  def deleteOnExit(dir: java.nio.file.Path): Unit = {
    installHook
    dirs.add(dir)
    ()
  }

  /** Delete `dir` now and drop it from the exit list (for callers that can
    * clean up eagerly once results are fully materialized). */
  def deleteNow(dir: java.nio.file.Path): Unit = {
    dirs.remove(dir)
    rm(dir.toFile)
  }
}
