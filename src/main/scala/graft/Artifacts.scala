package graft

/** Registry of oracle artifact directories — tmpdir files an engine query
  * PINS (parquet/text) so its DuckDB oracle can independently replay the
  * downstream computation over byte-identical inputs (the simhash/minhash
  * technique, SURVEY §5).
  *
  * Centralized for two reasons:
  *
  *   - STALENESS (ADVICE r7): [[Verify]] calls [[cleanAll]] once at
  *     startup (after the query registries initialize and register their
  *     paths), so an engine query that fails before its write leaves NO
  *     artifact and the oracle fails loudly ("no files found") instead of
  *     silently consuming bytes from a previous run or scale factor.
  *   - COST (VERDICT r7 item 2): [[writeOnce]] keys each artifact write by
  *     (session, sfDir, name), so a bench loop that invokes the same query
  *     twice (min-of-2) pays the pinning write once — the artifact is a
  *     deterministic function of the input tables, so the second run's
  *     bytes would be identical anyway. At 100 TB this is the same stance
  *     as the IVF index build: pin-once, probe many.
  */
object Artifacts {
  private val registered = scala.collection.mutable.LinkedHashSet.empty[String]

  /** Register (idempotent) and return the artifact dir for `name`. */
  def path(name: String): String = synchronized {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_$name"
    registered += p
    p
  }

  /** Delete every registered artifact dir — [[Verify]] calls this once,
    * after forcing registry init, before running any query.
    */
  def cleanAll(): Unit = synchronized {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    registered.foreach { p =>
      val f = new java.io.File(p)
      if (f.exists()) rm(f)
    }
    once.clear(); lastSf.clear() // a cleaned path must be re-written on next use
  }

  private val once =
    new java.util.concurrent.ConcurrentHashMap[(Any, String, String), java.lang.Boolean]()
  private val lastSf =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Run `write` only if (session, sfDir, name) hasn't written yet in this
    * JVM — artifact pins are deterministic functions of the fixture
    * tables, so repeat invocations (bench min-of-2) skip the I/O.
    *
    * A name's on-disk path is SHARED across scale factors, so the memo is
    * only valid while the same sfDir owns the bytes: when a different
    * sfDir writes `name`, every memo for `name` is dropped first — a dev
    * loop alternating sf dirs in one JVM re-pins instead of silently
    * reading the other scale factor's artifact (ADVICE r8).
    */
  def writeOnce(session: Any, sfDir: String, name: String)(write: => Unit): Unit = {
    lastSf.compute(name, (_, prev) => {
      if (prev != null && prev != sfDir) {
        val it = once.keySet.iterator
        while (it.hasNext) if (it.next()._3 == name) it.remove()
      }
      sfDir
    })
    once.computeIfAbsent((session, sfDir, name), _ => { write; java.lang.Boolean.TRUE })
    ()
  }
}
