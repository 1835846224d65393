package graft.queries

import org.apache.spark.sql.SparkSession

/** Write-once guard for persisted bucketed tables (q_bucketed_join,
  * q_phrase_index): the physical layout IS the shuffle, paid once at
  * write time and amortized over every later scan — so the write must
  * run exactly once per (session, fixture dir) while bench passes,
  * specs and Verify share a JVM.
  *
  * The session's own catalog is the guard (entries are session-scoped
  * and die with it — an identity-hash key could collide across GC'd
  * sessions); the dir conf key catches the same-session different-
  * sfDir case, where the catalog entry alone can't tell whose data the
  * layout holds. saveAsTable CREATEs when the table is absent from the
  * (in-memory) catalog — and fails on a stale warehouse dir left by a
  * previous JVM, which mode("overwrite") does NOT clear, so both the
  * catalog entry and the on-disk dir are dropped before rewriting.
  */
object BucketedTables {

  /** Run `write` unless every table in `names` already exists AND the
    * session's `dirKey` conf records the same fixture dir; on a
    * rewrite, drops each table from both the catalog and the warehouse
    * directory first.
    */
  def ensure(s: SparkSession, names: Seq[String], dirKey: String,
      dir: String)(write: => Unit): Unit = {
    val fresh = names.forall(s.catalog.tableExists) &&
      s.conf.getOption(dirKey).contains(dir)
    if (!fresh) {
      names.foreach { name =>
        s.sql(s"DROP TABLE IF EXISTS $name")
        val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir"))
        val root =
          if (wh.getScheme == "file") new java.io.File(wh).toString
          else wh.toString
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        val d = new java.io.File(root, name)
        if (d.exists()) rm(d)
      }
      write
      s.conf.set(dirKey, dir)
    }
  }
}
