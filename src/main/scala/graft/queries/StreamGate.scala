package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the MemoryStream-driven streaming gate rows:
  * every drive parks its output in a memory-sink temp view and a
  * throwaway checkpoint dir, and Bench re-runs each gate at least
  * twice — without cleanup the session catalog and /tmp accumulate one
  * view + one state-store tree per invocation. `finish` materializes
  * the result (localCheckpoint cuts the lineage off the sink view) and
  * then removes both, so a drive leaves nothing behind. */
object StreamGate {

  def deleteRecursively(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(path))
  }

  /** Materialize `df` (built over the memory sink `sink`), then drop
    * the sink view and delete the checkpoint dir. The returned frame
    * is self-contained — safe to write/collect after cleanup. */
  def finish(s: SparkSession, sink: String, ckpt: String,
      df: DataFrame): DataFrame = {
    val out = df.localCheckpoint()
    s.catalog.dropTempView(sink)
    deleteRecursively(ckpt)
    out
  }
}
