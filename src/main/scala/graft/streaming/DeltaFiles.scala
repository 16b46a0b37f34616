package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-stream staging for ordered delta delivery — the ONE audited
  * implementation of a subtle trick four gates and three specs used to
  * copy: a `maxFilesPerTrigger=1` file stream orders micro-batches by
  * file MODIFICATION TIME, so "delta 1 then delta 2" is only
  * guaranteed if the staged files' mtimes are strictly increasing in
  * delivery order (two files written milliseconds apart can tie or
  * invert — the q_sessionize_stream lesson). [[stage]] writes each
  * delta as one parquet file and pins mtimes 2 minutes apart;
  * [[runToEnd]] drains the staged stream through `foreachBatch` with
  * `Trigger.AvailableNow` and fails loudly on a hang.
  */
object DeltaFiles {

  /** Stage each frame as ONE parquet file in a fresh drop dir, mtimes
    * pinned strictly increasing in sequence order. Returns the drop
    * dir to stream from. */
  def stage(deltas: Seq[DataFrame]): String = {
    val drop = java.nio.file.Files
      .createTempDirectory("graft_delta_stream").toString
    def parts(): Set[java.nio.file.Path] = {
      val st = java.nio.file.Files.list(java.nio.file.Paths.get(drop))
      try st.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet")).toSet
      finally st.close()
    }
    val t0 = System.currentTimeMillis()
    var seen = Set.empty[java.nio.file.Path]
    deltas.zipWithIndex.foreach { case (d, i) =>
      d.coalesce(1).write.mode("append").parquet(drop)
      val fresh = parts() -- seen
      seen ++= fresh
      fresh.foreach(p => java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          t0 - (deltas.size - i) * 120000L)))
    }
    drop
  }

  /** Drain a [[stage]]d drop dir: every staged file arrives as its own
    * micro-batch, in staged order, through `batchFn`. Creates a fresh
    * checkpoint dir (pass `ckpt` to resume an earlier run's instead —
    * the restart-test shape). Throws after `timeoutMs` or on a stream
    * error. */
  def runToEnd(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType, dropDir: String,
      timeoutMs: Long = 180000L, ckpt: Option[String] = None)(
      batchFn: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        Long) => Unit): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val ckptDir = ckpt.getOrElse(java.nio.file.Files
      .createTempDirectory("graft_delta_stream_ckpt").toString)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dropDir)
      .writeStream.option("checkpointLocation", ckptDir)
      .foreachBatch(batchFn)
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(timeoutMs)) {
      q.stop()
      sys.error(s"delta stream over $dropDir did not finish in ${timeoutMs} ms")
    }
  }
}
