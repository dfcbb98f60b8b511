package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.GraftSession
import graft.pipeline.FlowPipeline
import graft.sinks.{ConsoleSink, FlowSink, JdbcSink, ParquetSink, UpsertJdbcSink}
import graft.sources.{FileFlowSource, FlowSource, KafkaFlowSource}

/** The end-to-end application, mirroring the reference's wiring
  * (`/root/reference/cmd/main.go`):
  *
  *   --kafkaurl       broker list (reference `-kafkaurl`, main.go:16); if
  *                    empty, --filesource replays files instead
  *   --clickhouseurl  JDBC URL (reference `-clickhouseurl`, main.go:17);
  *                    EMPTY → console sink, exactly like main.go:37-41
  *   --filesource     directory of newline-JSON drops (test/bench source)
  *   --parquetsink    directory; overrides console when set
  *   --rawstdout      console prints the raw decoded fields pre-projection,
  *                    matching the reference's stdout exporter, which dumps
  *                    the decoded map (`pkg/stdout/export_stdout.go:25-27`)
  *                    rather than the projected 12 columns
  *   --loglevel       reference `-loglevel` (main.go:18)
  *   --checkpoint     checkpoint dir (replaces the consumer-group offsets)
  *   --upsertkeys     comma-separated key columns: switch the JDBC sink to
  *                    keyed upsert (idempotent under replay) instead of
  *                    append — e.g. `--upsertkeys start,src_ip`
  *   --recreate       true/false: drop+recreate the JDBC table at start.
  *                    Defaults to the SAFE derivation: recreate only when the
  *                    checkpoint dir is absent/empty (fresh pipeline). A
  *                    resumed run must NOT recreate — the source continues
  *                    from committed offsets, so dropped rows would never be
  *                    re-ingested.
  *
  * Malformed-record visibility (reference logs every bad record,
  * `ingest_kafka.go:40-42`): the pipeline runs with named decode metrics and
  * a listener prints the per-micro-batch malformed count — one log line per
  * batch instead of per record, with no second pass over the data.
  *
  * Graceful shutdown (reference `pkg/utils/exit.go:15-37`): a JVM shutdown
  * hook stops the StreamingQuery; checkpointing makes the restart resume
  * where the commit log left off.
  */
object FlowApp {

  /** Sink selection, identical in shape to cmd/main.go:37-41 (factored out
    * for testability).
    */
  def chooseSink(chUrl: String, parquetSink: String,
                 recreate: Boolean = true,
                 upsertKeys: Seq[String] = Nil): FlowSink =
    if (chUrl.nonEmpty && upsertKeys.nonEmpty)
      UpsertJdbcSink(chUrl, upsertKeys, recreate = recreate)
    else if (chUrl.nonEmpty) JdbcSink(chUrl, recreate = recreate)
    else if (parquetSink.nonEmpty) ParquetSink(parquetSink)
    else ConsoleSink()

  /** Recreate the sink table only for a FRESH pipeline (no checkpoint yet).
    * Restarting with an existing checkpoint resumes from committed offsets —
    * recreating there would drop committed rows that will never be re-read.
    * Resolved through the Hadoop filesystem API so URI-style checkpoint
    * locations (`file:///...`, `hdfs://...`, `s3a://...`) — which Spark
    * accepts and java.io.File would misread as absent — derive correctly.
    */
  def deriveRecreate(checkpoint: String,
                     conf: org.apache.hadoop.conf.Configuration =
                       new org.apache.hadoop.conf.Configuration()): Boolean = {
    val p = new org.apache.hadoop.fs.Path(checkpoint)
    val fs = p.getFileSystem(conf)
    !fs.exists(p) || fs.listStatus(p).isEmpty
  }

  /** Listener that surfaces the decode drop counter per micro-batch. */
  final class DecodeMetricsListener extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val m = e.progress.observedMetrics.get(FlowPipeline.decodeMetricsName)
      if (m != null) {
        val bad = m.getAs[Long]("malformed")
        if (bad > 0)
          System.err.println(
            s"[decode] batch ${e.progress.batchId}: dropped $bad malformed of ${m.getAs[Long]("total")} records")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k.stripPrefix("--") -> v }.toMap
    val kafkaUrl = opts.getOrElse("kafkaurl", "")
    val chUrl = opts.getOrElse("clickhouseurl", "")
    val fileSrc = opts.getOrElse("filesource", "")
    val parquetSink = opts.getOrElse("parquetsink", "")
    // Boolean flags parse leniently, like --loglevel: a malformed value
    // warns and falls back to the flag's default instead of surfacing a raw
    // IllegalArgumentException from String.toBoolean.
    def boolOpt(key: String): Option[Boolean] = opts.get(key).flatMap {
      _.toLowerCase match {
        case "true"  => Some(true)
        case "false" => Some(false)
        case other =>
          System.err.println(s"--$key expects true or false, got '$other'; using default")
          None
      }
    }
    val rawStdout = boolOpt("rawstdout").getOrElse(false)
    val checkpoint = opts.getOrElse("checkpoint", "/tmp/graft-checkpoint")

    val spark: SparkSession = GraftSession.local()
    // Unrecognized level → warn and fall back, not crash (main.go:25-28).
    val lvl = opts.getOrElse("loglevel", "WARN").toUpperCase
    try spark.sparkContext.setLogLevel(lvl)
    catch {
      case _: IllegalArgumentException =>
        System.err.println(s"Log level $lvl not recognized, using WARN")
        spark.sparkContext.setLogLevel("WARN")
    }

    val source: FlowSource =
      if (kafkaUrl.nonEmpty) KafkaFlowSource(kafkaUrl)
      else if (fileSrc.nonEmpty) FileFlowSource(fileSrc)
      else { System.err.println("need --kafkaurl or --filesource"); sys.exit(2) }

    val recreate = boolOpt("recreate")
      .getOrElse(deriveRecreate(checkpoint, spark.sparkContext.hadoopConfiguration))
    // --upsertkeys start,src_ip switches the JDBC sink to keyed upsert:
    // replayed batches converge instead of duplicating (exactly-once-by-key
    // on top of the checkpointed source's at-least-once redelivery).
    val upsertKeys = opts.get("upsertkeys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val sink = chooseSink(chUrl, parquetSink, recreate, upsertKeys)
    spark.streams.addListener(new DecodeMetricsListener)

    val decoded = FlowPipeline.decodeNamed(source.stream(spark))
    // --rawstdout + console = reference stdout parity (pre-projection dump).
    val frame =
      if (rawStdout && sink.isInstanceOf[ConsoleSink]) decoded
      else FlowPipeline.project(decoded)
    val query = sink.start(frame, checkpoint)

    sys.addShutdownHook {
      // A10 graceful shutdown: stop the query, let the checkpoint commit.
      try query.stop() catch { case _: Throwable => () }
    }
    query.awaitTermination()
  }
}
