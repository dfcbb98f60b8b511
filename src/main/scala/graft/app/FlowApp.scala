package graft.app

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.pipeline.FlowPipeline
import graft.sinks.{ConsoleSink, FlowSink, JdbcSink, ParquetSink}
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
  *   --loglevel       reference `-loglevel` (main.go:18)
  *   --checkpoint     checkpoint dir (replaces the consumer-group offsets)
  *
  * Graceful shutdown (reference `pkg/utils/exit.go:15-37`): a JVM shutdown
  * hook stops the StreamingQuery; checkpointing makes the restart resume
  * where the commit log left off.
  */
object FlowApp {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k.stripPrefix("--") -> v }.toMap
    val kafkaUrl = opts.getOrElse("kafkaurl", "")
    val chUrl = opts.getOrElse("clickhouseurl", "")
    val fileSrc = opts.getOrElse("filesource", "")
    val parquetSink = opts.getOrElse("parquetsink", "")
    val checkpoint = opts.getOrElse("checkpoint", "/tmp/graft-checkpoint")

    val spark: SparkSession = GraftSession.local()
    spark.sparkContext.setLogLevel(opts.getOrElse("loglevel", "WARN").toUpperCase)

    val source: FlowSource =
      if (kafkaUrl.nonEmpty) KafkaFlowSource(kafkaUrl)
      else if (fileSrc.nonEmpty) FileFlowSource(fileSrc)
      else { System.err.println("need --kafkaurl or --filesource"); sys.exit(2) }

    // Sink selection identical in shape to cmd/main.go:37-41.
    val sink: FlowSink =
      if (chUrl.nonEmpty) JdbcSink(chUrl)
      else if (parquetSink.nonEmpty) ParquetSink(parquetSink)
      else ConsoleSink()

    val flows = FlowPipeline.batch(source.stream(spark))
    val query = sink.start(flows, checkpoint)

    sys.addShutdownHook {
      // A10 graceful shutdown: stop the query, let the checkpoint commit.
      try query.stop() catch { case _: Throwable => () }
    }
    query.awaitTermination()
  }
}
