package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Pluggable streaming sources yielding a `value: STRING` column of raw flow
  * JSON — the Spark analogue of the reference's single Kafka reader
  * (`/root/reference/pkg/kafka/ingest_kafka.go:14-50`), made pluggable the
  * same way the reference's sink is (`cmd/main.go:37-41`).
  *
  * Three interchangeable implementations because no Kafka connector jar is
  * resolvable in this environment: [[MemoryFlowSource]] for tests,
  * [[FileFlowSource]] for bench/replay, [[KafkaFlowSource]] for production
  * (config-only at compile time; needs spark-sql-kafka on the runtime
  * classpath).
  */
trait FlowSource {
  def stream(spark: SparkSession): DataFrame
}

/** File-drop replay source: reads newline-delimited JSON files appearing
  * under `path`. `maxFilesPerTrigger` is the batch-size/backpressure knob
  * (the analogue of the reference's unbuffered-channel pacing,
  * `cmd/main.go:34`).
  */
final case class FileFlowSource(path: String, maxFilesPerTrigger: Int = 16) extends FlowSource {
  override def stream(spark: SparkSession): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .text(path)
}

/** Kafka source with the reference's consumer settings mapped across:
  * topic `flows-export` (`ingest_kafka.go:17`), earliest start offset
  * (`ingest_kafka.go:20`); the consumer group + 500 ms async commit
  * (`ingest_kafka.go:18,21`) are replaced by checkpointed offsets, which
  * upgrades delivery from at-least-once to exactly-once into idempotent
  * sinks. Partition→task mapping is automatic; `minPartitions` oversplits
  * when executors outnumber the topic's 24 partitions
  * (`contrib/kafka.yaml:52`).
  */
final case class KafkaFlowSource(
    brokers: String,
    topic: String = "flows-export",
    startingOffsets: String = "earliest",
    maxOffsetsPerTrigger: Option[Long] = Some(500000L),
    minPartitions: Option[Int] = None) extends FlowSource {
  /** The full reader configuration, exposed so the wiring is unit-testable
    * without a broker or the connector jar (`stream()` needs both).
    * `failOnDataLoss=false`: the reference survives topic retention trimming
    * (28 min, contrib/kafka.yaml:28) by just consuming from earliest; the
    * Spark equivalent is tolerating aged-out offsets instead of failing the
    * query.
    */
  def readerOptions: Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> "false") ++
      maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString) ++
      minPartitions.map(n => "minPartitions" -> n.toString)

  override def stream(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka")
      .options(readerOptions)
      .load().selectExpr("CAST(value AS STRING) AS value")
}

/** In-memory source for tests: push raw JSON strings, run a trigger. */
final class MemoryFlowSource(spark: SparkSession) extends FlowSource {
  import spark.implicits._
  val input: MemoryStream[String] = MemoryStream[String](spark)
  def add(rows: String*): Unit = input.addData(rows)
  override def stream(s: SparkSession): DataFrame = input.toDF().toDF("value")
}
