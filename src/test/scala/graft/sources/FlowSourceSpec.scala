package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** A1 wiring test — no broker or connector jar needed: asserts the consumer
  * configuration the reference uses (`/root/reference/pkg/kafka/
  * ingest_kafka.go:14-21`) lands on the DataStreamReader option map.
  */
class FlowSourceSpec extends AnyFunSuite {

  test("KafkaFlowSource maps the reference consumer settings onto reader options") {
    val opts = KafkaFlowSource("broker1:9092,broker2:9092").readerOptions
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "flows-export")        // ingest_kafka.go:17
    assert(opts("startingOffsets") == "earliest")      // ingest_kafka.go:20
    assert(opts("failOnDataLoss") == "false")          // tolerate retention trim
    assert(opts("maxOffsetsPerTrigger") == "500000")   // backpressure default
    assert(!opts.contains("minPartitions"))
  }

  test("optional knobs appear only when set") {
    val opts = KafkaFlowSource("b:9092", topic = "t2", startingOffsets = "latest",
      maxOffsetsPerTrigger = None, minPartitions = Some(64)).readerOptions
    assert(opts("subscribe") == "t2")
    assert(opts("startingOffsets") == "latest")
    assert(!opts.contains("maxOffsetsPerTrigger"))
    assert(opts("minPartitions") == "64")
  }
}
