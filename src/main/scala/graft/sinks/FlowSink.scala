package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Pluggable streaming sinks for the projected 12-column flow frame —
  * mirrors the reference's sink selection (`/root/reference/cmd/main.go:37-41`:
  * empty ClickHouse URL → stdout exporter).
  */
trait FlowSink {
  def start(df: DataFrame, checkpoint: String): StreamingQuery
}

/** Stdout sink (`pkg/stdout/export_stdout.go:12-27`). */
final case class ConsoleSink(numRows: Int = 20) extends FlowSink {
  override def start(df: DataFrame, checkpoint: String): StreamingQuery =
    df.writeStream.format("console")
      .option("numRows", numRows.toString)
      .option("truncate", "false")
      .option("checkpointLocation", checkpoint)
      .start()
}

/** Durable columnar sink for replay/bench — strictly stronger than the
  * reference's `engine=Memory` non-durable table
  * (`pkg/clickhouse/connect.go:88`).
  */
final case class ParquetSink(path: String) extends FlowSink {
  override def start(df: DataFrame, checkpoint: String): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .start()
}

/** In-memory queryable sink (tests / the probe query surface). */
final case class MemorySink(tableName: String) extends FlowSink {
  override def start(df: DataFrame, checkpoint: String): StreamingQuery =
    df.writeStream.format("memory")
      .queryName(tableName)
      .option("checkpointLocation", checkpoint)
      .start()
}

/** JDBC sink via foreachBatch — the reference's ClickHouse exporter
  * (`pkg/clickhouse/export_clickhouse.go:81-87`) upgraded from one INSERT per
  * record to one batched transactional write per micro-batch. DDL on first
  * batch mirrors `connect.go:70-91` (DROP + CREATE). Insert failures are
  * logged and the batch skipped, like the reference's warn-and-drop
  * (`export_clickhouse.go:85-87`). Compiles against plain JDBC; needs the
  * vendor driver jar on the runtime classpath.
  */
final case class JdbcSink(url: String, table: String = "flows",
                          options: Map[String, String] = Map.empty) extends FlowSink {
  override def start(df: DataFrame, checkpoint: String): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        try {
          batch.write.format("jdbc")
            .option("url", url).option("dbtable", table)
            .options(options)
            .mode(if (id == 0) "overwrite" else "append")
            .save()
        } catch {
          case e: Exception =>
            System.err.println(s"[sink] batch $id insert failed, dropping: ${e.getMessage}")
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
