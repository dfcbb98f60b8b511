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
  * record to one batched transactional write per micro-batch.
  *
  * DDL is an explicit setup step at `start()` (driver-side, before the
  * stream): `recreate=true` overwrites with an empty frame — the JDBC
  * writer's DROP + CREATE, mirroring the reference's startup DDL
  * (`connect.go:70-91`, which also re-creates on every process start);
  * `recreate=false` skips it for checkpoint resumes that must keep prior
  * rows. Every micro-batch then appends — including a *re-tried* batch 0,
  * which under the old `mode(id == 0)` keying would have re-run DDL
  * mid-stream and dropped committed data. (Spark's JDBC append also creates
  * a missing table, so `recreate=false` against a fresh database still
  * works.)
  *
  * Insert failures are logged and the batch skipped, like the reference's
  * warn-and-drop (`export_clickhouse.go:85-87`). Compiles against plain
  * JDBC; needs the vendor driver jar on the runtime classpath. The real
  * JDBC path (DDL + batched append + restart-resume) is executed end to end
  * against embedded Derby in FlowSinkSpec — `writerOverride` remains only
  * as the seam for a vendor-native (non-JDBC) writer.
  */
final case class JdbcSink(url: String, table: String = "flows",
                          options: Map[String, String] = Map.empty,
                          recreate: Boolean = true,
                          writerOverride: Option[(DataFrame, String) => Unit] = None) extends FlowSink {

  private def write(batch: DataFrame, mode: String): Unit =
    writerOverride.getOrElse { (b: DataFrame, m: String) =>
      b.write.format("jdbc")
        .option("url", url).option("dbtable", table)
        .options(options)
        .mode(m)
        .save()
    }.apply(batch, mode)

  override def start(df: DataFrame, checkpoint: String): StreamingQuery = {
    if (recreate) {
      // DDL-once: 0-row overwrite = DROP + CREATE, no data written.
      val empty = df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), df.schema)
      try write(empty, "overwrite")
      catch {
        case e: Exception =>
          System.err.println(s"[sink] table setup failed (append will create if missing): ${e.getMessage}")
      }
    }
    df.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        try write(batch, "append")
        catch {
          case e: Exception =>
            System.err.println(s"[sink] batch $id insert failed, dropping: ${e.getMessage}")
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
