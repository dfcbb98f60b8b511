package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.FlowSchema

/** Pins the generated ClickHouse DDL and the Spark↔ClickHouse type table
  * against the reference's own CREATE TABLE
  * (`/root/reference/pkg/clickhouse/connect.go:74-89`) — the offline-safe
  * assertion of the ClickHouse-native sink surface (no server in the
  * sandbox; the JDBC write path itself is Derby-proven in FlowSinkSpec).
  */
class ClickHouseDdlSpec extends AnyFunSuite {

  // connect.go:74-89, (column, type) in declaration order
  private val referenceColumns = Seq(
    "start" -> "Float64",
    "end" -> "Float64",
    "src_ip" -> "String",
    "dst_ip" -> "String",
    "src_name" -> "String",
    "dst_name" -> "String",
    "src_kind" -> "String",
    "dst_kind" -> "String",
    "src_namespace" -> "String",
    "dst_namespace" -> "String",
    "bytes" -> "UInt32",
    "packets" -> "UInt32")

  test("flows DDL reproduces the reference table column-for-column") {
    val ddl = ClickHouseDdl.createTableDdl(
      "flows", FlowSchema.output, overrides = ClickHouseDdl.flowsOverrides)
    val colLine = "^(\\w+) (\\S+),$".r
    val emitted = ddl.linesIterator.map(_.trim).collect {
      case colLine(n, t) => n -> t
    }.toSeq
    assert(emitted === referenceColumns)
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS flows ("))
    assert(ddl.endsWith(") engine=Memory"))
  }

  test("setup pair is DROP then CREATE, same as the reference startup") {
    val stmts = ClickHouseDdl.setupDdl(
      "flows", FlowSchema.output, overrides = ClickHouseDdl.flowsOverrides)
    assert(stmts.length === 2)
    assert(stmts.head === "DROP TABLE IF EXISTS flows")
    assert(stmts(1).startsWith("CREATE TABLE IF NOT EXISTS flows"))
  }

  test("non-plain identifiers are rejected before they reach DDL text") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("ok_col", StringType)))
    val badTable = intercept[IllegalArgumentException] {
      ClickHouseDdl.createTableDdl("flows; DROP TABLE x", schema)
    }
    assert(badTable.getMessage.contains("not a plain identifier"))
    val badCol = intercept[IllegalArgumentException] {
      ClickHouseDdl.createTableDdl("flows",
        StructType(Seq(StructField("a b`c", StringType))))
    }
    assert(badCol.getMessage.contains("not a plain identifier"))
    val badSetup = intercept[IllegalArgumentException] {
      ClickHouseDdl.setupDdl("bad name", schema)
    }
    assert(badSetup.getMessage.contains("not a plain identifier"))
  }

  test("type table: UInt32 counters ride Spark LONG; unmapped types fail loudly") {
    import org.apache.spark.sql.types._
    // the documented mapping rows
    assert(ClickHouseDdl.chType(DoubleType) === "Float64")
    assert(ClickHouseDdl.chType(FloatType) === "Float32")
    assert(ClickHouseDdl.chType(StringType) === "String")
    assert(ClickHouseDdl.chType(LongType) === "Int64")
    assert(ClickHouseDdl.chType(IntegerType) === "Int32")
    assert(ClickHouseDdl.chType(TimestampType) === "DateTime64(3)")
    assert(ClickHouseDdl.chType(DecimalType(12, 2)) === "Decimal(12, 2)")
    // bytes/packets are LongType in the Spark schema (UInt32 range needs it)
    // and map back to UInt32 only via the explicit override
    assert(FlowSchema.output("bytes").dataType === LongType)
    assert(ClickHouseDdl.flowsOverrides("bytes") === "UInt32")
    val e = intercept[IllegalArgumentException] {
      ClickHouseDdl.chType(ArrayType(LongType))
    }
    assert(e.getMessage.contains("no ClickHouse mapping"))
  }
}
