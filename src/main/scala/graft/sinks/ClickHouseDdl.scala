package graft.sinks

import org.apache.spark.sql.types._

/** ClickHouse DDL generation from a Spark schema — the offline-testable
  * slice of the ClickHouse-native sink surface: the JDBC sink is proven
  * against embedded Derby (`FlowSinkSpec`), and THIS pins the exact DDL and
  * type mapping a ClickHouse target would receive, asserted against the
  * reference's own table (`/root/reference/pkg/clickhouse/connect.go:74-89`).
  *
  * Type-mapping notes (Spark ↔ ClickHouse over JDBC):
  *  - ClickHouse `UInt32` round-trips as Spark LONG (the unsigned range
  *    [0, 2^32) exceeds INT; JDBC surfaces it as Java long). The flow
  *    pipeline's `bytes`/`packets` are LongType for exactly this reason and
  *    map back to UInt32 via [[flowsOverrides]].
  *  - `Float64` ↔ DoubleType, `Float32` ↔ FloatType, `String` ↔ StringType.
  *  - Signed integers map width-for-width (Int64/Int32/Int16/Int8).
  *  - TimestampType maps to `DateTime64(3)` (millisecond precision, the
  *    Spark JDBC timestamp unit); the reference's TODO at `connect.go:73`
  *    ("use DateTime") is this row of the table.
  */
object ClickHouseDdl {

  /** Default Spark→ClickHouse type mapping; unsigned/override cases are the
    * caller's via the `overrides` parameter of [[createTableDdl]].
    */
  def chType(dt: DataType): String = dt match {
    case DoubleType => "Float64"
    case FloatType => "Float32"
    case StringType => "String"
    case LongType => "Int64"
    case IntegerType => "Int32"
    case ShortType => "Int16"
    case ByteType => "Int8"
    case BooleanType => "UInt8"
    case TimestampType => "DateTime64(3)"
    case DateType => "Date32"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case other =>
      throw new IllegalArgumentException(
        s"no ClickHouse mapping for Spark type ${other.simpleString}")
  }

  /** Per-column type overrides for the reference `flows` table: the two
    * counters are UNSIGNED 32-bit in ClickHouse (`connect.go:85-86`), which
    * Spark carries as LONG.
    */
  val flowsOverrides: Map[String, String] = Map(
    "bytes" -> "UInt32", "packets" -> "UInt32")

  /** `CREATE TABLE IF NOT EXISTS` DDL for `schema`, with the reference's
    * layout conventions (one column per line, trailing comma before the
    * close — `connect.go:74-89` keeps that trailing comma and ClickHouse
    * accepts it; we emit it too so the generated text is byte-comparable
    * after whitespace normalization).
    */
  // Table and column names are interpolated into DDL text unquoted (matching
  // the reference's plain-identifier style); restrict them so a name with
  // spaces, quotes, or backticks can't produce broken or injectable DDL.
  private def requireIdent(kind: String, name: String): Unit =
    require(name.matches("[A-Za-z0-9_]+"),
      s"$kind name '$name' is not a plain identifier ([A-Za-z0-9_]+); " +
        "rename the column or table before generating DDL")

  def createTableDdl(table: String, schema: StructType,
                     engine: String = "Memory",
                     overrides: Map[String, String] = Map.empty): String = {
    requireIdent("table", table)
    val cols = schema.fields.map { f =>
      requireIdent("column", f.name)
      val t = overrides.getOrElse(f.name, chType(f.dataType))
      s"${f.name} $t,"
    }.mkString("\n  ")
    s"CREATE TABLE IF NOT EXISTS $table (\n  $cols\n) engine=$engine"
  }

  /** The idempotent setup pair the reference issues on startup
    * (`connect.go:68-91`): DROP, then CREATE.
    */
  def setupDdl(table: String, schema: StructType,
               engine: String = "Memory",
               overrides: Map[String, String] = Map.empty): Seq[String] = {
    requireIdent("table", table)
    Seq(
      s"DROP TABLE IF EXISTS $table",
      createTableDdl(table, schema, engine, overrides))
  }
}
