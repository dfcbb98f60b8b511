package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY Layer B — the SQL surface the reference exercises against
  * ClickHouse, re-expressed against the Spark catalog/session.
  */
object FlowQueries {

  /** B7 — health check (`/root/reference/pkg/clickhouse/connect.go:35`). */
  def ping(spark: SparkSession): Boolean =
    spark.sql("SELECT 1").collect().head.getInt(0) == 1

  /** B3 — startup probe: catalog scan + projection + cast-to-string alias +
    * LIMIT (`connect.go:52`: `SELECT name, toString(uuid) as uuid_str FROM
    * system.tables LIMIT 5`). `toString` maps to a STRING cast.
    *
    * PARITY DELTA (documented, deliberate): the reference's second column is
    * the table UUID from ClickHouse's `system.tables`. Spark's catalog has
    * no table-UUID concept and no `information_schema` in the session
    * catalog, so the closest faithful shape is the catalog listing with a
    * cast-aliased metadata column — we cast `catalog` (the containing
    * catalog's name) where the reference casts `uuid`. Every structural
    * element the probe actually exercises — system-metadata scan, two-column
    * projection, cast + alias, LIMIT 5 — is preserved; only the identifier
    * payload differs, and nothing downstream consumes it (the reference
    * merely logs it).
    */
  def probe(spark: SparkSession): DataFrame =
    spark.catalog.listTables().toDF()
      .selectExpr("name", "CAST(catalog AS STRING) AS catalog_str")
      .limit(5)

  /** B1/B2 — DDL lifecycle (`connect.go:70-91`): DROP + CREATE of the
    * `flows` table. `engine=Memory` in the reference means non-durable, so a
    * temp view over the projected frame is the faithful mapping; a durable
    * variant would `saveAsTable`.
    */
  def setupTable(spark: SparkSession, flows: DataFrame, name: String = "flows"): Unit =
    // createOrReplace covers the reference's DROP+CREATE pair in one call.
    flows.createOrReplaceTempView(name)

  /** B1/B2 — the literal DDL statement pair, exercised through `spark.sql`
    * against the session catalog: `DROP TABLE IF EXISTS` + `CREATE TABLE ...
    * USING parquet` (the durable analogue of the reference's `engine=Memory`
    * table), then the frame inserted. Running it twice is safe — exactly the
    * reference's startup idempotence (`connect.go:70-91` drops before
    * creating).
    */
  def setupTableDurable(spark: SparkSession, flows: DataFrame, name: String = "flows"): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (${flows.schema.toDDL}) USING parquet")
    flows.write.insertInto(name)
  }

  /** B6 — the README verification query (`README.md:91-107`):
    * `fromUnixTimestamp(intDiv(start,1000))` + projection + LIMIT 100.
    */
  def verification(spark: SparkSession, table: String = "flows"): DataFrame =
    spark.sql(
      s"""SELECT timestamp_seconds(CAST(start AS BIGINT) div 1000) AS start,
         |       timestamp_seconds(CAST(`end` AS BIGINT) div 1000) AS `end`,
         |       src_ip, dst_ip, src_name, dst_name,
         |       src_kind, dst_kind, src_namespace, dst_namespace,
         |       bytes, packets
         |FROM $table
         |ORDER BY start, src_ip
         |LIMIT 100""".stripMargin)
}
