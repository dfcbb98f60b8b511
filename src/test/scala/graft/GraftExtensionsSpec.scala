package graft

import graft.operators.{Dedup, Similarity}

/** The SQL surface of the native expressions: a user of the engine reaches
  * the same codegen'd kernels through `spark.sql` that the DataFrame
  * operators use internally.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("graft_dot from SQL equals VectorOps.dot") {
    Tables.registerAll(spark, sf0001)
    val viaSql = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS d FROM embeddings ORDER BY vec_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    import org.apache.spark.sql.functions.col
    val viaDf = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), graft.functions.VectorOps.dot(col("embedding"), col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaDf)
  }

  test("graft_dotd / graft_l2sq from SQL match the generic kernels, mixed element types") {
    Tables.registerAll(spark, sf0001)
    // float×float dotd agrees with graft_dot; l2sq(v, v) is exactly 0
    val r = spark.sql(
      """SELECT graft_dotd(embedding, embedding) AS dd,
        |       graft_dot(embedding, embedding) AS df,
        |       graft_l2sq(embedding, embedding) AS l2,
        |       graft_l2sq(embedding, CAST(embedding AS ARRAY<DOUBLE>)) AS l2mix
        |FROM embeddings WHERE vec_id = 0""".stripMargin).collect().head
    assert(r.getDouble(0) == r.getDouble(1))
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
    val msg = intercept[Exception] {
      spark.sql("SELECT graft_l2sq(embedding) FROM embeddings").collect()
    }.getMessage
    assert(msg.contains("graft_l2sq expects exactly 2 arguments"))
  }

  test("graft_lsh_code from SQL matches the operator, incl. the planes override") {
    Tables.registerAll(spark, sf0001)
    val viaSql = spark.sql(
      s"SELECT vec_id, graft_lsh_code(embedding) AS c FROM embeddings ORDER BY vec_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDf = Similarity.withLshCode(Tables.embeddings(spark, sf0001))
      .select("vec_id", "lsh_code")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaDf)
    val wide = spark.sql(
      "SELECT max(graft_lsh_code(embedding, 24)) AS c FROM embeddings").head().getLong(0)
    assert(wide < (1L << 24))
  }

  test("graft_idot from SQL computes exact integer dots") {
    val got = spark.sql(
      "SELECT graft_idot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head().getLong(0)
    assert(got == 32L)
  }

  test("graft_rolling_fp from SQL matches TextFunctions.rollingFingerprint") {
    Tables.registerAll(spark, sf0001)
    val viaSql = spark.sql(
      "SELECT doc_id, graft_rolling_fp(text, 8) AS fp FROM documents ORDER BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    import org.apache.spark.sql.functions.col
    val viaDf = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        graft.functions.TextFunctions.rollingFingerprint(col("text"), 8).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaDf)
  }

  test("graft_bloom + graft_might_contain round-trip from SQL") {
    spark.range(0, 100).createOrReplaceTempView("bloom_keys")
    val blob = spark.sql(
      "SELECT graft_bloom(id, 100) AS f FROM bloom_keys").head().getAs[Array[Byte]](0)
    // every inserted key probes true (no false negatives), via the SQL probe
    spark.sql("SELECT graft_bloom(id, 100) AS f FROM bloom_keys")
      .createOrReplaceTempView("bloom_f")
    val misses = spark.sql(
      "SELECT count(*) AS c FROM bloom_keys, bloom_f WHERE NOT graft_might_contain(f, id)")
      .head().getLong(0)
    assert(misses == 0L)
    // and the SQL-built blob agrees with the kernel probe
    assert((0L until 100L).forall(graft.expressions.Bloom.mightContain(blob, _)))
  }

  test("wrong arity / non-literal planes raise usable messages, not MatchError") {
    Tables.registerAll(spark, sf0001)
    def messageOf(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    assert(messageOf("SELECT graft_dot(embedding) FROM embeddings")
      .contains("graft_dot expects exactly 2 arguments"))
    assert(messageOf("SELECT graft_lsh_code(embedding, vec_id) FROM embeddings")
      .contains("planes must be an INTEGER literal"))
    assert(messageOf("SELECT graft_lsh_code() FROM embeddings")
      .contains("expects 1 or 2 arguments"))
  }

  test("graft_simhash aggregate from SQL matches Dedup.simhash") {
    Tables.registerAll(spark, sf0001)
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash(
        |  CAST(CONV(SUBSTRING(m, 1, 8), 16, 10) AS BIGINT),
        |  CAST(CONV(SUBSTRING(m, 9, 8), 16, 10) AS BIGINT)) AS simhash
        |FROM (SELECT doc_id, md5(CONCAT(tok, '#0')) AS m FROM
        |       (SELECT doc_id, EXPLODE(SPLIT(text, ' ')) AS tok FROM documents) t
        |      WHERE tok <> '') h
        |GROUP BY doc_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDf = Dedup.simhash(Tables.documents(spark, sf0001))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaDf)
  }
}
