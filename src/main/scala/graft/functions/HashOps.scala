package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing for dedup/LSH operators.
  *
  * Everything is derived from `md5` (identical in Spark, DuckDB, and any
  * other engine) rather than Spark's murmur3 `hash()`, so every signature,
  * band, and bucket can be reproduced bit-for-bit by the SQL oracle. 60 bits
  * (15 hex chars) keeps values positive in a signed 64-bit long.
  */
object HashOps {

  /** 60-bit hash of a string column under a numbered hash function (seeded by
    * suffixing the payload — the classic way to get a hash family from one
    * hash).
    */
  def h60(c: Column, seed: Int): Column =
    conv(substring(md5(concat(c, lit("#" + seed))), 1, 15), 16, 10).cast("long")

  /** DuckDB rendering of [[h60]], kept adjacent so the two can't drift. */
  def h60Sql(expr: String, seed: Int): String =
    s"('0x'||substr(md5($expr||'#$seed'),1,15))::BIGINT"
}
