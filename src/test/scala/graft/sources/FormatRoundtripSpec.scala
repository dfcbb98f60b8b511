package graft.sources

import graft.{SparkSpec, Tables}

/** Source/sink format breadth: the engine reads and writes every standard
  * columnar/text format Spark ships, byte-equal after a roundtrip. (The
  * reference only speaks Kafka+ClickHouse; a standalone engine must cover
  * the lake formats.)
  */
class FormatRoundtripSpec extends SparkSpec {

  private def roundtrip(fmt: String): Unit = {
    val src = Tables.customer(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory(s"rt-$fmt").toString
    src.write.mode("overwrite").format(fmt).save(dir)
    val back = spark.read.format(fmt).schema(src.schema).load(dir)
    assert(back.schema == src.schema, s"$fmt schema drift")
    val a = src.orderBy("c_custkey").collect().toSeq
    val b = back.orderBy("c_custkey").collect().toSeq
    assert(a == b, s"$fmt rows drift")
  }

  Seq("parquet", "orc", "json", "csv").foreach { fmt =>
    test(s"$fmt write/read roundtrip preserves schema and rows") {
      roundtrip(fmt)
    }
  }
}
