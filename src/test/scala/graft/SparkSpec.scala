package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base for all specs: one shared local session per JVM (Test/fork := true),
  * configured exactly like the driver-facing mains via GraftSession.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  lazy val sf0001 = "/root/testdata/sf0.001"
}
