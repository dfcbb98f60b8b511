package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cluster profile is configuration-as-documentation: assert the values
  * so the scale rationale in the scaladoc can't drift from the code.
  */
class GraftSessionSpec extends AnyFunSuite {
  test("cluster profile carries the 100 TB scale settings") {
    val opts = GraftSession.clusterConf(totalCores = 3000)
    assert(opts("spark.sql.shuffle.partitions") == "12000")
    assert(opts("spark.sql.adaptive.enabled") == "true")
    assert(opts("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(opts("spark.sql.files.maxPartitionBytes") == "256m")
    assert(opts("spark.sql.autoBroadcastJoinThreshold") == "64m")
    assert(opts("spark.serializer").contains("KryoSerializer"))
    assert(opts("spark.sql.extensions") == "graft.GraftExtensions")
  }
}
