package graft

import graft.ml.BarrierSync

/** M7/M8 barrier primitives under gang scheduling (local[4] = 4 slots). */
class BarrierSpec extends SparkSpec {

  test("allGather: every rank sees the full rank-ordered address table") {
    val got = BarrierSync.allGather(spark, parts = 4, rank => s"addr-$rank")
    assert(got.length == 4)
    got.foreach { table =>
      assert(table == Seq("addr-0", "addr-1", "addr-2", "addr-3"))
    }
  }

  test("synchronized body runs once per rank between barriers") {
    val got = BarrierSync.synchronized(spark, parts = 4)(rank => rank * 10)
    assert(got.sorted == Seq(0, 10, 20, 30))
  }
}
