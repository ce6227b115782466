package graft

import graft.cluster.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(verts: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val v = verts.toDF("file_id")
    val e = edges.toDF("a", "b")
    ConnectedComponents.run(v, e).as[(Long, Long)].collect().toMap
  }

  test("two components + singleton") {
    val got = cc(Seq(1L, 2L, 3L, 4L, 5L, 9L), Seq((1L, 2L), (2L, 3L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 9L -> 9L))
  }

  test("long chain converges to the min id") {
    val n = 20L
    val verts = (1L to n)
    val edges = (1L until n).map(i => (i, i + 1))
    val got = cc(verts, edges)
    assert(got.values.toSet == Set(1L) && got.size == n)
  }

  test("edge orientation is irrelevant") {
    val got = cc(Seq(1L, 2L, 3L), Seq((3L, 1L), (2L, 3L)))
    assert(got.values.toSet == Set(1L))
  }
}
