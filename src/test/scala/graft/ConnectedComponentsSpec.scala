package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("components: chains, cliques and singleton-pair graphs") {
    // components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (triangle)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("ida", "idb")
    val got = ConnectedComponents.components(pairs, "ida", "idb")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long chain converges within iteration budget") {
    val pairs = (1L until 30L).map(i => (i, i + 1)).toDF("ida", "idb")
    val got = ConnectedComponents.components(pairs, "ida", "idb")
      .as[(Long, Long)].collect()
    assert(got.forall(_._2 == 1L))
  }
}
