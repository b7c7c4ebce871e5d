package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  // every graph below is under DriverMaxEdges, so run each case through
  // BOTH paths: the default (driver union-find short-circuit) and
  // driverMaxEdges = 0 (forces the distributed pointer-jumping loop)
  private val gates = Seq(
    "driver" -> ConnectedComponents.DriverMaxEdges, "distributed" -> 0L)

  test("components: chains, cliques and singleton-pair graphs") {
    // components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (triangle)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("ida", "idb")
    for ((path, gate) <- gates) {
      val got = ConnectedComponents
        .components(pairs, "ida", "idb", driverMaxEdges = gate)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L), path)
    }
  }

  test("long chain converges within iteration budget") {
    val pairs = (1L until 30L).map(i => (i, i + 1)).toDF("ida", "idb")
    for ((path, gate) <- gates) {
      val got = ConnectedComponents
        .components(pairs, "ida", "idb", driverMaxEdges = gate)
        .as[(Long, Long)].collect()
      assert(got.forall(_._2 == 1L), path)
    }
  }

  test("property: random graphs match a union-find oracle on both paths") {
    // local weighted union-find as the independent oracle
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // min-id representative per component
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val reps = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
      nodes.map(n => n -> reps(find(n))).toMap
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3; (path, gate) <- gates) {
      val n = 40 + trial * 30
      val edges = Seq.fill(n)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(e => e._1 != e._2)
      val got = ConnectedComponents
        .components(edges.toDF("ida", "idb"), "ida", "idb", driverMaxEdges = gate)
        .as[(Long, Long)].collect().toMap
      assert(got == unionFind(edges), s"trial $trial ($path)")
    }
  }
}
