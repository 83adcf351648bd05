package graft

import org.apache.spark.sql.functions._
import graft.graph.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("stats: hand-computed census on K4 minus one edge") {
    // nodes a,b,c,d; edges ab, ac, ad, bc, bd (cd missing):
    // degrees a=3, b=3, c=2, d=2 → wedges 3+3+1+1 = 8
    // triangles: abc, abd → 2; clustering = 6/8 = 750000 ppm
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"))
      .toDF("src", "dst")
    val out = Triangles.stats(edges)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out == ((4L, 5L, 8L, 2L, 750000L)))
  }

  test("stats: dup edges, self-loops, and reversed duplicates normalize away") {
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("c", "a"))
      .toDF("src", "dst")
    // one triangle abc; 3 edges; degrees all 2 → wedges 3; ppm = 1000000
    val out = Triangles.stats(edges)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out == ((3L, 3L, 3L, 1L, 1000000L)))
  }

  test("stats: triangle-free graph reports zero with a clean ppm guard") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Triangles.stats(edges)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out == ((4L, 3L, 2L, 0L, 0L)))
  }

  test("stats: oriented count equals brute force on a pseudo-random graph") {
    val es = for {
      i <- 0L until 300L
      e = (i * 13 % 40, (i * 29 + 7) % 40)
      if e._1 != e._2
    } yield e
    val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val brute = (for {
      (a, b) <- und.toSeq; c <- 0L until 40L
      if c > b && und.contains((a, c)) && und.contains((b, c))
    } yield 1).size
    val out = Triangles.stats(es.toDF("src", "dst"))
      .select("n_triangles").as[Long].head()
    assert(out == brute.toLong, s"oriented=$out brute=$brute")
  }

  test("localClustering: hand-computed lcc on K4 minus one edge") {
    // a,b in two triangles of deg 3: lcc = 2·2e6/(3·2) = 666666
    // c,d in one triangle of deg 2: lcc = 2e6/2 = 1000000
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"))
      .toDF("src", "dst")
    val out = Triangles.localClustering(edges)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      "a" -> ((3L, 2L, 666666L)), "b" -> ((3L, 2L, 666666L)),
      "c" -> ((2L, 1L, 1000000L)), "d" -> ((2L, 1L, 1000000L))))
  }

  test("localClustering: per-node counts match brute force; degree-1 emits 0") {
    val es = (for {
      i <- 0L until 300L
      e = (i * 13 % 40, (i * 29 + 7) % 40)
      if e._1 != e._2
    } yield e) :+ ((40L, 0L)) // a pendant node: degree 1, lcc must be 0
    val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    def tri(n: Long) = (for {
      (a, b) <- und.toSeq; c <- 0L to 40L
      if c > b && und.contains((a, c)) && und.contains((b, c))
      if a == n || b == n || c == n
    } yield 1).size.toLong
    val out = Triangles.localClustering(es.toDF("src", "dst"))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (node, d, t, ppm) =>
      assert(t == tri(node), s"node $node: got $t, brute ${tri(node)}")
      if (d < 2) assert(ppm == 0L)
      else assert(ppm == t * 2000000L / (d * (d - 1)))
    }
    assert(out.exists { case (n, d, _, ppm) => n == 40L && d == 1L && ppm == 0L })
  }
}
