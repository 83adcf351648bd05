package graft

import org.apache.spark.sql.functions._
import graft.graph.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("assortativity: star graph is maximally disassortative (-1)") {
    // K1,3: center degree 3, leaves degree 1 — r = −1 exactly, so the
    // ppm emission is −1000000 on the nose (no rounding slack to hide in)
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val out = Components.assortativity(edges)
      .as[(Long, Option[Long])].head()
    assert(out == ((6L, Some(-1000000L))))
  }

  test("assortativity: regular graph has zero variance and emits null") {
    // a 4-cycle: every degree 2 — the denominator is 0; null, not 0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val out = Components.assortativity(edges)
      .as[(Long, Option[Long])].head()
    assert(out == ((8L, None)))
  }

  test("assortativity: matches a hand-computed Pearson on a mixed graph") {
    // path 1-2-3 plus pendant 4 on node 2: degrees d1=1, d2=3, d3=1, d4=1
    // incidences (x,y): (1,3),(3,1) ×3 pairs → n=6
    // Σx=Σ(1+3)·3=... enumerate: (1,3),(3,1),(3,1),(1,3),(3,1),(1,3)
    // Σx=12, Σxy=6·3=18, Σx²=6·5=30 → num=6·18−144=−36, den=6·30−144=36
    // r = −1 (a star in disguise: 2 is the hub of all three edges)
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val out = Components.assortativity(edges)
      .as[(Long, Option[Long])].head()
    assert(out == ((6L, Some(-1000000L))))
  }

  test("assortativity: parallel and reversed duplicate edges collapse first") {
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 1L), (0L, 2L), (0L, 3L))
      .toDF("src", "dst")
    val out = Components.assortativity(edges)
      .as[(Long, Option[Long])].head()
    assert(out == ((6L, Some(-1000000L))))
  }
}
