package graft

import org.apache.spark.sql.functions._
import graft.spatial.Spatial

/** Grid-bucketed spatial joins: the cell-join must be EXACTLY the
  * all-pairs result (completeness is the whole claim — a grid join that
  * drops cross-cell neighbors is wrong, not approximate), and the
  * radius<=cell precondition must be enforced, not commented. */
class SpatialSpec extends SparkSpec {
  import spark.implicits._

  // sf0.01 (150 users): sf0.001's ~15 points are too sparse for any
  // radius-48 pair to exist, which would make the equality vacuous
  private def events = spark.read
    .parquet("/root/testdata/sf0.01/events.parquet")

  private def pts = Spatial.hashPoints(events, "user_id")

  test("radiusPairs equals brute-force all-pairs at the same radius") {
    val grid = Spatial.radiusPairs(pts, "user_id", radius = 48, cell = 64)
      .select("id_a", "id_b", "dist2").as[(Long, Long, Long)]
      .collect().toSet
    val p = pts.select("user_id", "x", "y").as[(Long, Long, Long)].collect()
    val brute = (for {
      (a, ax, ay) <- p; (b, bx, by) <- p
      if a < b
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= 48L * 48L
    } yield (a, b, d2)).toSet
    assert(grid == brute)
    assert(brute.nonEmpty) // density sanity: the fixture must exercise it
  }

  test("gridKnn equals brute-force bounded kNN with the same tie-break") {
    val grid = Spatial.gridKnn(pts, "user_id", k = 3, radius = 48, cell = 64)
      .select("id", "neighbor_id", "dist2", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    val p = pts.select("user_id", "x", "y").as[(Long, Long, Long)].collect()
    val brute = p.flatMap { case (a, ax, ay) =>
      p.filter(_._1 != a)
        .map { case (b, bx, by) =>
          (b, (ax - bx) * (ax - bx) + (ay - by) * (ay - by)) }
        .filter(_._2 <= 48L * 48L)
        .sortBy { case (b, d2) => (d2, b) }
        .take(3).zipWithIndex
        .map { case ((b, d2), i) => (a, b, d2, i + 1) }
    }.toSet
    assert(grid == brute)
  }

  test("every pair is emitted exactly once (no neighborhood double-count)") {
    val rows = Spatial.radiusPairs(pts, "user_id", radius = 64, cell = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(rows.length == rows.toSet.size)
    assert(rows.forall { case (a, b) => a < b })
  }

  test("radius > cell is rejected (3x3 neighborhood would be incomplete)") {
    val e = intercept[IllegalArgumentException] {
      Spatial.radiusPairs(pts, "user_id", radius = 65, cell = 64)
    }
    assert(e.getMessage.contains("radius"))
  }

  test("grid DBSCAN matches a brute-force replay") {
    val eps = 48; val minPts = 3
    val p = pts.select("user_id", "x", "y")
      .as[(Long, Long, Long)].collect().toSeq
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val neigh = p.map(a =>
      a._1 -> p.filter(b => b._1 != a._1 && d2(a, b) <= eps.toLong * eps)
        .map(_._1).toSet).toMap
    val core = p.map(_._1).filter(id => neigh(id).size + 1 >= minPts).toSet
    // components over core-core eps edges, min-id label (union-find)
    val label = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long =
      if (label(x) == x) x else { val r = find(label(x)); label(x) = r; r }
    for (a <- core; b <- neigh(a) if b > a && core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); label(math.max(ra, rb)) = lo }
    }
    val coreLabel = core.map(c => c -> find(c)).toMap
    val expect = p.map(_._1).sorted.map { id =>
      if (core(id)) (id, "core", Some(coreLabel(id)))
      else {
        val cn = neigh(id).filter(core)
        if (cn.nonEmpty) (id, "border", Some(cn.map(coreLabel).min))
        else (id, "noise", None)
      }
    }
    val got = Spatial.gridDbscan(pts, "user_id", eps, minPts, 64)
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(got == expect)
    // the fixture must exercise all three roles or the test proves little
    assert(Set("core", "border", "noise").subsetOf(got.map(_._2).toSet))
  }

  test("grid DBSCAN distributed CC fallback ≡ driver union-find") {
    // driverEdgeCap = 0 forces every supernode edge past the cap, so the
    // scale path (duplicateClusters pointer-jumping) labels the graph
    // instead of the collected union-find — the two branches must be
    // bit-identical on the same fixture (round-6 verdict: an untested
    // fallback on the scale path is not a scale argument).
    val eps = 48; val minPts = 3
    val viaDriver = Spatial.gridDbscan(pts, "user_id", eps, minPts, 64)
      .orderBy("user_id").collect().toSeq
    val viaDistributed =
      Spatial.gridDbscan(pts, "user_id", eps, minPts, 64, driverEdgeCap = 0)
        .orderBy("user_id").collect().toSeq
    assert(viaDistributed == viaDriver)
    // Non-vacuity: some cluster must span >1 eps-clique subcell — only
    // then does a supernode EDGE exist, and only edges reach the capped
    // branch. (All-cores-in-one-subcell would contract to a single
    // supernode and both branches would trivially see zero edges.)
    val side = 1 + (eps / math.sqrt(2.0)).toInt
    val xy = pts.orderBy("user_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1) / side, r.getLong(2) / side))
      .toMap
    val coreSubcellsPerCluster = viaDriver
      .filter(_.getString(1) == "core")
      .groupBy(_.getLong(2))
      .map { case (_, rows) => rows.map(r => xy(r.getLong(0))).toSet.size }
    assert(coreSubcellsPerCluster.exists(_ > 1))
  }

  test("point cloud is deterministic and in-range") {
    val a = pts.orderBy("user_id").collect().toSeq
    val b = Spatial.hashPoints(events.repartition(7), "user_id")
      .orderBy("user_id").collect().toSeq
    assert(a == b)
    assert(a.forall { r =>
      val (x, y) = (r.getLong(1), r.getLong(2))
      x >= 0 && x < 1024 && y >= 0 && y < 1024
    })
  }
}
