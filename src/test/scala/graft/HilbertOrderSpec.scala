package graft

import org.apache.spark.sql.functions._

import graft.expressions.HilbertXY
import graft.tables.{HilbertOrder, StatsSkipping, ZOrder}

/** The Hilbert index must be a true Hilbert curve (bijective over the
  * grid, successive cells adjacent), the codegen'd expression must match
  * the JVM walk, and the clustered layout must beat-or-match Morton on
  * files touched for box queries over the same data. */
class HilbertOrderSpec extends SparkSuite {

  test("curve properties: bijection + unit-step adjacency; d2xy inverts xy2d") {
    val bits = 5
    val side = 1 << bits
    val cells = for (x <- 0L until side; y <- 0L until side) yield (x, y)
    val ds = cells.map { case (x, y) => (x, y, HilbertXY.xy2d(bits, x, y)) }
    // Bijection onto [0, 4^bits).
    assert(ds.map(_._3).sorted == (0L until (side.toLong * side)).toVector)
    // Successive indexes are ADJACENT cells (the Hilbert property Morton
    // lacks) — walk the inverse and check unit Manhattan steps.
    val walk = (0L until (side.toLong * side)).map(HilbertXY.d2xy(bits, _))
    walk.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    }
    // d2xy inverts xy2d everywhere.
    ds.foreach { case (x, y, d) => assert(HilbertXY.d2xy(bits, d) == ((x, y))) }
  }

  test("codegen'd expression == JVM walk; codegens; NULL-safe") {
    val s = spark
    import s.implicits._
    val bits = 16
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(2000)((rnd.nextLong().abs % (1L << bits), rnd.nextLong().abs % (1L << bits)))
    val df = pts.toDF("x", "y")
    val rows = df.selectExpr("x", "y", s"hilbert_xy(x, y, $bits) AS h").collect()
    rows.foreach { r =>
      assert(r.getLong(2) == HilbertXY.xy2d(bits, r.getLong(0), r.getLong(1)))
    }
    val n = s.sql("SELECT hilbert_xy(CAST(NULL AS BIGINT), 1L, 4)").collect().head
    assert(n.isNullAt(0))
    // Plan check over a parquet scan (a local relation would be folded
    // away by ConvertToLocalRelation before any Project exists).
    val line = s.read.parquet(s"$sf001/orders.parquet")
      .selectExpr("hilbert_xy(o_orderkey, o_custkey, 16) AS h")
      .queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("Project")).getOrElse("")
    assert(line.trim.startsWith("*("), "hilbert_xy should run inside WholeStageCodegen")
  }

  test("hilbert layout prunes at least as well as morton on box queries") {
    val s = spark
    val orders = s.read.parquet(s"$sf001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val base = graft.tables.TmpDirs.create("graft-hvz")
    val zDir = base.resolve("z").toString
    val hDir = base.resolve("h").toString
    val cols = Seq("o_orderkey", "o_custkey")
    StatsSkipping.writeWithStats(s, orders, cols, zDir, numFiles = 16)
    StatsSkipping.writeWithStats(s, orders, cols, hDir, numFiles = 16, curve = "hilbert")

    // Same rows in both layouts.
    assert(s.read.parquet(hDir).count() == orders.count())

    val nKeys = orders.agg(max("o_orderkey")).head().getLong(0)
    val nCust = orders.agg(max("o_custkey")).head().getLong(0)
    // A grid of mid-size boxes (10% per dimension): Hilbert's tighter
    // per-file envelopes must touch no MORE files than Morton overall,
    // and results must be identical per box.
    var zTouched, hTouched = 0
    for (fx <- Seq(0.1, 0.4, 0.7); fy <- Seq(0.2, 0.5, 0.8)) {
      val box = Seq(
        ("o_orderkey", (nKeys * fx).toLong, (nKeys * (fx + 0.1)).toLong),
        ("o_custkey", (nCust * fy).toLong, (nCust * (fy + 0.1)).toLong))
      val zf = StatsSkipping.liveFiles(zDir, box).size
      val hf = StatsSkipping.liveFiles(hDir, box).size
      zTouched += zf; hTouched += hf
      val za = StatsSkipping.scanBox(s, zDir, box)
        .agg(count(lit(1)), sum("o_totalprice")).head()
      val ha = StatsSkipping.scanBox(s, hDir, box)
        .agg(count(lit(1)), sum("o_totalprice")).head()
      assert(za.getLong(0) == ha.getLong(0), s"row mismatch for box $box")
    }
    assert(hTouched > 0 && hTouched < 9 * 16, "pruning must actually prune")
    assert(hTouched <= zTouched,
      s"hilbert touched $hTouched files vs morton $zTouched — locality regressed")
  }
}
