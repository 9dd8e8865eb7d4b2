package graft.ops

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, String)],
      window: Option[Long] = None) =
    Funnel.funnel(
      rows.toDF("k", "t", "typ"), "k", "t", "typ",
      steps = Seq("A", "B", "C"), window = window)
      .select("k", "t1", "t2", "t3", "level")
      .as[(String, Option[Long], Option[Long], Option[Long], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("funnel takes first qualifying time per step, in order") {
    val out = run(Seq(
      // u1: B before A must not count; the B after A does
      ("u1", 10L, "B"), ("u1", 20L, "A"), ("u1", 30L, "B"), ("u1", 40L, "C"),
      // u2: completes in strict order, extra repeats ignored
      ("u2", 1L, "A"), ("u2", 2L, "B"), ("u2", 3L, "B"), ("u2", 4L, "C"),
      // u3: never reaches C
      ("u3", 5L, "A"), ("u3", 6L, "B"),
      // u4: only noise
      ("u4", 7L, "X")))
    assert(out("u1") == ((Some(20L), Some(30L), Some(40L), 3L)))
    assert(out("u2") == ((Some(1L), Some(2L), Some(4L), 3L)))
    assert(out("u3") == ((Some(5L), Some(6L), None, 2L)))
    assert(out("u4") == ((None, None, None, 0L)))
  }

  test("equal timestamps: earlier step at same instant counts as preceding") {
    val out = run(Seq(("u", 10L, "A"), ("u", 10L, "B"), ("u", 10L, "C")))
    assert(out("u") == ((Some(10L), Some(10L), Some(10L), 3L)))
  }

  test("C before B blocks even when both after A") {
    val out = run(Seq(("u", 1L, "A"), ("u", 2L, "C"), ("u", 3L, "B")))
    // the only C is before the first qualifying B -> level 2
    assert(out("u") == ((Some(1L), Some(3L), None, 2L)))
  }

  test("window bounds the funnel relative to first step-1 time") {
    val rows = Seq(
      ("u", 0L, "A"), ("u", 5L, "B"), ("u", 20L, "C"),
      // v finishes fast
      ("v", 0L, "A"), ("v", 1L, "B"), ("v", 2L, "C"))
    val bounded = run(rows, window = Some(10L))
    assert(bounded("u") == ((Some(0L), Some(5L), None, 2L))) // C at 20 > 10
    assert(bounded("v") == ((Some(0L), Some(1L), Some(2L), 3L)))
    val unbounded = run(rows)
    assert(unbounded("u") == ((Some(0L), Some(5L), Some(20L), 3L)))
  }

  test("plan: single hash exchange feeds the window chain") {
    val df = Seq(("u", 1L, "A"), ("u", 2L, "B")).toDF("k", "t", "typ")
    val plan = Funnel.funnel(df, "k", "t", "typ", Seq("A", "B"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"funnel must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // one for the window partitioning; the groupBy reuses it (same key),
    // so at most one more partial-agg exchange is tolerable
    assert(exchanges <= 2, s"too many shuffles ($exchanges):\n$plan")
  }

  test("rejects duplicate steps and reserved columns") {
    val df = Seq(("u", 1L, "A")).toDF("k", "t", "typ")
    intercept[IllegalArgumentException] {
      Funnel.funnel(df, "k", "t", "typ", Seq("A", "A"))
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(df.withColumn("level",
        org.apache.spark.sql.functions.lit(1)), "k", "t", "typ", Seq("A"))
    }
  }
  test("lastTouchAttribution: predecessor per key, (none) for openers, id tiebreak") {
    import org.apache.spark.sql.functions.col
    // user 1: view(t1) -> buy(t2) -> buy(t3); user 2: buy first event;
    // user 3: equal timestamps — event_id orders click before buy
    val ev = Seq(
      (1L, 1L, 101L, "view"), (1L, 2L, 102L, "buy"), (1L, 3L, 103L, "buy"),
      (2L, 1L, 201L, "buy"), (2L, 2L, 202L, "view"),
      (3L, 5L, 301L, "click"), (3L, 5L, 302L, "buy"))
      .toDF("k", "t", "id", "typ")
    val got = Funnel.lastTouchAttribution(ev, "k", "t", "id", "typ", "buy")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("view" -> 1L, "buy" -> 1L, "(none)" -> 1L,
      "click" -> 1L))
    intercept[IllegalArgumentException] {
      Funnel.lastTouchAttribution(
        ev.withColumn("__prev", col("typ")), "k", "t", "id", "typ", "buy")
    }
  }

  test("timeDecayAttribution: recent touches outweigh old, (none) kept") {
    // user 1: A at t=0, B at t=10, buy at t=20, halfLife 10:
    //   w_A = 2^-2 = 0.25, w_B = 2^-1 = 0.5 -> shares 1/3, 2/3.
    // user 2: bare buy -> (none) credit 1.
    val ev = Seq(
      (1L, 0L, 1L, "A"), (1L, 10L, 2L, "B"), (1L, 20L, 3L, "buy"),
      (2L, 5L, 4L, "buy"))
      .toDF("k", "t", "id", "typ")
    val got = Funnel.timeDecayAttribution(ev, "k", "t", "id", "typ",
        "buy", halfLifeUs = 10L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("A" -> 0.333333, "B" -> 0.666667, "(none)" -> 1.0))
  }

  test("woeTable: hand-computed smoothed woe/iv, constant column one bin") {
    import org.apache.spark.sql.functions.col
    // 2 bins: v<5 -> bin0 (3 pos, 1 neg), v>=5 -> bin1 (1 pos, 3 neg)
    val df = Seq((1.0, true), (2.0, true), (3.0, true), (4.0, false),
      (6.0, true), (7.0, false), (8.0, false), (9.0, false))
      .toDF("v", "y")
    val r = graft.ops.FeatureEng.woeTable(df, "v", col("y"), bins = 2)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
        x.getDouble(3)))
    def woe(p: Long, q: Long) =
      math.log(((p + 0.5) / 5.0) / ((q + 0.5) / 5.0))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.toSeq == Seq((0, 3L, 1L, r6(woe(3, 1))),
      (1, 1L, 3L, r6(woe(1, 3)))))
    // constant column: data in bin 0, but ALL bins emitted (empty ones
    // carry nonzero smoothed iv_terms, so sum(iv_term) is the full IV)
    val const = graft.ops.FeatureEng.woeTable(
      Seq((5.0, true), (5.0, false)).toDF("v", "y"), "v", col("y"))
    assert(const.count() == 10)
    val c0 = const.orderBy("bin").head()
    assert(c0.getLong(1) == 1L && c0.getLong(2) == 1L)
  }

  test("calibrationTable: rates per bin, empty bins null-rated") {
    import org.apache.spark.sql.functions.col
    // scores 0..9 (bins are width 0.9); outcome true for score >= 5
    val df = (0 until 10).map(i => (i.toDouble, i >= 5)).toDF("s", "y")
    val got = graft.ops.FeatureEng.calibrationTable(df, "s", col("y"))
      .collect()
    assert(got.length == 10)
    assert(got.head.getLong(1) == 1L && got.head.getDouble(3) == 0.0)
    assert(got.last.getLong(1) == 1L && got.last.getDouble(3) == 1.0)
    assert(got.map(_.getLong(1)).sum == 10L)
    // constant score: all mass in bin 0, bins 1..9 empty with null rate
    val const = Seq((1.0, true), (1.0, false)).toDF("s", "y")
    val c = graft.ops.FeatureEng.calibrationTable(const, "s", col("y"))
      .collect()
    assert(c.head.getLong(1) == 2L && c.head.getDouble(3) == 0.5)
    assert(c.drop(1).forall(r => r.getLong(1) == 0L && r.isNullAt(3)))
  }

  test("liftTable: top decile concentrates positives, monotone cum") {
    import org.apache.spark.sql.functions.col
    // 100 rows, score = i, positives are the top 10 scores
    val df = (0 until 100).map(i => (i.toDouble, i >= 90)).toDF("s", "y")
    val got = graft.ops.FeatureEng.liftTable(df, "s", col("y"))
      .collect()
    assert(got.length == 10)
    val b1 = got.head
    // bucket 1 = scores > q90: all 10 positives, lift = 1.0/0.1 = 10
    assert(b1.getInt(0) == 1 && b1.getLong(1) == 10L &&
      b1.getLong(2) == 10L)
    assert(b1.getDouble(5) == 1.0 && b1.getDouble(6) == 10.0)
    val last = got.last
    assert(last.getLong(3) == 100L && last.getLong(4) == 10L)
    assert(last.getDouble(6) == 1.0) // full-population lift is 1
    // cum counts are monotone non-decreasing
    assert(got.map(_.getLong(3)).toSeq ==
      got.map(_.getLong(3)).sorted.toSeq)
  }

  test("targetEncode: shrinkage toward prior, null category kept") {
    import org.apache.spark.sql.functions.col
    // prior = 4/8 = 0.5; cat a: 3/4 pos, cat null: 1/4 pos
    val df = Seq((Some("a"), true), (Some("a"), true), (Some("a"), true),
      (Some("a"), false), (None, true), (None, false), (None, false),
      (None, false)).toDF("c", "y")
    val rows = graft.ops.FeatureEng.targetEncode(df, "c", col("y"), m = 4.0)
      .collect()
    val byCat = rows.map(r => (if (r.isNullAt(0)) "NULL" else r.getString(0))
      -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // enc_a = (3 + 4*0.5)/(4+4) = 0.625 ; enc_null = (1+2)/8 = 0.375
    assert(byCat("a") == ((4L, 3L, 0.625)))
    assert(byCat("NULL") == ((4L, 1L, 0.375)))
  }
}
