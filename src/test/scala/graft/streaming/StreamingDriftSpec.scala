package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("per-window PSI vs baseline: matching low, shifted high, exact") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val df = mem.toDF.toDF("ts", "v")

    // baseline: uniform over [0, 10), 5 bins, equal mass
    val base = StreamingDrift.Baseline.fromCounts(
      0.0, 10.0, Seq(100L, 100L, 100L, 100L, 100L))
    val out = StreamingDrift.psiVsBaseline(
      df, "ts", "v", base, "10 minutes", "1 minute")
    val q = out.writeStream.format("memory").queryName("drift")
      .outputMode(OutputMode.Update()).start()

    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 09:$min%02d:00")
    // window 1 (09:00): uniform 1..10 -> two per bin, matches baseline
    val uniform = (0 until 10).map(i => (t(1), i + 0.5))
    // window 2 (09:10): all mass in the top bin + one below-range clamp
    val shifted = Seq.fill(9)((t(12), 9.5)) :+ ((t(12), -5.0))
    mem.addData(uniform ++ shifted: _*)
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM drift ORDER BY w.start").collect()
    q.stop()

    assert(rows.length == 2)
    def naivePsi(counts: Seq[Long]): Double = {
      val k = counts.size; val n = counts.sum
      val terms = counts.zip(base.shares).map { case (c, bq) =>
        val p = (c + 0.5) / (n + 0.5 * k)
        (p - bq) * math.log(p / bq)
      }
      BigDecimal(terms.sum).setScale(8,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val w1 = rows(0)
    assert(w1.getLong(2) == 10)
    assert(w1.getDouble(1) == naivePsi(Seq(2, 2, 2, 2, 2)), s"w1: $w1")
    assert(w1.getDouble(1) < 0.01, s"matching window should be ~0: $w1")
    val w2 = rows(1)
    assert(w2.getLong(2) == 10) // below-range row clamped in, not lost
    assert(w2.getDouble(1) == naivePsi(Seq(1, 0, 0, 0, 9)), s"w2: $w2")
    assert(w2.getDouble(1) > 1.0, s"shifted window should alarm: $w2")
  }

  test("baseline guards: nonpositive shares and bad range rejected") {
    intercept[IllegalArgumentException] {
      StreamingDrift.Baseline(0.0, 1.0, Seq(0.5, 0.0, 0.5))
    }
    intercept[IllegalArgumentException] {
      StreamingDrift.Baseline(1.0, 1.0, Seq(1.0))
    }
  }
}
