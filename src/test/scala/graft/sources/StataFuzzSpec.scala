package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Property fuzz of the Stata write→read round trip: random schemas
  * over the full dta type lattice, boundary values (the largest
  * NON-missing code of every numeric type), random nulls, multibyte
  * strings. Whatever the writer accepts, the reader must return
  * bit-identically (modulo null-string → "" — the pandas convention
  * the scaladoc states). */
class StataFuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260815)

  private def randValue(dt: DataType, r: scala.util.Random): Any =
    dt match {
      case ByteType =>
        // boundary: 100 is the LARGEST non-missing byte
        if (r.nextInt(10) == 0) 100.toByte
        else (r.nextInt(228) - 127).toByte // [-127, 100]
      case ShortType =>
        if (r.nextInt(10) == 0) 32740.toShort
        else (r.nextInt(65509) - 32768).toShort // [-32768, 32740]
      case IntegerType =>
        if (r.nextInt(10) == 0) 2147483620
        else r.nextInt()  // may exceed? Int.MaxValue=2147483647 > cap
      case FloatType => (r.nextFloat() - 0.5f) * 2e30f
      case DoubleType => (r.nextDouble() - 0.5) * 2e100
      case StringType =>
        val alphabet = "abcXYZ 09é漢_"
        (0 until r.nextInt(12)).map(_ =>
          alphabet(r.nextInt(alphabet.length))).mkString
      case _ => null
    }

  test("random frames round-trip bit-identically (20 trials)") {
    val types: Seq[DataType] = Seq(ByteType, ShortType, IntegerType,
      FloatType, DoubleType, StringType)
    (1 to 20).foreach { trial =>
      val k = 1 + rnd.nextInt(5)
      val schema = StructType(
        StructField("rid", IntegerType, nullable = false) +:
          (0 until k).map(i =>
            StructField(s"c$i", types(rnd.nextInt(types.length)),
              nullable = true)))
      val n = 1 + rnd.nextInt(40)
      val rows = (0 until n).map { ri =>
        Row.fromSeq(ri +: (0 until k).map { ci =>
          val dt = schema(ci + 1).dataType
          if (dt != StringType && rnd.nextInt(5) == 0) null
          else randValue(dt, rnd) match {
            // clamp ints above the missing threshold back into range
            case v: Int if v > 2147483620 => 2147483620
            case v => v
          }
        })
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1 + rnd.nextInt(3)), schema)
      val out = java.nio.file.Files
        .createTempDirectory(s"graft-stata-fuzz-$trial").toString
      df.write.format("graft-stata").mode("overwrite").save(out)
      val back = spark.read.format("graft-stata").load(out)
        .orderBy("rid").collect()
      val want = df.orderBy("rid").collect()
      assert(back.length === want.length, s"trial $trial row count")
      want.zip(back).foreach { case (w, b) =>
        (0 until schema.length).foreach { i =>
          val exp = schema(i).dataType match {
            case StringType => Option(w.get(i)).getOrElse("")
            case _ => w.get(i)
          }
          assert(exp === b.get(i),
            s"trial $trial rid=${w.get(0)} col=${schema(i).name} " +
              s"(${schema(i).dataType.simpleString})")
        }
      }
      graft.queries.StreamGate.deleteRecursively(out)
    }
  }

  test("boundary: largest non-missing codes survive, one past fails") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft-stata-bound").toString
    Seq((100.toByte, 32740.toShort, 2147483620))
      .toDF("b", "i", "l")
      .write.format("graft-stata").mode("overwrite").save(out)
    val r = spark.read.format("graft-stata").load(out).head()
    assert(r.getByte(0) === 100.toByte && r.getShort(1) === 32740.toShort)
    assert(r.getInt(2) === 2147483620)
    val e = intercept[Exception] {
      Seq((2147483621, "x")).toDF("l", "s")
        .write.format("graft-stata").mode("overwrite").save(out)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("missing")), e.toString)
    graft.queries.StreamGate.deleteRecursively(out)
  }
}
