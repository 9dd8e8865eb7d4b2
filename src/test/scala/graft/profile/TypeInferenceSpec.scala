package graft.profile

import graft.SparkSpec

class TypeInferenceSpec extends SparkSpec {
  import spark.implicits._

  test("string->bool via token map (reference typeset_relations.py:39-65)") {
    val df = Seq("yes", "No", "Y", "n", "TRUE", "f").toDF("b")
    val inf = TypeInference.infer(df).head
    assert(inf.inferred == ProfileType.Bool)
    val vals = TypeInference.castToInferred(df).as[Boolean].collect().toSeq
    assert(vals == Seq(true, false, true, false, true, false))
  }

  test("string->numeric when all values coerce") {
    val df = Seq("1.5", "2", "-3e2", "0").toDF("x")
    val inf = TypeInference.infer(df).head
    assert(inf.inferred == ProfileType.Numeric)
    val vals = TypeInference.castToInferred(df).as[Double].collect().toSeq
    assert(vals == Seq(1.5, 2.0, -300.0, 0.0))
  }

  test("string->datetime when all values parse") {
    val df = Seq("2020-01-01", "1999-12-31").toDF("d")
    assert(TypeInference.infer(df).head.inferred == ProfileType.DateTime)
  }

  test("mixed strings stay categorical") {
    val df = Seq("1.5", "abc", "true").toDF("m")
    assert(TypeInference.infer(df).head.inferred == ProfileType.Categorical)
  }

  test("nulls don't block promotion; all-null stays categorical") {
    val df = Seq(Some("1"), None, Some("2")).toDF("x")
    assert(TypeInference.infer(df).head.inferred == ProfileType.Numeric)
    val allNull = Seq[Option[String]](None, None).toDF("y")
    assert(TypeInference.infer(allNull).head.inferred == ProfileType.Categorical)
  }

  test("non-string columns pass through with declared type") {
    val df = Seq((1, "2.5")).toDF("i", "s")
    val m = TypeInference.infer(df).map(i => i.column -> i.inferred).toMap
    assert(m("i") == ProfileType.Numeric)
    assert(m("s") == ProfileType.Numeric)
  }
}
