package graft

/** End-to-end spec for the CONSOLE entry point (reference:
  * `controller/console.py:86-109` — file scan → report → sink) — the
  * last previously-unspecced surface row: extension-dispatched scan,
  * flag handling, sink selection by output extension, and the two
  * summary lines, driven through `ProfileApp.run` on the shared
  * session. */
class ProfileAppSpec extends SparkSpec {

  private def tmp(suffix: String): String =
    java.nio.file.Files.createTempFile("graft-app", suffix)
      .toString

  private def captureOut(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8"))(body)
    bos.toString("UTF-8")
  }

  test("parquet -> json: reference key set, row/col summary line") {
    val out = tmp(".json")
    val printed = captureOut {
      ProfileApp.run(spark, Array(
        "/root/testdata/sf0.001/lineitem.parquet", out, "--minimal"))
    }
    assert(printed.matches(
      "(?s).*\\[graft\\] profiled \\d+ rows x \\d+ cols in [\\d.]+s -> .*"),
      printed)
    assert(printed.contains("[graft] alerts:"), printed)
    val json = ujsonKeys(java.nio.file.Files.readString(
      java.nio.file.Paths.get(out)))
    assert(json === Set("analysis", "table", "variables", "scatter",
      "correlations", "missing", "messages", "package", "sample",
      "duplicates"))
  }

  test("html output extension selects the HTML sink") {
    val out = tmp(".html")
    captureOut {
      ProfileApp.run(spark, Array(
        "/root/testdata/sf0.001/region.parquet", out, "--minimal"))
    }
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out))
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("<h2>Overview</h2>"))
  }

  test("csv scan dispatch with header + inferSchema") {
    val csv = tmp(".csv")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csv),
      "a,b\n1,x\n2,y\n3,x\n")
    val out = tmp(".json")
    captureOut { ProfileApp.run(spark, Array(csv, out, "--minimal")) }
    val s = java.nio.file.Files.readString(java.nio.file.Paths.get(out))
    // header consumed (3 data rows), both columns present by name
    assert("\"n\"\\s*:\\s*3".r.findFirstIn(s).isDefined, s.take(400))
    assert(s.contains("\"a\"") && s.contains("\"b\""))
  }

  test("rejects missing arguments with the usage line") {
    val e = intercept[IllegalArgumentException] {
      ProfileApp.run(spark, Array("only-one-arg"))
    }
    assert(e.getMessage.contains("usage: ProfileApp"))
  }

  /** Top-level key set of a JSON object without a parser dependency:
    * keys at nesting depth 1. */
  private def ujsonKeys(s: String): Set[String] = {
    val keys = scala.collection.mutable.Set[String]()
    var depth = 0; var i = 0; var inStr = false; var cur = new StringBuilder
    var lastStr = ""
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\') { cur.append(s.charAt(i + 1)); i += 1 }
        else if (c == '"') { inStr = false; lastStr = cur.toString }
        else cur.append(c)
      } else c match {
        case '"' => inStr = true; cur = new StringBuilder
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ':' => if (depth == 1 && lastStr.nonEmpty) keys += lastStr
        case _ =>
      }
      i += 1
    }
    keys.toSet
  }
}
