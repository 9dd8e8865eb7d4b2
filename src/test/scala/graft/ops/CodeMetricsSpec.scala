package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Unit edges of the code-metrics spec (q358 gates the fixture corpus
  * vs the independent python twin). */
class CodeMetricsSpec extends AnyFunSuite {

  test("null text and missing extension degrade, never throw") {
    val m = CodeMetrics.metrics(1L, "x.py", null)
    assert(m.n_lines === 1 && m.blank_frac === 1.0 && m.alpha_frac === 0.0)
    assert(CodeMetrics.metrics(2L, "Makefile", "a:\n\tb\n")
      .lang === "unknown")
    assert(CodeMetrics.metrics(3L, "", "").lang === "unknown")
  }

  test("block-comment state carries across lines and closes mid-line") {
    val c = "/* a\nb\n*/ int x; /* again\nstill */ y\nint z;\n"
    val m = CodeMetrics.metrics(4L, "f.c", c)
    // lines: "/* a"(c) "b"(c) "*/ int x; /* again"(c: starts in block)
    //        "still */ y"(c) "int z;"(code)
    assert(m.n_lines === 5)
    assert(m.comment_frac === 0.8, m)
  }

  test("SPDX wins over phrase heuristics and captures verbatim") {
    val c = "// SPDX-License-Identifier: BSD-3-Clause\n" +
      "// MIT License would otherwise match\ncode();\n"
    assert(CodeMetrics.metrics(5L, "a.js", c).license === "BSD-3-Clause")
  }
}
