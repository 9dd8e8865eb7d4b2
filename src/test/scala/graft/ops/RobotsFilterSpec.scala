package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Robots.crawlFilter]]'s dual execution paths (q371 gates values on
  * the broadcast path; this pins path EQUIVALENCE, plan shape, and the
  * never-throws-on-hostile-probes contract). */
class RobotsFilterSpec extends SparkSpec {

  private def fixtures() = {
    import spark.implicits._
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"),
      ("b.com", "User-agent: bot\nDisallow: /\n")).toDF("host", "txt")
    val probes = Seq(
      ("a.com", "bot", "/private/x"),
      ("a.com", "bot", "/private/ok/y"),
      ("a.com", "bot", "/public"),
      ("b.com", "bot", "/anything"),
      ("b.com", "other", "/anything"),
      ("c.com", "bot", "/no-robots-here"),
      ("a.com", null, "/private/x"), // hostile: null agent
      ("a.com", "bot", null) // hostile: null path
    ).toDF("host", "agent", "path")
    (probes, robots)
  }

  test("partitioned path (gate=0) returns exactly the broadcast " +
    "path's verdicts, including null agent/path probes") {
    val (probes, robots) = fixtures()
    val bc = Robots.crawlFilter(probes, "host", "agent", "path",
      robots, "host", "txt")
    val part = Robots.crawlFilter(probes, "host", "agent", "path",
      robots, "host", "txt", maxBroadcastHosts = 0L)
    val key = Seq(col("host"), col("agent"), col("path"))
    assert(part.orderBy(key: _*).collect().toSeq ===
      bc.orderBy(key: _*).collect().toSeq)
    // spot verdicts: null agent falls to the * group; null path
    // evaluates as "" (prefix-of-nothing → only empty patterns match)
    val m = part.collect().map(r => (r.getString(0),
      Option(r.getString(1)), Option(r.getString(2))) -> r.getBoolean(3))
      .toMap
    assert(!m(("a.com", None, Some("/private/x")))) // * group disallows
    assert(m(("a.com", Some("bot"), None))) // no rule matches ""
    assert(m(("c.com", Some("bot"), Some("/no-robots-here")))) // no robots
  }

  test("path selection: above the gate the plan broadcasts, below " +
    "it the join shuffles on host") {
    val (probes, robots) = fixtures()
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // kill auto-broadcast so only the explicit hint can broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bcPlan = Robots.crawlFilter(probes, "host", "agent", "path",
        robots, "host", "txt").queryExecution.executedPlan.toString
      val partPlan = Robots.crawlFilter(probes, "host", "agent", "path",
        robots, "host", "txt", maxBroadcastHosts = 0L)
        .queryExecution.executedPlan.toString
      assert(bcPlan.contains("BroadcastHashJoin") ||
        bcPlan.contains("BroadcastNestedLoopJoin"))
      assert(!partPlan.contains("BroadcastHashJoin"))
      assert(partPlan.contains("SortMergeJoin") ||
        partPlan.contains("ShuffledHashJoin"))
    } finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("StreamingRobots.allowedAtFetchTime (batch drive): half-open " +
    "[from, to) version windows; uncovered fetch times default-allow") {
    import spark.implicits._
    val versions = Seq(
      ("h.com", 0L, 100L, "User-agent: *\nDisallow: /\n"),
      ("h.com", 100L, Long.MaxValue, "User-agent: *\nDisallow: /p/\n")
    ).toDF("host", "from_us", "to_us", "txt")
    val probes = Seq(
      ("h.com", "bot", "/p/x", 99L), // v1: deny-all
      ("h.com", "bot", "/q", 99L), // v1: deny-all
      ("h.com", "bot", "/p/x", 100L), // boundary -> v2: /p/ denied
      ("h.com", "bot", "/q", 100L), // v2: allowed
      ("h.com", "bot", "/q", -5L), // before any version: default allow
      ("nope.com", "bot", "/q", 50L) // never fetched: default allow
    ).toDF("host", "agent", "path", "ts")
    val got = graft.streaming.StreamingRobots.allowedAtFetchTime(
      probes, "host", "agent", "path", "ts",
      versions, "host", "from_us", "to_us", "txt")
      .collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3)) ->
        r.getBoolean(4)).toMap
    assert(!got(("h.com", "/p/x", 99L)))
    assert(!got(("h.com", "/q", 99L)))
    assert(!got(("h.com", "/p/x", 100L)))
    assert(got(("h.com", "/q", 100L)))
    assert(got(("h.com", "/q", -5L)))
    assert(got(("nope.com", "/q", 50L)))
  }

  test("StreamingRobots: a NULL fetch timestamp matches no version, " +
    "defaults to allowed, and never throws (hostile probe contract)") {
    import spark.implicits._
    val versions = Seq(
      ("h.com", 0L, Long.MaxValue, "User-agent: *\nDisallow: /\n")
    ).toDF("host", "from_us", "to_us", "txt")
    val probes = Seq(
      ("h.com", "bot", "/p/x", Some(50L)), // covered: deny-all
      ("h.com", "bot", "/p/x", None) // hostile: null fetch time
    ).toDF("host", "agent", "path", "ts")
    val got = graft.streaming.StreamingRobots.allowedAtFetchTime(
      probes, "host", "agent", "path", "ts",
      versions, "host", "from_us", "to_us", "txt")
      .collect()
      .map(r => (if (r.isNullAt(3)) None else Some(r.getLong(3))) ->
        r.getBoolean(4)).toMap
    assert(!got(Some(50L)))
    assert(got(None), "null ts must default-allow, keeping its null")
  }

  test("crawlFilter: a robotsHostCount hint skips the eager count " +
    "and yields identical verdicts on both paths") {
    val (probes, robots) = fixtures()
    val counted = Robots.crawlFilter(probes, "host", "agent", "path",
      robots, "host", "txt")
    val hintedBc = Robots.crawlFilter(probes, "host", "agent", "path",
      robots, "host", "txt", robotsHostCount = Some(2L))
    val hintedPart = Robots.crawlFilter(probes, "host", "agent", "path",
      robots, "host", "txt", maxBroadcastHosts = 1L,
      robotsHostCount = Some(2L))
    val key = Seq(col("host"), col("agent"), col("path"))
    assert(hintedBc.orderBy(key: _*).collect().toSeq ===
      counted.orderBy(key: _*).collect().toSeq)
    assert(hintedPart.orderBy(key: _*).collect().toSeq ===
      counted.orderBy(key: _*).collect().toSeq)
  }

  test("crawlDelaySeeds: default, cap, zero->1us, fractional") {
    import spark.implicits._
    val robots = Seq(
      ("a", "User-agent: *\nCrawl-delay: 2\n"),
      ("b", "User-agent: *\nDisallow:\n"),            // default
      ("c", "User-agent: *\nCrawl-delay: 9999999\n"), // capped
      ("d", "User-agent: *\nCrawl-delay: 0\n"),       // declared zero
      ("e", "User-agent: *\nCrawl-delay: 0.25\n")
    ).toDF("host", "txt")
    val got = Robots.crawlDelaySeeds(robots, "host", "txt", "bot",
        defaultDelayUs = 5000000L, maxDelayUs = 60000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") === 2000000L)
    assert(got("b") === 5000000L)
    assert(got("c") === 60000000L, "hostile delay capped")
    assert(got("d") === 1L, "declared 0 -> minimal spacing, not default")
    assert(got("e") === 250000L)
  }
}
