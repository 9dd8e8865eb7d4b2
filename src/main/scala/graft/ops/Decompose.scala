package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL / path / JSON decomposition operators (reference: URL value_counts
  * `model/summary_algorithms.py:360-381` + `summary_helpers.py:173-190`;
  * path decomposition `summary_helpers.py:143-170`).
  *
  * Implemented with engine-portable regexp extraction (identical
  * semantics in Java regex and RE2) rather than `parse_url`, so results
  * are oracle-checkable and behave the same in any SQL engine.
  */
object Decompose {

  /** URL parts: scheme, host, path, query, fragment. */
  def urlParts(c: Column): Map[String, Column] = Map(
    "scheme" -> regexp_extract(c, "^([a-z][a-z0-9+.-]*)://", 1),
    "host" -> regexp_extract(c, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1),
    "path" -> regexp_extract(c, "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
    "query" -> regexp_extract(c, "\\?([^#]*)", 1),
    "fragment" -> regexp_extract(c, "#(.*)$", 1))

  /** File-path parts: parent, name, stem, suffix (POSIX separators). */
  def pathParts(c: Column): Map[String, Column] = Map(
    "parent" -> regexp_extract(c, "^(.*)/[^/]*$", 1),
    "name" -> regexp_extract(c, "([^/]*)$", 1),
    "stem" -> regexp_extract(c, "([^/]+?)(?:\\.[^./]*)?$", 1),
    "suffix" -> regexp_extract(c, "(\\.[^./]*)$", 1))

  /** Scalar JSON field extraction (reference has none; events.props is
    * JSON so a pipeline needs it). Returns string; cast at call site. */
  def jsonField(c: Column, field: String): Column =
    get_json_object(c, s"$$.$field")

  /** Canonical URL for dedup (the CommonCrawl-pipeline normalization):
    * lowercase scheme+host, strip a `www.` prefix, default ports, the
    * fragment, common tracking params (utm_*, fbclid, gclid, ref), any
    * then-empty query, and a trailing slash on a non-root path. Pure
    * engine-portable string expressions (codegen'd, map-only) — at
    * 100 TB this runs in the scan stage; the dedup after it is one hash
    * shuffle on the canonical key. Order of surviving query params is
    * preserved (reordering params changes real-world semantics often
    * enough that crawl pipelines leave them alone). */
  def urlCanonical(c: Column): Column = {
    // strip the fragment FIRST: a '?' inside a hash-route fragment
    // ("/app#/r?tab=1") must not be mistaken for the query string
    val noFrag = regexp_replace(c, "#.*", "")
    // scheme+host lowercased via extraction; path/query case preserved
    val scheme =
      lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host0 = regexp_replace(hostRaw, "^www\\.", "")
    // default ports are scheme-relative: :80 is only default for http,
    // :443 only for https — 'http://h:443' is a real non-default origin
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    // trailing slashes: strip ALL, then empty -> "/" (rtrim is portable;
    // a lookbehind/backreference regex is not — RE2 has neither)
    val path0 = regexp_extract(
      noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path1 = rtrim(path0, "/")
    val path = when(path1 === "", lit("/")).otherwise(path1)
    val query0 = regexp_extract(noFrag, "\\?(.*)$", 1)
    // drop tracking params anywhere in the list, then tidy separators
    val query1 = regexp_replace(query0,
      "(?:^|&)(?:utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&]*", "")
    val query = regexp_replace(query1, "^&", "")
    // not an absolute URL (no scheme://host)? pass it through unchanged
    // rather than collapsing every malformed input to the same '://'
    // key — a keep-one-per-key dedup would silently drop distinct docs
    when(scheme === "" || host === "", c).otherwise(
      concat(scheme, lit("://"), host, path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  /** Canonicalize MapType columns so maps become group-able/comparable:
    * `sort_array(map_entries(m))` cast to string. Spark SQL cannot
    * GROUP BY or compare a map; the reference canonicalizes to
    * `array(map_keys, map_values)` for the same reason
    * (model/series_wrappers.py:64-66, dataframe_wrappers.py:520-531) but
    * keeps whatever entry order the map happens to hold — we sort by key
    * so equal maps canonicalize identically regardless of construction
    * order (their nondeterminism, deliberately not copied). Null map →
    * null, empty map → "[]". Non-map columns pass through untouched. */
  def canonicalizeMaps(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.MapType
    if (!df.schema.fields.exists(_.dataType.isInstanceOf[MapType])) df
    else df.select(df.schema.fields.toSeq.map { f =>
      val c = col("`" + f.name.replace("`", "``") + "`")
      f.dataType match {
        case _: MapType =>
          sort_array(map_entries(c)).cast("string").as(f.name)
        case _ => c
      }
    }: _*)
  }

  /** Flatten struct and map columns into prefixed scalar columns — the
    * reference's opt-in `expand_mixed` (utils/dataframe.py:87-124, which
    * explodes dict/tuple CELLS into `col_key` columns). Struct fields
    * expand from the schema; map columns expand over `keys` (maps have
    * no schema-level key set — pass the keys to materialize). */
  def expandNested(df: org.apache.spark.sql.DataFrame,
      mapKeys: Map[String, Seq[String]] = Map.empty): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.{MapType, StructType}
    val cols = df.schema.fields.flatMap { f =>
      f.dataType match {
        case st: StructType =>
          st.fieldNames.toSeq.map(n =>
            col(s"`${f.name}`.`$n`").as(s"${f.name}_$n"))
        case _: MapType if mapKeys.contains(f.name) =>
          mapKeys(f.name).map(k =>
            element_at(col(f.name), k).as(s"${f.name}_$k"))
        case _ => Seq(col(s"`${f.name}`"))
      }
    }
    df.select(cols.toSeq: _*)
  }
}
