package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** robots.txt (RFC 9309) parsing and URL gating — the compliance
  * filter a crawl pipeline applies between URL discovery and fetch
  * (and re-applies when re-processing an archive whose policies
  * changed). Scope: the prefix-rule core of the spec — `User-agent`
  * groups, `Allow`/`Disallow` prefixes, longest-match precedence with
  * Allow winning ties, most-specific-group selection ('*' fallback),
  * comments and blank-line handling. The `*`/`$` wildcard extension is
  * deliberately OUT of scope here (it turns rules into regexes; a
  * caller needing it compiles such rules separately) — documented, as
  * most robots files in the wild are plain prefixes.
  *
  * Shape: parsing is a per-row JVM kernel behind a `flatMap` (grouped,
  * stateful line format — the WARC-seam pattern), emitting a RULES
  * table that is hosts-sized, not corpus-sized. The gate is a plain
  * broadcast join by host + longest-match aggregation keyed by URL —
  * the corpus never shuffles by content, and at 100 TB the rules side
  * stays a broadcast (one row per host×rule).
  */
object Robots {

  /** One applicable rule after group selection. */
  case class Rule(host: String, rule_allow: Boolean, rule_prefix: String)

  /** Parse one robots.txt for `agent` (case-insensitive product
    * token): returns the (allow, path-prefix) rules of the MOST
    * SPECIFIC matching group set — all groups naming the agent, or all
    * `*` groups when none do (RFC 9309 §2.2.1: a specific group
    * REPLACES the wildcard group, it does not merge with it). Empty
    * rule paths ("Disallow:" = allow everything) contribute no rule.
    * Malformed lines are skipped, per spec's error tolerance.
    */
  def parseRules(txt: String, agent: String): Seq[(Boolean, String)] = {
    if (txt == null) return Seq.empty
    val agentLc = agent.toLowerCase
    // groups: (agent tokens, rules); consecutive UA lines share a
    // group, a UA line after rules starts a new group
    val groups = scala.collection.mutable.ListBuffer
      .empty[(scala.collection.mutable.Set[String],
        scala.collection.mutable.ListBuffer[(Boolean, String)])]
    var inRules = false
    txt.linesIterator.foreach { raw =>
      val line = { val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val name = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        name match {
          case "user-agent" =>
            if (groups.isEmpty || inRules) {
              groups += ((scala.collection.mutable.Set.empty[String],
                scala.collection.mutable.ListBuffer.empty[(Boolean, String)]))
              inRules = false
            }
            groups.last._1 += value.toLowerCase
          case "allow" | "disallow" if groups.nonEmpty =>
            inRules = true
            if (value.nonEmpty)
              groups.last._2 += ((name == "allow", value))
          case _ => () // crawl-delay, sitemap, unknown: not rules
        }
      }
    }
    val specific = groups.filter(_._1.contains(agentLc))
    val chosen = if (specific.nonEmpty) specific
      else groups.filter(_._1.contains("*"))
    chosen.flatMap(_._2).toSeq
  }

  /** Columnar seam: `robots(host, txt)` → the hosts-sized applicable
    * rules table for `agent`. Hosts whose file yields no rules emit no
    * rows (their URLs fall through the gate's allowed-by-default arm).
    */
  def rules(robots: DataFrame, hostCol: String, txtCol: String,
            agent: String): Dataset[Rule] = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (host, txt) =>
        if (host == null) Iterator.empty
        else parseRules(txt, agent).iterator.map { case (a, p) =>
          Rule(host, a, p) }
      }
  }

  /** Gate `urls(idCol, hostCol, pathCol)` by `rulesDf` (the
    * [[rules]] output): adds `allowed` plus the deciding rule's
    * `matched_prefix` ('' when no rule matched — allowed by default,
    * which also covers hosts with no robots.txt at all). Longest
    * match wins; on equal length Allow beats Disallow (RFC 9309
    * §2.2.2). One broadcast join by host + one URL-keyed aggregation:
    * the decision struct max is (prefix length, allow) — exactly the
    * spec's precedence order.
    */
  def gate(urls: DataFrame, rulesDf: DataFrame, idCol: String,
           hostCol: String, pathCol: String): DataFrame = {
    val r = rulesDf.select(col("host").as(hostCol),
      col("rule_allow"), col("rule_prefix"))
    val joined = urls.join(broadcast(r), Seq(hostCol), "left")
      .withColumn("__m", col("rule_prefix").isNotNull &&
        col(pathCol).startsWith(col("rule_prefix")))
    val urlCols = urls.columns.map(col)
    joined
      .groupBy(urlCols: _*)
      .agg(max(when(col("__m"), struct(
        length(col("rule_prefix")).as("l"),
        col("rule_allow").as("a"),
        col("rule_prefix").as("p")))).as("__best"))
      .select(urlCols :+
        coalesce(col("__best.a"), lit(true)).as("allowed") :+
        coalesce(col("__best.p"), lit("")).as("matched_prefix"): _*)
  }
}
