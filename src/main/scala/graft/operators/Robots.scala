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
  * table that is hosts-sized, not corpus-sized. The gate broadcasts
  * ONE array-valued rules row per host and decides per URL row with a
  * higher-order longest-match — no aggregation, no shuffle; at 100 TB
  * the corpus side never moves.
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

  /** Gate `urls(…, hostCol, pathCol)` by `rulesDf` (the [[rules]]
    * output): adds `allowed` plus the deciding rule's
    * `matched_prefix` ('' when no rule matched — allowed by default,
    * which also covers hosts with no robots.txt at all). Longest
    * match wins; on equal length Allow beats Disallow (RFC 9309
    * §2.2.2).
    *
    * Shape: the rules collapse to ONE array-valued row per host
    * (hosts-sized), broadcast; the decision is a per-row
    * higher-order `array_max` over the matching rules' (length,
    * allow, prefix) structs — the spec's precedence order as a struct
    * ordering. No aggregation, no shuffle, no row-multiplicity
    * change: duplicate URL rows each carry their own decision, and
    * the corpus side never moves.
    */
  def gate(urls: DataFrame, rulesDf: DataFrame,
           hostCol: String, pathCol: String): DataFrame = {
    val perHost = rulesDf
      .groupBy(col("host").as(hostCol))
      .agg(collect_list(struct(col("rule_prefix").as("p"),
        col("rule_allow").as("a"))).as("__rules"))
    val best = array_max(transform(
      filter(col("__rules"),
        r => col(pathCol).startsWith(r.getField("p"))),
      r => struct(length(r.getField("p")).as("l"),
        r.getField("a").as("a"), r.getField("p").as("p"))))
    urls.join(broadcast(perHost), Seq(hostCol), "left")
      .withColumn("__best", best)
      .withColumn("allowed", coalesce(col("__best.a"), lit(true)))
      .withColumn("matched_prefix", coalesce(col("__best.p"), lit("")))
      .drop("__rules", "__best")
  }
}
