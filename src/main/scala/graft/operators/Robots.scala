package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** robots.txt (RFC 9309) parsing and URL gating — the compliance
  * filter a crawl pipeline applies between URL discovery and fetch
  * (and re-applies when re-processing an archive whose policies
  * changed). Scope: `User-agent` groups, `Allow`/`Disallow` rules
  * INCLUDING the §2.2.3 `*`/`$` wildcards (a MUST for crawlers — real
  * robots files lean on "Disallow: / star ?sessionid"-style rules
  * constantly), most-specific-match precedence with Allow winning
  * ties, most-specific-group selection ('*' fallback), comments and
  * blank-line handling.
  *
  * Shape: parsing is a per-row JVM kernel behind a `flatMap` (grouped,
  * stateful line format — the WARC-seam pattern), emitting a RULES
  * table that is hosts-sized, not corpus-sized. The gate groups rules
  * to ONE array-valued row per host and decides per URL row with a
  * higher-order most-specific-match — no aggregation on the corpus
  * side, no row-multiplicity change; at 100 TB the corpus side never
  * moves, and AQE picks the join strategy (broadcast while the rules
  * table is small, a plain shuffle join if a crawl ever accumulates
  * more host rules than the driver could broadcast).
  */
object Robots {

  /** Does `pattern` match `path` under RFC 9309 §2.2.3 semantics:
    * `*` matches any character sequence (including empty and '/'),
    * a TRAILING `$` anchors the match at end-of-path, and an
    * unanchored pattern matches any path it prefixes. A `$` anywhere
    * but the end is a literal octet (the reference Google parser's
    * reading). Plain prefixes fall out as the wildcard-free case —
    * one matcher for every rule. Kernel shared with the codegen'd
    * `graft_robots_match` expression the [[gate]] evaluates per row.
    */
  def matches(path: String, pattern: String): Boolean =
    graft.functions.SketchKernels.robotsMatchStr(path, pattern)

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
    * `matched_prefix` — the rule pattern as written, wildcards
    * included ('' when no rule matched — allowed by default, which
    * also covers hosts with no robots.txt at all). Rules match under
    * full §2.2.3 semantics via [[matches]]; the most specific match
    * (most pattern octets, RFC 9309 §2.2.2) wins, and on a tie Allow
    * beats Disallow.
    *
    * Shape: the rules collapse to ONE array-valued row per host
    * (hosts-sized); the decision is a per-row higher-order
    * `array_max` over the matching rules' (length, allow, pattern)
    * structs — the spec's precedence order as a struct ordering. No
    * aggregation on the corpus side, no row-multiplicity change:
    * duplicate URL rows each carry their own decision, and the
    * corpus side never moves. The join strategy is left to AQE: a
    * hosts-sized table broadcasts, but an unconditional hint would
    * fail the job outright on a crawl whose rules table outgrew the
    * broadcast limit.
    */
  def gate(urls: DataFrame, rulesDf: DataFrame,
           hostCol: String, pathCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(urls.sparkSession)
    val perHost = rulesDf
      .groupBy(col("host").as(hostCol))
      .agg(collect_list(struct(col("rule_prefix").as("p"),
        col("rule_allow").as("a"))).as("__rules"))
    val best = array_max(transform(
      filter(col("__rules"),
        r => graft.functions.GraftFunctions
          .robotsMatch(col(pathCol), r.getField("p"))),
      r => struct(length(r.getField("p")).as("l"),
        r.getField("a").as("a"), r.getField("p").as("p"))))
    urls.join(perHost, Seq(hostCol), "left")
      .withColumn("__best", best)
      .withColumn("allowed", coalesce(col("__best.a"), lit(true)))
      .withColumn("matched_prefix", coalesce(col("__best.p"), lit("")))
      .drop("__rules", "__best")
  }
}
