"""robots.txt parsing and crawl-permission evaluation — the fetch
gate of a web-crawl pipeline, RFC 9309 semantics, pure Catalyst.

Two stages, both shuffle-light at corpus scale:

* :func:`parse_robots` — robots bodies (one per domain) to a rules
  table. Line splitting, directive extraction and GROUP assignment
  (consecutive ``User-agent`` lines share one group — the
  gaps-and-islands pattern: a running sum over a lag comparison)
  are all native expressions; the per-domain window is bounded by
  robots-file size, never by corpus size.
* :func:`evaluate_robots` — pages x rules permission. The rules
  table is tiny by construction (one robots per registered domain),
  so it BROADCASTS; the page side never shuffles. Group selection
  follows RFC 9309: the most specific matching user-agent group wins
  (exact agent > ``*``), within the group the LONGEST matching rule
  path wins, ties break to Allow, no match means allowed.

Prefix-only matching (the original REP): ``*``/``$`` pattern
wildcards are intentionally out of scope and documented as such —
rule paths are treated literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(robots: DataFrame, domain_col: str = "domain",
                 body_col: str = "body") -> DataFrame:
    """(domain, body) -> (domain, group_id, agent, directive, path).
    One output row per Allow/Disallow rule, replicated per user-agent
    of its group. Unknown directives and comments are dropped; empty
    Disallow (allow-all idiom) is dropped too."""
    lines = (robots.select(
        domain_col,
        F.posexplode(F.split(F.col(body_col), "\n"))
        .alias("line_no", "line")))
    directive = F.lower(F.regexp_extract("line", r"^\s*([A-Za-z-]+)\s*:",
                                         1))
    value = F.trim(F.regexp_extract("line", r":\s*([^#]*)", 1))
    parsed = (lines
              .withColumn("directive", directive)
              .withColumn("value", value)
              .filter(F.col("directive").isin("user-agent", "allow",
                                              "disallow")))
    w = Window.partitionBy(domain_col).orderBy("line_no")
    is_ua = (F.col("directive") == "user-agent").cast("int")
    prev_ua = F.lag(is_ua, 1, 0).over(w)
    # a UA line opens a NEW group only if the previous kept line
    # wasn't also a UA line (consecutive UA lines share the group)
    opens = ((is_ua == 1) & (prev_ua == 0)).cast("int")
    grouped = parsed.withColumn("group_id", F.sum(opens).over(w))
    agents = (grouped.filter(F.col("directive") == "user-agent")
              .select(domain_col, "group_id",
                      F.lower("value").alias("agent")))
    rules = (grouped
             .filter(F.col("directive").isin("allow", "disallow"))
             .filter(F.col("value") != "")
             .select(domain_col, "group_id", "directive",
                     F.col("value").alias("path")))
    return rules.join(agents, [domain_col, "group_id"])


def evaluate_robots(pages: DataFrame, rules: DataFrame,
                    agent: str, domain_col: str = "domain",
                    path_col: str = "path") -> DataFrame:
    """Adds ``allowed`` (boolean) and ``rule_path`` (winning rule, ''
    when none matched) to pages. RFC 9309 precedence; ``rules`` is
    broadcast — pages never shuffle for the permission check (the
    rank window partitions by the page's OWN row, keyed by a
    monotonically increasing id local to this plan)."""
    agent = agent.lower()
    # group selection per domain: exact-agent groups if any, else *
    exact = (rules.filter(F.col("agent") == agent)
             .select(domain_col).distinct()
             .withColumn("_has_exact", F.lit(1)))
    sel = (rules.join(F.broadcast(exact), domain_col, "left")
           .filter(((F.col("_has_exact") == 1)
                    & (F.col("agent") == agent))
                   | (F.col("_has_exact").isNull()
                      & (F.col("agent") == "*")))
           .select(F.col(domain_col).alias("_rdomain"),
                   F.col("directive").alias("_rdir"),
                   F.col("path").alias("_rpath")))
    pg = pages.withColumn("_pid", F.monotonically_increasing_id())
    cand = pg.join(F.broadcast(sel),
                   (F.col(domain_col) == F.col("_rdomain"))
                   & F.col(path_col).startswith(F.col("_rpath")),
                   "left")
    # precedence as a STRUCT MAX (lexicographic), not a sort window:
    # the candidate fan-out collapses map-side via partial aggregation
    # before the only shuffle (groupBy _pid), whereas a row_number
    # window would shuffle and sort every candidate row
    win = F.max(F.when(F.col("_rdir").isNotNull(), F.struct(
        F.length("_rpath").alias("len"),
        (F.col("_rdir") == "allow").cast("int").alias("is_allow"),
        F.col("_rpath").alias("rpath")))).alias("_win")
    keeps = [F.first(c).alias(c) for c in pages.columns]
    agg = cand.groupBy("_pid").agg(*keeps, win)
    return (agg.withColumn(
        "allowed",
        F.col("_win").isNull() | (F.col("_win.is_allow") == 1))
        .withColumn("rule_path",
                    F.coalesce(F.col("_win.rpath"), F.lit("")))
        .drop("_win", "_pid"))
