"""robots.txt parsing + per-URL permission evaluation (Robots Exclusion
Protocol, RFC 9309 practice).

A compliant corpus builder honors THREE permission layers: URL-level
rules (:mod:`.url_filter`), page-level robots meta tags
(:func:`.url_filter.page_directives`), and the host's robots.txt file —
this module is the third.  Semantics implemented (the classic REP core
every public parser agrees on):

* lines are ``directive: value`` with ``#`` comments stripped; the
  recognized directives are ``User-agent``, ``Allow``, ``Disallow``
  (case-insensitive);
* CONSECUTIVE ``User-agent`` lines form the agent set of a group; the
  Allow/Disallow lines after them (until the next User-agent line that
  follows a rule line) belong to that group;
* a fetcher obeys the most specific group: the group(s) naming its own
  agent token if any exist for the host, else the ``*`` group(s);
* per URL path the LONGEST-prefix-matching rule wins; at equal length
  ``Allow`` beats ``Disallow``; an empty rule value matches nothing; no
  matching rule means allowed.  (``*``/``$`` wildcard rules are parsed
  but treated as literal prefixes — documented simplification of the
  RFC 9309 extension.)

Scale shape (100 TB of pages, ~10^8 hosts): robots.txt is a per-HOST
dim table, orders of magnitude smaller than the page corpus.  The parse
(explode lines → window over (host, line order) → group aggregation)
shuffles only the dim; the per-URL evaluation broadcasts the compiled
rules and picks the winning rule with one partial-agg max(struct(...))
groupBy per URL — the corpus is never re-partitioned.

Reference anchor: fills the nutch-plugin crawl-filter role described in
the reference README (`/root/reference` README's protocol-plugin
pairing), the same slot url_filter cites.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .url_filter import url_host

_DIRECTIVE_RE = r"(?i)^\s*(user-agent|allow|disallow)\s*:\s*(.*?)\s*$"


def robots_rules(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Compile ``(host, robots_txt)`` into the rule set governing
    ``agent``: ``(host, rule_type, rule_path)`` with rule_type in
    {allow, disallow}.  Group semantics per the module docstring; hosts
    whose file yields no applicable group produce no rows (= everything
    allowed)."""
    agent_lc = agent.lower()
    lines = F.split(F.col(txt_col), r"\n")
    exploded = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(lines).alias("line_no", "raw"),
    ).select(
        "host",
        "line_no",
        F.regexp_extract(
            F.trim(F.regexp_replace(F.col("raw"), r"#.*$", "")),
            _DIRECTIVE_RE,
            1,
        ).alias("d"),
        F.regexp_extract(
            F.trim(F.regexp_replace(F.col("raw"), r"#.*$", "")),
            _DIRECTIVE_RE,
            2,
        ).alias("v"),
    ).filter(F.col("d") != "")
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.lower(F.col("d")) == "user-agent"
    prev_is_ua = F.lag(is_ua, 1, False).over(w)
    grouped = exploded.select(
        "host",
        "line_no",
        F.lower(F.col("d")).alias("d"),
        "v",
        F.sum(
            (is_ua & ~prev_is_ua).cast("int")
        ).over(w).alias("group_id"),
    )
    agents = (
        grouped.filter(F.col("d") == "user-agent")
        .groupBy("host", "group_id")
        .agg(
            F.max(
                (F.lower(F.col("v")) == agent_lc).cast("int")
            ).alias("has_agent"),
            F.max((F.col("v") == "*").cast("int")).alias("has_star"),
        )
    )
    host_specific = agents.groupBy("host").agg(
        F.max("has_agent").alias("host_has_agent")
    )
    selected = (
        agents.join(host_specific, "host")
        .filter(
            F.when(F.col("host_has_agent") == 1, F.col("has_agent") == 1)
            .otherwise(F.col("has_star") == 1)
        )
        .select("host", "group_id")
    )
    return (
        grouped.filter(F.col("d") != "user-agent")
        .join(selected, ["host", "group_id"])
        .filter(F.col("v") != "")
        .select(
            "host",
            F.col("d").alias("rule_type"),
            F.col("v").alias("rule_path"),
        )
        .distinct()
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Evaluate each URL against compiled robots rules: output
    ``(doc_id, url, host, matched_rule, rule_type, allowed)``.
    Longest-prefix match; Allow beats Disallow at equal length; no
    match (or no rules for the host) → allowed with matched_rule ''.

    ZERO corpus shuffle: the rules are pre-aggregated per host on the
    DIM side (collect_list), broadcast, and the winning rule is picked
    per row with a HOF fold over the host's rule array — the corpus is
    never re-partitioned, which is the shape that matters when urls is
    10^12 rows and rules is 10^8."""
    url = F.col(url_col)
    host = url_host(url)
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    base = urls.select(
        F.col(id_col).alias("doc_id"),
        url.alias("url"),
        host.alias("host"),
        F.when(path == "", "/").otherwise(path).alias("path"),
    )
    rules_by_host = rules.groupBy("host").agg(
        F.collect_list(
            F.struct(F.col("rule_type"), F.col("rule_path"))
        ).alias("rules")
    )
    joined = base.join(F.broadcast(rules_by_host), "host", "left")
    nothing = F.struct(
        F.lit(-1).alias("l"),
        F.lit(-1).alias("is_allow"),
        F.lit("").alias("rule_path"),
        F.lit("").alias("rule_type"),
    )
    # fold the (distinct) rule structs to the max of (len, allow, path,
    # type) — total order, so collect_list's arrival order is irrelevant
    best = F.aggregate(
        F.filter(
            F.coalesce(F.col("rules"), F.array()),
            lambda r: F.col("path").startswith(r["rule_path"]),
        ),
        nothing,
        lambda acc, r: F.when(
            F.struct(
                F.length(r["rule_path"]).alias("l"),
                (r["rule_type"] == "allow").cast("int").alias("is_allow"),
                r["rule_path"].alias("rule_path"),
                r["rule_type"].alias("rule_type"),
            )
            > acc,
            F.struct(
                F.length(r["rule_path"]).alias("l"),
                (r["rule_type"] == "allow").cast("int").alias("is_allow"),
                r["rule_path"].alias("rule_path"),
                r["rule_type"].alias("rule_type"),
            ),
        ).otherwise(acc),
    )
    return joined.select(
        "doc_id",
        "url",
        "host",
        best["rule_path"].alias("matched_rule"),
        best["rule_type"].alias("rule_type"),
        (best["rule_type"] != F.lit("disallow")).alias("allowed"),
    )


def robots_txt_expr(host: Column) -> Column:
    """Deterministic robots.txt fixture from the host string alone —
    shared literal construction for both engines.  Variants by
    length(host) % 3: (0) a ``*`` group disallowing /xxx/ and /download/
    with an Allow carve-out under /download/free/ plus a trainingbot
    group disallowing everything; (1) a trainingbot-specific group only
    (disallow /poker/ and /assets/) — ``*`` fetchers see no rules but
    trainingbot must use ITS group; (2) comments/blank lines and an
    empty Disallow (matches nothing)."""
    m = F.length(host) % 3
    return (
        F.when(
            m == 0,
            F.lit(
                "User-agent: *\n"
                "Disallow: /xxx/\n"
                "Disallow: /download/\n"
                "Allow: /download/free/\n"
                "\n"
                "User-agent: trainingbot\n"
                "Disallow: /\n"
            ),
        )
        .when(
            m == 1,
            F.lit(
                "# site policy\n"
                "User-agent: trainingbot\n"
                "User-agent: otherbot\n"
                "Disallow: /poker/\n"
                "Disallow: /assets/\n"
            ),
        )
        .otherwise(
            F.lit(
                "# nothing blocked\n"
                "User-agent: *\n"
                "Disallow:\n"
            )
        )
    )


def synth_robots_df(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host robots.txt dim built from the distinct hosts of a URL
    table via ``robots_txt_expr``."""
    host = url_host(F.col(url_col))
    return (
        urls.select(host.alias("host"))
        .distinct()
        .select("host", robots_txt_expr(F.col("host")).alias("robots_txt"))
    )
