"""robots.txt parsing + URL permission: hand-built file goldens covering
group construction, most-specific-group override, longest-prefix match,
Allow-beats-Disallow, comments and empty Disallow."""

import pytest

from language_detection_spark.operators.robots import (
    robots_allowed,
    robots_rules,
)

_ROBOTS = """\
# global policy
User-agent: *
Disallow: /private/
Allow: /private/public/
Disallow: /tmp

User-agent: trainingbot
User-agent: otherbot
Disallow: /poker/
Allow: /poker/rules/
Disallow:
"""


@pytest.fixture(scope="module")
def robots_df(spark):  # noqa: F811
    return spark.createDataFrame(
        [("example.com", _ROBOTS), ("empty.com", "# no directives\n")],
        "host string, robots_txt string",
    )


def _rules(spark, robots_df, agent):
    rows = robots_rules(robots_df, agent=agent).collect()
    return {(r["host"], r["rule_type"], r["rule_path"]) for r in rows}


def test_star_agent_gets_star_group_only(spark, robots_df):  # noqa: F811
    got = _rules(spark, robots_df, "*")
    assert got == {
        ("example.com", "disallow", "/private/"),
        ("example.com", "allow", "/private/public/"),
        ("example.com", "disallow", "/tmp"),
    }


def test_specific_agent_overrides_star(spark, robots_df):  # noqa: F811
    """trainingbot has its own group (shared with otherbot via
    consecutive User-agent lines) -> the * group is ignored and the
    empty Disallow contributes nothing."""
    got = _rules(spark, robots_df, "TrainingBot")  # case-insensitive
    assert got == {
        ("example.com", "disallow", "/poker/"),
        ("example.com", "allow", "/poker/rules/"),
    }


def test_evaluation_longest_match_and_allow_wins(spark, robots_df):  # noqa: F811
    urls = spark.createDataFrame(
        [
            (0, "https://example.com/private/data"),      # disallow
            (1, "https://example.com/private/public/x"),  # allow carve-out
            (2, "https://example.com/tmpfile"),           # prefix, no slash
            (3, "https://example.com/open/page"),         # no rule
            (4, "https://empty.com/anything"),            # host without rules
            (5, "https://example.com"),                   # bare host -> '/'
        ],
        "doc_id bigint, url string",
    )
    rules = robots_rules(robots_df, agent="*")
    rows = {r["doc_id"]: r for r in robots_allowed(urls, rules).collect()}
    assert not rows[0]["allowed"] and rows[0]["matched_rule"] == "/private/"
    assert rows[1]["allowed"] and rows[1]["matched_rule"] == "/private/public/"
    assert not rows[2]["allowed"] and rows[2]["matched_rule"] == "/tmp"
    assert rows[3]["allowed"] and rows[3]["matched_rule"] == ""
    assert rows[4]["allowed"]
    assert rows[5]["allowed"]


def test_rules_dim_is_broadcast(spark, robots_df):  # noqa: F811
    urls = spark.createDataFrame(
        [(0, "https://example.com/a")], "doc_id bigint, url string"
    )
    plan = (
        robots_allowed(urls, robots_rules(robots_df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # every shuffle is on the DIM side (host-keyed parse/aggregation);
    # the URL corpus itself is never re-partitioned
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]*)", plan)
    assert exchanges and all("host" in e for e in exchanges), exchanges
    assert "doc_id" not in " ".join(exchanges)
