"""robots.txt parse + RFC 9309 evaluation (operators/robots.py)."""

import pytest

from pyproj_spark.operators.robots import evaluate_robots, parse_robots

BODY = """# comment line
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:
Crawl-delay: 10

User-agent: GoodBot
User-agent: OtherBot
Disallow: /
Allow: /public
"""


@pytest.fixture(scope="module")
def rules(spark):
    df = spark.createDataFrame([("ex.com", BODY)],
                               "domain string, body string")
    return parse_robots(df)


def test_parse_groups_and_rules(rules):
    rows = {(r.agent, r.directive, r.path) for r in rules.collect()}
    # consecutive UA lines share the second group's rules
    assert ("goodbot", "disallow", "/") in rows
    assert ("otherbot", "disallow", "/") in rows
    assert ("goodbot", "allow", "/public") in rows
    assert ("*", "disallow", "/private") in rows
    # empty Disallow and Crawl-delay are dropped
    assert not any(p == "" for _a, _d, p in rows)
    assert not any(d == "crawl-delay" for _a, d, _p in rows)


def _decide(spark, rules, agent, path):
    pages = spark.createDataFrame([("ex.com", path)],
                                  "domain string, path string")
    r = evaluate_robots(pages, rules, agent=agent).head()
    return r.allowed, r.rule_path


def test_star_group_longest_match(spark, rules):
    assert _decide(spark, rules, "randombot", "/private/x") \
        == (False, "/private")
    # longer Allow beats shorter Disallow
    assert _decide(spark, rules, "randombot", "/private/ok/y") \
        == (True, "/private/ok")
    assert _decide(spark, rules, "randombot", "/home") == (True, "")


def test_exact_agent_group_preempts_star(spark, rules):
    # GoodBot gets ONLY its group: /private rules don't apply
    assert _decide(spark, rules, "GoodBot", "/anything") == (False, "/")
    assert _decide(spark, rules, "goodbot", "/public/z") \
        == (True, "/public")
    assert _decide(spark, rules, "OtherBot", "/public/z") \
        == (True, "/public")


def test_no_robots_domain_allows(spark, rules):
    pages = spark.createDataFrame([("other.com", "/private/x")],
                                  "domain string, path string")
    r = evaluate_robots(pages, rules, agent="anybot").head()
    assert r.allowed and r.rule_path == ""
