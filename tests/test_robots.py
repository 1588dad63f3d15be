"""robots.txt parsing + RFC 9309 precedence + Dataset filter."""

import re

import numpy as np
import pyarrow as pa
import pytest

from webindex.robots import (
    compile_rules,
    match_rules,
    parse_robots,
    robots_filter,
    split_url,
)

ROBOTS = """\
# comments are stripped
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /*.pdf$
Crawl-delay: 5

User-agent: webindex
User-agent: otherbot
Disallow: /only-webindex/
Allow: /only-webindex/sub

User-agent: webindex-deep
Disallow: /
"""


def _ref_verdict(rules, path):
    """Rule-by-rule RFC 9309 reference: longest match wins, allow wins
    ties, no match = allowed."""
    best = None  # (spec, is_allow)
    for is_allow, pattern in rules:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        rx = "^" + "".join(
            ".*" if c == "*" else re.escape(c) for c in body
        ) + ("$" if anchored else "")
        if re.match(rx, path):
            key = (len(pattern), 1 if is_allow else 0)
            if best is None or key > best[:2]:
                best = (*key, is_allow)
    return True if best is None else best[2]


def test_group_selection():
    # '*' group for an unknown agent
    rules = parse_robots(ROBOTS, "randombot")
    assert (False, "/private/") in rules
    assert (False, "/only-webindex/") not in rules
    # named group overrides '*' entirely
    rules = parse_robots(ROBOTS, "webindex")
    assert (False, "/only-webindex/") in rules
    assert (False, "/private/") not in rules
    # multiple user-agent lines share one group
    assert (False, "/only-webindex/") in parse_robots(ROBOTS, "otherbot")
    # longest agent prefix wins
    assert (False, "/") in parse_robots(ROBOTS, "webindex-deep")
    # empty robots => allow everything
    assert parse_robots("", "webindex") == []


@pytest.mark.parametrize("path,want", [
    ("/", True),
    ("/public/x", True),
    ("/private/x", False),
    ("/private/ok", True),            # longer Allow beats Disallow
    ("/private/okextra", True),       # prefix semantics
    ("/paper.pdf", False),            # * wildcard + $ anchor
    ("/paper.pdf?x=1", True),         # $ anchor: query breaks the match
    ("/a/b/paper.pdf", False),
])
def test_star_group_verdicts(path, want):
    rules = parse_robots(ROBOTS, "randombot")
    compiled = compile_rules(rules)
    got = match_rules(compiled, np.array([path], dtype=str))[0]
    assert bool(got) is want
    assert _ref_verdict(rules, path) is want  # reference agrees


def test_match_rules_property_vs_reference():
    """Random rule sets + random paths: vectorized kernel == reference."""
    rng = np.random.default_rng(11)
    segs = ["a", "b", "doc", "img", "x1"]
    for trial in range(40):
        rules = []
        for _ in range(rng.integers(1, 7)):
            depth = rng.integers(1, 4)
            pat = "/" + "/".join(
                rng.choice(segs) for _ in range(depth)
            )
            if rng.random() < 0.3:
                pat += "*"
            if rng.random() < 0.2:
                pat += "$"
            rules.append((bool(rng.random() < 0.5), pat))
        paths = np.array([
            "/" + "/".join(
                rng.choice(segs) for _ in range(rng.integers(1, 5))
            )
            for _ in range(30)
        ], dtype=str)
        compiled = compile_rules(rules)
        got = match_rules(compiled, paths)
        want = np.array([_ref_verdict(rules, p) for p in paths])
        assert (got == want).all(), (trial, rules)


def test_tie_allow_wins():
    rules = [(False, "/dir/"), (True, "/dir/")]
    compiled = compile_rules(rules)
    assert match_rules(compiled, np.array(["/dir/x"], dtype=str))[0]


def test_split_url():
    assert split_url("https://EX.example/a/b?q=1") == (
        "ex.example", "/a/b?q=1"
    )
    assert split_url("https://ex.example") == ("ex.example", "/")


def test_robots_filter_dataset(ray_session):
    import ray.data as rd

    pages = rd.from_arrow(pa.table({
        "url": pa.array([
            "https://a.example/private/secret",
            "https://a.example/private/ok",
            "https://a.example/public",
            "https://b.example/anything",       # no robots -> default
            "https://a.example/paper.pdf",
        ]),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    }))
    robots = pa.table({
        "domain": pa.array(["a.example"]),
        "robots_txt": pa.array([ROBOTS]),
    })
    out = robots_filter(pages, robots, user_agent="randombot").to_pandas()
    assert sorted(out["v"].tolist()) == [2, 3, 4]
    out2 = robots_filter(
        pages, robots, user_agent="randombot", default_allow=False
    ).to_pandas()
    assert sorted(out2["v"].tolist()) == [2, 3]
