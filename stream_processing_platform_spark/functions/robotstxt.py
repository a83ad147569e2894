"""robots.txt FILE parsing (RFC 9309) — the front half of the robots
pipeline: a crawl fetches ``/robots.txt`` per host, parses it into the
per-agent rule group, and only then can the path-rule gate
(``q_robots_rules_filter``'s broadcast rules table) exist. The r11
surface assumed the rules table; this module produces it from payload
text.

Deterministic subset of RFC 9309 (documented choices):

- lines split on ``\\n``; ``#`` comments stripped; ``key: value``
  directives, keys case-insensitive;
- a GROUP is one or more consecutive ``User-agent`` lines followed by
  its rules; blank lines do NOT terminate a group (RFC 9309 §2.1 —
  unlike the original 1994 REP); rules before any ``User-agent`` line
  are ignored;
- agent matching is case-insensitive: a token matches when it is ``*``
  or a prefix of the crawler's product token; the MOST SPECIFIC
  (longest) matching token wins, and every group carrying that token
  merges (RFC 9309 §2.2.1);
- path rule evaluation implements the full RFC 9309 §2.2.3 pattern
  language (r13): ``*`` matches any run of octets (including empty),
  a TRAILING ``$`` anchors the end of the path (a ``$`` anywhere else
  is a literal octet, the same reading Google's open-source parser
  takes); most-specific-match-wins where specificity counts LITERAL
  octets only (``*`` and the ``$`` anchor contribute zero — so
  ``/page/*3$`` and the prefix rule ``/page/1`` tie at 7); on a
  specificity tie Allow wins (§2.2.2); no matching rule -> allowed;
- ``Crawl-delay`` (non-RFC but ubiquitous) and ``Sitemap`` (global,
  group-independent) are surfaced.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class RobotsPolicy:
    matched_agent: str  # the winning user-agent token ('' = no group)
    rules: tuple[tuple[int, str], ...]  # (allow 1/0, path prefix)
    crawl_delay: int  # seconds, -1 when absent
    sitemaps: tuple[str, ...]


def parse_robots_txt(text: str, agent: str) -> RobotsPolicy:
    """Parse one robots.txt payload and select the rule group for
    ``agent`` per RFC 9309 group-selection semantics."""
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[tuple[int, str]], int]] = []
    sitemaps: list[str] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[int, str]] = []
    cur_delay = -1
    in_agent_run = False  # consecutive User-agent lines stack into one group

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], -1

    for raw in text.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue  # blank lines do NOT terminate a group (RFC 9309)
        if ":" not in line:
            # garbage (colon-less) lines are ignored, but DO end a
            # User-agent run: per the RFC 9309 ABNF only startgrouplines
            # and empty lines may sit between the User-agent lines of
            # one group, so 'UA: a / <garbage> / UA: b' is two groups.
            in_agent_run = False
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            if val:
                sitemaps.append(val)  # global directive, outside groups
            # like any non-User-agent line, a sitemap ends a UA run:
            # 'UA: a / Sitemap: x / UA: b' must NOT merge a and b into
            # one group (r12 ADVICE — RFC 9309 group formation).
            in_agent_run = False
            continue
        if key == "user-agent":
            if not in_agent_run:
                flush()
            if val:
                cur_agents.append(val.lower())
            in_agent_run = True
            continue
        in_agent_run = False
        if not cur_agents:
            continue  # rules before any User-agent line: ignored
        if key in ("allow", "disallow"):
            if val:
                cur_rules.append((1 if key == "allow" else 0, val))
            # an empty Disallow means "allow everything": no rule
        elif key == "crawl-delay":
            try:
                cur_delay = int(float(val))
            except ValueError:
                pass

    flush()

    # group selection: most specific matching token, '*' as fallback;
    # all groups carrying the winning token merge
    best = ""
    has_star = False
    for agents, _, _ in groups:
        for tok in agents:
            if tok == "*":
                has_star = True
            elif agent_l.startswith(tok) and len(tok) > len(best):
                best = tok
    if not best and has_star:
        best = "*"
    rules: list[tuple[int, str]] = []
    delay = -1
    if best:
        for agents, rs, dl in groups:
            if best in agents:
                rules.extend(rs)
                if dl >= 0:
                    delay = dl
    return RobotsPolicy(best, tuple(rules), delay, tuple(sitemaps))


def match_pattern(pattern: str, path: str) -> bool:
    """RFC 9309 §2.2.3 path-pattern match: the pattern is anchored at the
    START of the path, ``*`` matches any run of octets (including the
    empty run), and a TRAILING ``$`` additionally anchors the END (a
    ``$`` anywhere else is a literal). Greedy first-fit over the
    ``*``-split segments is exact for this language (each middle segment
    placed at its earliest feasible position never blocks a later one)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = body.split("*")
    if len(parts) == 1:  # no wildcard: plain prefix (or exact with $)
        return path == body if anchored else path.startswith(body)
    if not path.startswith(parts[0]):
        return False
    pos = len(parts[0])
    for seg in parts[1:-1]:
        if not seg:  # '**' — the extra star matches the empty run
            continue
        i = path.find(seg, pos)
        if i < 0:
            return False
        pos = i + len(seg)
    last = parts[-1]
    if anchored:
        return len(path) - len(last) >= pos and path.endswith(last)
    return path.find(last, pos) >= 0  # '' found at pos when pos<=len


def pattern_specificity(pattern: str) -> int:
    """Rule precedence weight: the number of LITERAL octets in the
    pattern — ``*`` and a trailing ``$`` anchor count zero. This is the
    documented deterministic choice for wildcard-vs-prefix precedence
    (RFC 9309 says only "most specific = longest"; counting literal
    octets makes ``/page/*3$`` and ``/page/1`` tie at 7, resolved by
    Allow-wins-ties)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    return len(body) - body.count("*")


def path_allowed(policy: RobotsPolicy, path: str) -> bool:
    """RFC 9309 §2.2.2 evaluation: most specific matching rule wins
    (literal-octet specificity, wildcard-aware match); Allow wins ties;
    no matching rule -> allowed."""
    best_spec = -1
    best_allow = True
    for allow, pattern in policy.rules:
        if match_pattern(pattern, path):
            s = pattern_specificity(pattern)
            if s > best_spec or (s == best_spec and allow == 1):
                best_spec = s
                best_allow = allow == 1
    return best_allow
